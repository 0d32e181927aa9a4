"""Interleaved A/B at the canonical bbox finest level shape
(960x144x144, 73% of all refined cells): flat wavefront vs the round-4
production flat-pipelined w2s4 kernel.

Usage: python scripts/_probe_wavefront_flat.py [s_wave] [bx_wave]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from mg_ic_code_tpu.ops import fused_sweeps as fs
from mg_ic_code_tpu.ops import wavefront as wf

D = "dirichlet"
KW = dict(kinds=((D, D),) * 3, rho=2.0, alpha=1.0, beta=-1.0, dx=0.01,
          lo=(0, 0, 0), interpret=False)
SHAPE = (960, 144, 144)
SW = int(sys.argv[1]) if len(sys.argv) > 1 else 4
BXW = int(sys.argv[2]) if len(sys.argv) > 2 else 16
TRIALS = 7
LO_SWEEPS, HI_SWEEPS = 16, 48


def bar(x):
    jax.block_until_ready(x)
    return float(jnp.sum(x))


def make_run(fn, s, sweeps):
    @jax.jit
    def run(x, r, a):
        for _ in range(sweeps // s):
            x = fn(x, r, a, nsweeps=s, **KW)
        return x
    return run


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u = jnp.zeros(SHAPE, jnp.float32)
    r = jax.random.normal(k1, SHAPE, jnp.float32)
    a = jax.random.uniform(k2, SHAPE, jnp.float32, 0.5, 2.0)
    cells = float(SHAPE[0] * SHAPE[1] * SHAPE[2])

    variants = {
        "flatp_w2s4": (functools.partial(
            fs.multisweep_relax_flat_pipelined, width=2), 4, 7.0),
        f"wavef_s{SW}bx{BXW}": (functools.partial(
            wf.wavefront_relax_flat, bx=BXW), SW, 16.0 / SW),
    }
    runs, outs = {}, {}
    for label, (fn, s, bps) in variants.items():
        try:
            lo_run = make_run(fn, s, LO_SWEEPS)
            hi_run = make_run(fn, s, HI_SWEEPS)
            out = hi_run(u, r, a)
            bar(out)
            bar(lo_run(u, r, a))
        except Exception as e:
            print(f"{label}: COMPILE-FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)
            continue
        runs[label] = (lo_run, hi_run, bps)
        outs[label] = out
    if len(outs) == 2:
        va, vb = outs.values()
        print(f"max dev between variants after {HI_SWEEPS} sweeps: "
              f"{float(jnp.max(jnp.abs(va - vb))):.3e}", flush=True)

    slopes = {k: [] for k in runs}
    for t in range(TRIALS):
        for label, (lo_run, hi_run, _) in runs.items():
            t0 = time.perf_counter(); bar(lo_run(u, r, a))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter(); bar(hi_run(u, r, a))
            t_hi = time.perf_counter() - t0
            slopes[label].append((t_hi - t_lo) / (HI_SWEEPS - LO_SWEEPS))
    for label, ss in slopes.items():
        ss = sorted(ss)
        med = ss[len(ss) // 2]
        bps = runs[label][2]
        print(f"{label}: {med*1e3:.3f} ms/sweep marginal = "
              f"{cells/med:.3e} DOF/s; {bps:.1f} B/cell-sweep -> "
              f"{bps*cells/med/1e9:.0f} GB/s effective "
              f"(all: {['%.3f' % (x*1e3) for x in ss]})", flush=True)


if __name__ == "__main__":
    main()
