"""Round-5 probe: vector-mask folded passes x pipelined width, 256^3 f32.

The round-5 pass rework (ops/fused_sweeps._fold_coefs) replaced the
materialised P*a_vp full-field products (4 VMEM windows) and the per-pass
x ghost-row re-derivation (selects + concat) with broadcast edge-weight
vectors inside one P*S FMA chain. Two predictions to verify on the chip:

1. the per-pass VPU op count drops ~25-30%, so the w2s4 marginal moves
   from the round-4 0.283 ms/sweep toward ~0.20;
2. the live window shrinks ~14 -> ~10 equivalent row-fields, so width 4
   at s=4 (bx=32, 48-row window) now compiles where round 4's Mosaic
   VMEM rejection sat, buying (w+2)/w redundancy 1.5 vs 2.

Marginal methodology as _probe_width.py: slope between 16- and 48-sweep
chained calls, interleaved trials, median (drift-robust, VERDICT r3 #4).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from mg_ic_code_tpu.ops import fused_sweeps as fs

D = "dirichlet"
KW = dict(kinds=((D, D),) * 3, rho=2.0, alpha=1.0, beta=-1.0, dx=0.01,
          lo=(0, 0, 0), interpret=False)
N = 256
TRIALS = 5
LO_SWEEPS, HI_SWEEPS = 16, 48

# (label, nsweeps_per_launch, width, pipe_vmem_budget_bytes)
VARIANTS = [
    ("w2s4", 4, 2, 120 * 1024 * 1024),
    ("w4s4", 4, 4, 127 * 1024 * 1024),
    ("w4s2", 2, 4, 110 * 1024 * 1024),
    ("w8s2", 2, 8, 127 * 1024 * 1024),
    ("w1s4", 4, 1, 100 * 1024 * 1024),
]


def bar(x):
    jax.block_until_ready(x)
    return float(jnp.sum(x))


def make_run(s, w, sweeps):
    assert sweeps % s == 0

    @jax.jit
    def run(x, r, a):
        for _ in range(sweeps // s):
            x = fs.multisweep_relax_pipelined(
                x, r, a, nsweeps=s, width=w, **KW)
        return x

    return run


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u = jnp.zeros((N, N, N), jnp.float32)
    r = jax.random.normal(k1, (N, N, N), jnp.float32)
    a = jax.random.uniform(k2, (N, N, N), jnp.float32, 0.5, 2.0)
    cells = float(N) ** 3

    ref_out = None
    runs = {}
    for label, s, w, budget in VARIANTS:
        old = fs.PIPE_VMEM_LIMIT
        fs.PIPE_VMEM_LIMIT = budget
        try:
            lo_run = make_run(s, w, LO_SWEEPS)
            hi_run = make_run(s, w, HI_SWEEPS)
            out = hi_run(u, r, a)
            bar(out)
        except Exception as e:  # Mosaic VMEM rejection etc.
            print(f"{label}: COMPILE-FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            continue
        finally:
            fs.PIPE_VMEM_LIMIT = old
        if ref_out is None:
            ref_out = out
        else:
            dev = float(jnp.max(jnp.abs(out - ref_out)))
            print(f"{label}: max dev vs {VARIANTS[0][0]} after "
                  f"{HI_SWEEPS} sweeps: {dev:.3e}", flush=True)
        bar(lo_run(u, r, a))
        runs[label] = (lo_run, hi_run, s, w)

    slopes = {k: [] for k in runs}
    for t in range(TRIALS):
        for label, (lo_run, hi_run, s, w) in runs.items():
            t0 = time.perf_counter(); bar(lo_run(u, r, a))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter(); bar(hi_run(u, r, a))
            t_hi = time.perf_counter() - t0
            slopes[label].append((t_hi - t_lo) / (HI_SWEEPS - LO_SWEEPS))
    for label, ss in slopes.items():
        ss = sorted(ss)
        med = ss[len(ss) // 2]
        s, w = runs[label][2], runs[label][3]
        streams = (3.0 * (w + 2) / w + 1.0) / s
        print(f"{label}: {med*1e3:.3f} ms/sweep marginal = "
              f"{cells/med:.3e} DOF/s; {streams*4.0:.1f} B/cell-sweep -> "
              f"{streams*4.0*cells/med/1e9:.0f} GB/s effective "
              f"(all trials: {['%.3f' % (x*1e3) for x in ss]})", flush=True)


if __name__ == "__main__":
    main()
