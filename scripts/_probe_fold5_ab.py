"""Same-process interleaved A/B: round-4 pass (materialised P*a products,
per-pass x ghost rederive) vs round-5 pass (vector-mask fold), pipelined
w2s4 at 256^3 f32. The relay drifts 2-3x day to day, so only an
interleaved in-process ratio is meaningful (docs/PERF.md methodology).

Usage: python scripts/_probe_fold5_ab.py [N] [s] [w]
Requires: git show HEAD:...fused_sweeps.py > /tmp/fsv4/fused_sweeps_v4.py
"""
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from mg_ic_code_tpu.ops import fused_sweeps as fs_new

spec = importlib.util.spec_from_file_location(
    "fused_sweeps_v4", "/tmp/fsv4/fused_sweeps_v4.py")
fs_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fs_old)

D = "dirichlet"
KW = dict(kinds=((D, D),) * 3, rho=2.0, alpha=1.0, beta=-1.0, dx=0.01,
          lo=(0, 0, 0), interpret=False)
N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
S = int(sys.argv[2]) if len(sys.argv) > 2 else 4
W = int(sys.argv[3]) if len(sys.argv) > 3 else 2
TRIALS = 7
LO_SWEEPS, HI_SWEEPS = 16, 48


def bar(x):
    jax.block_until_ready(x)
    return float(jnp.sum(x))


def make_run(mod, sweeps):
    @jax.jit
    def run(x, r, a):
        for _ in range(sweeps // S):
            x = mod.multisweep_relax_pipelined(
                x, r, a, nsweeps=S, width=W, **KW)
        return x
    return run


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u = jnp.zeros((N, N, N), jnp.float32)
    r = jax.random.normal(k1, (N, N, N), jnp.float32)
    a = jax.random.uniform(k2, (N, N, N), jnp.float32, 0.5, 2.0)
    cells = float(N) ** 3

    runs = {}
    for label, mod in (("old", fs_old), ("new", fs_new)):
        lo_run, hi_run = make_run(mod, LO_SWEEPS), make_run(mod, HI_SWEEPS)
        out = hi_run(u, r, a); bar(out)
        bar(lo_run(u, r, a))
        runs[label] = (lo_run, hi_run, out)
    dev = float(jnp.max(jnp.abs(runs["old"][2] - runs["new"][2])))
    print(f"max dev old-vs-new after {HI_SWEEPS} sweeps: {dev:.3e}",
          flush=True)

    slopes = {k: [] for k in runs}
    for t in range(TRIALS):
        for label, (lo_run, hi_run, _) in runs.items():
            t0 = time.perf_counter(); bar(lo_run(u, r, a))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter(); bar(hi_run(u, r, a))
            t_hi = time.perf_counter() - t0
            slopes[label].append((t_hi - t_lo) / (HI_SWEEPS - LO_SWEEPS))
    meds = {}
    for label, ss in slopes.items():
        ss = sorted(ss)
        meds[label] = ss[len(ss) // 2]
        print(f"{label}: {meds[label]*1e3:.3f} ms/sweep marginal = "
              f"{cells/meds[label]:.3e} DOF/s "
              f"(all: {['%.3f' % (x*1e3) for x in ss]})", flush=True)
    print(f"ratio old/new: {meds['old']/meds['new']:.3f}", flush=True)


if __name__ == "__main__":
    main()
