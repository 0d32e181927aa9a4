"""Order-randomized, many-trial marginal comparison: wavefront vs
pipelined w2s4 at 256^3 f32. The earlier A/B medians disagreed with the
official bench under heavy relay drift; this probe randomises the
variant order per trial and reports order-stratified medians so a
systematic first-runner bias shows up explicitly.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import random
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from mg_ic_code_tpu.ops import fused_sweeps as fs
from mg_ic_code_tpu.ops import wavefront as wf

D = "dirichlet"
KW = dict(kinds=((D, D),) * 3, rho=2.0, alpha=1.0, beta=-1.0, dx=0.01,
          lo=(0, 0, 0), interpret=False)
N = 256
TRIALS = 15
LO, HI = 16, 48


def bar(x):
    jax.block_until_ready(x)
    return float(jnp.sum(x))


def chain(fn, s, sweeps, **kw):
    @jax.jit
    def run(x, r, a):
        for _ in range(sweeps // s):
            x = fn(x, r, a, nsweeps=s, **kw, **KW)
        return x
    return run


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u = jnp.zeros((N, N, N), jnp.float32)
    r = jax.random.normal(k1, (N, N, N), jnp.float32)
    a = jax.random.uniform(k2, (N, N, N), jnp.float32, 0.5, 2.0)
    cells = float(N) ** 3

    runs = {
        "pipe": (chain(fs.multisweep_relax_pipelined, 4, LO, width=2),
                 chain(fs.multisweep_relax_pipelined, 4, HI, width=2)),
        "wave": (chain(wf.wavefront_relax, 4, LO, bx=16),
                 chain(wf.wavefront_relax, 4, HI, bx=16)),
    }
    for lo_run, hi_run in runs.values():
        bar(hi_run(u, r, a))
        bar(lo_run(u, r, a))

    rng = random.Random(0)
    slopes = {k: [] for k in runs}
    order_first = {k: [] for k in runs}
    for t in range(TRIALS):
        names = list(runs)
        rng.shuffle(names)
        for pos, name in enumerate(names):
            lo_run, hi_run = runs[name]
            t0 = time.perf_counter(); bar(lo_run(u, r, a))
            tl = time.perf_counter() - t0
            t0 = time.perf_counter(); bar(hi_run(u, r, a))
            th = time.perf_counter() - t0
            sl = (th - tl) / (HI - LO)
            slopes[name].append(sl)
            if pos == 0:
                order_first[name].append(sl)

    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2] if xs else float("nan")

    for name, ss in slopes.items():
        m = med(ss)
        print(f"{name}: median {m*1e3:.3f} ms/sweep = {cells/m:.3e} DOF/s "
              f"(n={len(ss)}, first-position median "
              f"{med(order_first[name])*1e3:.3f}; "
              f"all {['%.3f' % (x*1e3) for x in sorted(ss)]})", flush=True)


if __name__ == "__main__":
    main()
