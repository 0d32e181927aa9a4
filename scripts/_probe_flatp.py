"""Interleaved A/B: manual-DMA flat kernel (round 2) vs the round-4
folded auto-pipelined flat kernel on the canonical bbox finest shape
(960x144x144 — 73% of all refined cells). Also 40-sweep chained timing for
the marginal picture. On-device operands (relay-congestion-proof)."""
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
SHAPE = (960, 144, 144)
TRIALS = 6


def bar(x):
    jax.block_until_ready(x)
    return float(jnp.sum(x))


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u = jnp.zeros(SHAPE, jnp.float32)
    r = jax.random.normal(k1, SHAPE, jnp.float32)
    a = jax.random.uniform(k2, SHAPE, jnp.float32, 0.5, 2.0)

    @jax.jit
    def run_flat(x):  # 40 sweeps: 10 x 4-sweep manual-DMA launches
        for _ in range(10):
            x = fs.multisweep_relax_flat(x, r, a, nsweeps=4, bx=8, **KW)
        return x

    @jax.jit
    def run_flatp(x):  # 40 sweeps: 5 x 8-sweep pipelined launches
        for _ in range(5):
            x = fs.multisweep_relax_flat_pipelined(x, r, a, nsweeps=8, **KW)
        return x

    o1 = run_flat(u); bar(o1)
    o2 = run_flatp(u); bar(o2)
    rel = float(jnp.max(jnp.abs(o1 - o2)) / jnp.max(jnp.abs(o1)))
    print(f"flat-vs-flatp rel dev after 40 sweeps: {rel:.3e}", flush=True)

    t1, t2 = [], []
    for _ in range(TRIALS):
        t0 = time.perf_counter(); bar(run_flat(u)); t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); bar(run_flatp(u)); t2.append(time.perf_counter() - t0)
    cells = SHAPE[0] * SHAPE[1] * SHAPE[2]
    m1, m2 = sorted(t1)[TRIALS // 2], sorted(t2)[TRIALS // 2]
    ratios = sorted(b / a2 for a2, b in zip(t1, t2))
    print(f"flat  (manual DMA, s=4): med {m1*1e3:.1f} ms = "
          f"{cells*40/m1:.3e} DOF/s")
    print(f"flatp (pipelined, s=8):  med {m2*1e3:.1f} ms = "
          f"{cells*40/m2:.3e} DOF/s")
    print("per-trial flatp/flat ratios:", ["%.3f" % x for x in ratios])


if __name__ == "__main__":
    main()
