"""Head-to-head: packed red/black storage vs the auto kernel family.

Usage: python scripts/bench_packed.py [n=256] [sweeps=40]

VERDICT r2 weak #6 / next-round #9: the packed-RB kernel family
(ops/packed_rb.py) is opt-in (`smoother="packed"`) and unreachable from
`auto`. This times the SAME n-sweep relax through both dispatchers at a
packed-eligible shape (nz % 256 == 0) and prints the verdict: keep the
family only if it beats the auto path somewhere, else delete it.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)  # match bench.py's process config

from mg_ic_code_tpu.utils import compile_cache

compile_cache.configure()

from mg_ic_code_tpu.grid.geometry import BCSpec, single_level_geom  # noqa: E402
from mg_ic_code_tpu.solver import multigrid as mg  # noqa: E402


def barrier(x):
    # scalar readback: under the axon relay, block_until_ready may return
    # before the device work drains (docs/PERF.md; .claude/skills/verify)
    return float(jnp.sum(x))


def time_mode(n: int, sweeps: int, smoother: str, reps: int = 5) -> float:
    geom = single_level_geom(n, 1.0, BCSpec())
    spec = mg.make_level_spec(
        geom, 0, alpha=1.0, beta=-1.0, nsmooth=4, smoother=smoother
    )
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.5, 2.0, (n, n, n)), jnp.float32)
    coefs = mg.build_level_coefs_jit(spec, a)
    rhs = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    u = jnp.zeros_like(rhs)
    barrier(mg.relax_jit(spec, coefs, 0, u, rhs, sweeps))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        u = mg.relax_jit(spec, coefs, 0, u, rhs, sweeps)
    barrier(u)
    return (time.perf_counter() - t0) / reps


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    cells = float(n) ** 3
    for smoother in ("pallas", "packed"):
        dt = time_mode(n, sweeps, smoother)
        print(
            f"{smoother:>7}: {dt * 1e3:8.1f} ms for {sweeps} sweeps at "
            f"{n}^3 = {cells * sweeps / dt:.3e} DOF-updates/s"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
