"""Measure the f64-emulation tax on the outer-Krylov composite apply.

The round-4 phase profile puts composite_apply (f64 XLA) at ~15 ms real
per application x ~7 per solve — the single largest slice of the 281 ms
fused Picard iteration after the preconditioner. TPU v5e has no f64 ALU;
XLA emulates. This times ONE composite_apply on the canonical
patches+avgdown hierarchy in f64 vs f32 (same graph, cast operands), plus
a single-level 7-point apply_op on a dense 256^3 block in both dtypes, to
split "emulation tax" from "graph overhead" before deciding whether a
double-float Pallas apply kernel is worth building.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
from mg_ic_code_tpu.utils import compile_cache  # noqa: E402

compile_cache.configure()


def bar(x):
    leaves = jax.tree_util.tree_leaves(x)
    jax.block_until_ready(leaves)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    bar(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    bar(out)
    return (time.perf_counter() - t0) / reps


def main():
    from mg_ic_code_tpu.config import load_params
    from mg_ic_code_tpu.grid.tagging import generate_hierarchy
    from mg_ic_code_tpu.physics import level_data as ld
    from mg_ic_code_tpu.solver import composite as comp
    from mg_ic_code_tpu.solver import nonlinear as nl
    from mg_ic_code_tpu.ops import stencils as st

    cfg = load_params("/root/reference/params.txt",
                      overrides=["level_decomposition = patches",
                                 "average_down = 1"])
    geom = generate_hierarchy(cfg)
    spec = comp.make_amr_spec(geom, cfg)
    fields = [ld.problem_fields_jit(geom, cfg, l, jnp.float64)
              for l in range(geom.num_levels)]
    state = ld.initial_state(geom, cfg, jnp.float64)
    psi = state["psi"]
    a_list, rhs_list, _ = nl.prepare_iteration_jit(geom, cfg, fields, psi)
    coefs = comp.build_coefs_jit(spec, a_list)
    u64 = rhs_list

    apply64 = jax.jit(lambda u: comp.composite_apply(spec, coefs, u))
    t64 = timeit(apply64, u64)
    # f32 same graph via the preconditioner's lp coefficient set
    u32 = [u.astype(jnp.float32) for u in u64]
    apply32 = jax.jit(
        lambda u: comp.composite_apply(spec, coefs, u, use_lp=True))
    t32 = timeit(apply32, u32)
    print(f"composite_apply: f64 {t64*1e3:.2f} ms  f32 {t32*1e3:.2f} ms  "
          f"ratio {t64/t32:.2f}x")

    # dense single-level stencil, no ghosts/CF machinery
    n = 256
    key = jax.random.PRNGKey(0)
    ug = jax.random.uniform(key, (n + 2, n + 2, n + 2), jnp.float64)
    a = jax.random.uniform(key, (n, n, n), jnp.float64) + 1.0
    stn = jax.jit(lambda ug, a: st.apply_op(ug, a, None, 1.0, -1.0, 0.01))
    td = timeit(stn, ug, a)
    ts = timeit(jax.jit(lambda ug, a: st.apply_op(ug, a, None, 1.0, -1.0,
                                                  0.01)),
                ug.astype(jnp.float32), a.astype(jnp.float32))
    cells = n ** 3
    print(f"dense 256^3 apply_op: f64 {td*1e3:.2f} ms "
          f"({cells/td/1e9:.1f} Gcell/s)  f32 {ts*1e3:.2f} ms "
          f"({cells/ts/1e9:.1f} Gcell/s)  ratio {td/ts:.2f}x")

    # axpy + dot in both dtypes (the BiCGStab recurrence traversals)
    x64 = u64
    axpy64 = jax.jit(lambda x, y: [2.0 * a + b for a, b in zip(x, y)])
    dot64 = jax.jit(lambda x, y: sum(jnp.vdot(a, b)
                                     for a, b in zip(x, y)))
    ta64 = timeit(axpy64, x64, x64)
    tD64 = timeit(dot64, x64, x64)
    x32 = u32
    ta32 = timeit(axpy64, x32, x32)
    tD32 = timeit(dot64, x32, x32)
    print(f"composite axpy: f64 {ta64*1e3:.2f} ms  f32 {ta32*1e3:.2f} ms; "
          f"dot: f64 {tD64*1e3:.2f} ms  f32 {tD32*1e3:.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
