"""Compile-and-run every Pallas kernel-family variant on the REAL TPU.

Usage: python scripts/tpu_kernel_smoke.py

Interpret-mode tests cannot catch Mosaic lowering failures (round 3: the
padless tiled kernel passed every equality test yet had never compiled on
hardware — weak i64 clip bounds, weak f64 literals, and a scalar-predicate
cond all only fail in Mosaic). This drives ONE real compile+execute of
each kernel entry point and variant the dispatcher can reach, including
the shard-aware halo forms that normally only run inside shard_map on a
multi-chip mesh. Exit 0 = every variant lowered, compiled, and produced a
finite result on the chip.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mg_ic_code_tpu.utils import compile_cache  # noqa: E402

compile_cache.configure()

from mg_ic_code_tpu.ops import fused_sweeps as fs  # noqa: E402
from mg_ic_code_tpu.ops import pallas_kernels as pk  # noqa: E402
from mg_ic_code_tpu.ops.ghosts import (  # noqa: E402
    PERIODIC, PHYS_DIRICHLET as D,
)

RNG = np.random.default_rng(0)
KINDS = ((D, D), (D, D), (D, D))


_KEY = [jax.random.PRNGKey(7)]


def operands(shape):
    # on-device RNG: bulk host->device uploads stall for minutes when the
    # axon relay's send path is congested; only the key crosses the wire
    _KEY[0], k1, k2 = jax.random.split(_KEY[0], 3)
    u = jnp.zeros(shape, jnp.float32)
    r = jax.random.normal(k1, shape, jnp.float32)
    a = jax.random.uniform(k2, shape, jnp.float32, 0.5, 2.0)
    return u, r, a


def check(name, out):
    s = float(jnp.sum(out))  # scalar readback = the only real barrier here
    assert np.isfinite(s), (name, s)
    print(f"  ok {name}: sum {s:.6g}", flush=True)


def main() -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    kw = dict(kinds=KINDS, rho=2.0, alpha=1.0, beta=-1.0, dx=0.01,
              lo=(0, 0, 0), interpret=False)

    u, r, a = operands((64, 64, 128))
    check("resident", fs.resident_relax(u, r, a, nsweeps=4, **kw))
    b = jax.random.uniform(jax.random.PRNGKey(3), u.shape, jnp.float32,
                           0.5, 2.0)
    check("resident varb", fs.resident_relax(u, r, a, b, nsweeps=4, **kw))
    check("resident residual",
          fs.resident_residual(u, r, a, kinds=KINDS, rho=2.0, alpha=1.0,
                               beta=-1.0, dx=0.01, interpret=False))

    u, r, a = operands((256, 256, 256))
    H = 8
    pads = [jax.random.normal(jax.random.PRNGKey(9 + i), (2 * H, 256, 256),
                              jnp.float32) for i in range(3)]
    meta = jnp.array([0, 0, 64, 0], jnp.int32)

    check("pipelined", fs.multisweep_relax_pipelined(u, r, a, nsweeps=4, **kw))
    check("pipelined w2 (production width)",
          fs.multisweep_relax_pipelined(u, r, a, nsweeps=4, width=2, **kw))
    check("slab", fs.multisweep_relax(u, r, a, nsweeps=4, bx=8, **kw))
    check("slab+halo (sharded form)",
          fs.multisweep_relax(u, r, a, nsweeps=4, bx=8,
                              halo=(*pads, meta), **kw))
    bx, by = fs.tiled_plan(u.shape, 4)
    check("tiled padless",
          fs.multisweep_relax_tiled(u, r, a, nsweeps=4, bx=bx, by=by, **kw))
    check("tiled padless + halo (sharded form)",
          fs.multisweep_relax_tiled(u, r, a, nsweeps=4, bx=bx, by=by,
                                    halo=(*pads, meta), **kw))
    kp = ((D, D), (PERIODIC, PERIODIC), (D, D))
    assert not fs.tiled_padless_ok(u.shape, bx, by, 4, kp)
    check("tiled prepad (periodic y)",
          fs.multisweep_relax_tiled(u, r, a, nsweeps=4, bx=bx, by=by,
                                    kinds=kp, rho=2.0, alpha=1.0, beta=-1.0,
                                    dx=0.01, lo=(0, 0, 0), interpret=False))

    u, r, a = operands((144, 144, 144))  # nz % 128 != 0 -> flat layout
    check("flat", fs.multisweep_relax_flat(u, r, a, nsweeps=4, bx=8, **kw))
    check("flat pipelined",
          fs.multisweep_relax_flat_pipelined(u, r, a, nsweeps=4, **kw))
    check("flat pipelined w2 (production width)",
          fs.multisweep_relax_flat_pipelined(u, r, a, nsweeps=4, width=2,
                                             **kw))

    # round-4 surfaces: the prepadded 2-D-pencil entry and the bf16 tier
    u, r, a = operands((64, 64, 128))
    Hp = 8
    def prepad(x):
        x = jnp.concatenate([jnp.zeros((Hp,) + x.shape[1:], x.dtype), x,
                             jnp.zeros((Hp,) + x.shape[1:], x.dtype)], 0)
        z = jnp.zeros((x.shape[0], Hp, x.shape[2]), x.dtype)
        return jnp.concatenate([z, x, z], 1)
    meta4 = jnp.array([1, 1, 0, 0], jnp.int32)
    check("tiled prepadded (pencil entry)",
          fs.multisweep_relax_tiled_pre(
              prepad(u), prepad(r), prepad(a), meta4, ny_global=64,
              nsweeps=4, bx=16, by=16, **kw))
    for fam, call in (
        ("resident", lambda: fs.resident_relax(
            u, r, a, nsweeps=4, compute_dtype="bfloat16", **kw)),
        ("pipelined", lambda: fs.multisweep_relax_pipelined(
            u, r, a, nsweeps=4, compute_dtype="bfloat16", **kw)),
        ("tiled", lambda: fs.multisweep_relax_tiled(
            u, r, a, nsweeps=4, bx=16, by=16, compute_dtype="bfloat16",
            **kw)),
    ):
        check(f"bf16 tier: {fam}", call())

    # round-5: the time-skewed wavefront family (3-D, single-block edge
    # case, flat layout, and the bf16 tier)
    from mg_ic_code_tpu.ops import wavefront as wf

    u, r, a = operands((64, 64, 128))
    check("wavefront", wf.wavefront_relax(u, r, a, nsweeps=4, bx=16, **kw))
    check("wavefront single-block",
          wf.wavefront_relax(u, r, a, nsweeps=2, bx=64, **kw))
    check("wavefront bf16 tier",
          wf.wavefront_relax(u, r, a, nsweeps=4, bx=16,
                             compute_dtype="bfloat16", **kw))
    u, r, a = operands((144, 144, 144))  # nz % 128 != 0 -> flat layout
    check("wavefront flat",
          wf.wavefront_relax_flat(u, r, a, nsweeps=4, bx=16, **kw))

    # round-5: the fused coarse-depth tower (down + XLA bottom + up)
    from mg_ic_code_tpu.grid.geometry import BCSpec, single_level_geom
    from mg_ic_code_tpu.ops import coarse_tower as ct
    from mg_ic_code_tpu.solver import multigrid as mg

    n = 32
    geom = single_level_geom(n, 1.0, BCSpec())
    spec = mg.make_level_spec(geom, 0, alpha=1.0, beta=-1.0, nsmooth=4)
    u, r, a = operands((n, n, n))
    coefs = mg.build_level_coefs_jit(spec, a)
    assert ct.tower_supported(spec, coefs, 0)
    check("coarse tower vcycle",
          jax.jit(ct.tower_vcycle, static_argnums=(0, 2))(
              spec, coefs, 0, u, r))

    u, r, a = operands((128, 128, 128))
    check("legacy pair", pk.gsrb_full_sweep(u, r, a, **kw))

    print("ALL KERNEL VARIANTS COMPILED AND RAN ON", jax.devices()[0].device_kind)
    return 0


if __name__ == "__main__":
    sys.exit(main())
