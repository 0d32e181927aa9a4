"""Packed red-black storage: equivalence with the masked GSRB smoother."""

import numpy as np
import jax.numpy as jnp
import pytest

from mg_ic_code_tpu.grid.geometry import BCSpec, single_level_geom
from mg_ic_code_tpu.ops import ghosts as gh
from mg_ic_code_tpu.ops import packed_rb as prb
from mg_ic_code_tpu.solver import multigrid as mg

RNG = np.random.default_rng(31)


def test_pack_unpack_roundtrip():
    u = jnp.asarray(RNG.standard_normal((6, 4, 8)))
    for base in (0, 1, 5):
        r, b = prb.pack(u, base)
        np.testing.assert_array_equal(np.asarray(prb.unpack(r, b, base)), u)


def test_pack_separates_colours():
    n = 4
    u = np.zeros((n, n, n))
    # mark colour-0 cells with +1, colour-1 with -1
    for i in range(n):
        for j in range(n):
            for k in range(n):
                u[i, j, k] = 1.0 if (i + j + k) % 2 == 0 else -1.0
    r, b = prb.pack(jnp.asarray(u), 0)
    assert float(jnp.min(r)) == 1.0 and float(jnp.max(r)) == 1.0
    assert float(jnp.min(b)) == -1.0 and float(jnp.max(b)) == -1.0


@pytest.mark.parametrize("bc", [
    BCSpec(),
    BCSpec(periodic=True),
    BCSpec(bc_lo=(1, 0, 1), bc_hi=(0, 1, 0)),
])
@pytest.mark.parametrize("lo", [(0, 0, 0), (4, 2, 6)])
def test_packed_relax_matches_masked(bc, lo):
    n = (8, 8, 16)
    geom = single_level_geom((8, 8, 16), 1.0, bc)
    # build a spec whose box lo matches the requested offset (parity!)
    from mg_ic_code_tpu.grid.boxes import Box
    from mg_ic_code_tpu.grid.geometry import HierarchyGeom

    box = Box.from_shape(n, lo=lo)
    geom = HierarchyGeom(
        boxes=(box,), domain_boxes=(box,), dx=(0.125,),
        domain_length=(1.0, 1.0, 2.0), bc=bc,
    )
    spec = mg.make_level_spec(geom, 0, alpha=1.0, beta=-1.0, nsmooth=2)
    a = jnp.asarray(RNG.uniform(0.5, 2.0, n))
    coefs = mg.build_level_coefs(spec, a)
    rhs = jnp.asarray(RNG.standard_normal(n))
    u0 = jnp.asarray(RNG.standard_normal(n))

    want = mg.relax_jit(spec, coefs, 0, u0, rhs, 2)
    got = prb.packed_relax(
        u0, rhs, a, 2, kinds=gh.face_kinds(geom, 0), rho=2.0,
        alpha=1.0, beta=-1.0, dx=geom.dx[0], lo=lo,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("bc", [
    BCSpec(),
    BCSpec(periodic=True),
    BCSpec(bc_lo=(1, 0, 1), bc_hi=(0, 1, 0)),
])
def test_packed_pallas_matches_masked(bc):
    n = (16, 16, 16)
    geom = single_level_geom(n, 1.0, bc)
    spec = mg.make_level_spec(geom, 0, alpha=1.0, beta=-1.0, nsmooth=2)
    a = jnp.asarray(RNG.uniform(0.5, 2.0, n), jnp.float32)
    coefs = mg.build_level_coefs(spec, a)
    rhs = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    u0 = jnp.asarray(RNG.standard_normal(n), jnp.float32)

    want = mg.relax_jit(spec, coefs, 0, u0, rhs, 2)
    got = prb.packed_relax_pallas(
        u0, rhs, a, 2, kinds=gh.face_kinds(geom, 0), rho=2.0,
        alpha=1.0, beta=-1.0, dx=geom.dx[0], lo=(0, 0, 0), bx=4,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)
