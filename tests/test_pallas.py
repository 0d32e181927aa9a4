"""Pallas kernels vs the XLA reference path (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mg_ic_code_tpu.grid.geometry import BCSpec, single_level_geom
from mg_ic_code_tpu.ops import ghosts as gh
from mg_ic_code_tpu.ops import pallas_kernels as pk
from mg_ic_code_tpu.ops import stencils as st

RNG = np.random.default_rng(21)


def xla_half_sweep(u, rhs, a, kinds, rho, alpha, beta, dx, lo, color):
    u_gh = gh.fill_ghosts_homogeneous(u, kinds, rho)
    lam = st.gsrb_lambda(a, alpha, beta, dx)
    return st.gsrb_color(u_gh, rhs, a, None, lam, alpha, beta, dx, lo, color)


def xla_residual(u, rhs, a, kinds, rho, alpha, beta, dx):
    u_gh = gh.fill_ghosts_homogeneous(u, kinds, rho)
    return st.residual(u_gh, rhs, a, None, alpha, beta, dx)


CASES = [
    ("dirichlet", BCSpec()),
    ("periodic", BCSpec(periodic=True)),
    ("mixed", BCSpec(bc_lo=(1, 0, 1), bc_hi=(0, 1, 0))),
]


@pytest.mark.parametrize("name,bc", CASES)
@pytest.mark.parametrize("color", [0, 1])
def test_gsrb_half_sweep_matches_xla(name, bc, color):
    n = (16, 16, 16)
    geom = single_level_geom(n, 1.0, bc)
    kinds = gh.face_kinds(geom, 0)
    alpha, beta, dx, rho = 1.0, -1.0, 1.0 / 16, 2.0
    u = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    rhs = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    a = jnp.asarray(RNG.uniform(0.5, 2.0, n), jnp.float32)

    want = xla_half_sweep(u, rhs, a, kinds, rho, alpha, beta, dx,
                          (0, 0, 0), color)
    got = pk.gsrb_half_sweep(
        u, rhs, a, kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        lo=(0, 0, 0), color=color, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_gsrb_half_sweep_cf_kinds():
    """A refined level: every face is CF; also exercises a non-cubic box
    and a nonzero global lo offset (parity!)."""
    from mg_ic_code_tpu.grid.boxes import Box
    from mg_ic_code_tpu.grid.geometry import HierarchyGeom

    dom0 = Box.from_shape((16, 16, 16))
    fine = Box((6, 8, 4), (29, 23, 19))  # shape (24, 16, 16)
    geom = HierarchyGeom(
        boxes=(dom0, fine),
        domain_boxes=(dom0, dom0.refine(2)),
        dx=(1.0 / 16, 1.0 / 32),
        domain_length=(1.0, 1.0, 1.0),
        bc=BCSpec(),
    )
    kinds = gh.face_kinds(geom, 1)
    n = fine.shape
    alpha, beta, dx, rho = 1.0, -1.0, 1.0 / 32, 2.0
    u = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    rhs = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    a = jnp.asarray(RNG.uniform(0.5, 2.0, n), jnp.float32)
    for color in (0, 1):
        want = xla_half_sweep(u, rhs, a, kinds, rho, alpha, beta, dx,
                              fine.lo, color)
        got = pk.gsrb_half_sweep(
            u, rhs, a, kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
            lo=fine.lo, color=color, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("name,bc", CASES)
def test_residual_matches_xla(name, bc):
    n = (16, 16, 16)
    geom = single_level_geom(n, 1.0, bc)
    kinds = gh.face_kinds(geom, 0)
    alpha, beta, dx, rho = 1.0, -1.0, 1.0 / 16, 2.0
    u = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    rhs = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    a = jnp.asarray(RNG.uniform(0.5, 2.0, n), jnp.float32)
    want = xla_residual(u, rhs, a, kinds, rho, alpha, beta, dx)
    got = pk.residual(
        u, rhs, a, kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        interpret=True,
    )
    # f32 roundoff relative to the residual's magnitude (~1/dx^2 scale)
    scale = float(np.max(np.abs(np.asarray(want))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6 * scale)


def test_pick_bx():
    assert pk.pick_bx(256, 4) == 4
    assert pk.pick_bx(24, 4) == 4
    assert pk.pick_bx(10, 4) == 2
    assert pk.pick_bx(7, 4) == 1


@pytest.mark.parametrize("name,bc", CASES)
def test_gsrb_full_sweep_matches_two_half_sweeps(name, bc):
    """The fused red+black kernel must equal colour-0 then colour-1 of the
    XLA path (including the inter-colour ghost refresh)."""
    n = (16, 16, 16)
    geom = single_level_geom(n, 1.0, bc)
    kinds = gh.face_kinds(geom, 0)
    alpha, beta, dx, rho = 1.0, -1.0, 1.0 / 16, 2.0
    u = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    rhs = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    a = jnp.asarray(RNG.uniform(0.5, 2.0, n), jnp.float32)

    want = u
    for color in (0, 1):
        want = xla_half_sweep(want, rhs, a, kinds, rho, alpha, beta, dx,
                              (0, 0, 0), color)
    got = pk.gsrb_full_sweep(
        u, rhs, a, kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        lo=(0, 0, 0), bx=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-6, atol=3e-6)


def test_gsrb_full_sweep_offset_box():
    """Nonzero global lo (parity) + non-cubic box + CF faces."""
    from mg_ic_code_tpu.grid.boxes import Box
    from mg_ic_code_tpu.grid.geometry import HierarchyGeom

    dom0 = Box.from_shape((16, 16, 16))
    fine = Box((6, 8, 4), (29, 23, 19))
    geom = HierarchyGeom(
        boxes=(dom0, fine),
        domain_boxes=(dom0, dom0.refine(2)),
        dx=(1.0 / 16, 1.0 / 32),
        domain_length=(1.0, 1.0, 1.0),
        bc=BCSpec(),
    )
    kinds = gh.face_kinds(geom, 1)
    n = fine.shape
    alpha, beta, dx, rho = 1.0, -1.0, 1.0 / 32, 2.0
    u = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    rhs = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    a = jnp.asarray(RNG.uniform(0.5, 2.0, n), jnp.float32)
    want = u
    for color in (0, 1):
        want = xla_half_sweep(want, rhs, a, kinds, rho, alpha, beta, dx,
                              fine.lo, color)
    got = pk.gsrb_full_sweep(
        u, rhs, a, kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        lo=fine.lo, bx=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-6, atol=3e-6)
