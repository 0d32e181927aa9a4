import numpy as np
import jax.numpy as jnp
import pytest

from mg_ic_code_tpu.grid.boxes import Box
from mg_ic_code_tpu.grid.geometry import BCSpec, HierarchyGeom, single_level_geom
from mg_ic_code_tpu.ops import ghosts as gh
from mg_ic_code_tpu.ops import cf_interp as cfi

RNG = np.random.default_rng(1)


def two_level_geom(periodic=False, bc_lo=(0, 0, 0), bc_hi=(0, 0, 0)):
    dom0 = Box.from_shape((16, 16, 16))
    fine = Box.from_shape((16, 16, 16), lo=(8, 8, 8))
    return HierarchyGeom(
        boxes=(dom0, fine),
        domain_boxes=(dom0, dom0.refine(2)),
        dx=(1.0 / 16, 1.0 / 32),
        domain_length=(1.0, 1.0, 1.0),
        bc=BCSpec(bc_lo=bc_lo, bc_hi=bc_hi, periodic=periodic),
    )


def test_face_kinds_level0_dirichlet():
    g = single_level_geom(8, bc=BCSpec())
    kinds = gh.face_kinds(g, 0)
    assert all(k == ("dirichlet", "dirichlet") for k in kinds)


def test_face_kinds_mixed():
    g = single_level_geom(8, bc=BCSpec(bc_lo=(1, 0, 1), bc_hi=(0, 1, 0)))
    kinds = gh.face_kinds(g, 0)
    assert kinds[0] == ("neumann", "dirichlet")
    assert kinds[1] == ("dirichlet", "neumann")


def test_face_kinds_fine_level_is_cf():
    g = two_level_geom()
    assert all(k == ("cf", "cf") for k in gh.face_kinds(g, 1))


def test_periodic_wrap_roundtrip():
    g = single_level_geom(6, bc=BCSpec(periodic=True))
    kinds = gh.face_kinds(g, 0)
    u = RNG.standard_normal((6, 6, 6))
    u_gh = gh.fill_ghosts_homogeneous(jnp.asarray(u), kinds)
    np.testing.assert_allclose(u_gh[0, 1:-1, 1:-1], u[-1])
    np.testing.assert_allclose(u_gh[-1, 1:-1, 1:-1], u[0])
    np.testing.assert_allclose(u_gh[1:-1, 0, 1:-1], u[:, -1])
    np.testing.assert_allclose(u_gh[1:-1, 1:-1, -1], u[:, :, 0])


def test_homogeneous_dirichlet_face_value_zero():
    # quadratic fill: value interpolated at the face must be ~0
    g = single_level_geom(8, bc=BCSpec())
    kinds = gh.face_kinds(g, 0)
    u = RNG.standard_normal((8, 8, 8))
    u_gh = np.asarray(gh.fill_ghosts_homogeneous(jnp.asarray(u), kinds))
    # face value by quadratic extrapolation from ghost,u0,u1 at -.5,.5,1.5:
    # f(0) = (3/8)g + (3/4)u0 - (1/8)u1
    face = 0.375 * u_gh[0, 1:-1, 1:-1] + 0.75 * u_gh[1, 1:-1, 1:-1] \
        - 0.125 * u_gh[2, 1:-1, 1:-1]
    np.testing.assert_allclose(face, 0.0, atol=1e-12)


def test_inhomogeneous_dirichlet_face_value():
    g = single_level_geom(8, bc=BCSpec(bc_value=2.5))
    u = RNG.standard_normal((8, 8, 8))
    u_gh = np.asarray(
        gh.fill_ghosts(jnp.asarray(u), g, 0, None, homogeneous_phys=False)
    )
    face = 0.375 * u_gh[0, 1:-1, 1:-1] + 0.75 * u_gh[1, 1:-1, 1:-1] \
        - 0.125 * u_gh[2, 1:-1, 1:-1]
    np.testing.assert_allclose(face, 2.5, atol=1e-12)


def test_neumann_zero_gradient():
    g = single_level_geom(8, bc=BCSpec(bc_lo=(1, 1, 1), bc_hi=(1, 1, 1)))
    kinds = gh.face_kinds(g, 0)
    u = RNG.standard_normal((8, 8, 8))
    u_gh = np.asarray(gh.fill_ghosts_homogeneous(jnp.asarray(u), kinds))
    np.testing.assert_allclose(u_gh[0, 1:-1, 1:-1], u[0])
    np.testing.assert_allclose(u_gh[-1, 1:-1, 1:-1], u[-1])


def test_neumann_inhomogeneous_gradient():
    val, dx = 1.7, 1.0 / 8
    g = single_level_geom(
        8, bc=BCSpec(bc_lo=(1, 1, 1), bc_hi=(1, 1, 1), bc_value=val)
    )
    u = RNG.standard_normal((8, 8, 8))
    u_gh = np.asarray(gh.fill_ghosts(jnp.asarray(u), g, 0, None))
    np.testing.assert_allclose((u[0] - u_gh[0, 1:-1, 1:-1]) / dx, val)
    np.testing.assert_allclose((u_gh[-1, 1:-1, 1:-1] - u[-1]) / dx, val)


def test_cf_homog_weights_rho2():
    w0, w1 = gh.cf_homog_weights(2.0)
    assert w0 == pytest.approx(2.0 / 3.0)
    assert w1 == pytest.approx(-1.0 / 5.0)


def test_cf_interp_exact_for_linear():
    """Quadratic CF interpolation must reproduce a globally linear function
    exactly (tangential linear interp + normal quadratic are both exact)."""
    g = two_level_geom()

    def f(x, y, z):
        return 2.0 * x - 3.0 * y + 0.5 * z + 1.0

    xc, yc, zc = g.coords(0)
    coarse = f(xc, yc, zc) * np.ones((16, 16, 16))
    xf, yf, zf = g.coords(1)
    fine = f(xf, yf, zf) * np.ones((16, 16, 16))

    u_gh = gh.fill_ghosts(jnp.asarray(fine), g, 1, jnp.asarray(coarse))
    u_gh = np.asarray(u_gh)

    xg, yg, zg = g.coords(1, grow=1)
    want = f(xg, yg, zg) * np.ones((18, 18, 18))
    # check the six CF face planes (not corners/edges)
    np.testing.assert_allclose(u_gh[0, 1:-1, 1:-1], want[0, 1:-1, 1:-1],
                               rtol=1e-12)
    np.testing.assert_allclose(u_gh[-1, 1:-1, 1:-1], want[-1, 1:-1, 1:-1],
                               rtol=1e-12)
    np.testing.assert_allclose(u_gh[1:-1, 0, 1:-1], want[1:-1, 0, 1:-1],
                               rtol=1e-12)
    np.testing.assert_allclose(u_gh[1:-1, -1, 1:-1], want[1:-1, -1, 1:-1],
                               rtol=1e-12)
    np.testing.assert_allclose(u_gh[1:-1, 1:-1, 0], want[1:-1, 1:-1, 0],
                               rtol=1e-12)
    np.testing.assert_allclose(u_gh[1:-1, 1:-1, -1], want[1:-1, 1:-1, -1],
                               rtol=1e-12)


def test_cf_interp_quadratic_in_normal():
    """Normal-direction interpolation is quadratic: exact for f = x^2 when
    the tangential variation is zero."""
    g = two_level_geom()
    xc, _, _ = g.coords(0)
    coarse = np.broadcast_to(xc**2, (16, 16, 16)).copy()
    xf, _, _ = g.coords(1)
    fine = np.broadcast_to(xf**2, (16, 16, 16)).copy()
    u_gh = np.asarray(
        gh.fill_ghosts(jnp.asarray(fine), g, 1, jnp.asarray(coarse))
    )
    xg = g.coords1d(1, 0, grow=1)
    np.testing.assert_allclose(u_gh[0, 1:-1, 1:-1], xg[0] ** 2, rtol=1e-11)
    np.testing.assert_allclose(u_gh[-1, 1:-1, 1:-1], xg[-1] ** 2, rtol=1e-11)


def test_upsample2_exact_on_linear_and_quadratic():
    # children at coarse coords c -/+ 0.25: quadratic interp must be exact
    # for quadratics
    coords = np.arange(5.0)
    for f in (lambda x: 2 * x + 1, lambda x: x * x - 3 * x + 2):
        c = f(coords)[:, None]
        out = np.asarray(cfi._upsample2(jnp.asarray(c), 0))
        fine_coords = np.concatenate(
            [[cc - 0.25, cc + 0.25] for cc in coords[1:-1]]
        )
        np.testing.assert_allclose(out[:, 0], f(fine_coords), rtol=1e-13)


def test_upsample2_linear_mode():
    c = np.array([0.0, 1.0, 2.0, 3.0])[:, None]
    out = np.asarray(cfi._upsample2(jnp.asarray(c), 0, order=1))
    np.testing.assert_allclose(out[:, 0], [0.75, 1.25, 1.75, 2.25])


def test_periodic_edge_face_is_cf_with_wrapped_coarse():
    """A fine box that TOUCHES (but does not span) a periodic domain face
    must get CF ghosts whose coarse contribution wraps around the domain —
    not a physical Dirichlet fill (round-3 review finding: fill_ghosts
    previously fell through to the physical branch for exactly this face,
    silently injecting bc_value into a periodic problem)."""
    dom0 = Box.from_shape((16, 16, 16))
    fine = Box.from_shape((16, 8, 8), lo=(0, 8, 8))  # touches x-lo edge
    g = HierarchyGeom(
        boxes=(dom0, fine),
        domain_boxes=(dom0, dom0.refine(2)),
        dx=(1.0 / 16, 1.0 / 32),
        domain_length=(1.0, 1.0, 1.0),
        bc=BCSpec(periodic=True),
    )
    # homogeneous classification: every fine face is CF (none spans)
    assert all(k == ("cf", "cf") for k in gh.face_kinds(g, 1))

    coarse = jnp.asarray(RNG.standard_normal((16, 16, 16)))
    u = jnp.asarray(RNG.standard_normal((16, 8, 8)))
    got = gh.fill_ghosts(u, g, 1, coarse)

    # x-lo ghost plane: quadratic CF with the coarse plane from the
    # WRAPPED side of the domain (fine ghost x = -1 -> coarse cell 15)
    plane = cfi._coarse_plane_for_face(coarse, g, 1, 0, 0, wrap=True)
    expect = (
        cfi.W_U0 * u[0] + cfi.W_U1 * u[1]
        + cfi.W_COARSE * plane.astype(u.dtype)
    )
    np.testing.assert_allclose(
        np.asarray(got[0, 1:-1, 1:-1]), np.asarray(expect), rtol=1e-12
    )
    # and the wrapped plane really is built from the far (x-hi) coarse row
    direct = cfi._coarse_plane_for_face(
        jnp.asarray(np.roll(np.asarray(coarse), -8, axis=0)), g, 1, 0, 0,
        wrap=True,
    )
    # rolling the coarse array by half the domain moves row 15 to row 7;
    # sanity: the two planes must differ (the wrap is load-bearing)
    assert not np.allclose(np.asarray(plane), np.asarray(direct))
