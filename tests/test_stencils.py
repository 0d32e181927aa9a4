import numpy as np
import jax.numpy as jnp
import pytest

from mg_ic_code_tpu.ops import stencils as st
from tests import reference_impl as ref

RNG = np.random.default_rng(0)


def rand(shape):
    return RNG.standard_normal(shape)


@pytest.fixture(scope="module")
def fields():
    n = (6, 5, 7)
    u_gh = rand(tuple(s + 2 for s in n))
    rhs = rand(n)
    a = rand(n) + 3.0
    b = rand(n) + 3.0
    return n, u_gh, rhs, a, b


def test_laplacian_matches_loops(fields):
    n, u_gh, *_ = fields
    dx = 0.37
    got = st.laplacian(jnp.asarray(u_gh), dx)
    want = ref.laplacian_loops(u_gh, dx)
    np.testing.assert_allclose(got, want, rtol=1e-13)


def test_laplacian_quadratic_exact():
    # Lap(x^2 + 2 y^2 + 3 z^2) = 12 exactly for the 2nd-order stencil
    n, dx = 8, 0.25
    idx = (np.arange(n + 2) - 0.5) * dx
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    u = x**2 + 2 * y**2 + 3 * z**2
    got = st.laplacian(jnp.asarray(u), dx)
    np.testing.assert_allclose(got, 12.0, rtol=1e-11)


@pytest.mark.parametrize("use_b", [True, False])
def test_apply_op_matches_loops(fields, use_b):
    n, u_gh, rhs, a, b = fields
    alpha, beta, dx = 1.0, -1.0, 0.21
    bb = b if use_b else None
    got = st.apply_op(
        jnp.asarray(u_gh), jnp.asarray(a), None if bb is None else jnp.asarray(bb),
        alpha, beta, dx,
    )
    want = ref.apply_op_loops(u_gh, a, bb, alpha, beta, dx)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_residual(fields):
    n, u_gh, rhs, a, b = fields
    alpha, beta, dx = 0.5, -2.0, 0.4
    got = st.residual(jnp.asarray(u_gh), jnp.asarray(rhs), jnp.asarray(a),
                      jnp.asarray(b), alpha, beta, dx)
    want = rhs - ref.apply_op_loops(u_gh, a, b, alpha, beta, dx)
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("lo", [(0, 0, 0), (3, 8, 1)])
@pytest.mark.parametrize("red_black", [0, 1])
def test_gsrb_color_matches_loops(fields, lo, red_black):
    n, u_gh, rhs, a, b = fields
    alpha, beta, dx = 1.0, -1.0, 0.3
    lam = np.asarray(st.gsrb_lambda(a, alpha, beta, dx))
    got = st.gsrb_color(
        jnp.asarray(u_gh), jnp.asarray(rhs), jnp.asarray(a), jnp.asarray(b),
        jnp.asarray(lam), alpha, beta, dx, lo, red_black,
    )
    want = ref.gsrb_color_loops(u_gh, rhs, a, b, lam, alpha, beta, dx, lo,
                                red_black)
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-13)


def test_gsrb_parity_is_global():
    # shifting the box lo by 1 must flip which cells a colour updates
    n = (4, 4, 4)
    u_gh = rand(tuple(s + 2 for s in n))
    rhs = np.zeros(n)
    a = np.ones(n)
    lam = np.asarray(st.gsrb_lambda(a, 1.0, -1.0, 1.0))
    r0 = np.asarray(st.gsrb_color(jnp.asarray(u_gh), jnp.asarray(rhs),
                                  jnp.asarray(a), None, jnp.asarray(lam),
                                  1.0, -1.0, 1.0, (0, 0, 0), 0))
    r1 = np.asarray(st.gsrb_color(jnp.asarray(u_gh), jnp.asarray(rhs),
                                  jnp.asarray(a), None, jnp.asarray(lam),
                                  1.0, -1.0, 1.0, (1, 0, 0), 1))
    np.testing.assert_allclose(r0, r1, rtol=1e-13)


def test_gsrb_fixed_point_is_solution():
    # at the exact solution of L(u)=rhs (interior), a GSRB pass is a no-op
    n = (6, 6, 6)
    u_gh = rand(tuple(s + 2 for s in n))
    a = rand(n) + 2.0
    alpha, beta, dx = 1.0, -1.0, 0.5
    rhs = np.asarray(st.apply_op(jnp.asarray(u_gh), jnp.asarray(a), None,
                                 alpha, beta, dx))
    lam = st.gsrb_lambda(jnp.asarray(a), alpha, beta, dx)
    out = st.gsrb_color(jnp.asarray(u_gh), jnp.asarray(rhs), jnp.asarray(a),
                        None, lam, alpha, beta, dx, (0, 0, 0), 0)
    np.testing.assert_allclose(out, u_gh[1:-1, 1:-1, 1:-1], rtol=1e-12)


def test_restrict_full(fields):
    f = rand((8, 6, 4))
    got = st.restrict_full(jnp.asarray(f))
    want = ref.restrict_loops(f)
    np.testing.assert_allclose(got, want, rtol=1e-13)


def test_restrict_residual_fused(fields):
    n = (8, 8, 8)
    u_gh = rand(tuple(s + 2 for s in n))
    rhs, a, b = rand(n), rand(n) + 2.0, rand(n) + 2.0
    alpha, beta, dx = 1.0, -1.0, 0.7
    got = st.restrict_residual(jnp.asarray(u_gh), jnp.asarray(rhs),
                               jnp.asarray(a), jnp.asarray(b), alpha, beta, dx)
    res = rhs - ref.apply_op_loops(u_gh, a, b, alpha, beta, dx)
    np.testing.assert_allclose(got, ref.restrict_loops(res), rtol=1e-12)


def test_prolong_inc():
    e_c = rand((3, 4, 2))
    u_f = rand((6, 8, 4))
    got = st.prolong_inc(jnp.asarray(u_f), jnp.asarray(e_c))
    np.testing.assert_allclose(got, u_f + ref.prolong_loops(e_c), rtol=1e-13)


def test_coarsen_coef_modes():
    c = rand((4, 4, 4)) + 5.0
    arith = st.coarsen_coef(jnp.asarray(c), "arithmetic")
    np.testing.assert_allclose(arith, ref.restrict_loops(c), rtol=1e-13)
    harm = st.coarsen_coef(jnp.asarray(c), "harmonic")
    want = 1.0 / ref.restrict_loops(1.0 / c)
    np.testing.assert_allclose(harm, want, rtol=1e-13)


def test_grad_energy():
    n, dx = (6, 6, 6), 0.11
    phi_gh = rand(tuple(s + 2 for s in n))
    got = st.grad_energy(jnp.asarray(phi_gh), dx)
    gx = (phi_gh[2:, 1:-1, 1:-1] - phi_gh[:-2, 1:-1, 1:-1]) / (2 * dx)
    gy = (phi_gh[1:-1, 2:, 1:-1] - phi_gh[1:-1, :-2, 1:-1]) / (2 * dx)
    gz = (phi_gh[1:-1, 1:-1, 2:] - phi_gh[1:-1, 1:-1, :-2]) / (2 * dx)
    np.testing.assert_allclose(got, 0.5 * (gx**2 + gy**2 + gz**2), rtol=1e-12)


def test_gsrb_lambda_formula():
    a = rand((3, 3, 3)) + 4.0
    alpha, beta, dx = 1.0, -1.0, 0.5
    lam = np.asarray(st.gsrb_lambda(jnp.asarray(a), alpha, beta, dx))
    np.testing.assert_allclose(lam, 1.0 / (alpha * a + 6.0 * beta / dx**2),
                               rtol=1e-13)
