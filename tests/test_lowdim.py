"""SpaceDim-parity tests: the dimension-generic kernels (ops/lowdim.py)
against (a) the production 3D stack at D=3, (b) a dense direct solve at
D=1, (c) MG contraction + analytic convergence at D=2.

Reference: the ChF macro expansions GSRBHELMHOLTZVC{1,2,3}D /
VCCOMPUTEOP{1,2,3}D / VCCOMPUTERES{1,2,3}D / RESTRICTRESVC{1,2,3}D
(VariableCoeffPoissonOperatorF.ChF:31-437).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mg_ic_code_tpu.ops import lowdim as ld
from mg_ic_code_tpu.ops import stencils as st
from mg_ic_code_tpu.ops import ghosts as gh

RNG = np.random.default_rng(11)

D3_KINDS = (("dirichlet", "dirichlet"), ("neumann", "dirichlet"),
            ("periodic", "periodic"))


def test_generic_matches_3d_stack():
    """At D=3 the generic kernels must agree with the production stack
    (ops/stencils.py + ops/ghosts.py) to rounding."""
    n = 12
    u = jnp.asarray(RNG.standard_normal((n, n, n)))
    rhs = jnp.asarray(RNG.standard_normal((n, n, n)))
    a = jnp.asarray(RNG.uniform(0.5, 2.0, (n, n, n)))
    dx = 0.1
    alpha, beta = 1.0, -1.0

    gh3 = gh.fill_ghosts_homogeneous(u, D3_KINDS, 2.0)
    ghg = ld.fill_ghosts_homogeneous(u, D3_KINDS)
    # corners excluded (star stencils never read them; the generic fill
    # leaves them zero)
    np.testing.assert_allclose(np.asarray(ghg[1:-1, 1:-1, :]),
                               np.asarray(gh3[1:-1, 1:-1, :]), atol=1e-14)

    np.testing.assert_allclose(
        np.asarray(ld.laplacian(gh3, dx)), np.asarray(st.laplacian(gh3, dx)),
        rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ld.residual(gh3, rhs, a, alpha, beta, dx)),
        np.asarray(st.residual(gh3, rhs, a, None, alpha, beta, dx)),
        rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ld.gsrb_lambda(a, alpha, beta, dx)),
        np.asarray(st.gsrb_lambda(a, alpha, beta, dx)), rtol=1e-14)

    lam = st.gsrb_lambda(a, alpha, beta, dx)
    lo = (3, 1, 2)
    got = ld.gsrb_color(u, rhs, a, lam, alpha, beta, dx, lo, D3_KINDS, 0)
    want = st.gsrb_color(gh3, rhs, a, None, lam, alpha, beta, dx, lo, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)

    f = jnp.asarray(RNG.standard_normal((8, 8, 8)))
    np.testing.assert_allclose(np.asarray(ld.restrict_full(f)),
                               np.asarray(st.restrict_full(f)), atol=1e-14)


def _dense_1d(a, alpha, beta, dx):
    """Dense L for D=1 with the quadratic-Dirichlet ghost eliminated:
    lap(u)_0 = ((4/3) u_1 - 4 u_0)/dx^2 at the boundary rows."""
    n = a.shape[0]
    inv = 1.0 / (dx * dx)
    A = np.zeros((n, n))
    for i in range(n):
        A[i, i] = alpha * a[i] + 2.0 * beta * inv
        if i > 0:
            A[i, i - 1] = -beta * inv
        if i < n - 1:
            A[i, i + 1] = -beta * inv
    A[0, 0] = alpha * a[0] + 4.0 * beta * inv
    A[0, 1] = -(4.0 / 3.0) * beta * inv
    A[-1, -1] = alpha * a[-1] + 4.0 * beta * inv
    A[-1, -2] = -(4.0 / 3.0) * beta * inv
    return A


def test_1d_solve_matches_dense():
    """GSRBHELMHOLTZVC1D-parity: MG solve of the 1D variable-coefficient
    operator equals the dense direct solve."""
    n = 64
    dx = 1.0 / n
    alpha, beta = 1.0, 1.0
    a_np = RNG.uniform(0.5, 2.0, n)
    rhs_np = RNG.standard_normal(n)
    u, hist = ld.mg_solve(jnp.asarray(rhs_np), jnp.asarray(a_np),
                          alpha=alpha, beta=beta, dx=dx, tol=1e-12)
    assert hist[-1] < 1e-12, hist
    want = np.linalg.solve(_dense_1d(a_np, alpha, beta, dx), rhs_np)
    np.testing.assert_allclose(np.asarray(u), want, rtol=1e-9, atol=1e-10)


def test_1d_apply_op_consistency():
    """residual(u_exact) == 0 for the dense-solved u (operator and matrix
    agree row by row)."""
    n = 32
    dx = 1.0 / n
    a_np = RNG.uniform(0.5, 2.0, n)
    u_np = RNG.standard_normal(n)
    A = _dense_1d(a_np, 1.0, 1.0, dx)
    want = A @ u_np
    got = ld.apply_op(
        ld.fill_ghosts_homogeneous(
            jnp.asarray(u_np), (("dirichlet", "dirichlet"),)),
        jnp.asarray(a_np), 1.0, 1.0, dx)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10,
                               atol=1e-9)


def test_2d_vcycle_contraction_and_analytic():
    """GSRBHELMHOLTZVC2D-parity: 2D Poisson -lap(u) = f, homogeneous
    Dirichlet. V-cycles must contract like textbook MG and converge to the
    2nd-order-accurate discrete solution of an analytic problem."""
    n = 64
    L = 1.0
    dx = L / n
    x = (np.arange(n) + 0.5) * dx
    X, Y = np.meshgrid(x, x, indexing="ij")
    u_exact = np.sin(np.pi * X) * np.sin(np.pi * Y)
    f = 2.0 * np.pi**2 * u_exact
    a = jnp.zeros((n, n))
    u, hist = ld.mg_solve(jnp.asarray(f), a, alpha=0.0, beta=1.0, dx=dx,
                          tol=1e-11)
    # per-cycle contraction (slope of the residual history)
    rates = [hist[i + 1] / hist[i] for i in range(min(4, len(hist) - 1))]
    assert max(rates) < 0.2, hist
    # discretisation error ~ O(dx^2)
    err = float(np.max(np.abs(np.asarray(u) - u_exact)))
    assert err < 4.0 * dx**2, err


def test_2d_periodic_and_neumann_faces():
    """Mixed-BC 2D smoke: periodic in x, Neumann/Dirichlet in y; the
    helmholtz term keeps the operator nonsingular."""
    n = 32
    kinds = (("periodic", "periodic"), ("neumann", "dirichlet"))
    a = jnp.asarray(RNG.uniform(0.5, 2.0, (n, n)))
    rhs = jnp.asarray(RNG.standard_normal((n, n)))
    u, hist = ld.mg_solve(rhs, a, alpha=1.0, beta=1.0, dx=1.0 / n,
                          kinds=kinds, tol=1e-11)
    assert hist[-1] < 1e-11, hist
    r = ld.residual(ld.fill_ghosts_homogeneous(u, kinds), rhs, a,
                    1.0, 1.0, 1.0 / n)
    assert float(jnp.max(jnp.abs(r))) < 1e-11 * float(
        jnp.max(jnp.abs(rhs)))


def test_restriction_denominators():
    """denom = 2^D (RESTRICTRESVC{1,2,3}D:401-432): averaging a constant
    is exact in every D, and harmonic == arithmetic on constants."""
    for D in (1, 2, 3):
        c = jnp.full((8,) * D, 3.5)
        np.testing.assert_allclose(np.asarray(ld.restrict_full(c)), 3.5)
        np.testing.assert_allclose(np.asarray(ld.restrict_harmonic(c)), 3.5)
    # harmonic < arithmetic for non-constant positive data (AM-HM)
    v = jnp.asarray(RNG.uniform(0.5, 2.0, (8, 8)))
    assert float(jnp.max(ld.restrict_harmonic(v) - ld.restrict_full(v))) < 0


def test_prolong_shapes():
    for D in (1, 2):
        e = jnp.asarray(RNG.standard_normal((4,) * D))
        u = jnp.zeros((8,) * D)
        out = ld.prolong_inc(u, e)
        assert out.shape == u.shape
        # piecewise-constant: each coarse value appears 2^D times
        np.testing.assert_allclose(np.asarray(ld.restrict_full(out)),
                                   np.asarray(e), atol=1e-14)
