import math

import numpy as np
import jax.numpy as jnp
import pytest

from mg_ic_code_tpu.config import SolverConfig
from mg_ic_code_tpu.grid.geometry import BCSpec, single_level_geom
from mg_ic_code_tpu.physics import bowen_york as by
from mg_ic_code_tpu.physics import level_data as ld
from mg_ic_code_tpu.physics.scalar_field import phi_function


def bbh_cfg(**kw):
    base = dict(
        max_level=0, n_cells=(8, 8, 8), L=16.0,
        bh1_bare_mass=0.5, bh2_bare_mass=0.5,
        bh1_offset=2.0, bh2_offset=-2.0,
        bh1_momentum=0.05, bh2_momentum=-0.05,
        bh1_spin=0.1, bh2_spin=0.1,
        phi_amplitude=0.1, phi_wavelength=1.0,
    )
    base.update(kw)
    return SolverConfig(**base)


def numpy_bowen_york_point(p, offset, P, J):
    """Independent oracle: full epsilon-tensor Bowen-York A_ij at one point
    (Alcubierre eq. 3.4.22) for a single puncture."""
    eps = np.zeros((3, 3, 3))
    for (i, j, k), s in [((0, 1, 2), 1), ((1, 2, 0), 1), ((2, 0, 1), 1),
                         ((0, 2, 1), -1), ((2, 1, 0), -1), ((1, 0, 2), -1)]:
        eps[i, j, k] = s
    x = np.asarray(p, float) - np.array([offset, 0.0, 0.0])
    r = np.linalg.norm(x)
    n = x / r
    P = np.asarray(P, float)
    J = np.asarray(J, float)
    A = np.zeros((3, 3))
    for i in range(3):
        for j in range(3):
            A[i, j] = 1.5 / r**2 * (n[i] * P[j] + n[j] * P[i])
            A[i, j] += 1.5 / r**2 * (n[i] * n[j] - (i == j)) * np.dot(P, n)
            for k in range(3):
                for l in range(3):
                    A[i, j] += (
                        -3.0 / r**3
                        * (eps[i, l, k] * n[j] + eps[j, l, k] * n[i])
                        * n[l] * J[k]
                    )
    return A


def test_aij_matches_epsilon_oracle():
    cfg = bbh_cfg(bh2_bare_mass=0.0, bh2_momentum=0.0, bh2_spin=0.0,
                  bh2_offset=-1000.0)  # second puncture far away
    pts = [(1.1, 0.7, -0.4), (-0.3, 2.0, 1.5)]
    for p in pts:
        x = jnp.asarray([p[0]])[:, None, None]
        y = jnp.asarray([p[1]])[None, :, None].reshape(1, 1, 1)
        z = jnp.asarray([p[2]]).reshape(1, 1, 1)
        aij = by.binary_bh_aij(x.reshape(1, 1, 1), y, z, cfg)
        want = numpy_bowen_york_point(
            p, cfg.bh1_offset, (0, cfg.bh1_momentum, 0), (0, 0, cfg.bh1_spin)
        )
        for (i, j), got in aij.items():
            assert float(got[0, 0, 0]) == pytest.approx(want[i, j], rel=1e-12), (i, j)


def test_aij_traceless_and_superposed():
    cfg = bbh_cfg()
    geom = single_level_geom(cfg.n_cells, cfg.L, BCSpec())
    x, y, z = geom.coords(0)
    aij = by.binary_bh_aij(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), cfg)
    trace = aij[(0, 0)] + aij[(1, 1)] + aij[(2, 2)]
    scale = jnp.max(jnp.abs(aij[(0, 1)]))
    assert float(jnp.max(jnp.abs(trace))) < 1e-12 * max(float(scale), 1.0)


def test_psi_bh_values():
    cfg = bbh_cfg()
    # at origin: r1 = r2 = 2 -> psi_bh = 0.5/2 + 0.5/2 = 0.5
    v = by.psi_bh(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0), cfg)
    assert float(v) == pytest.approx(0.5)


def test_phi_function_gaussian():
    cfg = bbh_cfg()
    v = phi_function(jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(0.0), cfg)
    assert float(v) == pytest.approx(0.1 * math.exp(-5.0 / 1.0), rel=1e-12)


def test_m_value():
    cfg = bbh_cfg()
    assert ld.m_value(cfg, 0.0) == 0.0
    assert ld.m_value(cfg, 3.0) == pytest.approx(6.0)


def test_rhs_trivial_configuration():
    """No BHs, no scalar field, psi = 1, K = 0: every source term vanishes
    and rhs = -Lap(1) = 0."""
    cfg = bbh_cfg(bh1_bare_mass=0.0, bh2_bare_mass=0.0, bh1_momentum=0.0,
                  bh2_momentum=0.0, bh1_spin=0.0, bh2_spin=0.0,
                  phi_amplitude=0.0)
    geom = single_level_geom(cfg.n_cells, cfg.L, BCSpec())
    fields = ld.problem_fields(geom, cfg, 0)
    psi_gh = jnp.ones(tuple(s + 2 for s in cfg.n_cells))
    rhs = ld.set_rhs(psi_gh, fields, cfg, geom.dx[0], 0.0)
    np.testing.assert_allclose(rhs, 0.0, atol=1e-14)
    a = ld.set_a_coef(jnp.ones(cfg.n_cells), fields, cfg, 0.0)
    np.testing.assert_allclose(a, 0.0, atol=1e-14)


def test_rhs_formula_pointwise():
    """Cross-check set_rhs against a direct pointwise evaluation."""
    cfg = bbh_cfg()
    geom = single_level_geom(cfg.n_cells, cfg.L, BCSpec())
    fields = ld.problem_fields(geom, cfg, 0)
    rng = np.random.default_rng(5)
    psi_gh = jnp.asarray(1.0 + 0.1 * rng.standard_normal(
        tuple(s + 2 for s in cfg.n_cells)))
    K = -0.3
    rhs = ld.set_rhs(psi_gh, fields, cfg, geom.dx[0], K)

    from mg_ic_code_tpu.ops import stencils as st
    psi0 = psi_gh[1:-1, 1:-1, 1:-1] + fields["psi_bh"]
    m = (2.0 / 3.0) * K * K
    want = (
        0.125 * m * psi0**5
        - 0.125 * fields["aij2"] * psi0**-7
        - 2.0 * math.pi * cfg.G_Newton * fields["rho_grad"] * psi0
        - st.laplacian(psi_gh, geom.dx[0])
    )
    np.testing.assert_allclose(rhs, want, rtol=1e-12)


def test_grchombo_output_stack():
    cfg = bbh_cfg()
    geom = single_level_geom(cfg.n_cells, cfg.L, BCSpec())
    fields = ld.problem_fields(geom, cfg, 0)
    psi = jnp.ones(cfg.n_cells)
    stack = ld.grchombo_output_stack(psi, fields, cfg, constant_K=-0.1)
    from mg_ic_code_tpu.physics.variables import (
        GRCHOMBO_INDEX, NUM_GRCHOMBO_VARS,
    )
    assert stack.shape == (NUM_GRCHOMBO_VARS,) + cfg.n_cells
    chi = np.asarray(stack[GRCHOMBO_INDEX["chi"]])
    psi0 = np.asarray(psi + fields["psi_bh"])
    np.testing.assert_allclose(chi, psi0**-4, rtol=1e-12)
    np.testing.assert_allclose(stack[GRCHOMBO_INDEX["h11"]], 1.0)
    np.testing.assert_allclose(stack[GRCHOMBO_INDEX["K"]], -0.1)
    np.testing.assert_allclose(stack[GRCHOMBO_INDEX["lapse"]], 1.0)
    np.testing.assert_allclose(stack[GRCHOMBO_INDEX["shift1"]], 0.0)
    # tilde A_ij = bar A_ij * chi^1.5
    a11 = np.asarray(stack[GRCHOMBO_INDEX["A11"]])
    want = np.asarray(fields["aij"][(0, 0)]) * chi**1.5
    np.testing.assert_allclose(a11, want, rtol=1e-12)


def test_single_puncture_time_symmetric_exactness():
    """A single puncture with no spin/momentum and no scalar field is
    time-symmetric Brill-Lindquist data. The reference keeps the singular
    part m/r analytic (never differenced: SetLevelData.cpp:50-54), so with
    A_ij = 0, rho = 0, K = 0 the rhs is IDENTICALLY zero and the solved
    regular part must stay psi = 1 to machine precision at any h."""
    from mg_ic_code_tpu.grid.geometry import single_level_geom as slg
    from mg_ic_code_tpu.solver.nonlinear import poisson_solve

    norms = []
    for n in (8, 16):
        cfg = SolverConfig(
            alpha=1.0, beta=-1.0, L=16.0, n_cells=(n, n, n), max_level=0,
            num_mg_smooth=4, num_mg_iterations=2, max_iterations=60,
            max_nl_iterations=3, tolerance=1e-12,
            bh1_bare_mass=0.3, bh2_bare_mass=0.0,
            bh1_offset=1.0, bh2_offset=-1000.0,
            bh1_momentum=0.0, bh2_momentum=0.0,
            bh1_spin=0.0, bh2_spin=0.0, phi_amplitude=0.0,
        )
        res = poisson_solve(cfg, verbose=False)
        dev = float(np.max(np.abs(np.asarray(res.psi[0]) - 1.0)))
        norms.append(dev)
    assert max(norms) < 1e-12, norms


def test_phi_profile_selectable():
    cfg_sine = bbh_cfg(phi_profile="sine", is_periodic=True)
    geom = single_level_geom(cfg_sine.n_cells, cfg_sine.L,
                             BCSpec(periodic=True))
    f = ld.problem_fields(geom, cfg_sine, 0)
    # sine profile: zero mean over the periodic box, nonzero field
    phi = np.asarray(f["phi"])
    assert abs(phi.mean()) < 1e-12 * np.abs(phi).max()
    assert np.abs(phi).max() > 0
