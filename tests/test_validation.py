"""Reference-independent physics validation (VERDICT r2 next-step #3).

Every other end-to-end lock in this suite is a regression against the
framework's own earlier output; the reference's only oracle is its own
convergence monitor (Main_PoissonSolver.cpp:208-225). These tests check the
*physics answer* against things neither the solver nor the reference supply:

  * exact limits (P = J = 0 must leave the regular conformal factor
    identically 1 — Brill-Lindquist data is exact, SetBinaryBH.H:85-99);
  * O(dx^2) convergence of the nonlinear Hamiltonian constraint residual
    evaluated with an independent 4th-order Laplacian + analytic sources;
  * Richardson convergence order of psi itself across 3 resolutions;
  * analytic transversality of the Bowen-York extrinsic curvature
    (momentum constraint, d_j A_ij = 0);
  * ADM mass: surface-flux vs Gauss-volume agreement (sign-sensitive),
    the rest-mass limit, and quadratic small-momentum scaling.

A sign or linearisation error baked into a round-1 baseline would pass the
regression locks and fail here.
"""

import numpy as np
import pytest

from mg_ic_code_tpu.config import SolverConfig
from mg_ic_code_tpu.physics import diagnostics as dg
from mg_ic_code_tpu.solver.nonlinear import poisson_solve


def scalar_cfg(n: int, **kw):
    """Smooth scalar-field-only configuration (no punctures): the constraint
    reduces to Lap(psi) = -2 pi G rho_grad psi with a Gaussian phi, smooth
    everywhere — the clean setting for convergence-order measurement."""
    base = dict(
        alpha=1.0, beta=-1.0, L=8.0, n_cells=(n, n, n), max_level=0,
        num_mg_smooth=4, num_mg_iterations=2, max_iterations=100,
        max_nl_iterations=8, tolerance=1e-12,
        coefficient_average_type="arithmetic",
        is_periodic=False, bc_lo=(0, 0, 0), bc_hi=(0, 0, 0), bc_value=0.0,
        G_Newton=1.0, phi_amplitude=0.3, phi_wavelength=2.0,
        bh1_bare_mass=0.0, bh2_bare_mass=0.0,
        bh1_offset=2.0, bh2_offset=-2.0,
        bh1_momentum=0.0, bh2_momentum=0.0,
        bh1_spin=0.0, bh2_spin=0.0,
    )
    base.update(kw)
    return SolverConfig(**base)


def puncture_cfg(n: int, **kw):
    """Single puncture at the origin in a 24^3-length box."""
    base = dict(
        alpha=1.0, beta=-1.0, L=24.0, n_cells=(n, n, n), max_level=0,
        num_mg_smooth=4, num_mg_iterations=2, max_iterations=100,
        max_nl_iterations=8, tolerance=1e-12,
        coefficient_average_type="arithmetic",
        is_periodic=False, bc_lo=(0, 0, 0), bc_hi=(0, 0, 0), bc_value=0.0,
        G_Newton=1.0, phi_amplitude=0.0, phi_wavelength=1.0,
        bh1_bare_mass=0.3, bh2_bare_mass=0.0,
        bh1_offset=0.0, bh2_offset=6.0,
        bh1_momentum=0.0, bh2_momentum=0.0,
        bh1_spin=0.0, bh2_spin=0.0,
    )
    base.update(kw)
    return SolverConfig(**base)


# --------------------------------------------------------------- exact limits


def test_time_symmetric_puncture_limit_is_exact():
    """P = J = 0, phi = 0: Brill-Lindquist data solves the constraint
    EXACTLY with psi_regular == 1 (rhs == 0 identically since the singular
    m/r parts are analytic and never differenced). Any spurious source term,
    sign slip, or ghost-fill contamination shows up as a nonzero dpsi."""
    cfg = puncture_cfg(
        16, bh1_bare_mass=0.3, bh2_bare_mass=0.2, bh1_offset=3.0,
        bh2_offset=-3.0, max_level=1, max_nl_iterations=3,
    )
    from mg_ic_code_tpu.grid.boxes import Box
    from mg_ic_code_tpu.grid.geometry import geom_from_config

    geom = geom_from_config(
        cfg, (Box.from_shape((16, 16, 16)),
              Box.from_shape((16, 16, 16), lo=(8, 8, 8))),
    )
    res = poisson_solve(cfg, geom=geom, verbose=False)
    assert max(res.dpsi_norm_history) < 1e-12, res.dpsi_norm_history
    for p in res.psi:
        np.testing.assert_allclose(np.asarray(p), 1.0, rtol=0, atol=1e-12)


# ------------------------------------------------ constraint-residual order


@pytest.fixture(scope="module")
def scalar_solves():
    """Converged scalar-field solves at 16^3, 32^3, 64^3 (same L)."""
    out = {}
    for n in (16, 32, 64):
        cfg = scalar_cfg(n)
        res = poisson_solve(cfg, verbose=False)
        assert res.converged
        out[n] = (cfg, res)
    return out


def test_hamiltonian_residual_shrinks_at_second_order(scalar_solves):
    """The nonlinear constraint residual at the converged psi, evaluated
    with the INDEPENDENT 4th-order Laplacian and analytic gradient energy,
    must shrink ~4x per mesh doubling (VERDICT r2 item: 'the set_rhs
    formula at the converged psi should vanish at O(dx^2)')."""
    norms = {}
    for n, (cfg, res) in scalar_solves.items():
        h = dg.hamiltonian_residual(res.geom, cfg, res.psi[0], 0)
        norms[n] = float(np.sqrt(np.mean(np.square(np.asarray(h)))))
    r1 = norms[16] / norms[32]
    r2 = norms[32] / norms[64]
    assert 2.5 < r1 < 6.5, norms
    assert 3.0 < r2 < 5.5, norms


def test_psi_richardson_convergence_order(scalar_solves):
    """psi itself converges at 2nd order: ||psi_h - psi_{h/2}|| drops 4x
    per refinement (Richardson), comparing on common coarse cells."""
    from mg_ic_code_tpu.ops.stencils import restrict_full

    psi16 = np.asarray(scalar_solves[16][1].psi[0])
    psi32 = np.asarray(scalar_solves[32][1].psi[0])
    psi64 = np.asarray(scalar_solves[64][1].psi[0])
    d1 = np.abs(psi16 - np.asarray(restrict_full(psi32))).max()
    d2 = np.abs(psi32 - np.asarray(restrict_full(psi64))).max()
    # full-weighting restriction itself carries an O(dx^2) cell-average vs
    # point-value offset, so the ratio centres on 4 but less tightly than
    # the residual study
    assert 2.8 < d1 / d2 < 5.8, (d1, d2)
    # and the solution is non-trivial (the scalar field actually sources)
    assert np.abs(psi64 - 1.0).max() > 1e-3


# -------------------------------------------------------- momentum constraint


def test_bowen_york_transversality():
    """d_j bar A_ij = 0 analytically for Bowen-York data (Alcubierre eq.
    3.4.20-22); the central-difference divergence must shrink at O(dx^2)
    relative to |A| in a fixed annulus away from the punctures. A sign
    error in the momentum or spin terms of SetBinaryBH-parity code breaks
    this identity O(1)."""
    vals = {}
    for n in (32, 64):
        cfg = SolverConfig(
            L=24.0, n_cells=(n, n, n), max_level=0,
            bh1_bare_mass=0.5, bh2_bare_mass=0.5,
            bh1_offset=4.0, bh2_offset=-4.0,
            bh1_momentum=0.1, bh2_momentum=-0.1,
            bh1_spin=0.2, bh2_spin=0.1,
            phi_amplitude=0.0,
        )
        from mg_ic_code_tpu.grid.geometry import geom_from_config
        from mg_ic_code_tpu.grid.boxes import Box

        geom = geom_from_config(cfg, (Box.from_shape((n, n, n)),))
        div, mag = dg.momentum_constraint_divergence(geom, cfg, 0)
        div, mag = np.asarray(div), np.asarray(mag)
        x, y, z = geom.coords(0)
        xc = np.broadcast_to(x, geom.shape(0))
        yc = np.broadcast_to(y, geom.shape(0))
        zc = np.broadcast_to(z, geom.shape(0))
        r1 = np.sqrt((xc - 4.0) ** 2 + yc**2 + zc**2)
        r2 = np.sqrt((xc + 4.0) ** 2 + yc**2 + zc**2)
        ann = (np.minimum(r1, r2) > 2.5) & (np.maximum(r1, r2) < 9.0)
        vals[n] = float(np.max(div[ann]) / np.max(mag[ann]))
    assert 3.0 < vals[32] / vals[64] < 5.0, vals
    assert vals[64] < 0.1, vals  # already small in absolute terms


# ----------------------------------------------------------------- ADM mass


def test_adm_mass_rest_limit_and_surface_volume_identity():
    """P = J = 0 single puncture: the flux integral must return the ADM
    mass 2*m_bare (the reference's psi_bh = m/r convention doubles the
    conventional 1/(2r) coefficient), and the Gauss volume form must agree
    with the surface form — an identity that holds only when the solved
    field satisfies the constraint with the right signs."""
    cfg = puncture_cfg(48)
    res = poisson_solve(cfg, verbose=False)
    m_surf = float(dg.adm_mass_surface(res.geom, cfg, res.psi[0], margin=4))
    m_vol = float(dg.adm_mass_volume(res.geom, cfg, res.psi[0], margin=4))
    m_adm = 2.0 * cfg.bh1_bare_mass
    assert abs(m_surf - m_adm) < 0.03 * m_adm, (m_surf, m_adm)
    assert abs(m_surf - m_vol) < 0.02 * m_adm, (m_surf, m_vol)


def test_adm_mass_quadratic_momentum_scaling():
    """Small-P Bowen-York: the ADM mass exceeds the rest mass by an
    O(P^2) binding/kinetic contribution — doubling P must quadruple the
    excess (perturbative BY scaling), and the surface/volume forms must
    keep agreeing on the solved (non-trivial) field."""
    masses = {}
    for P in (0.0, 0.1, 0.2):
        cfg = puncture_cfg(32, bh1_momentum=P)
        res = poisson_solve(cfg, verbose=False)
        m_s = float(dg.adm_mass_surface(res.geom, cfg, res.psi[0], margin=3))
        m_v = float(dg.adm_mass_volume(res.geom, cfg, res.psi[0], margin=3))
        assert abs(m_s - m_v) < 0.02 * max(m_s, 1e-30), (P, m_s, m_v)
        masses[P] = m_s
    base = masses[0.0]
    d1 = masses[0.1] - base
    d2 = masses[0.2] - base
    assert d1 > 0 and d2 > 0, masses
    assert 3.0 < d2 / d1 < 5.0, masses
