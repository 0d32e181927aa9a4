"""Auxiliary subsystems: timers, logging, Jacobi smoother, face sums."""

import io

import numpy as np
import jax.numpy as jnp

from mg_ic_code_tpu.grid.geometry import BCSpec, single_level_geom
from mg_ic_code_tpu.ops import stencils as st
from mg_ic_code_tpu.solver import multigrid as mg
from mg_ic_code_tpu.utils import profiling

RNG = np.random.default_rng(13)


def test_timer_tree_nesting_and_report():
    t = profiling.TimerTree()
    with t.scope("solve"):
        with t.scope("vcycle"):
            pass
        with t.scope("vcycle"):
            pass
        with t.scope("norm"):
            pass
    rep = t.report()
    assert "solve" in rep and "vcycle" in rep and "norm" in rep
    solve = t.root.children["solve"]
    assert solve.count == 1
    assert solve.children["vcycle"].count == 2


def test_pout_verbosity(capsys):
    from mg_ic_code_tpu.io.logging import pout, set_verbosity

    set_verbosity(1)
    pout("visible", level=1)
    pout("hidden", level=3)
    out = capsys.readouterr().out
    assert "visible" in out and "hidden" not in out
    set_verbosity(2)


def test_jacobi_smoother_converges():
    """Weighted Jacobi fixed point = the solution; error must contract."""
    n = 8
    geom = single_level_geom(n, 1.0, BCSpec())
    spec = mg.make_level_spec(geom, 0, alpha=1.0, beta=-1.0, nsmooth=2)
    a = jnp.asarray(RNG.uniform(0.5, 2.0, (n, n, n)))
    coefs = mg.build_level_coefs(spec, a)
    rhs = jnp.asarray(RNG.standard_normal((n, n, n)))
    u = jnp.zeros_like(rhs)
    r0 = float(jnp.max(jnp.abs(mg.residual_homog(spec, coefs, 0, u, rhs))))
    for _ in range(50):
        u = mg.jacobi_sweep(spec, coefs, 0, u, rhs)
    r = float(jnp.max(jnp.abs(mg.residual_homog(spec, coefs, 0, u, rhs))))
    assert r < 0.25 * r0, (r, r0)


def test_sum_faces():
    lhs = jnp.asarray(RNG.standard_normal((4, 4, 4)))
    fv = jnp.asarray(RNG.standard_normal((4, 5, 4)))  # faces along axis 1
    out = st.sum_faces(lhs, fv, axis=1, beta=2.0, scale=0.5)
    want = np.asarray(lhs) + 0.5 * 2.0 * (
        np.asarray(fv)[:, :-1, :] + np.asarray(fv)[:, 1:, :]
    )
    np.testing.assert_allclose(out, want, rtol=1e-13)


def test_face_flux():
    n = (6, 6, 6)
    u_gh = RNG.standard_normal(tuple(s + 2 for s in n))
    dx = 0.5
    f = np.asarray(st.face_flux(jnp.asarray(u_gh), 0, dx))
    assert f.shape == (7, 6, 6)
    want = (u_gh[1:, 1:-1, 1:-1] - u_gh[:-1, 1:-1, 1:-1]) / dx
    np.testing.assert_allclose(f, want, rtol=1e-13)
    bf = RNG.uniform(0.5, 2.0, (7, 6, 6))
    f2 = np.asarray(st.face_flux(jnp.asarray(u_gh), 0, dx, jnp.asarray(bf)))
    np.testing.assert_allclose(f2, want * bf, rtol=1e-13)


def test_laplacian6_exact_for_quartic():
    n, dx = 10, 0.2
    idx = (np.arange(n + 6) - 2.5) * dx
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    u = x**4 + y**3 + 2 * z**2
    got = np.asarray(st.laplacian6(jnp.asarray(u), dx))
    xi, yi, zi = x[3:-3, 3:-3, 3:-3], y[3:-3, 3:-3, 3:-3], z[3:-3, 3:-3, 3:-3]
    want = 12 * xi**2 + 6 * yi + 4.0
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_debug_checks():
    from mg_ic_code_tpu.utils import asserts

    x = jnp.asarray([1.0, 2.0])
    assert asserts.check_finite(x, "x") is x  # disabled: passthrough
    asserts.enable_debug_checks(True)
    try:
        import pytest as _pytest

        asserts.check_finite(jnp.asarray([1.0, 2.0]), "ok")
        with _pytest.raises(FloatingPointError):
            asserts.check_finite(jnp.asarray([1.0, np.nan]), "bad")
            import jax as _jax

            _jax.effects_barrier()
    finally:
        asserts.enable_debug_checks(False)


def test_dense_level_memory_report():
    """Memory accounting for the dense-level design (VERDICT r1 #7):
    well-separated refined regions must show up as a high
    bounding-box-vs-tag-union waste ratio."""
    from mg_ic_code_tpu.config import SolverConfig
    from mg_ic_code_tpu.grid import tagging

    # two BHs far apart -> two small tag clusters, one wide bounding box
    cfg = SolverConfig(
        alpha=1.0, beta=-1.0, L=64.0, n_cells=(64, 16, 16), max_level=1,
        num_mg_smooth=4, num_mg_iterations=1, max_iterations=10,
        max_nl_iterations=1, tolerance=1e-10,
        refine_threshold=0.5, block_factor=4, max_grid_size=8,
        bh1_bare_mass=0.5, bh2_bare_mass=0.5,
        bh1_offset=24.0, bh2_offset=-24.0,
        phi_amplitude=0.0, phi_wavelength=1.0,
    )
    geom = tagging.generate_hierarchy(cfg)
    assert geom.num_levels == 2
    rep = tagging.memory_report(cfg, geom)
    assert len(rep) == 1
    r = rep[0]
    assert r["level"] == 1
    assert r["dense_cells"] >= r["tag_union_cells"] > 0
    # punctures 48 cells apart in a 64-cell domain: the dense bbox spans
    # both while the union covers only the two neighbourhoods
    assert r["waste_ratio"] > 2.0
