"""Checkpoint write -> restart read round trip and warm-started re-solve."""

import numpy as np
import jax.numpy as jnp
import pytest

from mg_ic_code_tpu.io import chombo_hdf5 as io
from mg_ic_code_tpu.io import restart
from mg_ic_code_tpu.solver.nonlinear import poisson_solve
from tests.test_nonlinear import small_bbh_cfg

pytest.importorskip("h5py")


def test_checkpoint_restart_roundtrip(tmp_path):
    cfg = small_bbh_cfg(max_level=1)
    res = poisson_solve(cfg, verbose=False)
    path = str(tmp_path / "ckpt.hdf5")
    io.write_final_data(path, res.geom, cfg, res.psi, res.fields,
                        res.constant_K)

    geom2, psi2, k2 = restart.load_state(path, cfg)
    assert geom2.boxes == res.geom.boxes
    assert k2 == pytest.approx(res.constant_K)
    for l in range(geom2.num_levels):
        np.testing.assert_allclose(
            np.asarray(psi2[l]), np.asarray(res.psi[l]), rtol=1e-9,
            atol=1e-11,
        )

    # warm start: the first correction must be tiny (solution already there)
    res2 = poisson_solve(cfg, geom=geom2, verbose=False, initial_psi=psi2)
    assert res2.dpsi_norm_history[0] < 1e-5, res2.dpsi_norm_history


def test_checkpoint_restart_roundtrip_patches(tmp_path):
    """Forest hierarchy: sibling patches write as a multi-box Chombo level
    and restart reconstructs the same forest (boxes, parents, psi)."""
    import dataclasses
    from mg_ic_code_tpu.config import SolverConfig

    cfg = SolverConfig(
        alpha=1.0, beta=-1.0, L=64.0, n_cells=(64, 16, 16), max_level=1,
        num_mg_smooth=4, num_mg_iterations=2, max_iterations=40,
        max_nl_iterations=2, tolerance=1e-10,
        refine_threshold=0.25, block_factor=4, max_grid_size=8,
        bh1_bare_mass=0.5, bh2_bare_mass=0.5,
        bh1_offset=24.0, bh2_offset=-24.0,
        bh1_spin=0.0, bh2_spin=0.0, bh1_momentum=0.02, bh2_momentum=-0.02,
        phi_amplitude=0.0, phi_wavelength=1.0,
        level_decomposition="patches",
    )
    res = poisson_solve(cfg, verbose=False)
    assert res.geom.num_levels == 3 and res.geom.children(0) == (1, 2)
    path = str(tmp_path / "ckpt_forest.hdf5")
    io.write_final_data(path, res.geom, cfg, res.psi, res.fields,
                        res.constant_K)

    # the level_1 group must hold BOTH patch boxes (Chombo multi-box level)
    boxes, _, _, patches = io.read_level_patches(path, 1)
    assert len(boxes) == 2 and len(patches) == 2

    geom2, psi2, k2 = restart.load_state(path, cfg)
    assert geom2.boxes == res.geom.boxes
    assert geom2.parent == res.geom.parent
    for e in range(geom2.num_levels):
        np.testing.assert_allclose(
            np.asarray(psi2[e]), np.asarray(res.psi[e]), rtol=1e-9,
            atol=1e-11,
        )
    res2 = poisson_solve(cfg, geom=geom2, verbose=False, initial_psi=psi2)
    assert res2.dpsi_norm_history[0] < 1e-5, res2.dpsi_norm_history
