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
