"""Restart from a previously written GRChombo checkpoint.

The reference only WRITES checkpoints (for GRChombo to evolve) and notes
that a read-in-grids option "exists in principle" (SetGrids.cpp:29-30).
This module closes that loop: `load_state` reads a `vcPoissonFinal`-format
file written by io.chombo_hdf5 and reconstructs (geometry, psi) so a solve
can warm-start from a previous solution — e.g. re-solving with tightened
tolerance, more levels, or perturbed physics.

Inversion of the output transform (SetLevelData.cpp:343-396):
    chi = (psi_regular + psi_bh)^-4   =>   psi_regular = chi^-1/4 - psi_bh
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mg_ic_code_tpu.config import SolverConfig
from mg_ic_code_tpu.grid.boxes import Box
from mg_ic_code_tpu.grid.geometry import HierarchyGeom, geom_from_config
from mg_ic_code_tpu.io import chombo_hdf5 as io
from mg_ic_code_tpu.physics import bowen_york as by


def load_geometry(path: str, cfg: SolverConfig) -> HierarchyGeom:
    """Rebuild the level-box hierarchy recorded in a checkpoint."""
    io._require_h5py()
    import h5py

    with h5py.File(path, "r") as f:
        nl = int(f.attrs["num_levels"])
    boxes = []
    for l in range(nl):
        # read_level_data returns the valid (ungrown) box regardless of the
        # file's outputGhost convention
        box, _, _, _ = io.read_level_data(path, l)
        boxes.append(box)
    return geom_from_config(cfg, tuple(boxes))


def load_state(path: str, cfg: SolverConfig, dtype=jnp.float64):
    """(geom, psi_list, constant_K) from a GRChombo-format checkpoint."""
    geom = load_geometry(path, cfg)
    psi = []
    constant_K = 0.0
    for l in range(geom.num_levels):
        _, _, _, named = io.read_level_data(path, l)
        chi = named["chi"]  # valid region (reader strips any outputGhost)
        x, y, z = geom.coords(l)
        psi_bh = np.asarray(by.psi_bh(x, y, z, cfg))
        psi_bh = np.broadcast_to(psi_bh, chi.shape)
        psi.append(jnp.asarray(chi, dtype) ** (-0.25) - jnp.asarray(psi_bh, dtype))
        constant_K = float(named["K"][1, 1, 1])
    return geom, psi, constant_K
