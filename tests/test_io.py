import numpy as np
import jax.numpy as jnp
import pytest

from mg_ic_code_tpu.config import SolverConfig
from mg_ic_code_tpu.grid.boxes import Box
from mg_ic_code_tpu.grid.geometry import BCSpec, HierarchyGeom
from mg_ic_code_tpu.io import chombo_hdf5 as io
from mg_ic_code_tpu.physics import level_data as ld
from mg_ic_code_tpu.physics.variables import (
    GRCHOMBO_VARIABLE_NAMES, NUM_GRCHOMBO_VARS,
)

h5py = pytest.importorskip("h5py")


@pytest.fixture(scope="module")
def setup():
    cfg = SolverConfig(
        max_level=1, n_cells=(8, 8, 8), L=16.0,
        bh1_offset=2.0, bh2_offset=-2.0,
    )
    dom0 = Box.from_shape((8, 8, 8))
    fine = Box.from_shape((8, 8, 8), lo=(4, 4, 4))
    geom = HierarchyGeom(
        boxes=(dom0, fine),
        domain_boxes=(dom0, dom0.refine(2)),
        dx=(2.0, 1.0),
        domain_length=(16.0, 16.0, 16.0),
        bc=BCSpec(),
    )
    fields = [ld.problem_fields(geom, cfg, l) for l in range(2)]
    psi = [jnp.ones(geom.shape(l)) * (1.0 + 0.01 * l) for l in range(2)]
    return cfg, geom, fields, psi


def test_final_data_schema(setup, tmp_path):
    cfg, geom, fields, psi = setup
    path = str(tmp_path / "vcPoissonFinal.3d.hdf5")
    io.write_final_data(path, geom, cfg, psi, fields, constant_K=-0.25)

    with h5py.File(path, "r") as f:
        assert int(f.attrs["max_level"]) == 1
        assert int(f.attrs["num_levels"]) == 2
        assert int(f.attrs["num_components"]) == NUM_GRCHOMBO_VARS
        assert int(f.attrs["regrid_interval_0"]) == 1
        assert int(f.attrs["steps_since_regrid_1"]) == 0
        # component name table matches the GRChombo enum order
        for i, name in enumerate(GRCHOMBO_VARIABLE_NAMES):
            got = f.attrs[f"component_{i}"]
            got = got.decode() if isinstance(got, bytes) else str(got)
            assert got == name
        assert int(f["Chombo_global"].attrs["SpaceDim"]) == 3
        for l in range(2):
            g = f[f"level_{l}"]
            assert float(g.attrs["dt"]) == pytest.approx(0.25 * geom.dx[l])
            assert int(g.attrs["ref_ratio"]) == 2
            assert int(g.attrs["is_periodic_0"]) == 1  # GRChombo convention
            assert g["boxes"].shape == (1,)
            # ungrown valid box in the boxes dataset (Chombo write())
            braw = g["boxes"][0]
            assert (int(braw["lo_i"]), int(braw["lo_j"]), int(braw["lo_k"])) \
                == geom.boxes[l].lo
            # data covers the valid region only: outputGhost = 0
            # (WriteOutput.H:211-212 uses write()'s default IntVect::Zero)
            n = np.prod(geom.shape(l))
            assert g["data:datatype=0"].shape == (n * NUM_GRCHOMBO_VARS,)
            da = g["data_attributes"]
            assert int(da.attrs["comps"]) == NUM_GRCHOMBO_VARS
            assert int(da.attrs["outputGhost"]["intvecti"]) == 0
            assert int(da.attrs["ghost"]["intvecti"]) == 3


def test_final_data_roundtrip_values(setup, tmp_path):
    cfg, geom, fields, psi = setup
    path = str(tmp_path / "final.hdf5")
    io.write_final_data(path, geom, cfg, psi, fields, constant_K=-0.25)
    box, dom, dx, named = io.read_level_data(path, 0)
    assert box == geom.boxes[0]
    assert dom == geom.domain_boxes[0]
    assert dx == geom.dx[0]
    chi = named["chi"]
    psi0 = np.asarray(psi[0] + fields[0]["psi_bh"])
    np.testing.assert_allclose(chi, psi0**-4, rtol=1e-12)
    np.testing.assert_allclose(named["K"], -0.25)
    np.testing.assert_allclose(named["h22"], 1.0)


def test_read_genuine_chombo_output_ghost(setup, tmp_path):
    """Files written with a nonzero outputGhost (as some GRChombo
    checkpoints are) must read back with the ghost rind stripped."""
    cfg, geom, fields, psi = setup
    path = str(tmp_path / "ghosted.hdf5")
    shape = geom.shape(0)
    interior = np.arange(np.prod(shape), dtype=float).reshape(shape)
    grown = np.pad(interior, 2, constant_values=-7.0)
    with h5py.File(path, "w") as f:
        f.attrs.create("num_components", np.int32(1))
        io._write_string_attr(f, "component_0", "chi")
        io._write_level_group(
            f, 0, [(geom.boxes[0], [grown])], dx=geom.dx[0], dt=1.0,
            time=0.0, ref_ratio=2, prob_domain=geom.domain_boxes[0],
            is_periodic=False, ghost=3,
        )
        # overwrite outputGhost to match the grown data we stored
        iv = np.dtype([("intvecti", "<i4"), ("intvectj", "<i4"),
                       ("intvectk", "<i4")])
        da = f["level_0/data_attributes"]
        del da.attrs["outputGhost"]
        da.attrs.create("outputGhost", np.array([(2, 2, 2)], dtype=iv)[0])
    box, dom, dx, named = io.read_level_data(path, 0)
    assert box == geom.boxes[0]
    np.testing.assert_array_equal(named["chi"], interior)


def test_solver_data_roundtrip(setup, tmp_path):
    cfg, geom, fields, psi = setup
    rng = np.random.default_rng(2)
    dpsi = [jnp.asarray(rng.standard_normal(geom.shape(l))) for l in range(2)]
    rhs = [jnp.asarray(rng.standard_normal(geom.shape(l))) for l in range(2)]
    path = str(tmp_path / "vcPoissonOut.3d_0.hdf5")
    io.write_solver_data(path, geom, cfg, dpsi, rhs, psi, fields, iteration=0)

    box, dom, dx, named = io.read_level_data(path, 1)
    assert box == geom.boxes[1]
    np.testing.assert_allclose(named["dpsi"], dpsi[1], rtol=1e-15)
    np.testing.assert_allclose(named["rhs"], rhs[1], rtol=1e-15)
    np.testing.assert_allclose(named["psi"], psi[1], rtol=1e-15)
    np.testing.assert_allclose(named["A12_0"], fields[1]["aij"][(0, 1)],
                               rtol=1e-15)
    np.testing.assert_allclose(named["phi_0"], fields[1]["phi"], rtol=1e-15)


def test_fab_layout_fortran_order():
    """The flat FArrayBox layout must be x-fastest (Fortran) per component."""
    a = np.arange(24, dtype=float).reshape(2, 3, 4)  # (nx, ny, nz)
    flat = io._flatten_fab([a])
    # first elements vary x (axis 0) fastest
    assert flat[0] == a[0, 0, 0]
    assert flat[1] == a[1, 0, 0]
    assert flat[2] == a[0, 1, 0]
    back = io._unflatten_fab(flat, a.shape, 1)[0]
    np.testing.assert_array_equal(back, a)
