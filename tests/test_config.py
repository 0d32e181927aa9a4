import textwrap

import pytest

from mg_ic_code_tpu.config import ParamFile, load_params

# a faithful clone of the reference's canonical params.txt key set
# (reference: params.txt:1-84)
CANONICAL = textwrap.dedent(
    """
    # comment line
    alpha = 1.0
    beta  = -1.0
    L = 100.0
    N = 64 64 64
    max_level    = 6
    refine_threshold = 0.1
    block_factor = 8
    max_grid_size = 16
    fill_ratio   = 0.5
    buffer_size  = 3
    numMGsmooth = 4 # trailing comment
    num_mg     = 1
    numMGIterations = 2
    max_iterations = 100
    max_NL_iterations = 6
    tolerance  = 1.0e-10
    hang       = 1.0e-11
    verbosity = 2
    coefficient_average_type = harmonic
    is_periodic = 0
    bc_lo       = 0 0 0
    bc_hi       = 0 0 0
    bc_value = 0.0
    G_Newton = 1.0
    phi_amplitude = 0.1
    phi_wavelength = 1
    bh1_bare_mass = 0.5
    bh1_spin = 0.1
    bh1_momentum = 0.05
    bh1_offset = 10.0
    bh2_bare_mass = 0.5
    bh2_spin = 0.1
    bh2_momentum = -0.05
    bh2_offset = -10.0
    """
)


@pytest.fixture()
def params_path(tmp_path):
    p = tmp_path / "params.txt"
    p.write_text(CANONICAL)
    return str(p)


def test_load_canonical(params_path):
    cfg = load_params(params_path)
    assert cfg.alpha == 1.0 and cfg.beta == -1.0
    assert cfg.n_cells == (64, 64, 64)
    assert cfg.max_level == 6 and cfg.num_levels == 7
    assert cfg.coarsest_dx == pytest.approx(100.0 / 64)
    assert cfg.coefficient_average_type == "harmonic"
    assert cfg.num_mg_smooth == 4 and cfg.num_mg_iterations == 2
    assert cfg.max_iterations == 100 and cfg.max_nl_iterations == 6
    assert cfg.tolerance == 1.0e-10
    assert not cfg.is_periodic
    assert cfg.bc_lo == (0, 0, 0) and cfg.bc_value == 0.0
    assert cfg.bh1_offset == 10.0 and cfg.bh2_momentum == -0.05


def test_overrides_win(params_path):
    cfg = load_params(params_path, overrides=["max_level = 2", "L = 8.0"])
    assert cfg.max_level == 2
    assert cfg.L == 8.0


def test_query_vs_get(tmp_path):
    p = tmp_path / "min.txt"
    p.write_text("a = 3\n")
    pp = ParamFile(str(p))
    assert pp.get_int("a") == 3
    assert pp.query_int("missing", 7) == 7
    with pytest.raises(KeyError):
        pp.get_real("missing")


def test_bad_average_type(params_path):
    with pytest.raises(ValueError):
        load_params(params_path, overrides=["coefficient_average_type = bogus"])


def test_config_hashable(params_path):
    cfg = load_params(params_path)
    hash(cfg)  # static jit argument requirement
