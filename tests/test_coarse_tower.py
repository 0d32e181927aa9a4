"""Fused coarse-depth tower locks (ops/coarse_tower, VERDICT r4 #3).

The tower must reproduce the staged per-depth mg_vcycle (same resident
pass bodies; restriction/prolongation re-expressed with in-kernel
pairing/matmuls) to f32 reorder tolerance, and the dispatch must engage
it exactly where the whole remaining sub-chain is resident-class."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mg_ic_code_tpu.grid.geometry import BCSpec, single_level_geom
from mg_ic_code_tpu.ops import coarse_tower as ct
from mg_ic_code_tpu.solver import multigrid as mg

RNG = np.random.default_rng(7)


def _setup(n=32, bc=None, nsmooth=4, bottom="auto"):
    geom = single_level_geom(n, 1.0, bc or BCSpec())
    spec = mg.make_level_spec(geom, 0, alpha=1.0, beta=-1.0,
                              nsmooth=nsmooth, smoother="pallas",
                              bottom=bottom)
    a = jnp.asarray(RNG.uniform(0.5, 2.0, (n, n, n)), jnp.float32)
    rhs = jnp.asarray(RNG.standard_normal((n, n, n)), jnp.float32)
    u0 = jnp.asarray(RNG.standard_normal((n, n, n)), jnp.float32)
    coefs = mg.build_level_coefs(spec, a)
    return geom, spec, a, rhs, u0, coefs


@pytest.mark.parametrize("bc", [BCSpec(), BCSpec(periodic=True),
                                BCSpec(bc_lo=(1, 0, 1), bc_hi=(0, 1, 0))])
def test_tower_matches_staged_vcycle(bc, monkeypatch):
    geom, spec, a, rhs, u0, coefs = _setup(bc=bc)
    assert ct.tower_supported(spec, coefs, 0)
    out_tower = mg.mg_vcycle(spec, coefs, u0, rhs)

    monkeypatch.setattr(ct, "tower_supported", lambda *a_: False)
    out_staged = mg.mg_vcycle(spec, coefs, u0, rhs)
    np.testing.assert_allclose(np.asarray(out_tower),
                               np.asarray(out_staged),
                               rtol=0, atol=5e-5)


def test_tower_matches_staged_bicgstab_bottom(monkeypatch):
    """The non-direct bottom (bottom_solver=bicgstab) path: the tower's
    down kernel must pre-smooth the BOTTOM depth exactly as the staged
    mg_vcycle does before bottom_solve — with an iterative bottom the
    starting state matters (review round 5: the first tower version
    skipped it and only direct-inverse bottoms masked the divergence)."""
    geom, spec, a, rhs, u0, coefs = _setup(bottom="bicgstab")
    assert coefs.get("binv") is None
    assert ct.tower_supported(spec, coefs, 0)
    out_tower = mg.mg_vcycle(spec, coefs, u0, rhs)
    monkeypatch.setattr(ct, "tower_supported", lambda *a_: False)
    out_staged = mg.mg_vcycle(spec, coefs, u0, rhs)
    np.testing.assert_allclose(np.asarray(out_tower),
                               np.asarray(out_staged),
                               rtol=0, atol=5e-5)


def test_tower_from_mid_depth(monkeypatch):
    """The dispatch engages mid-chain: at a 128^3-class level only the
    depths at/below ~64^3 are resident, so the tower starts there."""
    geom, spec, a, rhs, u0, coefs = _setup(n=64)
    # depth 0 = 64^3: whole chain resident -> tower from the top
    assert ct.tower_supported(spec, coefs, 0)
    # probe the predicate's negative sides
    assert not ct.tower_supported(
        spec, {"a": coefs["a"], "b": (a,) + coefs["b"][1:],
               "lam": coefs["lam"]}, 0)  # variable bCoef
    spec_w = mg.make_level_spec(geom, 0, alpha=1.0, beta=-1.0, nsmooth=4,
                                smoother="pallas", num_mg=2)
    assert not ct.tower_supported(spec_w, coefs, 0)  # W-cycle
    # fewer than 3 remaining depths
    assert not ct.tower_supported(spec, coefs, spec.ndepths - 2)


def test_tower_vcycle_contracts_residual():
    """Solver-level sanity: the fused tower V-cycle still contracts the
    residual at the staged path's rate (~0.1-0.2 per cycle)."""
    geom, spec, a, rhs, u0, coefs = _setup()
    assert ct.tower_supported(spec, coefs, 0)
    u = jnp.zeros_like(rhs)
    r0 = float(jnp.max(jnp.abs(
        mg.residual_homog(spec, coefs, 0, u, rhs))))
    for _ in range(2):
        u = mg.mg_vcycle(spec, coefs, u, rhs)
    r2 = float(jnp.max(jnp.abs(
        mg.residual_homog(spec, coefs, 0, u, rhs))))
    assert r2 < 0.1 * r0


def test_tower_bf16_tier_tracks_f32():
    """smoother_precision=bfloat16 flows into the tower's pass tier
    (spec.smoother_compute); lock it to track the f32 tower at
    smoother-grade tolerance."""
    import dataclasses

    geom, spec, a, rhs, u0, coefs = _setup()
    spec_bf = dataclasses.replace(spec, smoother_compute="bfloat16")
    assert ct.tower_supported(spec_bf, coefs, 0)
    ref = mg.mg_vcycle(spec, coefs, u0, rhs)
    out = mg.mg_vcycle(spec_bf, coefs, u0, rhs)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=0.05 * scale)
