"""Unified one-ring ghost filling for level arrays.

Composes the physical BC fills (ops/bc.py), periodic wrap, and coarse-fine
interpolation (ops/cf_interp.py) into the two fills the solver needs:

* `fill_ghosts` — the full inhomogeneous fill used when applying the
  composite operator at AMR level depth 0 (physical BC values + quadratic CF
  interpolation from the coarser level; reference: applyOpI + QuadCFInterp).
* `fill_ghosts_homogeneous` — the cheap fill used inside MG smoothing and
  residual/restriction at every MG depth (reference: levelGSRB's
  homogeneousCFInterp + homogeneous ParseBC,
  VariableCoeffPoissonOperator.cpp:290-330).

At MG depth d below an AMR level, the coarse-fine ghost formula generalises:
with rho = dxCrse / dx_depth (in fine-cell units the coarse parent centre
sits at -rho/2), the quadratic homogeneous weights are

    ghost = 2(rho-1)/(1+rho) * u0 + (1-rho)/(3+rho) * u1

(rho=2 gives the familiar 2/3, -1/5). Chombo's AMRPoissonOp keeps m_dxCrse
fixed while m_dx doubles with depth, which is exactly this rho dependence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mg_ic_code_tpu.ops import bc as _bc
from mg_ic_code_tpu.ops import cf_interp as _cf
from mg_ic_code_tpu.config import BC_DIRICHLET, BC_NEUMANN
from mg_ic_code_tpu.grid.geometry import HierarchyGeom

_I = slice(1, -1)

# face kind tags
PHYS_DIRICHLET = "dirichlet"
PHYS_NEUMANN = "neumann"
PERIODIC = "periodic"
CF = "cf"

FaceKinds = tuple[tuple[str, str], ...]  # [axis][side]


def face_kinds(geom: HierarchyGeom, level: int) -> FaceKinds:
    """Static per-face classification for an AMR level (reused at all MG
    depths below it, whose boxes coarsen but keep the same face types)."""
    out = []
    box, dom = geom.boxes[level], geom.domain_boxes[level]
    for axis in range(3):
        kinds = []
        for side in (0, 1):
            at_dom = (
                box.lo[axis] == dom.lo[axis]
                if side == 0
                else box.hi[axis] == dom.hi[axis]
            )
            if geom.bc.periodic:
                spans = (
                    box.lo[axis] == dom.lo[axis] and box.hi[axis] == dom.hi[axis]
                )
                kinds.append(PERIODIC if spans else CF)
            elif not at_dom:
                kinds.append(CF)
            else:
                flag = geom.bc.bc_lo[axis] if side == 0 else geom.bc.bc_hi[axis]
                if flag == BC_DIRICHLET:
                    kinds.append(PHYS_DIRICHLET)
                elif flag == BC_NEUMANN:
                    kinds.append(PHYS_NEUMANN)
                else:
                    raise ValueError(f"bogus bc flag {flag}")
        out.append(tuple(kinds))
    return tuple(out)


def cf_homog_weights(rho: float) -> tuple[float, float]:
    w0 = 2.0 * (rho - 1.0) / (1.0 + rho)
    w1 = (1.0 - rho) / (3.0 + rho)
    return w0, w1


def ghost_plane(kind: str, u0, u1, rho: float):
    """THE homogeneous one-ring ghost rule from the two interior planes —
    the single shared definition every smoother path (XLA, all Pallas
    kernel variants, the sharded halo assembly) imports; a formula fix
    must land here and nowhere else. Dirichlet/Neumann per
    SetBCs.cpp:49-131; CF = generalized-rho homogeneous quadratic."""
    if kind == PHYS_DIRICHLET:
        return -2.0 * u0 + (1.0 / 3.0) * u1
    if kind == PHYS_NEUMANN:
        return u0
    if kind == CF:
        w0, w1 = cf_homog_weights(rho)
        return w0 * u0 + w1 * u1
    raise AssertionError(kind)


def _set_face(u_gh, axis, side, values):
    idx = [_I, _I, _I]
    idx[axis] = 0 if side == 0 else u_gh.shape[axis] - 1
    return u_gh.at[tuple(idx)].set(values)


def _plane(u_gh, axis, side, depth):
    idx = [_I, _I, _I]
    idx[axis] = 1 + depth if side == 0 else u_gh.shape[axis] - 2 - depth
    return u_gh[tuple(idx)]


def fill_ghosts_homogeneous(
    u: jax.Array, kinds: FaceKinds, rho: float = 2.0
) -> jax.Array:
    """Pad `u` by one and fill every face with its homogeneous rule.

    Dirichlet: quadratic with face value 0; Neumann: zero gradient;
    periodic: wrap; CF: homogeneous quadratic with coarse term 0.
    """
    u_gh = _bc.pad1(u)
    for axis in range(3):
        if kinds[axis][0] == PERIODIC:
            u_gh = _bc.periodic_wrap_axis(u_gh, axis)
            continue
        for side in (0, 1):
            kind = kinds[axis][side]
            ghost = ghost_plane(
                kind, _plane(u_gh, axis, side, 0),
                _plane(u_gh, axis, side, 1), rho,
            )
            u_gh = _set_face(u_gh, axis, side, ghost)
    return u_gh


def fill_ghosts(
    u: jax.Array,
    geom: HierarchyGeom,
    level: int,
    coarse_u: jax.Array | None,
    homogeneous_phys: bool = False,
    dirichlet_shift: float = 0.0,
) -> jax.Array:
    """Full (depth-0) ghost fill: quadratic CF interpolation from the
    coarser level (None for homogeneous CF) plus physical BCs."""
    u_gh = _bc.pad1(u)
    u_gh = _cf.fill_cf_ghosts(u_gh, geom, level, coarse_u)
    u_gh = _bc.fill_physical_ghosts(
        u_gh, geom, level, homogeneous_phys, dirichlet_shift
    )
    return u_gh
