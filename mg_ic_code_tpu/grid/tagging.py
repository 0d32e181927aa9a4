"""AMR hierarchy generation from the regrid condition.

TPU-native replacement for the reference's set_grids pipeline
(SetGrids.cpp:31-207): initialise temp data per level, evaluate the regrid
condition, tag cells with |condition| >= refine_threshold * max|condition|,
grow tags by 2, and build the next finer level from them — iterating until
max_level. Where Chombo runs Berger-Rigoutsos + LoadBalance to carve tag
sets into many small boxes for MPI ranks, the TPU design takes the tags'
BOUNDING BOX as the (single, dense) child level: device-mesh sharding of
that dense box replaces box-granular rank placement.

Nesting: each child, coarsened to its parent's index space, is kept inside
the parent shrunk by the nesting radius (2, SetGrids.cpp:64) on faces away
from the domain boundary, and block-aligned so every level box stays
2-coarsenable (block_factor granularity, as domainSplit enforces).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mg_ic_code_tpu.config import SolverConfig
from mg_ic_code_tpu.grid.boxes import Box
from mg_ic_code_tpu.grid.geometry import HierarchyGeom, geom_from_config
from mg_ic_code_tpu.physics import level_data as ld

NESTING_RADIUS = 2  # SetGrids.cpp:64
TAGS_GROW = 2  # SetGrids.cpp:109


def _tag_bounding_box(cond: np.ndarray, level_box: Box, thresh: float) -> Box | None:
    """Bounding box (in the level's global index space) of cells with
    |cond| >= thresh (set_tag_cells, SetGrids.cpp:172-207)."""
    mask = np.abs(cond) >= thresh
    if not mask.any():
        return None
    lo, hi = [], []
    for axis in range(3):
        other = tuple(a for a in range(3) if a != axis)
        line = mask.any(axis=other)
        idx = np.nonzero(line)[0]
        lo.append(int(idx[0]) + level_box.lo[axis])
        hi.append(int(idx[-1]) + level_box.lo[axis])
    return Box(tuple(lo), tuple(hi))


def _shrink_for_nesting(parent: Box, domain: Box, radius: int) -> Box:
    """Parent region a child may occupy: shrink by `radius` on faces not on
    the domain boundary."""
    lo = list(parent.lo)
    hi = list(parent.hi)
    for axis in range(3):
        if parent.lo[axis] != domain.lo[axis]:
            lo[axis] += radius
        if parent.hi[axis] != domain.hi[axis]:
            hi[axis] -= radius
    if any(h < l for l, h in zip(lo, hi)):
        return parent  # degenerate; fall back to the parent itself
    return Box(tuple(lo), tuple(hi))


def _align_inward(b: Box, block: int, bounds: Box) -> Box:
    """Block-align by shrinking (keeps b inside `bounds`); if a dimension
    would vanish, align outward and clip instead."""
    lo, hi = [], []
    for axis in range(3):
        l = -(-b.lo[axis] // block) * block  # ceil to multiple
        h = (b.hi[axis] + 1) // block * block - 1  # floor
        if h < l:  # too thin: align outward, then clip to bounds
            l = b.lo[axis] // block * block
            h = -(-(b.hi[axis] + 1) // block) * block - 1
            l = max(l, bounds.lo[axis])
            h = min(h, bounds.hi[axis])
        lo.append(l)
        hi.append(h)
    return Box(tuple(lo), tuple(hi))


def _regrid_condition_np(geom: HierarchyGeom, cfg: SolverConfig, level: int):
    """Regrid condition on freshly-initialised data (psi = 1), as set_grids
    evaluates it on temp level data (SetGrids.cpp:86-96)."""
    fields = ld.problem_fields(geom, cfg, level)
    psi = jnp.ones(geom.shape(level))
    return np.asarray(ld.regrid_condition(psi, fields, cfg))


def generate_hierarchy(cfg: SolverConfig) -> HierarchyGeom:
    """Build the level boxes by iterative tagging (set_grids loop,
    SetGrids.cpp:70-138): each pass re-derives every level above the base
    from the current hierarchy's regrid condition, until max_level is
    reached or no cells are tagged."""
    dom0 = Box.from_shape(cfg.n_cells)
    boxes: list[Box] = [dom0]
    top = 0
    max_level = cfg.max_level
    # child boxes must stay 2-coarsenable after refinement; aligning the
    # coarse-space bounding box to block_factor/2 guarantees block_factor
    # granularity on the child
    block_c = max(cfg.block_factor // 2, 1)

    while top < max_level:
        geom = geom_from_config(cfg, tuple(boxes))
        new_boxes = [dom0]
        grew = False
        for l in range(0, min(top, max_level - 1) + 1):
            cond = _regrid_condition_np(geom, cfg, l)
            thresh = cfg.refine_threshold * float(np.max(np.abs(cond)))
            bbox = _tag_bounding_box(cond, geom.boxes[l], thresh)
            if bbox is None:
                break
            parent = new_boxes[l]
            dom_l = geom.domain_boxes[l]
            allowed = _shrink_for_nesting(parent, dom_l, NESTING_RADIUS)
            b = bbox.grow(TAGS_GROW).intersect(allowed)
            if b is None:
                break
            b = _align_inward(b, block_c, allowed)
            child = b.refine(cfg.ref_ratio)
            new_boxes.append(child)
            if l + 1 > top:
                grew = True
        boxes = new_boxes
        if not grew:
            break
        top = len(boxes) - 1

    return geom_from_config(cfg, tuple(boxes))
