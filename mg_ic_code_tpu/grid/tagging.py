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

# dense-level memory accounting: warn when a level's dense bounding box
# holds more than this multiple of the tag-union cells it actually needs
# (the price of the one-dense-box-per-level design vs Chombo's
# union-of-boxes layouts, SetGrids.cpp:54-68)
WASTE_WARN_RATIO = 4.0


def _tag_boxes(
    cond: np.ndarray, level_box: Box, thresh: float, cfg: SolverConfig
) -> list[Box]:
    """Cluster the tag set {|cond| >= thresh} into boxes with the native
    Berger-Rigoutsos builder (set_tag_cells + BRMeshRefine.regrid,
    SetGrids.cpp:108-126); boxes come back in the level's global frame."""
    mask = np.abs(cond) >= thresh
    if not mask.any():
        return []
    from mg_ic_code_tpu.grid import br_native as brn

    return brn.cluster_tags(
        mask,
        fill_ratio=cfg.fill_ratio,
        max_box_size=cfg.max_grid_size,
        block_factor=max(cfg.block_factor // 2, 2),
        lo_offset=level_box.lo,
    )


def _union_bounding_box(boxes: list[Box]) -> Box:
    lo = tuple(min(b.lo[d] for b in boxes) for d in range(3))
    hi = tuple(max(b.hi[d] for b in boxes) for d in range(3))
    return Box(lo, hi)


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
        # a silent fall-back to the unshrunk parent would let a child sit
        # flush against a non-domain parent face, and the CF interpolation
        # would then index outside the coarse array (ADVICE r1)
        raise ValueError(
            f"parent box {parent} too small for proper-nesting radius "
            f"{radius}: refine the base grid or lower max_level"
        )
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
    # per-level (dense_cells, tag_union_cells) in the child's fine frame,
    # recorded on the pass that built the level (memory accounting for the
    # dense-level design)
    waste: dict[int, tuple[int, int]] = {}

    while top < max_level:
        geom = geom_from_config(cfg, tuple(boxes))
        new_boxes = [dom0]
        grew = False
        for l in range(0, min(top, max_level - 1) + 1):
            cond = _regrid_condition_np(geom, cfg, l)
            thresh = cfg.refine_threshold * float(np.max(np.abs(cond)))
            tag_boxes = _tag_boxes(cond, geom.boxes[l], thresh, cfg)
            if not tag_boxes:
                break
            # dense-level design: the child level is ONE box covering the
            # clustered tag boxes (sharding over the device mesh replaces
            # per-box rank placement; the decomposition is still exposed via
            # tag_box_decomposition for diagnostics/placement policies)
            bbox = _union_bounding_box(tag_boxes)
            parent = new_boxes[l]
            dom_l = geom.domain_boxes[l]
            allowed = _shrink_for_nesting(parent, dom_l, NESTING_RADIUS)
            b = bbox.grow(TAGS_GROW).intersect(allowed)
            if b is None:
                break
            b = _align_inward(b, block_c, allowed)
            child = b.refine(cfg.ref_ratio)
            new_boxes.append(child)
            r3 = cfg.ref_ratio ** 3
            waste[l + 1] = (child.num_cells,
                            sum(tb.num_cells for tb in tag_boxes) * r3)
            if l + 1 > top:
                grew = True
        boxes = new_boxes
        if not grew:
            break
        top = len(boxes) - 1

    _report_memory_waste(boxes, waste)
    return geom_from_config(cfg, tuple(boxes))


def _report_memory_waste(
    boxes: list[Box], waste: dict[int, tuple[int, int]]
) -> None:
    """Dense-level memory accounting (VERDICT r1 next-step #7): log each
    level's bounding-box vs tag-union cell count, and WARN when the dense
    box wastes more than WASTE_WARN_RATIO x the union — the signature of a
    config with well-separated refined regions, where Chombo's
    union-of-boxes layout (SetGrids.cpp:54-68) would be materially
    leaner than one dense array per level."""
    from mg_ic_code_tpu.io.logging import pout

    for lvl, (dense, union) in sorted(waste.items()):
        if lvl >= len(boxes):
            continue  # level was re-derived away on a later pass
        ratio = dense / max(union, 1)
        msg = (
            f"level {lvl}: dense box {boxes[lvl].shape} = {dense:,} cells; "
            f"tag union {union:,} cells ({ratio:.2f}x)"
        )
        if ratio > WASTE_WARN_RATIO:
            pout(
                "MEMORY WARNING: " + msg + " — well-separated refined "
                "regions; consider splitting this configuration or "
                "tightening refine_threshold", level=0,
            )
        else:
            pout(msg, level=3)


def memory_report(cfg: SolverConfig, geom: HierarchyGeom) -> list[dict]:
    """Per-level memory accounting for an existing hierarchy: dense
    bounding-box cells vs Berger-Rigoutsos tag-union cells (both in the
    fine level's frame), with the waste ratio. Level 0 is always dense by
    construction (the base domain)."""
    decomp = tag_box_decomposition(cfg, geom)
    out = []
    r3 = cfg.ref_ratio ** 3
    for l in range(1, geom.num_levels):
        dense = geom.boxes[l].num_cells
        union = sum(b.num_cells for b in decomp[l - 1]["boxes"]) * r3
        out.append({
            "level": l,
            "dense_cells": dense,
            "tag_union_cells": union,
            "waste_ratio": dense / max(union, 1),
        })
    return out


def tag_box_decomposition(
    cfg: SolverConfig, geom: HierarchyGeom, n_shards: int = 1
) -> list[dict]:
    """Diagnostic view of the Chombo-style decomposition: per level, the
    Berger-Rigoutsos cluster boxes of the regrid tags plus a Morton
    load-balance assignment over `n_shards` — what the reference's
    BRMeshRefine + LoadBalance would have produced (SetGrids.cpp:108-126).
    """
    from mg_ic_code_tpu.grid import br_native as brn

    out = []
    for l in range(min(geom.num_levels, cfg.max_level + 1)):
        cond = _regrid_condition_np(geom, cfg, l)
        thresh = cfg.refine_threshold * float(np.max(np.abs(cond)))
        boxes = _tag_boxes(cond, geom.boxes[l], thresh, cfg)
        assign = brn.load_balance(boxes, n_shards) if boxes else []
        out.append({"level": l, "threshold": thresh, "boxes": boxes,
                    "shard": assign})
    return out
