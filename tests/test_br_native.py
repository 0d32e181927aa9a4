"""Native Berger-Rigoutsos grid builder: correctness invariants."""

import numpy as np
import pytest

from mg_ic_code_tpu.grid import br_native as brn
from mg_ic_code_tpu.grid.boxes import Box


def cover_check(boxes, tags):
    """Every tag must be inside some box."""
    mask = np.zeros_like(tags, dtype=bool)
    for b in boxes:
        sl = tuple(slice(l, h + 1) for l, h in zip(b.lo, b.hi))
        mask[sl] = True
    assert bool(mask[tags.astype(bool)].all()), "tags not covered"
    return mask


def test_native_library_builds():
    assert brn.native_available(), "g++ build of native/br_mesh.cpp failed"


@pytest.mark.parametrize("use_native", [True, False])
def test_cluster_two_blobs(use_native, monkeypatch):
    if not use_native:
        monkeypatch.setattr(brn, "_lib", None)
        monkeypatch.setattr(brn, "_lib_tried", True)
    tags = np.zeros((32, 32, 32), dtype=bool)
    tags[4:10, 6:12, 8:14] = True  # blob 1
    tags[20:26, 18:24, 16:22] = True  # blob 2
    boxes = brn.cluster_tags(tags, fill_ratio=0.5, max_box_size=16,
                             block_factor=2)
    assert boxes
    cover_check(boxes, tags)
    for b in boxes:
        assert max(b.shape) <= 16
        for d in range(3):
            assert b.lo[d] % 2 == 0 and (b.hi[d] + 1) % 2 == 0
    # two separate blobs should produce at least two disjoint clusters
    assert len(boxes) >= 2


def test_cluster_efficiency():
    """BR clustering must beat the naive bounding box on sparse diagonal
    tags (the whole point of the algorithm)."""
    tags = np.zeros((64, 64, 64), dtype=bool)
    for t in range(0, 60, 4):
        tags[t:t + 2, t:t + 2, t:t + 2] = True
    boxes = brn.cluster_tags(tags, fill_ratio=0.5, max_box_size=32,
                             block_factor=2)
    cover_check(boxes, tags)
    total = sum(b.num_cells for b in boxes)
    bbox_cells = 62 ** 3
    assert total < 0.1 * bbox_cells, (
        f"clustering inefficient: {total} vs bbox {bbox_cells}"
    )


def test_cluster_offset_frame():
    tags = np.zeros((8, 8, 8), dtype=bool)
    tags[2:4, 2:4, 2:4] = True
    boxes = brn.cluster_tags(tags, 0.5, 8, 2, lo_offset=(16, 32, 64))
    assert all(b.lo[0] >= 16 and b.lo[1] >= 32 and b.lo[2] >= 64 for b in boxes)


def test_empty_tags():
    assert brn.cluster_tags(np.zeros((8, 8, 8), dtype=bool), 0.5, 8, 2) == []


@pytest.mark.parametrize("use_native", [True, False])
def test_load_balance(use_native, monkeypatch):
    if not use_native:
        monkeypatch.setattr(brn, "_lib", None)
        monkeypatch.setattr(brn, "_lib_tried", True)
    rng = np.random.default_rng(3)
    boxes = []
    for _ in range(40):
        lo = rng.integers(0, 56, 3)
        sz = rng.integers(4, 8, 3)
        boxes.append(Box(tuple(int(x) for x in lo),
                         tuple(int(l + s) for l, s in zip(lo, sz))))
    assign = brn.load_balance(boxes, 8)
    assert len(assign) == len(boxes)
    assert set(assign) <= set(range(8))
    loads = np.zeros(8)
    for b, r in zip(boxes, assign):
        loads[r] += b.num_cells
    # volume balance within 3x of the mean (boxes are coarse-grained)
    assert loads.max() <= 3.0 * loads.mean()
    assert loads.min() > 0
