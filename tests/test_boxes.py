import pytest

from mg_ic_code_tpu.grid.boxes import Box


def test_shape_and_cells():
    b = Box((2, 4, 6), (9, 11, 13))
    assert b.shape == (8, 8, 8)
    assert b.num_cells == 512


def test_refine_coarsen_roundtrip():
    b = Box.from_shape((16, 8, 4), lo=(8, 0, 4))
    assert b.refine(2).coarsen(2) == b
    assert b.coarsenable(2)
    assert b.refine(2).shape == (32, 16, 8)
    assert b.refine(2).lo == (16, 0, 8)


def test_coarsen_floor():
    b = Box((1, 1, 1), (6, 6, 6))
    c = b.coarsen(2)
    assert c == Box((0, 0, 0), (3, 3, 3))
    assert not b.coarsenable(2)


def test_grow_intersect_contains():
    b = Box((0, 0, 0), (7, 7, 7))
    g = b.grow(2)
    assert g == Box((-2, -2, -2), (9, 9, 9))
    other = Box((5, 5, 5), (20, 20, 20))
    inter = b.intersect(other)
    assert inter == Box((5, 5, 5), (7, 7, 7))
    assert b.contains_box(inter)
    assert b.intersect(Box((8, 0, 0), (9, 7, 7))) is None


def test_local_slices():
    b = Box((4, 4, 4), (19, 19, 19))
    sub = Box((6, 4, 10), (9, 7, 19))
    sl = b.local_slices(sub)
    assert sl == (slice(2, 6), slice(0, 4), slice(6, 16))


def test_align_to():
    b = Box((3, 0, 9), (12, 7, 17))
    a = b.align_to(8)
    assert a == Box((0, 0, 8), (15, 7, 23))
    assert a.contains_box(b)


def test_invalid_box_raises():
    with pytest.raises(ValueError):
        Box((0, 0, 0), (-1, 3, 3))
