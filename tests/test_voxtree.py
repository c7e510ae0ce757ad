"""Tests for the sparse voxel tree layer.

These mirror the reference's executable specification: the vdb doc tests
(``crates/vdb/src/bitmask.rs:83-96``, ``pool.rs:26-42``,
``tree.rs:15-25,91-103``) and the accessor unit test
(``accessor.rs:147-198``).
"""

import numpy as np
import pytest

from dust_tpu.voxtree import Accessor, BitMask, Pool, VoxTree
from dust_tpu.voxtree.accessor import lowest_common_ancestor_level
from dust_tpu.voxtree.tree import LEAF_DTYPE, leaf_bit_index


class TestBitMask:
    def test_set_get_count(self):
        m = BitMask(64)
        assert m.is_empty()
        m.set(0, True)
        m.set(63, True)
        m.set(17, True)
        assert m.get(0) and m.get(63) and m.get(17)
        assert not m.get(1)
        assert m.count_ones() == 3
        m.set(17, False)
        assert m.count_ones() == 2

    def test_iter_set_bits_order(self):
        # bitmask.rs doc test: iterator yields indices ascending.
        m = BitMask(128)
        for i in (100, 3, 64, 3, 127):
            m.set(i, True)
        assert list(m.iter_set_bits()) == [3, 64, 100, 127]

    def test_u64_roundtrip(self):
        m = BitMask(64)
        m.set_u64(0xDEADBEEFCAFEBABE)
        assert m.as_u64() == 0xDEADBEEFCAFEBABE


class TestPool:
    def test_alloc_free_reuse_order(self):
        # pool.rs:26-42 doc test: bump alloc 0,1,2,3; LIFO reuse after free.
        pool = Pool(np.dtype(np.uint64), chunk_size_log2=1)
        assert [pool.alloc() for _ in range(4)] == [0, 1, 2, 3]
        pool.free(1)
        pool.free(2)
        assert pool.alloc() == 2  # most recently freed first
        assert pool.alloc() == 1
        assert pool.alloc() == 4

    def test_alloc_zeroes_reused_slot(self):
        pool = Pool(LEAF_DTYPE)
        i = pool.alloc()
        pool.data[i]["occupancy"] = np.uint64(0xFF)
        pool.free(i)
        j = pool.alloc()
        assert j == i
        assert int(pool.data[j]["occupancy"]) == 0

    def test_contiguous(self):
        pool = Pool(np.dtype(np.uint32))
        base = pool.alloc_contiguous(100)
        assert base == 0 and pool.top == 100 and len(pool) == 100


class TestVoxTree:
    def test_tristate_set_get(self):
        # tree.rs:15-25 doc test semantics.
        t = VoxTree()
        assert t.get_value((3, 3, 3)) is None
        t.set_value((3, 3, 3), True)
        assert t.get_value((3, 3, 3)) is True
        t.set_value((3, 3, 3), False)  # occupied but inactive
        assert t.get_value((3, 3, 3)) is False
        t.set_value((3, 3, 3), None)
        assert t.get_value((3, 3, 3)) is None

    def test_leaf_iteration_order(self):
        # tree.rs:91-103: leaves iterate in hierarchical x-major order.
        t = VoxTree()
        pts = [(255, 255, 255), (0, 0, 0), (0, 0, 255), (128, 3, 64)]
        for p in pts:
            t.set_value(p, True)
        origins = [o for o, _ in t.iter_leaf()]
        assert origins == [(0, 0, 0), (0, 0, 252), (128, 0, 64), (252, 252, 252)]

    def test_bit_index_matches_glsl_encode_index(self):
        # hit.rint:30-32: (x<<4)|(y<<2)|z
        assert leaf_bit_index(3, 2, 1) == (3 << 4) | (2 << 2) | 1
        assert leaf_bit_index(7, 6, 5) == (3 << 4) | (2 << 2) | 1  # wraps &3

    def test_bulk_build_equals_pointwise(self):
        rng = np.random.default_rng(0)
        coords = rng.integers(0, 256, size=(2000, 3))
        bulk = VoxTree.from_voxels(coords)
        point = VoxTree()
        for c in coords:
            point.set_value(c, True)
        got = [(o, int(l["occupancy"]), int(l["active"])) for o, l in bulk.iter_leaf()]
        want = [(o, int(l["occupancy"]), int(l["active"])) for o, l in point.iter_leaf()]
        assert got == want

    def test_flatten_roundtrip(self):
        rng = np.random.default_rng(1)
        coords = np.unique(rng.integers(0, 256, size=(500, 3)), axis=0)
        t = VoxTree.from_voxels(coords)
        flat = t.flatten()
        assert flat.num_leaves == sum(1 for _ in t.iter_leaf())
        # Every input voxel is occupied in the flat masks.
        for x, y, z in coords[:50]:
            row = flat.leaf_grid[x >> 2, y >> 2, z >> 2]
            assert row >= 0
            bit = int(leaf_bit_index(x, y, z))
            mask = int(flat.mask_lo[row]) | (int(flat.mask_hi[row]) << 32)
            assert (mask >> bit) & 1
        # Grid rows point back at the right origins.
        b = flat.leaf_origin >> 2
        assert np.array_equal(
            flat.leaf_grid[b[:, 0], b[:, 1], b[:, 2]], np.arange(flat.num_leaves)
        )

    def test_cleared_leaf_drops_from_flat(self):
        t = VoxTree()
        t.set_value((0, 0, 0), True)
        t.set_value((100, 100, 100), True)
        t.set_value((0, 0, 0), None)
        flat = t.flatten()
        assert flat.num_leaves == 1
        assert tuple(flat.leaf_origin[0]) == (100, 100, 100 & ~3)


class TestAccessor:
    def test_lca_levels(self):
        # accessor.rs:15-30 semantics for hierarchy (4,2,2).
        assert lowest_common_ancestor_level((0, 0, 0), (3, 3, 3)) == 0
        assert lowest_common_ancestor_level((0, 0, 0), (4, 0, 0)) == 1
        assert lowest_common_ancestor_level((0, 0, 0), (15, 15, 15)) == 1
        assert lowest_common_ancestor_level((0, 0, 0), (16, 0, 0)) == 2
        assert lowest_common_ancestor_level((0, 0, 0), (255, 0, 0)) == 2

    def test_randomized_roundtrip(self):
        # accessor.rs:147-198: randomized 100-point set/get through the
        # cached accessor agrees with direct tree access.
        rng = np.random.default_rng(42)
        t = VoxTree()
        acc = Accessor(t)
        pts = rng.integers(0, 256, size=(100, 3))
        vals = rng.integers(0, 3, size=100)  # 0=None,1=False,2=True
        for p, v in zip(pts, vals):
            acc.set(tuple(p), [None, False, True][v])
        acc2 = Accessor(t)
        for p, v in zip(pts, vals):
            expect = [None, False, True][v]
            assert t.get_value(tuple(p)) == expect
            assert acc2.get(tuple(p)) == expect

    def test_set_none_on_missing_is_noop(self):
        t = VoxTree()
        Accessor(t).set((8, 8, 8), None)
        assert len(t.leaf_pool) == 0 and len(t.internal_pool) == 0


@pytest.mark.parametrize("n", [0, 1])
def test_empty_and_tiny_trees_flatten(n):
    coords = np.zeros((n, 3), dtype=np.int64)
    flat = VoxTree.from_voxels(coords).flatten()
    assert flat.num_leaves == n
    assert flat.leaf_grid.shape == (64, 64, 64)
