"""Native voxcore vs the numpy reference paths."""

import numpy as np
import pytest

from dust_tpu import native
from dust_tpu.vox.collector import collect_material_indices
from dust_tpu.voxtree import VoxTree
from dust_tpu.voxtree.tree import FlatTree


needs_native = pytest.mark.skipif(not native.available(), reason="no toolchain")


@needs_native
class TestVoxcore:
    def test_build_leaves_matches_numpy(self):
        rng = np.random.default_rng(12)
        coords = np.unique(rng.integers(0, 256, size=(5000, 3)), axis=0)
        idx = rng.integers(0, 255, size=len(coords)).astype(np.uint8)

        occ, bp, mats = native.build_leaves(coords, idx)
        mats_ref, bp_ref = collect_material_indices(coords, idx)
        assert np.array_equal(bp, bp_ref)
        assert np.array_equal(mats, mats_ref)

        flat_native = FlatTree.from_dense_pools(occ, bp)
        tree = VoxTree.from_voxels(coords)
        flat_ref = tree.flatten()
        assert np.array_equal(flat_native.leaf_origin, flat_ref.leaf_origin)
        assert np.array_equal(flat_native.mask_lo, flat_ref.mask_lo)
        assert np.array_equal(flat_native.mask_hi, flat_ref.mask_hi)
        assert np.array_equal(flat_native.leaf_grid, flat_ref.leaf_grid)

    def test_duplicates_last_write_wins(self):
        coords = np.array([[5, 5, 5], [5, 5, 5]])
        idx = np.array([1, 9], np.uint8)
        _, _, mats = native.build_leaves(coords, idx)
        assert list(mats) == [9]

    def test_out_of_range_rejected(self):
        with pytest.raises(ValueError):
            native.build_leaves(np.array([[256, 0, 0]]), np.array([1], np.uint8))

    def test_chebyshev_matches_numpy(self):
        from dust_tpu.render import scene as scn

        rng = np.random.default_rng(3)
        occ = np.zeros((64, 64, 64), bool)
        pts = rng.integers(0, 64, size=(40, 3))
        occ[pts[:, 0], pts[:, 1], pts[:, 2]] = True

        nat = native.chebyshev(occ, 63)
        # numpy reference: dilation loop (force the non-native branch)
        ref = np.full(occ.shape, 63, np.int32)
        ref[occ] = 0
        frontier = occ.copy()
        for d in range(1, 63):
            if frontier.all():
                break
            p = np.pad(frontier, 1, constant_values=False)
            grown = np.zeros_like(frontier)
            for dx in (0, 1, 2):
                for dy in (0, 1, 2):
                    for dz in (0, 1, 2):
                        grown |= p[dx:dx + 64, dy:dy + 64, dz:dz + 64]
            ref[grown & ~frontier] = d
            frontier = grown
        assert np.array_equal(nat, ref)
