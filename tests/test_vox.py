"""Tests for the .vox import pipeline (parser, collector, loader, geometry)."""

import numpy as np

from dust_tpu.vox import parser as vp
from dust_tpu.vox import procgen
from dust_tpu.vox.collector import collect_material_indices
from dust_tpu.vox.geometry import unpack_r10g10b10a2
from dust_tpu.vox.loader import load_vox_scene, to_transform
from dust_tpu.voxtree.tree import leaf_bit_index


def _tiny_file():
    voxels = np.array(
        [[0, 0, 0, 1], [1, 0, 0, 2], [0, 1, 0, 3], [5, 6, 7, 4]], dtype=np.uint8
    )
    model = vp.VoxModel(size=(8, 8, 8), voxels=voxels)
    return vp.VoxFile(models=[model], palette=vp.DEFAULT_PALETTE.copy(), scenes={})


class TestParser:
    def test_roundtrip(self):
        f = _tiny_file()
        data = vp.write_vox(f)
        g = vp.parse_vox(data)
        assert g.models[0].size == (8, 8, 8)
        assert np.array_equal(g.models[0].voxels, f.models[0].voxels)
        assert np.array_equal(g.palette, f.palette)

    def test_scene_graph_roundtrip(self):
        f = _tiny_file()
        rot = vp.rotation_from_byte(vp.rotation_to_byte(np.array(
            [[0, 1, 0], [-1, 0, 0], [0, 0, 1]], dtype=np.int32)))
        f.scenes = {
            0: vp.TransformNode(child=1, translation=(10, -4, 3), rotation=rot, name="n"),
            1: vp.GroupNode(children=[2]),
            2: vp.TransformNode(child=3),
            3: vp.ShapeNode(model_ids=[0]),
        }
        g = vp.parse_vox(vp.write_vox(f))
        t0 = g.scenes[0]
        assert isinstance(t0, vp.TransformNode)
        assert t0.translation == (10, -4, 3)
        assert np.array_equal(t0.rotation, rot)
        assert isinstance(g.scenes[1], vp.GroupNode) and g.scenes[1].children == [2]
        assert isinstance(g.scenes[3], vp.ShapeNode) and g.scenes[3].model_ids == [0]

    def test_rotation_byte_all(self):
        # Every signed permutation must round-trip through the _r byte.
        import itertools

        for perm in itertools.permutations(range(3)):
            for signs in itertools.product((1, -1), repeat=3):
                m = np.zeros((3, 3), dtype=np.int32)
                for row, (col, s) in enumerate(zip(perm, signs)):
                    m[row, col] = s
                assert np.array_equal(vp.rotation_from_byte(vp.rotation_to_byte(m)), m)

    def test_bad_magic(self):
        try:
            vp.parse_vox(b"NOPE" + b"\x00" * 100)
            assert False
        except ValueError as e:
            assert "magic" in str(e)


class TestCollector:
    def test_compaction_order_matches_popcount_lookup(self):
        # The shader looks up materials[material_ptr + popcount(mask & (1<<bit)-1)]
        # (hit.rchit:59-71). Verify the collector produces that layout.
        rng = np.random.default_rng(7)
        coords = np.unique(rng.integers(0, 32, size=(300, 3)), axis=0)
        idx = rng.integers(1, 255, size=len(coords)).astype(np.uint8)
        materials, block_ptr = collect_material_indices(coords, idx)
        assert len(materials) == len(coords)

        # Reconstruct each voxel's palette index through the popcount path.
        occ = {}
        for (x, y, z) in coords:
            b = (x >> 2, y >> 2, z >> 2)
            occ.setdefault(b, 0)
            occ[b] |= 1 << int(leaf_bit_index(x, y, z))
        for (x, y, z), want in zip(coords[:100], idx[:100]):
            b = (x >> 2, y >> 2, z >> 2)
            lin = b[0] + b[1] * 64 + b[2] * 64 * 64
            bit = int(leaf_bit_index(x, y, z))
            offset = int(occ[b] & ((1 << bit) - 1)).bit_count()
            assert materials[block_ptr[lin] + offset] == want

    def test_duplicate_last_write_wins(self):
        coords = np.array([[1, 1, 1], [1, 1, 1]])
        idx = np.array([5, 9], dtype=np.uint8)
        materials, _ = collect_material_indices(coords, idx)
        assert list(materials) == [9]


class TestLoader:
    def test_identity_transform_centering(self):
        # Even-size model, no rotation: affine = translate(-size_world/2).
        a = to_transform((0, 0, 0), np.eye(3, dtype=np.int32), (8, 8, 8))
        p = a @ np.array([0, 0, 0, 1.0])
        np.testing.assert_allclose(p[:3], [-4, -4, -4])

    def test_odd_size_offset(self):
        a = to_transform((0, 0, 0), np.eye(3, dtype=np.int32), (7, 7, 7))
        p = a @ np.array([0, 0, 0, 1.0])
        # center = (3.5, 3.5, 3.5); offset = (+.5, +.5, -.5)
        np.testing.assert_allclose(p[:3], [-3.0, -3.0, -4.0])

    def test_vox_to_engine_swizzle(self):
        # A voxel at vox (x=1, y=2, z=3) in an 8^3 model must land at
        # engine coords (1, 3, 8-1-2=5) (loader.rs:249-254).
        f = _tiny_file()
        f.models[0].voxels = np.array([[1, 2, 3, 1]], dtype=np.uint8)
        scene = load_vox_scene(vp.write_vox(f))
        geo = scene.geometries[0]
        assert geo.flat.num_leaves == 1
        # leaf origin is the block-aligned base; voxel bit must be set at (1,3,5)
        assert tuple(geo.flat.leaf_origin[0]) == (0, 0, 4)
        bit = leaf_bit_index(1, 3, 5)
        mask = int(geo.flat.mask_lo[0]) | (int(geo.flat.mask_hi[0]) << 32)
        assert (mask >> int(bit)) & 1

    def test_procgen_castle_loads(self):
        scene = load_vox_scene(procgen.castle_scene_bytes())
        assert len(scene.instances) == 1
        geo = scene.geometries[0]
        assert geo.num_blocks > 5000  # a real scene, not a toy
        assert geo.materials.dtype == np.uint8
        # material array length == total occupied voxels
        occ = geo.flat.occupancy_u64()
        total = sum(int(m).bit_count() for m in occ)
        assert len(geo.materials) == total
        # average albedo decodes to plausible sRGB values
        rgba = unpack_r10g10b10a2(geo.avg_albedo)
        assert rgba.min() >= 0 and rgba.max() <= 1
        assert (rgba[:, 3] > 0.5).all()  # opaque

    def test_procgen_teapot_loads(self):
        scene = load_vox_scene(procgen.teapot_scene_bytes())
        geo = scene.geometries[0]
        assert 50 < geo.num_blocks < 4096

    def test_instance_transform_places_model_at_origin_center(self):
        scene = load_vox_scene(procgen.teapot_scene_bytes())
        inst = scene.instances[0]
        size = scene.geometries[0].size
        # Model center maps to the scene-graph translation (0 here).
        center_model = np.array([size[0] / 2, size[1] / 2, size[2] / 2, 1.0])
        p = inst.transform @ center_model
        np.testing.assert_allclose(p[:3], [0, 0, 0], atol=1.0)
