"""Generic hierarchy + unbounded root (voxtree/generic.py).

Reference parity targets: the ``hierarchy!`` macro's arbitrary level
lists (node/mod.rs:113-127) and RootNode's infinite hashmap
(root.rs:28). The (4,2,2) instantiation must agree with the specialized
production ``VoxTree``; unbounded worlds render through the standard
instanced pipeline.
"""

import numpy as np
import pytest

from dust_tpu.voxtree.generic import (GenericTree, UnboundedRoot, TILE,
                                      tile_of, local_of)
from dust_tpu.voxtree.tree import VoxTree


class TestGenericTree:
    def test_tri_state_random_vs_dict(self):
        """Random set/clear/overwrite against a dict model, on a
        non-(4,2,2) hierarchy (extent 2^(3+2+3) = 256... (2,2,2)=64)."""
        for levels in ((2, 2, 2), (3, 2, 3), (4, 2, 2), (1, 1, 1, 1)):
            t = GenericTree(levels)
            n = t.extent
            rng = np.random.default_rng(hash(levels) & 0xFFFF)
            model = {}
            for _ in range(400):
                c = tuple(rng.integers(0, n, 3).tolist())
                v = [None, True, False][int(rng.integers(0, 3))]
                t.set_value(c, v)
                if v is None:
                    model.pop(c, None)
                else:
                    model[c] = v
            for c, v in model.items():
                assert t.get_value(c) == v, (levels, c)
            for _ in range(100):
                c = tuple(rng.integers(0, n, 3).tolist())
                assert t.get_value(c) == model.get(c), (levels, c)

    def test_422_matches_specialized_voxtree(self):
        """The (4,2,2) instantiation is the production VoxTree."""
        g = GenericTree((4, 2, 2))
        s = VoxTree()
        rng = np.random.default_rng(11)
        for _ in range(500):
            c = tuple(rng.integers(0, 256, 3).tolist())
            v = [None, True, False][int(rng.integers(0, 3))]
            g.set_value(c, v)
            s.set_value(c, v)
        for _ in range(300):
            c = tuple(rng.integers(0, 256, 3).tolist())
            assert g.get_value(c) == s.get_value(c), c

    def test_leaf_iteration_order_matches(self):
        """iter_leaf yields the same origins in the same (hierarchy)
        order as the specialized tree."""
        g = GenericTree((4, 2, 2))
        s = VoxTree()
        rng = np.random.default_rng(5)
        pts = rng.integers(0, 256, size=(300, 3))
        for p in pts:
            g.set_value(tuple(p.tolist()), True)
            s.set_value(tuple(p.tolist()), True)
        go = [tuple(o.tolist()) for o, _occ, _act in g.iter_leaf()]
        so = [tuple(int(v) for v in o) for o, _row in s.iter_leaf()]
        assert go == so

    def test_extent_bounds(self):
        t = GenericTree((2, 2))
        assert t.extent == 16
        with pytest.raises(IndexError):
            t.set_value((16, 0, 0), True)
        with pytest.raises(ValueError):
            GenericTree((4,))


class TestUnboundedRoot:
    def test_signed_world_coords(self):
        r = UnboundedRoot()
        pts = [(-1, 0, 0), (-257, 5, 3), (255, 255, 255), (256, 0, 0),
               (1000, -1000, 12)]
        for i, p in enumerate(pts):
            r.set_voxel(p, i + 1)
        for i, p in enumerate(pts):
            assert r.get_voxel(p) == i + 1
        assert r.get_voxel((0, 0, 0)) is None
        # tiles span negative and positive space
        assert tile_of((-1, 0, 0)) == (-1, 0, 0)
        assert local_of((-1, 0, 0)) == (255, 0, 0)
        assert r.num_tiles == len({tile_of(p) for p in pts})

    def test_empty_tile_freed(self):
        r = UnboundedRoot()
        r.set_voxel((10, 10, 10), 3)
        assert r.num_tiles == 1
        r.set_voxel((10, 10, 10), None)
        assert r.num_tiles == 0

    def test_unbounded_world_renders(self):
        """A world spanning two tiles (one at negative coordinates)
        renders through the standard pipeline: rays hit BOTH tiles at
        their world positions — the scene graph plays the infinite
        root's role."""
        import jax.numpy as jnp
        from dust_tpu.ops.traverse import trace_scene
        from dust_tpu.render.scene import build_device_scene

        r = UnboundedRoot()
        # ground slabs in two different tiles (8x8 footprint each)
        r.set_box((4, 0, 4), (12, 2, 12), 7)          # tile (0,0,0)
        r.set_box((-200, 0, 30), (-192, 2, 38), 9)    # tile (-1,0,0)
        assert r.num_tiles == 2

        palette = np.zeros((256, 4), np.uint8)
        palette[7] = (255, 40, 40, 255)
        palette[9] = (40, 255, 40, 255)
        scene = r.to_scene(palette)
        dev = build_device_scene(scene)
        assert dev.num_instances == 2

        def down_at(x, z):
            o = jnp.asarray([[x, 50.0, z]], jnp.float32)
            d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
            return trace_scene(dev, o, d, 0.1, 1000.0, mode="precise")

        a = down_at(8.0, 8.0)
        b = down_at(-196.0, 34.0)
        miss = down_at(500.0, 500.0)
        assert bool(a.hit[0]) and bool(b.hit[0]) and not bool(miss.hit[0])
        # hit heights: slab tops at y=2 -> t = 48
        np.testing.assert_allclose(float(a.t[0]), 48.0, atol=1e-2)
        np.testing.assert_allclose(float(b.t[0]), 48.0, atol=1e-2)
