"""Dynamic scene edits + refit (BASELINE config #4)."""

import numpy as np
import jax.numpy as jnp

from dust_tpu.ops.traverse import trace_scene
from dust_tpu.render.edits import SceneEditor
from dust_tpu.render.scene import build_device_scene
from dust_tpu.vox import procgen
from dust_tpu.vox.loader import load_vox_scene


def _ray_down_at(scene_dev, x, z, t_max=500.0):
    o = jnp.asarray([[x, 200.0, z]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    return trace_scene(scene_dev, o, d, 0.1, t_max)


class TestSceneEditor:
    def test_carve_and_build(self):
        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)

        # Baseline: a ray straight down through the teapot center hits.
        before = _ray_down_at(dev, 0.0, 0.0)
        assert bool(before.hit[0])

        # Build a tall pillar right under the ray, higher than the pot.
        geo = vox.geometries[0]
        size = geo.size
        cx, cz = size[0] // 2, size[2] // 2
        pillar = np.array([[cx, y, cz] for y in range(size[1])])
        ed.set_voxels(0, pillar, palette_idx=3)
        dev2 = ed.refit()
        after = _ray_down_at(dev2, 0.0, 0.0)
        assert bool(after.hit[0])
        assert float(after.t[0]) < float(before.t[0]) - 0.5  # hits higher up

        # Now carve the pillar AND the voxels below it: ray falls through
        # to deeper geometry or misses.
        ed.set_voxels(0, pillar, palette_idx=None)
        col = np.array([[cx, y, cz] for y in range(size[1])])
        ed.set_voxels(0, col, palette_idx=None)
        dev3 = ed.refit()
        res = _ray_down_at(dev3, 0.0, 0.0)
        assert (not bool(res.hit[0])) or float(res.t[0]) > float(after.t[0]) + 0.5

    def test_refit_updates_materials(self):
        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        n_before = len(vox.geometries[0].materials)
        ed.set_voxel(0, (0, 0, 0), palette_idx=7)
        dev2 = ed.refit()
        # The model's compacted material list grew by one (the device
        # pool length is capacity-padded and stays fixed under splices).
        assert len(vox.geometries[0].materials) == n_before + 1
        assert len(np.array(dev2.materials)) == len(np.array(dev.materials))

    def test_small_edit_splices_not_rebuilds(self):
        """A one-voxel edit must go through the O(model) splice path and
        produce a device scene identical to a from-scratch build."""
        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        ed.set_voxel(0, (1, 1, 1), palette_idx=5)
        dev2 = ed.refit()
        assert ed.last_refit_mode == "splice"

        fresh = build_device_scene(vox)
        for name in dev2._fields:
            a, b = getattr(dev2, name), getattr(fresh, name)
            if name == "inst_model":
                assert a == b
                continue
            if name in ("obj_to_world", "world_to_obj", "prev_obj_to_world"):
                continue  # refit preserves live transforms by design
            np.testing.assert_array_equal(
                np.array(a), np.array(b), err_msg=f"field {name} diverged")

    def test_large_growth_falls_back_to_rebuild(self):
        """An edit that outgrows the scene's leaf-row padding must force
        the full-rebuild path (and still render consistently)."""
        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        size = vox.geometries[0].size
        # Fill a large slab: far more leaves than the original lmax.
        xs, ys, zs = np.meshgrid(np.arange(0, size[0], 2), np.arange(4),
                                 np.arange(0, size[2], 2), indexing="ij")
        slab = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], 1)
        ed.set_voxels(0, slab, palette_idx=4)
        dev2 = ed.refit()
        assert ed.last_refit_mode == "rebuild"
        r = _ray_down_at(dev2, 0.0, 0.0)
        assert bool(r.hit[0])

    def test_noop_refit_is_identity(self):
        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        assert ed.refit() is dev

    def test_refit_refreshes_dense_gi_cache(self):
        """Splice-path refit with a FrameState must refresh the dense GI
        cache's per-row albedo (rows are keyed by leaf-row order, which
        the edit shifts) while keeping accumulated radiance."""
        from dust_tpu.config import RenderSettings
        from dust_tpu.ops import gi_cache as gilib
        from dust_tpu.render.pipeline import make_frame_state

        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        settings = RenderSettings(width=64, height=32, gi_cache="dense")
        state = make_frame_state(settings, dev)
        # Accumulate one radiance sample in every row.
        ones = jnp.ones((state.gi.table.shape[0], 3))
        state = state._replace(
            gi=gilib.dense_update(state.gi, ones,
                                  jnp.ones(ones.shape[0], bool)))

        ed.set_voxel(0, (0, 0, 0), palette_idx=7)  # new leaf at row 0
        dev2, state2 = ed.refit(state)
        assert ed.last_refit_mode == "splice"
        # Albedo words must match a freshly-built cache for the new scene...
        fresh = gilib.make_dense_gi_cache(dev2)
        np.testing.assert_array_equal(np.array(state2.gi.table[:, 2]),
                                      np.array(fresh.table[:, 2]))
        # ...and the accumulated radiance survives the splice path.
        assert float(jnp.max(state2.gi.count)) > 0.0

    def test_rebuild_refit_resizes_dense_gi_cache(self):
        from dust_tpu.config import RenderSettings
        from dust_tpu.ops import gi_cache as gilib
        from dust_tpu.render.pipeline import make_frame_state

        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        settings = RenderSettings(width=64, height=32, gi_cache="dense")
        state = make_frame_state(settings, dev)
        size = vox.geometries[0].size
        xs, ys, zs = np.meshgrid(np.arange(0, size[0], 2), np.arange(4),
                                 np.arange(0, size[2], 2), indexing="ij")
        slab = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], 1)
        ed.set_voxels(0, slab, palette_idx=4)
        dev2, state2 = ed.refit(state)
        assert ed.last_refit_mode == "rebuild"
        assert state2.gi.table.shape[0] == gilib.dense_rows(dev2)


class TestEditShadingConsistency:
    def test_edit_updates_all_derived_structures(self):
        """After refit, shading attributes (leaf_attr/material_rgba) and
        the Pallas tables must reflect the edit — a stale subset renders
        wrongly (regression test for the splice-path bug)."""
        import jax.numpy as jnp
        from dust_tpu.ops import shade
        from dust_tpu.ops.pallas_trace import trace_scene_pallas

        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)

        size = vox.geometries[0].size
        cx, cz = size[0] // 2, size[2] // 2
        pillar = np.array([[cx, y, cz] for y in range(size[1])])
        ed.set_voxels(0, pillar, palette_idx=8)  # WATER-colored pillar
        dev2 = ed.refit()

        o = jnp.asarray([[0.0, 200.0, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
        # Both backends hit the new pillar top...
        r_x = trace_scene(dev2, o, d, 0.1, 500.0)
        r_p = trace_scene_pallas(dev2, o, d, jnp.full(1, 0.1), jnp.full(1, 500.0))
        assert bool(r_x.hit[0]) and bool(r_p.hit[0])
        np.testing.assert_allclose(float(r_x.t[0]), float(r_p.t[0]), rtol=1e-3)
        # ...and shading resolves the edited voxel's palette color.
        g = shade.resolve_hits(dev2, r_x, o, d)
        assert int(g["palette_idx"][0]) == 8


class TestLeafPatchFastPath:
    """Leaf-granular fast path: same-leaf-set edits skip the splice and
    scatter only the touched leaves' rows (scene.apply_leaf_patch)."""

    def _find_occupied(self, vox):
        geo = vox.geometries[0]
        flat = geo.flat
        occ = flat.occupancy_u64()
        # a leaf with >= 2 voxels (so a clear keeps it alive)
        counts = np.unpackbits(occ.view(np.uint8).reshape(-1, 8),
                               axis=1).sum(axis=1)
        r = int(np.argmax(counts >= 2))
        origin = flat.leaf_origin[r]
        bits = [b for b in range(64) if (int(occ[r]) >> b) & 1]
        vx = [tuple(int(v) for v in origin + np.array(
            [(b >> 4) & 3, (b >> 2) & 3, b & 3])) for b in bits]
        return tuple(int(v) for v in origin), vx

    def _read_arrays(self, dev):
        return {k: np.array(getattr(dev, k)) for k in
                ("mask_lo", "mask_hi", "avg_albedo", "voxel_attr",
                 "pl_mlo", "pl_mhi", "cell_info", "pl_l1", "pl_l2w0",
                 "pl_l2w1", "pl_l2r0", "pl_l2r1", "leaf_origin")}

    def test_palette_change_uses_leaf_patch_and_matches_rebuild(self):
        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        _, vx = self._find_occupied(vox)
        ed.set_voxel(0, vx[0], palette_idx=9)
        dev2 = ed.refit()
        assert ed.last_refit_mode == "leaf"

        # Oracle: a from-scratch scene with the same final voxels.
        vox_ref = load_vox_scene(procgen.teapot_scene_bytes())
        ed_ref = SceneEditor(vox_ref, build_device_scene(vox_ref))
        ed_ref.set_voxel(0, vx[0], palette_idx=9)
        ed_ref._refit()  # force the splice path
        dev_ref = ed_ref.device
        a, b = self._read_arrays(dev2), self._read_arrays(dev_ref)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        # leaf_attr_fg albedo words match too (origin+albedo columns).
        np.testing.assert_array_equal(np.array(dev2.leaf_attr_fg),
                                      np.array(dev_ref.leaf_attr_fg))

    def test_add_and_clear_within_leaf(self):
        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        origin, vx = self._find_occupied(vox)
        # find a FREE bit in this leaf
        occupied = {v for v in vx}
        free = None
        for b in range(64):
            c = (origin[0] + ((b >> 4) & 3), origin[1] + ((b >> 2) & 3),
                 origin[2] + (b & 3))
            if c not in occupied:
                free = c
                break
        assert free is not None
        ed.set_voxel(0, free, palette_idx=4)      # add inside leaf
        ed.set_voxel(0, vx[0], palette_idx=None)  # clear another voxel
        dev2 = ed.refit()
        assert ed.last_refit_mode == "leaf"

        vox_ref = load_vox_scene(procgen.teapot_scene_bytes())
        ed_ref = SceneEditor(vox_ref, build_device_scene(vox_ref))
        ed_ref.set_voxel(0, free, palette_idx=4)
        ed_ref.set_voxel(0, vx[0], palette_idx=None)
        ed_ref._refit()
        a, b = self._read_arrays(dev2), self._read_arrays(ed_ref.device)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

        # A later out-of-leaf edit still works via the slow path and
        # recompacts the stale material pools from the editor's coords.
        ed.set_voxel(0, (0, 0, 0) if (0, 0, 0) != free else (4, 0, 0), 5)
        ed.refit()
        assert ed.last_refit_mode in ("splice", "rebuild")

    def test_new_leaf_falls_back(self):
        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        flat = vox.geometries[0].flat
        have = {tuple(int(v) for v in o) for o in flat.leaf_origin}
        target = next((ox, oy, oz) for ox in range(0, 256, 4)
                      for oy in range(0, 256, 4) for oz in range(0, 256, 4)
                      if (ox, oy, oz) not in have)
        ed.set_voxel(0, target, palette_idx=3)
        ed.refit()
        assert ed.last_refit_mode in ("splice", "rebuild")

    def test_leaf_patch_refreshes_dense_gi_albedo(self):
        from dust_tpu.ops import gi_cache as gilib
        from dust_tpu.config import RenderSettings
        from dust_tpu.render.pipeline import make_frame_state
        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        settings = RenderSettings(width=32, height=32, gi_cache="dense")
        state = make_frame_state(settings, dev)
        _, vx = self._find_occupied(vox)
        ed.set_voxel(0, vx[0], palette_idx=11)
        dev2, state2 = ed.refit(state)
        assert ed.last_refit_mode == "leaf"
        gi_alb = np.array(state2.gi.table[:, 2]).view(np.uint32)
        fresh = np.array(gilib.make_dense_gi_cache(dev2).table[:, 2]).view(
            np.uint32)
        np.testing.assert_array_equal(gi_alb, fresh)

    def test_refit_refreshes_hash_ws_albedo(self):
        """Hash mode with ws_refresh_slices > 1 keeps a persistent
        working set keyed like the dense cache — both the leaf-patch and
        splice refit paths must refresh its albedo words."""
        import dataclasses
        from dust_tpu.ops import gi_cache as gilib
        from dust_tpu.config import RenderSettings
        from dust_tpu.render.pipeline import make_frame_state
        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        settings = RenderSettings(width=32, height=32, gi_cache="hash")
        settings = dataclasses.replace(
            settings, spatial_hash=dataclasses.replace(
                settings.spatial_hash, ws_refresh_slices=2))
        state = make_frame_state(settings, dev)
        assert state.gi_ws is not None

        # Leaf-patch path (palette change inside an existing leaf).
        _, vx = self._find_occupied(vox)
        ed.set_voxel(0, vx[0], palette_idx=11)
        dev2, state2 = ed.refit(state)
        assert ed.last_refit_mode == "leaf"
        np.testing.assert_array_equal(
            np.array(state2.gi_ws.table[:, 2]),
            np.array(gilib.make_dense_gi_cache(dev2).table[:, 2]))

        # Splice path (new leaf shifts row order).
        ed2 = SceneEditor(vox, dev2)
        ed2.set_voxel(0, (0, 0, 0), palette_idx=7)
        dev3, state3 = ed2.refit(state2)
        assert ed2.last_refit_mode == "splice"
        np.testing.assert_array_equal(
            np.array(state3.gi_ws.table[:, 2]),
            np.array(gilib.make_dense_gi_cache(dev3).table[:, 2]))


class TestAsyncRefit:
    """refit_async/poll_refit — the reference's async BLAS staging
    (blas.rs:125): host rebuilds run off the render thread, the splice
    swaps at a frame boundary."""

    def test_async_splice_matches_sync(self):
        import time
        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        ed.set_voxel(0, (1, 1, 1), palette_idx=5)
        assert ed.refit_async() is None     # staged (new leaf -> splice)
        assert ed.refit_in_flight
        # "Render" while the rebuild runs; poll until it lands.
        deadline = time.time() + 60.0
        out = None
        while out is None and time.time() < deadline:
            out = ed.poll_refit()
            time.sleep(0.005)
        assert out is not None
        assert ed.last_refit_mode == "splice"
        assert not ed.refit_in_flight

        vox2 = load_vox_scene(procgen.teapot_scene_bytes())
        ed2 = SceneEditor(vox2, build_device_scene(vox2))
        ed2.set_voxel(0, (1, 1, 1), palette_idx=5)
        want = ed2.refit()
        for name in out._fields:
            a, b = getattr(out, name), getattr(want, name)
            if name == "inst_model":
                assert a == b
                continue
            np.testing.assert_array_equal(
                np.array(a), np.array(b), err_msg=f"field {name} diverged")

    def test_async_leaf_patch_applies_inline(self):
        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        c = ed._coords[0][0]
        ed.set_voxel(0, tuple(int(v) for v in c), palette_idx=9)
        out = ed.refit_async()
        assert out is not None              # leaf tier needs no staging
        assert ed.last_refit_mode == "leaf"
        assert not ed.refit_in_flight

    def test_edits_during_flight_stay_pending(self):
        vox = load_vox_scene(procgen.teapot_scene_bytes())
        dev = build_device_scene(vox)
        ed = SceneEditor(vox, dev)
        ed.set_voxel(0, (1, 1, 1), palette_idx=5)
        assert ed.refit_async() is None
        ed.set_voxel(0, (3, 1, 1), palette_idx=6)   # lands mid-flight
        out = ed.poll_refit(block=True)
        assert out is not None
        assert ed._pending[0]                       # still pending
        dev2 = ed.refit()                           # next refit picks it up
        ed2v = load_vox_scene(procgen.teapot_scene_bytes())
        ed2 = SceneEditor(ed2v, build_device_scene(ed2v))
        ed2.set_voxel(0, (1, 1, 1), palette_idx=5)
        ed2.set_voxel(0, (3, 1, 1), palette_idx=6)
        want = ed2.refit()
        np.testing.assert_array_equal(np.array(dev2.mask_lo),
                                      np.array(want.mask_lo))
        np.testing.assert_array_equal(np.array(dev2.avg_albedo),
                                      np.array(want.avg_albedo))
