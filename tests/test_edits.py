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
