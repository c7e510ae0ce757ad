"""Multi-instance scenes: closest-hit merge, transforms, motion vectors."""

import numpy as np
import jax.numpy as jnp

from dust_tpu.ops import camera as cam
from dust_tpu.ops import shade
from dust_tpu.ops.traverse import trace_scene
from dust_tpu.render.scene import build_device_scene
from dust_tpu.vox import procgen
from dust_tpu.vox.loader import VoxInstance, load_vox_scene


def _two_teapots():
    scene = load_vox_scene(procgen.teapot_scene_bytes())
    inst = scene.instances[0]
    t2 = inst.transform.copy()
    t2[:3, 3] += np.asarray([100.0, 0.0, 0.0], np.float32)
    scene.instances.append(VoxInstance(inst.model_id, t2, name="second"))
    return scene


class TestMultiInstance:
    def test_closest_hit_picks_nearer_instance(self):
        dev = build_device_scene(_two_teapots())
        # Ray along +x from far -x: hits instance 0 (at origin) first.
        o = jnp.asarray([[-200.0, 0.0, 0.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        res = trace_scene(dev, o, d, 0.1, 1000.0)
        assert bool(res.hit[0]) and int(res.inst[0]) == 0
        # From far +x: hits the translated copy (instance 1) first.
        o2 = jnp.asarray([[300.0, 0.0, 0.0]])
        d2 = jnp.asarray([[-1.0, 0.0, 0.0]])
        res2 = trace_scene(dev, o2, d2, 0.1, 1000.0)
        assert bool(res2.hit[0]) and int(res2.inst[0]) == 1

    def test_motion_vectors_on_moving_instance(self):
        dev = build_device_scene(_two_teapots())
        o2w = np.array(dev.obj_to_world)
        o2w[1, :3, 3] += [0.0, 3.0, 0.0]  # move instance 1 up
        dev2 = dev.with_transforms(jnp.asarray(o2w))

        o = jnp.asarray([[300.0, 3.0, 0.0], [-200.0, 0.0, 0.0]])
        d = jnp.asarray([[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        res = trace_scene(dev2, o, d, 0.1, 1000.0)
        g = shade.resolve_hits(dev2, res, o, d)
        m = np.array(g["motion"])
        # The moved instance's hit reprojects 3 units down in prev frame.
        assert int(res.inst[0]) == 1
        np.testing.assert_allclose(m[0], [0.0, -3.0, 0.0], atol=1e-3)
        # The static instance has zero motion.
        assert int(res.inst[1]) == 0
        np.testing.assert_allclose(m[1], 0.0, atol=1e-4)


def _five_teapots():
    """5 instances of one model spread along x — far enough apart that
    most ray tiles miss most instances, exercising the batched kernel's
    >2-instance tile-cull cond path."""
    scene = load_vox_scene(procgen.teapot_scene_bytes())
    inst = scene.instances[0]
    for k in range(1, 5):
        t = inst.transform.copy()
        t[:3, 3] += np.asarray([120.0 * k, 10.0 * k, 15.0 * k], np.float32)
        scene.instances.append(VoxInstance(inst.model_id, t, name=f"tp{k}"))
    return scene


class TestInstanceCullGate:
    """The batched scene kernel emits a per-(tile, instance) scalar skip
    cond when the scene has >2 instances; these pin that path to the
    per-instance loop oracle (and the XLA wavefront) exactly."""

    def test_batched_matches_loop_five_instances(self, monkeypatch):
        from dust_tpu.ops.pallas_trace import trace_scene_pallas

        dev = build_device_scene(_five_teapots())
        c2w = cam.look_at((250.0, 180.0, 420.0), (240.0, 30.0, 30.0))
        cs = cam.camera_settings(c2w, 1.1, 0.1, 10000.0, 128, 64)
        d = jnp.asarray(
            np.array(cam.camera_ray_dirs(cs, 128, 64)).reshape(-1, 3))
        n = d.shape[0]
        o = jnp.broadcast_to(jnp.asarray(np.array(cs.position)), (n, 3))

        for mode in ("precise", "rough"):
            a = trace_scene_pallas(dev, o, d, 0.1, 10000.0, mode=mode,
                                   interpret=True)
            monkeypatch.setenv("DUST_PALLAS_SCENE", "loop")
            b = trace_scene_pallas(dev, o, d, 0.1, 10000.0, mode=mode,
                                   interpret=True)
            monkeypatch.delenv("DUST_PALLAS_SCENE")
            assert int(np.asarray(a.hit).sum()) > 80  # scene actually hit
            assert len(set(np.asarray(a.inst)[np.asarray(a.hit)])) >= 3
            if mode == "precise":
                np.testing.assert_array_equal(np.array(a.inst),
                                              np.array(b.inst))
                np.testing.assert_array_equal(np.array(a.row), np.array(b.row))
                np.testing.assert_array_equal(np.array(a.bit), np.array(b.bit))
            else:
                # rough entry rejection (blk_in >= s_min) sits on an fp
                # boundary: the batched kernel normalises directions
                # in-kernel, the loop host-side — a 1-ulp s_min shift can
                # move a grazing entry by one block (same class as the
                # documented two-phase caveat).
                assert (np.array(a.inst) == np.array(b.inst)).mean() >= 0.999
                assert (np.array(a.row) == np.array(b.row)).mean() >= 0.999
            ta, tb = np.array(a.t), np.array(b.t)
            both = (np.isfinite(ta) & np.isfinite(tb)
                    & (np.array(a.row) == np.array(b.row)))
            np.testing.assert_allclose(ta[both], tb[both], rtol=1e-5)

    def test_batched_ao_fg_matches_loop_five_instances(self, monkeypatch):
        from dust_tpu.ops.pallas_trace import (trace_scene_pallas,
                                               trace_scene_pallas_ao_fg)

        dev = build_device_scene(_five_teapots())
        rng = np.random.default_rng(5)
        c2w = cam.look_at((250.0, 180.0, 420.0), (240.0, 30.0, 30.0))
        cs = cam.camera_settings(c2w, 1.1, 0.1, 10000.0, 128, 64)
        d0 = jnp.asarray(
            np.array(cam.camera_ray_dirs(cs, 128, 64)).reshape(-1, 3))
        n = d0.shape[0]
        o0 = jnp.broadcast_to(jnp.asarray(np.array(cs.position)), (n, 3))
        prim = trace_scene_pallas(dev, o0, d0, 0.1, 10000.0,
                                  mode="precise", interpret=True)
        t0 = jnp.where(prim.hit, prim.t, 0.0)
        o = o0 + d0 * t0[:, None] * 0.999
        dn = rng.normal(size=(n, 3))
        dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
        d = jnp.asarray(dn.astype(np.float32))
        act = prim.hit
        t_ao = jnp.where(act, 8.0, -1.0)
        t_fg = jnp.where(act, 10000.0, -1.0)

        ao_a, fg_a = trace_scene_pallas_ao_fg(dev, o, d, 0.1, t_ao, t_fg,
                                              interpret=True)
        monkeypatch.setenv("DUST_PALLAS_SCENE", "loop")
        ao_b, fg_b = trace_scene_pallas_ao_fg(dev, o, d, 0.1, t_ao, t_fg,
                                              interpret=True)
        monkeypatch.delenv("DUST_PALLAS_SCENE")

        assert (np.array(ao_a.hit) == np.array(ao_b.hit)).mean() >= 0.999
        both = np.array(ao_a.hit) & np.array(ao_b.hit)
        assert both.sum() > 50
        np.testing.assert_allclose(np.array(ao_a.t)[both],
                                   np.array(ao_b.t)[both], rtol=1e-4)
        assert (np.array(fg_a.hit) == np.array(fg_b.hit)).mean() >= 0.999
        b = np.array(fg_a.hit) & np.array(fg_b.hit)
        assert (np.array(fg_a.row)[b] == np.array(fg_b.row)[b]).mean() >= 0.999
        assert (np.array(fg_a.inst)[b] == np.array(fg_b.inst)[b]).mean() >= 0.999


class TestCameraParity:
    def test_ray_dir_formula(self):
        # camera.glsl:4-16 exact formula at chosen pixels.
        w, h = 64, 32
        c2w = cam.look_at((0, 0, 10), (0, 0, 0))
        cs = cam.camera_settings(c2w, fov=np.pi / 2, near=0.1, far=100.0,
                                 width=w, height=h)
        dirs = np.array(cam.camera_ray_dirs(cs, w, h))
        thf = float(cs.tan_half_fov)
        for (px, py) in [(0, 0), (w - 1, h - 1), (w // 2, h // 2)]:
            ndc_x = (px + 0.5) / w
            ndc_y = (py + 0.5) / h
            cx = (2 * ndc_x - 1) * (w / h) * thf
            cy = -(2 * ndc_y - 1) * thf
            d_cam = np.array([cx, cy, -1.0])
            want = np.array(cs.view_cols) @ d_cam
            np.testing.assert_allclose(dirs[py, px], want, atol=1e-5)

    def test_infinite_reverse_z(self):
        # standard.rs:281-286: far plane at infinity maps depth->0.
        p = cam.perspective_infinite_reverse(np.pi / 2, 16 / 9, 0.1)
        def project(z):
            v = p @ np.array([0, 0, z, 1.0])
            return v[2] / v[3]
        assert abs(project(-0.1) - 1.0) < 1e-6      # near -> 1
        assert abs(project(-1e9)) < 1e-6            # far -> 0


class TestFrontToBackOrder:
    def test_ids_sorted_near_to_far_within_model_group(self):
        """The batched kernel's >2-instance sweep receives instances
        near-to-far (pallas_trace._front_to_back_ids): the per-tile
        cull can then skip occluded instances. Ordering is pure perf —
        the merge is order-independent (pinned by the loop oracles
        above) — so this pins just the ordering property."""
        from dust_tpu.ops.pallas_trace import _front_to_back_ids

        dev = build_device_scene(_five_teapots())
        I = dev.num_instances
        order = sorted(range(I), key=lambda i: dev.inst_model[i])
        counts = tuple(sum(1 for im in dev.inst_model if im == m)
                       for m in range(dev.num_models))
        eye = np.array([610.0, 60.0, 90.0], np.float32)  # near teapot 4
        origin = jnp.broadcast_to(jnp.asarray(eye), (64, 3))
        ids, aff = _front_to_back_ids(dev, origin, order, counts)
        ids = np.asarray(ids)
        assert sorted(ids.tolist()) == list(range(I))
        # Model grouping preserved (all one model here).
        assert [int(dev.inst_model[i]) for i in ids] == \
            sorted(int(m) for m in dev.inst_model)
        # Distances from the eye are non-decreasing along the sweep.
        cm = 0.5 * (np.asarray(dev.model_aabb_min)
                    + np.asarray(dev.model_aabb_max))
        o2w = np.asarray(dev.obj_to_world)
        cw = np.einsum("ijk,ik->ij", o2w[ids][:, :, :3],
                       cm[[int(dev.inst_model[i]) for i in ids]]) \
            + o2w[ids][:, :, 3]
        d = ((cw - eye) ** 2).sum(-1)
        assert (np.diff(d) >= -1e-3).all(), d
        # aff rows follow the same permutation.
        np.testing.assert_allclose(
            np.asarray(aff), np.asarray(dev.world_to_obj)[ids].reshape(I, 12))
