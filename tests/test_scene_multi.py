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
