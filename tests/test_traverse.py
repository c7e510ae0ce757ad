"""Oracle tests: the wavefront HDDA vs the scalar reference tracer.

SURVEY §7.3 milestone: teapot.vox, depth/normal at small resolution,
verified against a scalar CPU reference tracer.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dust_tpu.ops import camera as cam
from dust_tpu.ops import trace_ref
from dust_tpu.ops.traverse import trace_scene, trace_scene_tiled
from dust_tpu.render.scene import build_device_scene, chebyshev_distance_field
from dust_tpu.vox import procgen
from dust_tpu.vox.loader import load_vox_scene
from dust_tpu.voxtree import VoxTree


@pytest.fixture(scope="module")
def teapot():
    scene = load_vox_scene(procgen.teapot_scene_bytes())
    dev = build_device_scene(scene)
    flats = [scene.geometries[m].flat for m in sorted(scene.geometries)]
    insts = [
        (inst.model_id, np.linalg.inv(np.asarray(inst.transform, np.float64)))
        for inst in scene.instances
    ]
    return scene, dev, flats, insts


def _camera_rays(width, height, eye=(90, 60, 90), target=(0, 0, 0)):
    c2w = cam.look_at(eye, target)
    cs = cam.camera_settings(c2w, fov=np.pi / 3, near=0.1, far=1000.0,
                             width=width, height=height)
    dirs = cam.camera_ray_dirs(cs, width, height).reshape(-1, 3)
    origins = jnp.broadcast_to(cs.position, dirs.shape)
    return cs, origins, dirs


class TestChebyshev:
    def test_distance_field(self):
        occ = np.zeros((64, 64, 64), bool)
        occ[10, 10, 10] = True
        d = chebyshev_distance_field(occ, max_dist=63)
        assert d[10, 10, 10] == 0
        assert d[11, 11, 11] == 1
        assert d[10, 10, 13] == 3
        assert d[30, 10, 10] == 20


class TestSingleLeafDDA:
    """Direct parity with hit.rint semantics on one leaf."""

    def _scene(self, mask_bits):
        t = VoxTree()
        for b in mask_bits:
            x, y, z = (b >> 4) & 3, (b >> 2) & 3, b & 3
            t.set_value((x, y, z), True)
        return t.flatten()

    def test_axis_ray_hits_first_voxel(self):
        flat = self._scene([0])  # voxel (0,0,0)
        hit = trace_ref.dda_leaf((-1.0, 0.5, 0.5), (1.0, 0.0, 0.0),
                                 int(flat.occupancy_u64()[0]), 0.0, 100.0)
        assert hit is not None
        t, bit = hit
        assert abs(t - 1.0) < 1e-6 and bit == 0

    def test_ray_through_empty_column_misses(self):
        flat = self._scene([(3 << 4) | (3 << 2) | 3])
        hit = trace_ref.dda_leaf((-1.0, 0.5, 0.5), (1.0, 0.0, 0.0),
                                 int(flat.occupancy_u64()[0]), 0.0, 100.0)
        assert hit is None

    def test_diagonal(self):
        # Full leaf: entry voxel must be reported at the AABB entry t.
        flat = self._scene(list(range(64)))
        hit = trace_ref.dda_leaf((-0.5, -0.5, -0.5), (1.0, 1.0, 1.0),
                                 int(flat.occupancy_u64()[0]), 0.0, 100.0)
        t, bit = hit
        assert abs(t - 0.5) < 1e-6 and bit == 0


class TestWavefrontVsOracle:
    def test_teapot_primary_rays(self, teapot):
        scene, dev, flats, insts = teapot
        w = h = 48
        _, origins, dirs = self._rays(w, h)
        got = trace_scene(dev, origins, dirs, 0.1, 1000.0)
        want = trace_ref.trace_rays_ref(
            flats, insts, np.array(origins), np.array(dirs), 0.1, 1000.0
        )
        self._compare(got, want, dirs)

    def test_teapot_rough_mode(self, teapot):
        scene, dev, flats, insts = teapot
        w = h = 32
        _, origins, dirs = self._rays(w, h)
        got = trace_scene(dev, origins, dirs, 0.1, 1000.0, mode="rough")
        want = trace_ref.trace_rays_ref(
            flats, insts, np.array(origins), np.array(dirs), 0.1, 1000.0, mode="rough"
        )
        hit_g = np.array(got.inst) >= 0
        hit_w = want["inst"] >= 0
        assert (hit_g == hit_w).mean() > 0.995
        both = hit_g & hit_w
        np.testing.assert_allclose(np.array(got.t)[both], want["t"][both], rtol=1e-3, atol=1e-3)

    def test_tiled_equals_untiled(self, teapot):
        _, dev, _, _ = teapot
        w = h = 40
        _, origins, dirs = self._rays(w, h)
        a = trace_scene(dev, origins, dirs, 0.1, 1000.0)
        b = trace_scene_tiled(dev, origins, dirs, 0.1, 1000.0, tile=512)
        assert np.array_equal(np.array(a.inst), np.array(b.inst))
        np.testing.assert_allclose(np.array(a.t), np.array(b.t), rtol=1e-5, atol=1e-5, equal_nan=True)

    def test_random_directions_from_inside(self, teapot):
        # Secondary-bounce-like rays: random origins near the model, random dirs.
        scene, dev, flats, insts = teapot
        rng = np.random.default_rng(3)
        n = 512
        origins = jnp.asarray(rng.uniform(-40, 40, size=(n, 3)), jnp.float32)
        d = rng.normal(size=(n, 3))
        dirs = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
        got = trace_scene(dev, origins, dirs, 0.1, 500.0)
        want = trace_ref.trace_rays_ref(
            flats, insts, np.array(origins), np.array(dirs), 0.1, 500.0
        )
        # Interior rays start on voxel faces, so exact-bit ties at shared
        # corners are legitimate; require agreement on hit/miss and t but
        # allow a slightly larger tie rate on voxel identity.
        self._compare(got, want, dirs, agree=0.99, bit_agree=0.95)

    @staticmethod
    def _rays(w, h):
        return _camera_rays(w, h)

    @staticmethod
    def _compare(got, want, dirs, agree=0.995, bit_agree=0.995):
        hit_g = np.array(got.inst) >= 0
        hit_w = want["inst"] >= 0
        # Hit/miss agreement (boundary rays may differ by epsilon policy).
        assert (hit_g == hit_w).mean() >= agree, (hit_g.sum(), hit_w.sum())
        both = hit_g & hit_w
        t_g = np.array(got.t)[both]
        t_w = want["t"][both]
        close = np.isclose(t_g, t_w, rtol=1e-3, atol=1e-3)
        assert close.mean() >= agree
        # Exact voxel identity where t agrees.
        bit_match = np.array(got.bit)[both][close] == want["bit"][both][close]
        row_match = np.array(got.row)[both][close] == want["row"][both][close]
        assert bit_match.mean() >= bit_agree
        assert row_match.mean() >= bit_agree


class TestDepthImageMilestone:
    def test_teapot_depth_normal_image(self, teapot):
        """BASELINE config #1: tree build + primary depth/normal render."""
        _, dev, _, _ = teapot
        w = h = 64
        cs, origins, dirs = _camera_rays(w, h)
        res = trace_scene(dev, origins, dirs, cs.near, cs.far)
        depth = np.array(res.t).reshape(h, w)
        hits = np.isfinite(depth)
        # The teapot occupies the middle of the frame.
        assert 0.03 < hits.mean() < 0.9
        assert hits[h // 2, w // 2]
        center = depth[h - h // 3 : h, :][np.isfinite(depth[h - h // 3 : h, :])]
        assert center.size == 0 or center.min() > 1.0
