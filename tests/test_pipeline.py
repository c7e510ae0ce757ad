"""End-to-end pipeline tests (small frames, CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dust_tpu.config import (
    RenderSettings, SpatialHashSettings, SurfelSettings,
)
from dust_tpu.ops import camera as cam
from dust_tpu.ops.noise import load_blue_noise
from dust_tpu.ops.sky import bake_sky
from dust_tpu.render.pipeline import make_frame_state, render_frame
from dust_tpu.render.scene import build_device_scene
from dust_tpu.vox import procgen
from dust_tpu.vox.loader import load_vox_scene


@pytest.fixture(scope="module")
def setup():
    settings = RenderSettings(
        width=96, height=54,
        spatial_hash=SpatialHashSettings(capacity=1 << 14),
        surfels=SurfelSettings(pool_size=1024),
    )
    scene = build_device_scene(load_vox_scene(procgen.castle_scene_bytes()))
    sky = bake_sky(settings.sunlight)
    bn = load_blue_noise()
    c2w = cam.look_at((150, 90, 180), (0, 30, 0))
    cs = cam.camera_settings(
        c2w, settings.camera.fov, settings.camera.near,
        settings.camera.far, settings.width, settings.height,
    )
    return settings, scene, sky, bn, cs


def _frame(setup_t, state):
    settings, scene, sky, bn, cs = setup_t
    return render_frame(
        scene, state, cs, sky, bn.unitvec3_cosine, bn.scalar, settings, tile=2048
    )


class TestRenderFrame:
    def test_three_frames(self, setup):
        settings, scene, sky, bn, cs = setup
        state = make_frame_state(settings)
        occupancy = []
        for i in range(3):
            out, aux, state = _frame(setup, state)
            occupancy.append(int((np.array(state.spatial_hash.fingerprint) != 0).sum()))

        o = np.array(out)
        assert o.shape == (settings.height, settings.width, 3)
        assert np.isfinite(o).all()
        assert 0.0 <= o.min() and o.max() <= 1.0
        assert o.std() > 0.05  # not a flat image

        # Frame counter advances; GI cache fills monotonically.
        assert int(state.frame_index) == 3
        assert occupancy[-1] >= occupancy[0] > 0
        # Surfels got scheduled.
        assert int((np.array(state.surfels[:, 3]) < 6).sum()) > 0

    def test_gbuffer_contents(self, setup):
        settings, scene, sky, bn, cs = setup
        state = make_frame_state(settings)
        out, aux, state = _frame(setup, state)
        depth = np.array(aux["depth"])
        hits = np.isfinite(depth)
        assert 0.05 < hits.mean() < 0.95
        # Normals unit-length on hits.
        nrm = np.array(aux["normal"])[hits]
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-4)
        # Static scene: zero motion everywhere.
        assert np.abs(np.array(aux["motion"])).max() < 1e-3
        # Albedo is palette-driven on hits, 1.0 on sky.
        alb = np.array(aux["albedo"])
        assert (alb[~hits] == 1.0).all()
        assert alb[hits].std() > 0.01

    def test_temporal_accumulation_static_camera(self, setup):
        settings, scene, sky, bn, cs = setup
        state = make_frame_state(settings)
        for _ in range(3):
            out, aux, state = _frame(setup, state)
        hist = np.array(state.denoiser.history_len)
        hits = np.isfinite(np.array(aux["depth"]))
        # Static camera: history accumulates on surfaces.
        assert hist[hits].mean() > 1.5

    def test_sunlit_brighter_than_shadowed(self, setup):
        settings, scene, sky, bn, cs = setup
        state = make_frame_state(settings)
        out, aux, state = _frame(setup, state)
        rad = np.array(aux["radiance"])
        nrm = np.array(aux["normal"])
        hits = np.isfinite(np.array(aux["depth"]))
        sun = np.array(sky.direction)
        facing = (nrm @ sun > 0.3) & hits
        away = (nrm @ sun < -0.3) & hits
        if facing.sum() > 10 and away.sum() > 10:
            assert rad[facing].mean() > rad[away].mean()
