"""Backend parity: the Pallas kernel and the XLA wavefront must render the
same image (BASELINE quality gate stand-in: the two independent traversal
implementations cross-validate each other end-to-end through the full
pipeline, not just per-ray)."""

import dataclasses

import numpy as np
import pytest

from dust_tpu.config import RenderSettings, SpatialHashSettings, SurfelSettings
from dust_tpu.ops import camera as cam
from dust_tpu.ops.noise import load_blue_noise
from dust_tpu.ops.sky import bake_sky
from dust_tpu.render.pipeline import make_frame_state, render_frame
from dust_tpu.render.scene import build_device_scene
from dust_tpu.vox import procgen
from dust_tpu.vox.loader import load_vox_scene
from tools.rmse import rmse


@pytest.mark.slow
def test_pallas_and_jnp_render_same_image():
    # Pallas runs in interpret mode on CPU — small frame keeps it fast.
    base = RenderSettings(
        width=128, height=72,
        spatial_hash=SpatialHashSettings(capacity=1 << 12),
        surfels=SurfelSettings(pool_size=512),
    )
    scene = build_device_scene(load_vox_scene(procgen.teapot_scene_bytes()))
    sky = bake_sky(base.sunlight)
    bn = load_blue_noise()
    c2w = cam.look_at((90, 60, 90), (0, 0, 0))
    cs = cam.camera_settings(c2w, np.pi / 3, 0.1, 10000.0, base.width, base.height)

    imgs = {}
    for backend in ("jnp", "pallas"):
        settings = dataclasses.replace(base, traversal_backend=backend)
        state = make_frame_state(settings)
        out, aux, state = render_frame(
            scene, state, cs, sky, bn.unitvec3_cosine, bn.scalar,
            settings, tile=2048,
        )
        imgs[backend] = np.array(out)

    err = rmse(imgs["jnp"], imgs["pallas"])
    # Sub-1% RMSE: only epsilon-order traversal tie-breaks may differ.
    assert err < 0.01, err
