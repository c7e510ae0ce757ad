"""Golden-image regression: the full pipeline's output is pinned.

The golden is rendered on the CPU backend with fixed settings (2 frames,
teapot scene). Any change to traversal, shading, GI, denoising or post
shows up as RMSE against it; intentional changes re-bake via
``python tests/test_golden.py``.
"""

import numpy as np

from dust_tpu.config import RenderSettings, SpatialHashSettings, SurfelSettings
from dust_tpu.ops import camera as cam
from dust_tpu.ops.noise import load_blue_noise
from dust_tpu.ops.sky import bake_sky
from dust_tpu.render.pipeline import make_frame_state, render_frame
from dust_tpu.render.scene import build_device_scene
from dust_tpu.utils.image import read_png
from dust_tpu.vox import procgen
from dust_tpu.vox.loader import load_vox_scene

GOLDEN = "tests/golden/teapot_96x54_f2.png"


def _render():
    settings = RenderSettings(width=96, height=54,
        spatial_hash=SpatialHashSettings(capacity=1 << 12),
        surfels=SurfelSettings(pool_size=512))
    scene = build_device_scene(load_vox_scene(procgen.teapot_scene_bytes()))
    state = make_frame_state(settings)
    sky = bake_sky(settings.sunlight)
    bn = load_blue_noise()
    cs = cam.camera_settings(cam.look_at((90, 60, 90), (0, 0, 0)),
                             np.pi / 3, 0.1, 10000.0, 96, 54)
    for _ in range(2):
        out, aux, state = render_frame(
            scene, state, cs, sky, bn.unitvec3_cosine, bn.scalar,
            settings, tile=1024)
    return np.array(out)


def test_golden_image():
    got = _render()
    want = read_png(GOLDEN).astype(np.float64) / 255.0
    rmse = float(np.sqrt(np.mean((got - want) ** 2)))
    assert rmse < 0.01, f"render changed: RMSE {rmse:.4f} vs golden"


if __name__ == "__main__":
    import sys
    sys.path.insert(0, ".")
    from dust_tpu.utils.image import write_png
    write_png(GOLDEN, _render())
    print("golden re-baked")
