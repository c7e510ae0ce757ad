"""Shared configuration for the converged-ground-truth quality gates.

One place defines the GT scene/camera/settings so
``tools/gen_ground_truth.py`` (runs on the TPU) and
``tests/test_quality.py`` (runs on CPU) cannot drift apart.
"""

from dust_tpu.config import (RenderSettings, SpatialHashSettings,
                             SurfelSettings)
from dust_tpu.ops import camera as cameralib


def gt_settings(width: int, height: int, backend: str = "jnp",
                **overrides) -> RenderSettings:
    base = dict(
        width=width, height=height,
        spatial_hash=SpatialHashSettings(capacity=1 << 18),
        surfels=SurfelSettings(pool_size=16384),
        traversal_backend=backend,
        gi_cache="dense",
    )
    base.update(overrides)
    return RenderSettings(**base)


def gt_camera(settings: RenderSettings, width: int, height: int):
    c2w = cameralib.look_at((150.0, 90.0, 180.0), (0.0, 30.0, 0.0))
    return cameralib.camera_settings(
        c2w, settings.camera.fov, settings.camera.near,
        settings.camera.far, width, height,
    )
