"""Camera: settings, ray generation, projection matrices.

Reference: ``CameraSettings`` (``headers/layout.playout:22-35``) baked by
``StandardPipeline::render`` (``standard.rs:277-302``, infinite-reverse-Z
perspective) and the per-pixel ray of ``headers/camera.glsl:4-16``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = ["CameraSettings", "camera_settings", "camera_ray_dirs", "look_at",
           "perspective_infinite_reverse"]


class CameraSettings(NamedTuple):
    """Per-frame camera uniform (flip-flopped: the pipeline keeps this
    frame's and last frame's, ``layout.playout`` camera/camera_last_frame).
    """

    view_cols: jnp.ndarray     # (3,3) camera-to-world rotation (columns)
    position: jnp.ndarray      # (3,)
    tan_half_fov: jnp.ndarray  # ()
    near: jnp.ndarray          # ()
    far: jnp.ndarray           # ()
    view_proj: jnp.ndarray     # (4,4) world -> clip (infinite reverse-Z)


def perspective_infinite_reverse(fov_y: float, aspect: float, near: float) -> np.ndarray:
    """Mat4::perspective_infinite_reverse_rh (standard.rs:281-286)."""
    f = 1.0 / math.tan(fov_y / 2.0)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = 0.0
    m[2, 3] = near
    m[3, 2] = -1.0
    return m


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Camera-to-world affine looking down -Z at ``target`` (the engine's
    camera convention: camera.glsl builds dirs as rot @ (px, py, -1))."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    a = np.eye(4, dtype=np.float64)
    a[:3, 0] = right
    a[:3, 1] = true_up
    a[:3, 2] = -fwd
    a[:3, 3] = eye
    return a.astype(np.float32)


def camera_settings(camera_to_world: np.ndarray, fov: float, near: float,
                    far: float, width: int, height: int) -> CameraSettings:
    """Bake CameraSettings exactly like standard.rs:277-302."""
    c2w = np.asarray(camera_to_world, np.float64)
    proj = perspective_infinite_reverse(fov, width / height, near).astype(np.float64)
    view = np.linalg.inv(c2w)
    view_proj = proj @ view
    return CameraSettings(
        view_cols=jnp.asarray(c2w[:3, :3], jnp.float32),
        position=jnp.asarray(c2w[:3, 3], jnp.float32),
        tan_half_fov=jnp.asarray(math.tan(fov / 2.0), jnp.float32),
        near=jnp.asarray(near, jnp.float32),
        far=jnp.asarray(far, jnp.float32),
        view_proj=jnp.asarray(view_proj, jnp.float32),
    )


def camera_ray_dirs(cam: CameraSettings, width: int, height: int) -> jnp.ndarray:
    """Per-pixel world-space ray directions, NOT normalised — matching
    camera.glsl:4-16 (t parameters are then in view-depth-like units and
    near/far map directly to tmin/tmax like the reference's traceRayEXT
    call in primary.rgen)."""
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    u, v = jnp.meshgrid(px, py, indexing="xy")  # v indexes rows (y down)
    cx = (2.0 * u - 1.0) * (width / height) * cam.tan_half_fov
    cy = (1.0 - 2.0 * v) * cam.tan_half_fov  # pixelCamera.y *= -1
    d_cam = jnp.stack([cx, cy, -jnp.ones_like(cx)], axis=-1)
    return jnp.einsum("ij,hwj->hwi", cam.view_cols, d_cam, precision="highest")
