"""Real-time GI denoiser: temporal accumulation + edge-aware à-trous.

Replaces the reference's closed-source NRD REBLUR integration
(``crates/render/src/pipeline/nrd.rs`` — prebuilt SPIR-V blobs, SURVEY
§7.7 calls for an open reimplementation). Same interface contract as
REBLUR diffuse: consumes world-space motion vectors, packed
normal+roughness, view-Z depth and YCoCg radiance+normalised-hit-distance;
produces denoised radiance in the same packing.

Design (SVGF/REBLUR-style, TPU-shaped):

1. temporal reprojection — previous world position = hit + motion
   (hit.rchit:90-94 packs ``prevWorld - curWorld``), projected with the
   previous frame's view-proj; bilinear history fetch validated by
   world-position and normal agreement; exponential accumulation capped
   at ``max_accumulated_frames``.
2. spatial pass — ``atrous_iterations`` of a 3×3 à-trous wavelet with
   depth/normal/luminance edge stops; the blur width additionally scales
   with the ray hit distance (short hit distance = contact region = less
   blur), REBLUR's key idea.

Everything is dense elementwise/shift arithmetic — ideal VPU work; the
only gathers are the four taps of the bilinear history fetch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dust_tpu.config import DenoiserSettings
from dust_tpu.ops import packing as pk

__all__ = ["DenoiserState", "make_denoiser_state", "denoise"]


class DenoiserState(NamedTuple):
    """History packed as one (H,W,8) image: [color rgb, hitdist, len,
    view depth, oct-normal xy]. One image keeps the reprojection fetch a
    single <=64-byte row gather — the width past which TPU gather cost
    starts scaling (measured)."""

    history: jnp.ndarray  # (H,W,8) float32

    @property
    def color(self) -> jnp.ndarray:
        return self.history[..., 0:3]

    @property
    def hitdist(self) -> jnp.ndarray:
        return self.history[..., 3]

    @property
    def history_len(self) -> jnp.ndarray:
        return self.history[..., 4]


def make_denoiser_state(height: int, width: int) -> DenoiserState:
    # Explicit non-weak dtypes: the state must round-trip through
    # render_frame without changing abstract values, or jit recompiles.
    h = jnp.zeros((height, width, 8), jnp.float32)
    return DenoiserState(history=h.at[..., 5].set(-1.0))  # depth -1 = none


def _bilinear(img: jnp.ndarray, xy: jnp.ndarray):
    """Bilinear fetch of (H,W,C) at float pixel coords (...,2) = (x,y).

    Random row gathers from image-sized tables run at ~45M rows/s on TPU
    (HBM-latency bound) regardless of row width, so the four taps are
    packed into ONE 4C-wide gather: the source image is pre-shifted into
    a (H,W,4C) quad where each row already holds its 2×2 neighbourhood.
    """
    h, w = img.shape[:2]
    c = img.shape[2]
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    quad = jnp.concatenate([img, right, down, down_right], axis=-1)
    flat = quad.reshape(h * w, 4 * c)

    x = jnp.clip(xy[..., 0] - 0.5, 0.0, w - 1.0)
    y = jnp.clip(xy[..., 1] - 0.5, 0.0, h - 1.0)
    x0 = jnp.minimum(jnp.floor(x).astype(jnp.int32), w - 1)
    y0 = jnp.minimum(jnp.floor(y).astype(jnp.int32), h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    rows = jnp.take(flat, y0 * w + x0, axis=0)
    v00 = rows[..., 0 * c : 1 * c]
    v01 = rows[..., 1 * c : 2 * c]
    v10 = rows[..., 2 * c : 3 * c]
    v11 = rows[..., 3 * c : 4 * c]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _project(view_proj: jnp.ndarray, pos: jnp.ndarray, width: int, height: int):
    """World -> pixel coords under the (reverse-Z) view-proj."""
    p = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], axis=-1)
    clip = jnp.einsum("...j,kj->...k", p, view_proj, precision="highest")
    w = clip[..., 3]
    ndc = clip[..., :2] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)[..., None]
    x = (ndc[..., 0] * 0.5 + 0.5) * width
    y = (0.5 - ndc[..., 1] * 0.5) * height
    return jnp.stack([x, y], axis=-1), w


def denoise(
    state: DenoiserState,
    radiance: jnp.ndarray,       # (H,W,3) linear current-frame illuminance
    hitdist: jnp.ndarray,        # (H,W) current hit distance (0 = none)
    depth: jnp.ndarray,          # (H,W) primary t (inf = sky)
    normal: jnp.ndarray,         # (H,W,3) world normals
    world_pos: jnp.ndarray,      # (H,W,3) primary hit positions
    motion: jnp.ndarray,         # (H,W,3) prevWorld - curWorld
    prev_view_proj: jnp.ndarray,  # (4,4)
    settings: DenoiserSettings,
):
    """One denoiser step. Returns (denoised_rgb, hitdist, new_state)."""
    height, width = depth.shape
    valid_px = jnp.isfinite(depth)

    # ---- temporal reprojection ----------------------------------------
    prev_world = world_pos + motion
    prev_xy, prev_w = _project(prev_view_proj, prev_world, width, height)
    in_bounds = (
        (prev_xy[..., 0] >= 0.5) & (prev_xy[..., 0] <= width - 0.5)
        & (prev_xy[..., 1] >= 0.5) & (prev_xy[..., 1] <= height - 0.5)
        & (prev_w > 0)
    )
    hist = _bilinear(state.history, prev_xy)
    hist_color = hist[..., 0:3]
    hist_hd = hist[..., 3]
    hist_len = hist[..., 4]
    hist_depth = hist[..., 5]
    hist_nrm = pk.decode_oct_normal(hist[..., 6:8])

    # Geometric validation: the history pixel must describe (nearly) the
    # same surface — its stored view depth must match the depth of the
    # reprojected point in the previous camera (the projection w is
    # exactly that view depth), with a compatible orientation.
    depth_ok = jnp.abs(hist_depth - prev_w) < 0.1 * jnp.maximum(prev_w, 1.0)
    nrm_ok = jnp.sum(hist_nrm * normal, axis=-1) > 0.8
    valid_hist = (in_bounds & depth_ok & nrm_ok & valid_px
                  & (hist_depth > 0.0) & jnp.isfinite(hist_len))

    n = jnp.where(valid_hist, jnp.minimum(hist_len, settings.max_accumulated_frames - 1), 0.0)
    alpha = 1.0 / (n + 1.0)
    acc_color = hist_color + (radiance - hist_color) * alpha[..., None]
    acc_color = jnp.where(valid_px[..., None], acc_color, radiance)
    acc_hd = jnp.where(valid_px, hist_hd + (hitdist - hist_hd) * alpha, hitdist)
    new_len = jnp.where(valid_px, n + 1.0, 0.0)

    # ---- spatial à-trous ------------------------------------------------
    lum = jnp.sum(acc_color * jnp.asarray([0.25, 0.5, 0.25]), axis=-1)
    # Hit-distance-driven blur strength (REBLUR-style): contact regions
    # (small accumulated hit distance) keep detail.
    hd_norm = jnp.clip(acc_hd / (acc_hd + 4.0), 0.05, 1.0) * settings.hitdist_blur_scale
    # Converged pixels need less spatial filtering.
    conv = jnp.sqrt(1.0 / new_len.clip(1.0))

    filtered = acc_color
    inv_d2 = 1.0 / (settings.depth_sigma * settings.depth_sigma)

    kernel = [
        (dy, dx, 0.125 if (dx == 0 or dy == 0) else 0.0625)
        for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dx, dy) != (0, 0)
    ]

    def shift(a, sy, sx):
        """Edge-clamped 2D shift via pad+slice (jnp.roll lowers poorly)."""
        pads = [(max(sy, 0), max(-sy, 0)), (max(sx, 0), max(-sx, 0))]
        pads += [(0, 0)] * (a.ndim - 2)
        p = jnp.pad(a, pads, mode="edge")
        h, w = a.shape[:2]
        return jax.lax.slice(
            p, (max(-sy, 0), max(-sx, 0)) + (0,) * (a.ndim - 2),
            (max(-sy, 0) + h, max(-sx, 0) + w) + a.shape[2:],
        )

    def powi(x, n):
        """x**n for static integer n via repeated squaring (no pow op)."""
        result = None
        bit = x
        n = int(n)
        while n:
            if n & 1:
                result = bit if result is None else result * bit
            n >>= 1
            if n:
                bit = bit * bit
        return result

    n_sigma = settings.normal_sigma
    int_sigma = float(n_sigma).is_integer()
    depth_s = jnp.where(valid_px, depth, 1e10)
    inv_hd = 1.0 / (hd_norm + 1e-3)

    valid_f = valid_px.astype(jnp.float32)
    for it in range(settings.atrous_iterations):
        step = 1 << it
        wsum = jnp.full_like(lum, 0.25)
        csum = filtered * 0.25
        lum_f = jnp.sum(filtered * jnp.asarray([0.25, 0.5, 0.25]), axis=-1)
        inv_lum_sig = 1.0 / (settings.luminance_sigma * conv * hd_norm + 1e-3)
        # Pack everything a tap reads into two arrays so each of the 8
        # taps shifts 2 buffers instead of 5.
        guide = jnp.concatenate(
            [filtered, lum_f[..., None], depth_s[..., None], normal,
             valid_f[..., None]], axis=-1)  # (H,W,9)
        for dy, dx, kw in kernel:
            sy, sx = dy * step, dx * step
            g_q = shift(guide, -sy, -sx)
            c_q = g_q[..., 0:3]
            l_q = g_q[..., 3]
            d_q = g_q[..., 4]
            n_q = g_q[..., 5:8]
            v_q = g_q[..., 8]

            # One exp for both depth and luminance stops.
            log_w = (
                -jnp.abs(depth_s - d_q) / jnp.maximum(depth_s, 1.0)
                * (inv_d2 * 8.0) * inv_hd
                - jnp.abs(lum_f - l_q) * inv_lum_sig
            )
            ndot = jnp.maximum(jnp.sum(normal * n_q, axis=-1), 0.0)
            w_n = powi(ndot, n_sigma) if int_sigma else ndot ** n_sigma
            wgt = kw * jnp.exp(jnp.maximum(log_w, -40.0)) * w_n * v_q
            csum = csum + c_q * wgt[..., None]
            wsum = wsum + wgt
        filtered = csum / wsum[..., None]

    out = jnp.where(valid_px[..., None], filtered, radiance)

    new_hist = jnp.concatenate(
        [jnp.where(valid_px[..., None], acc_color, 0.0),
         acc_hd[..., None],
         new_len[..., None],
         jnp.where(valid_px, depth, -1.0)[..., None],
         pk.encode_oct_normal(jnp.where(valid_px[..., None], normal,
                                        jnp.asarray([0.0, 0.0, 1.0])))],
        axis=-1)
    return out, acc_hd, DenoiserState(history=new_hist)
