"""Real-time GI denoiser: REBLUR-style temporal accumulation + à-trous.

Replaces the reference's closed-source NRD REBLUR integration
(``crates/render/src/pipeline/nrd.rs`` — prebuilt SPIR-V blobs, SURVEY
§7.7 calls for an open reimplementation). Same interface contract as
REBLUR diffuse: consumes world-space motion vectors, normals, view-Z
depth and radiance+hit-distance; produces denoised radiance.

Design (TPU-shaped REBLUR):

1. **temporal reprojection** — previous world position = hit + motion
   (hit.rchit:90-94 packs ``prevWorld - curWorld``), projected with the
   previous frame's view-proj. The bilinear history fetch uses
   *per-tap geometric validity* (each of the four corners is weighted
   out independently when its stored depth/normal disagree with the
   reprojected surface — REBLUR's custom-weight bilinear), with
   exponential accumulation capped at ``max_accumulated_frames``.
2. **history clamping** — the fetched history color is clamped to the
   mean ± ``clamp_sigma``·σ box of the *current* frame's 3×3
   neighborhood, so stale radiance cannot survive a lighting change for
   more than one frame (REBLUR's color clamp).
3. **anti-lag** — a short "fast" history (cap ``fast_max_accumulated_
   frames``) tracks luminance; when fast and slow histories diverge by
   more than the local noise level, the accumulated frame count is cut,
   accelerating convergence to the new signal (REBLUR's anti-lag).
4. **spatial pass** — ``atrous_iterations`` of a 3×3 à-trous wavelet
   with depth/normal/luminance edge stops; blur width scales with the
   accumulated hit distance (contact regions keep detail) and shrinks
   as history converges.

Performance: history lives as one (H,W,3) uint32 image — 12 bytes per
pixel (RGB9E5 color, f16 fast-luma, log-u8 hit distance, u8 fixed-point
history length, f16 view depth, u8×2 octahedral normal). The bilinear
fetch is TWO narrow row gathers (the x-neighbor is pre-paired into the
row, the y-neighbor is the second gather). TPU gather cost scales with
row bytes (measured: 32 B rows ≈ 14 ms, 128 B ≈ 82 ms for 2M rows), so
the 24 B paired-packed rows cut the reprojection from ~84 ms (f32) /
~42 ms (f16) to ~16 ms at 1080p. Bit pack/unpack is cheap VPU work; the
quantisations are chosen so every consumer keeps its precision budget:
9-bit-mantissa color ≪ the residual noise floor, ¼-frame history-length
steps are exact for the +1/frame update, log-u8 hit distance only drives
the blur radius, and 8-bit oct normals carry ~1° worst-case error
against a 36° validity threshold.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dust_tpu.config import DenoiserSettings
from dust_tpu.ops import packing as pk

__all__ = ["DenoiserState", "make_denoiser_state", "denoise"]

# History word layout (3 × uint32 = 12 B/pixel):
#   w0: RGB9E5 accumulated color (shared-exponent HDR)
#   w1: fast-history luminance f16 (bits 16:32) | history length ×4
#       fixed-point u8 (bits 8:16) | hit distance log-u8 (bits 0:8)
#   w2: view depth f16 (bits 16:32; -1 = no surface) | oct normal
#       u8×2 (bits 8:16, 0:8)
_C = 3
_HD_MAX = 60000.0  # hit-distance clamp (log-u8 encodable)


def _f16_bits(x):
    """f32 -> u32 holding the f16 bit pattern (low 16 bits)."""
    return jax.lax.bitcast_convert_type(
        x.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)


def _bits_f16(b):
    """u32 (low 16 bits = f16 pattern) -> f32."""
    return jax.lax.bitcast_convert_type(
        (b & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)


def _exp2i(e):
    """2**e for integer e in [-126, 127], built from float32 bits."""
    return jax.lax.bitcast_convert_type(
        ((e + 127) << 23).astype(jnp.int32), jnp.float32)


def _pack_rgb9e5(c):
    """(..., 3) non-negative f32 -> shared-exponent RGB9E5 u32."""
    c = jnp.clip(c, 0.0, 65000.0)
    maxc = jnp.maximum(jnp.max(c, axis=-1), 1e-8)
    bits = jax.lax.bitcast_convert_type(maxc, jnp.int32)
    e = jnp.clip((bits >> 23) - 126, -15, 16)  # maxc < 2**e
    m = jnp.clip(jnp.round(c * _exp2i(9 - e)[..., None]).astype(jnp.int32),
                 0, 511).astype(jnp.uint32)
    return (((e + 15).astype(jnp.uint32) << 27)
            | (m[..., 0] << 18) | (m[..., 1] << 9) | m[..., 2])


def _unpack_rgb9e5(w):
    """RGB9E5 u32 -> (..., 3) f32."""
    e = ((w >> 27) & 31).astype(jnp.int32) - 15
    scale = _exp2i(e - 9)
    m = jnp.stack([(w >> 18) & 511, (w >> 9) & 511, w & 511], axis=-1)
    return m.astype(jnp.float32) * scale[..., None]


def _pack_history(color, fast, hd, length, depth, normal):
    """Pack per-pixel history channels into (..., 3) uint32."""
    w0 = _pack_rgb9e5(color)
    len_q = jnp.clip(jnp.round(length * 4.0), 0, 255).astype(jnp.uint32)
    hd_q = jnp.clip(jnp.round(jnp.log2(1.0 + jnp.clip(hd, 0.0, _HD_MAX))
                              * 16.0), 0, 255).astype(jnp.uint32)
    w1 = (_f16_bits(fast) << 16) | (len_q << 8) | hd_q
    oct = jnp.clip(jnp.round(pk.encode_oct_normal(normal) * 255.0),
                   0, 255).astype(jnp.uint32)
    w2 = (_f16_bits(depth) << 16) | (oct[..., 0] << 8) | oct[..., 1]
    return jnp.stack([w0, w1, w2], axis=-1)


def _unpack_history(h):
    """(..., 3) uint32 -> dict of f32 channels (normal stays encoded as
    (..., 2) oct in [0,1] — decoded only where needed)."""
    w0, w1, w2 = h[..., 0], h[..., 1], h[..., 2]
    return dict(
        color=_unpack_rgb9e5(w0),
        fast=_bits_f16(w1 >> 16),
        length=((w1 >> 8) & 0xFF).astype(jnp.float32) * 0.25,
        hd=jnp.exp2((w1 & 0xFF).astype(jnp.float32) * (1.0 / 16.0)) - 1.0,
        depth=_bits_f16(w2 >> 16),
        oct=jnp.stack([(w2 >> 8) & 0xFF, w2 & 0xFF],
                      axis=-1).astype(jnp.float32) * (1.0 / 255.0),
    )


class DenoiserState(NamedTuple):
    history: jnp.ndarray  # (H, W, 3) uint32 (see layout above)

    @property
    def color(self) -> jnp.ndarray:
        return _unpack_rgb9e5(self.history[..., 0])

    @property
    def hitdist(self) -> jnp.ndarray:
        return jnp.exp2((self.history[..., 1] & 0xFF).astype(jnp.float32)
                        * (1.0 / 16.0)) - 1.0

    @property
    def history_len(self) -> jnp.ndarray:
        return ((self.history[..., 1] >> 8) & 0xFF).astype(jnp.float32) * 0.25


def make_denoiser_state(height: int, width: int) -> DenoiserState:
    h = jnp.zeros((height, width, _C), jnp.uint32)
    # depth f16(-1) in w2's high bits = "no surface".
    no_depth = jnp.uint32(0xBC00) << 16
    return DenoiserState(history=h.at[..., 2].set(no_depth))


def _project(view_proj: jnp.ndarray, pos: jnp.ndarray, width: int, height: int):
    """World -> pixel coords under the (reverse-Z) view-proj."""
    p = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], axis=-1)
    clip = jnp.einsum("...j,kj->...k", p, view_proj, precision="highest")
    w = clip[..., 3]
    ndc = clip[..., :2] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)[..., None]
    x = (ndc[..., 0] * 0.5 + 0.5) * width
    y = (0.5 - ndc[..., 1] * 0.5) * height
    return jnp.stack([x, y], axis=-1), w


def _fetch_history(history: jnp.ndarray, xy: jnp.ndarray):
    """Bilinear-corner fetch: returns the four (..., _C) packed-u32 corner
    rows and the (fx, fy) fractions. ONE gather total: each pixel's row is
    pre-concatenated with its right / down / down-right neighbors (48 B
    rows — row width is nearly free, rows are what gathers pay for), so
    the quad row at (y0, x0) carries all four bilinear corners. Measured
    ~1.5 ms/frame over the two 24 B pair-row gathers it replaces."""
    h, w = history.shape[:2]
    right = jnp.concatenate([history[:, 1:], history[:, -1:]], axis=1)
    down = jnp.concatenate([history[1:], history[-1:]], axis=0)
    downright = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    quad = jnp.concatenate([history, right, down, downright],
                           axis=-1).reshape(h * w, 4 * _C)
    # (Row-padding the quad past the 524288-row emitter boundary wins
    # 3.5 ms in isolation — tools/history_gather_probe.py — but measured
    # NEUTRAL in the real frame (54.9 vs 55.1 ms): the in-frame gather
    # is emitted against this column-minor fused producer, a different
    # emitter than the probe's standalone row-major table.)
    # Force ONE materialisation: XLA otherwise risks rematerialising the
    # 48 B/px array into each consumer (measured on the old pair layout).
    quad = jax.lax.optimization_barrier(quad)

    x = jnp.clip(xy[..., 0] - 0.5, 0.0, w - 1.0)
    y = jnp.clip(xy[..., 1] - 0.5, 0.0, h - 1.0)
    x0 = jnp.minimum(jnp.floor(x).astype(jnp.int32), w - 2)
    y0 = jnp.minimum(jnp.floor(y).astype(jnp.int32), h - 2)
    fx = x - x0
    fy = y - y0

    r = jnp.take(quad, y0 * w + x0, axis=0)
    # Barrier BEFORE the corner slices: without it XLA splits the take
    # into two 24 B-row gathers (one per consumer half), paying the
    # row-count-bound gather cost twice (2x2.5 ms measured at 1080p
    # half-res instead of ~2.5 ms once).
    r = jax.lax.optimization_barrier(r)
    return (r[..., :_C], r[..., _C:2 * _C], r[..., 2 * _C:3 * _C],
            r[..., 3 * _C:]), fx, fy


def _local_moments(img: jnp.ndarray):
    """3×3 neighborhood mean and std of an (H,W,3) image via separable
    box shifts (pure VPU work)."""
    def box3(a, axis):
        size = a.shape[axis]
        edge0 = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        edge1 = jax.lax.slice_in_dim(a, size - 1, size, axis=axis)
        lo = jnp.concatenate(
            [edge0, jax.lax.slice_in_dim(a, 0, size - 1, axis=axis)], axis)
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(a, 1, size, axis=axis), edge1], axis)
        return lo + a + hi

    s1 = box3(box3(img, 0), 1) / 9.0
    s2 = box3(box3(img * img, 0), 1) / 9.0
    var = jnp.maximum(s2 - s1 * s1, 0.0)
    return s1, jnp.sqrt(var)


_LUMA = (0.25, 0.5, 0.25)


def _luma(c):
    return jnp.sum(c * jnp.asarray(_LUMA), axis=-1)


def _pool2(x):
    """2×2 sum pool, stride 2 (TPU-native reduce_window; strided slices
    relayout through the scalar path and cost ~5 ms per 1080p image)."""
    a = x if x.ndim == 3 else x[..., None]
    r = jax.lax.reduce_window(a, 0.0, jax.lax.add,
                              (2, 2, 1), (2, 2, 1), "VALID")
    return r if x.ndim == 3 else r[..., 0]


def downsample_inputs(radiance, hitdist, depth, normal, world_pos, motion):
    """2× downsample of the denoiser inputs for the half-res indirect
    path: validity-weighted 2×2 means (sum pools — no strided slicing).
    Quads mixing two surfaces produce blended geometry; the temporal
    validity tests and the upsample's geometry gate reject those taps,
    so the cost of averaging is shorter history at edges, not leaks.
    (A min-depth representative-surface variant was measured and did NOT
    improve edge RMSE vs the full-res control — the residual edge error
    lives in the upsample, not the downsample.)"""
    valid = jnp.isfinite(depth)
    w = valid.astype(jnp.float32)
    ws = _pool2(w)
    inv = 1.0 / jnp.maximum(ws, 1.0)

    def mean(x, mask_val=0.0):
        xm = jnp.where((valid if x.ndim == 2 else valid[..., None]),
                       x, mask_val)
        return _pool2(xm * (w if x.ndim == 2 else w[..., None])) * (
            inv if x.ndim == 2 else inv[..., None])

    rad = mean(radiance)
    hd = mean(hitdist)
    d = jnp.where(ws > 0, mean(depth), jnp.inf)
    nrm = mean(normal)
    nlen = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = jnp.where(nlen > 0.3, nrm / jnp.maximum(nlen, 1e-6),
                    jnp.asarray([0.0, 0.0, 1.0]))
    return rad, hd, d, nrm, mean(world_pos), mean(motion)


_K_BILIN = (0.25, 0.75, 0.75, 0.25)
_K_NEAREST = (0.0, 1.0, 1.0, 0.0)


def _up2_both(x, n_nearest=None):
    """2× upsample of (h2, w2, C) to (2h2, 2w2, C+n_nearest) in ONE
    dilated grouped conv: output channels [0:C] bilinear, [C:] nearest
    for the FIRST ``n_nearest`` input channels only (the TPU-native
    transposed-conv lowering; strided slices / jnp.repeat relayout lanes
    through the scalar path). 4-tap alignment: output 2i reads taps
    {i-1: k0, i: k2}, output 2i+1 reads {i: k1, i+1: k3}."""
    h, wdt, c = x.shape
    n_nearest = c if n_nearest is None else n_nearest
    kb = jnp.asarray(_K_BILIN, x.dtype)
    kn = jnp.asarray(_K_NEAREST, x.dtype)
    k2b = kb[:, None] * kb[None, :]                    # (4,4)
    k2n = kn[:, None] * kn[None, :]
    eye = jnp.eye(c, dtype=x.dtype)
    # Block-diagonal HWIO kernel: out[:c] = bilinear, out[c:] = nearest
    # (contiguous channel blocks — a grouped conv would interleave them,
    # and strided channel slices relayout lanes). The channel "matmul"
    # is a 9→13 identity-ish map, free on the MXU. Trimming the nearest
    # block to the channels the edge fallback actually reads measured
    # ~0.9 ms/frame at 1080p (tools/upsample_bench.py).
    k = jnp.concatenate(
        [k2b[:, :, None, None] * eye,
         k2n[:, :, None, None] * eye[:, :n_nearest]],
        axis=-1)                                       # (4,4,c,c+n)
    # (An explicit bf16 cast was measured neutral — XLA already runs the
    # conv's operands in bf16 internally.) NCHW output: the consumers
    # read per-channel planes, and an NHWC conv result gets relayouted
    # channel-planar anyway (a 1.7 ms copy at 1080p); asking the conv
    # for channel-major output directly lets the moveaxis below be a
    # layout view instead.
    out = jax.lax.conv_general_dilated(
        x[None], k, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NCHW"),
    )[0]
    return jnp.moveaxis(out, 0, -1)[: 2 * h, : 2 * wdt]


def upsample_bilateral(img_half, hd_half, depth_half, normal_half,
                       depth_full, normal_full):
    """Joint-bilateral 2× upsample of the half-res denoised indirect.

    One grouped transposed conv produces the bilinear AND nearest
    upsamples of the payload + its geometry; where the bilinearly-
    interpolated geometry disagrees with the full-res G-buffer (a
    geometric edge), fall back to the nearest half texel — GI stays
    crisp at edges, smooth in the interior."""
    H, W = depth_full.shape
    # Finite sentinel for sky depth: inf would turn the conv's zero-weight
    # MACs into NaN (0*inf); sky pixels' upsample output is discarded by
    # the caller anyway.
    d_h = jnp.minimum(depth_half, 1e9)[..., None]
    depth_full = jnp.minimum(depth_full, 1e9)
    pack = jnp.concatenate(
        [img_half, hd_half[..., None], d_h, normal_half,
         jnp.ones(depth_half.shape + (1,), img_half.dtype)],
        axis=-1)  # (h2, w2, 9); last channel renormalises borders

    up = _up2_both(pack, n_nearest=4)[:H, :W]
    up_b, up_n = up[..., :9], up[..., 9:]
    up_b = up_b / jnp.maximum(up_b[..., 8:9], 1e-6)  # border weight renorm

    ok = (
        (jnp.abs(up_b[..., 4] - depth_full)
         < 0.1 * jnp.maximum(depth_full, 1.0))
        & (jnp.sum(up_b[..., 5:8] * normal_full, axis=-1) > 0.85)
    )
    sel = ok[..., None]
    out = jnp.where(sel, up_b[..., 0:3], up_n[..., 0:3])
    hd = jnp.where(ok, up_b[..., 3], up_n[..., 3])
    return out, hd


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

    # ---- temporal reprojection -----------------------------------------
    prev_world = world_pos + motion
    prev_xy, prev_w = _project(prev_view_proj, prev_world, width, height)
    in_bounds = (
        (prev_xy[..., 0] >= 0.5) & (prev_xy[..., 0] <= width - 0.5)
        & (prev_xy[..., 1] >= 0.5) & (prev_xy[..., 1] <= height - 0.5)
        & (prev_w > 0)
    )
    corners, fx, fy = _fetch_history(state.history, prev_xy)
    wb = ((1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy)

    # Per-tap geometric validity (REBLUR custom-weight bilinear): a corner
    # participates only if it stored (nearly) the same surface — matching
    # previous-camera view depth and compatible orientation.
    wsum = jnp.zeros_like(fx)
    hist = jnp.zeros(fx.shape + (6,))  # color(3) fastluma hd len
    for c, w0 in zip(corners, wb):
        u = _unpack_history(c)
        c_nrm = pk.decode_oct_normal(u["oct"])
        ok = (
            (u["depth"] > 0.0)
            & (jnp.abs(u["depth"] - prev_w) < 0.1 * jnp.maximum(prev_w, 1.0))
            & (jnp.sum(c_nrm * normal, axis=-1) > 0.8)
        )
        w = w0 * ok.astype(jnp.float32)
        vals = jnp.concatenate(
            [u["color"], u["fast"][..., None], u["hd"][..., None],
             u["length"][..., None]], axis=-1)
        hist = hist + vals * w[..., None]
        wsum = wsum + w

    valid_hist = in_bounds & valid_px & (wsum > 1e-3)
    inv_w = 1.0 / jnp.maximum(wsum, 1e-3)
    hist_color = hist[..., 0:3] * inv_w[..., None]
    hist_fast = hist[..., 3] * inv_w
    hist_hd = hist[..., 4] * inv_w
    hist_len = hist[..., 5] * inv_w

    # ---- history clamping (REBLUR color clamp) -------------------------
    mu, sigma = _local_moments(radiance)
    gamma = settings.clamp_sigma
    clamped = jnp.clip(hist_color, mu - gamma * sigma, mu + gamma * sigma)
    hist_color = jnp.where(valid_hist[..., None], clamped, hist_color)

    n0 = jnp.where(valid_hist,
                   jnp.minimum(hist_len, settings.max_accumulated_frames - 1),
                   0.0)

    # ---- anti-lag via fast history (REBLUR) ----------------------------
    luma_cur = _luma(radiance)
    nf = jnp.where(valid_hist,
                   jnp.minimum(hist_len,
                               settings.fast_max_accumulated_frames - 1), 0.0)
    fast = hist_fast + (luma_cur - hist_fast) / (nf + 1.0)
    slow_luma = _luma(hist_color)
    sig_l = _luma(sigma)
    # Deviation in units of the local noise level: random noise keeps the
    # fast/slow gap within ~sigma, a lighting change pushes far past it.
    deviation = jnp.abs(fast - slow_luma) / (
        sig_l * settings.antilag_sigma
        + jnp.maximum(jnp.maximum(fast, slow_luma), 1e-3)
        * settings.antilag_relative
        + 1e-6
    )
    antilag = jnp.square(jnp.clip(1.0 - deviation, 0.05, 1.0))
    n = n0 * antilag

    alpha = 1.0 / (n + 1.0)
    acc_color = hist_color + (radiance - hist_color) * alpha[..., None]
    acc_color = jnp.where(valid_px[..., None], acc_color, radiance)
    acc_hd = jnp.where(valid_px, hist_hd + (hitdist - hist_hd) * alpha, hitdist)
    new_len = jnp.where(valid_px, n + 1.0, 0.0)

    # ---- spatial à-trous ------------------------------------------------
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
        wsum_a = jnp.full(depth.shape, 0.25)
        csum = filtered * 0.25
        lum_f = _luma(filtered)
        inv_lum_sig = 1.0 / (settings.luminance_sigma * conv * hd_norm + 1e-3)
        # Pack everything a tap reads into one array so each of the 8
        # taps shifts 1 buffer instead of 5.
        guide = jnp.concatenate(
            [filtered, lum_f[..., None], depth_s[..., None], normal,
             valid_f[..., None]], axis=-1)  # (H,W,9)
        for dy, dx, kw in kernel:
            sy, sx = dy * step, dx * step
            g_q = shift(guide, -sy, -sx).astype(jnp.float32)
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
            wsum_a = wsum_a + wgt
        filtered = csum / wsum_a[..., None]

    out = jnp.where(valid_px[..., None], filtered, radiance)

    new_hist = _pack_history(
        jnp.where(valid_px[..., None], acc_color, 0.0),
        jnp.where(valid_px, fast, 0.0),
        acc_hd,
        new_len,
        jnp.where(valid_px, jnp.minimum(depth, _HD_MAX), -1.0),
        jnp.where(valid_px[..., None], normal, jnp.asarray([0.0, 0.0, 1.0])),
    )
    return out, acc_hd, DenoiserState(history=new_hist)
