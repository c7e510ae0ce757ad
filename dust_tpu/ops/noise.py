"""Spatio-temporal blue noise sampling.

Reference: ``crates/render/src/noise.rs`` + ``assets/stbn/*.png`` — six
128×128×64 STBN texture arrays (scalar / vec2 / unitvec2 / vec3 /
unitvec3 / unitvec3-cosine), indexed per frame by layer and fetched with
a per-frame random pixel offset (``push_constants.rand``, e.g.
``ambient_occlusion.rgen:27``).

The STBN PNGs are git-LFS stubs in the snapshot, so the tables are
regenerated: a true spatio-temporal blue-noise volume
(``assets/stbn128x64.npy``, built by ``tools/gen_bluenoise.py stbn`` via
stratified void-filling with a separable spatial/temporal gaussian
energy) provides per-slice-stratified u values that are spatially blue
in every layer AND per-pixel decorrelated across layers (the
frame-difference field is itself noise — the property golden-ratio
rotation lacks). Independent channels use toroidal rolls of the volume
in space and time, which preserve both properties while decorrelating
the channels. If the volume file is absent the loader falls back to
golden-ratio Cranley-Patterson rotations of the 2-D rank texture
(``assets/bluenoise128.npy``)."""

from __future__ import annotations

import os
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["BlueNoise", "load_blue_noise"]

SIZE = 128
LAYERS = 64
_PHI1 = 0.6180339887498949  # 1/phi
_PHI2 = (0.7548776662466927, 0.5698402909980532)  # R2 sequence


class BlueNoise:
    """Per-variant (LAYERS, SIZE, SIZE, C) float32 tables in [0,1)."""

    def __init__(self, scalar, vec2, vec3, unitvec2, unitvec3, unitvec3_cosine):
        self.scalar = scalar                    # (...,1)
        self.vec2 = vec2                        # (...,2)
        self.vec3 = vec3                        # (...,3)
        self.unitvec2 = unitvec2                # (...,2) encoded *0.5+0.5
        self.unitvec3 = unitvec3                # (...,3) encoded *0.5+0.5
        self.unitvec3_cosine = unitvec3_cosine  # (...,3) encoded *0.5+0.5

    def sample(self, table: jnp.ndarray, pix_xy: jnp.ndarray, frame_index,
               offset=(0, 0), rand=0) -> jnp.ndarray:
        """texelFetch(blue_noise[v], (pix + offset + rand) % 128, layer).

        ``pix_xy``: (..., 2) int32 pixel coords; ``rand`` is the per-frame
        scrambling like push_constants.rand."""
        layer = jnp.asarray(frame_index, jnp.int32) % LAYERS
        x = (pix_xy[..., 0] + offset[0] + rand) % SIZE
        y = (pix_xy[..., 1] + offset[1] + rand) % SIZE
        return table[layer, y, x]


def octant_sort_regions(table, rows: int = 8, cols: int = 128):
    """Statically reorder each (rows × cols) region of every layer of an
    encoded unit-vector table so texels are grouped by direction octant
    (lexsorted by (sign x, sign y, z)).

    The GI/AO cosine directions are deliberately decorrelated between
    adjacent pixels by STBN — the worst case for the Pallas kernel's
    lockstep (8,128) ray tiles, whose walk runs to the slowest ray
    (ARCHITECTURE roadmap item 2). Regions are chosen to coincide with
    the kernel's 8×128-pixel tiles (bn_fetch quantises its y-roll to
    multiples of ``rows`` when this table is in use), so each tile's rays
    share a direction octant run. Zero runtime cost — the transform is
    host-side, once.

    Trade-off: the per-PIXEL temporal sequence is no longer STBN (each
    frame a pixel reads a different texel of its region), i.e. temporal
    blueness degrades to shuffled-blue; spatial distribution per frame
    and the per-region value multiset are unchanged. Gated by the
    converged-GT RMSE tests like every other estimator knob."""
    t = np.asarray(table)
    L, H, W, C = t.shape
    out = t.copy()
    for li in range(L):
        for y0 in range(0, H, rows):
            for x0 in range(0, W, cols):
                reg = out[li, y0:y0 + rows, x0:x0 + cols].reshape(-1, C)
                v = reg * 2.0 - 1.0
                key = (v[:, 0] >= 0) * 2 + (v[:, 1] >= 0)
                order = np.lexsort((v[:, 2], key))
                out[li, y0:y0 + rows, x0:x0 + cols] = (
                    reg[order].reshape(rows, cols, C))
    return jnp.asarray(out)


def _rank_unit() -> np.ndarray:
    path = os.path.join(os.path.dirname(__file__), "..", "assets", "bluenoise128.npy")
    rank = np.load(path).astype(np.float64)
    return (rank + 0.5) / rank.size  # uniform in (0,1)


def _layers(u: np.ndarray, step: float) -> np.ndarray:
    """64 golden-ratio-rotated copies: (LAYERS, SIZE, SIZE)."""
    shifts = (np.arange(LAYERS)[:, None, None] * step) % 1.0
    return ((u[None] + shifts) % 1.0).astype(np.float32)


def _stbn_channels():
    """(3, LAYERS, SIZE, SIZE) from the true STBN volume, or None.

    Channels are toroidal rolls (space AND time) of one volume: each roll
    is itself a valid STBN volume and large coprime offsets decorrelate
    the channels (same trick the 2-D fallback uses)."""
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "stbn128x64.npy")
    if not os.path.exists(path):
        return None
    rank = np.load(path)
    if rank.shape != (LAYERS, SIZE, SIZE):
        return None
    u = (rank.astype(np.float64) + 0.5) / (SIZE * SIZE)  # per-slice strat.
    return [
        u.astype(np.float32),
        np.roll(u, (17, 37, 73), axis=(0, 1, 2)).astype(np.float32),
        np.roll(u, (43, 91, 23), axis=(0, 1, 2)).swapaxes(1, 2)
        .astype(np.float32),
    ]


@lru_cache(maxsize=1)
def load_blue_noise() -> BlueNoise:
    stbn = _stbn_channels()
    if stbn is not None:
        u0, u1, u2 = stbn
    else:
        base = _rank_unit()
        # Independent channels: toroidal shifts by large coprime offsets
        # keep each channel individually blue while decorrelating them.
        chan = [
            base,
            np.roll(base, (37, 73), axis=(0, 1)),
            np.roll(base, (91, 23), axis=(0, 1)).T,
        ]
        u0 = _layers(chan[0], _PHI1)
        u1 = _layers(chan[1], _PHI2[0])
        u2 = _layers(chan[2], _PHI2[1])

    scalar = u0[..., None]
    vec2 = np.stack([u0, u1], axis=-1)
    vec3 = np.stack([u0, u1, u2], axis=-1)

    theta = 2.0 * np.pi * u1
    unitvec2 = np.stack([np.cos(theta), np.sin(theta)], axis=-1) * 0.5 + 0.5

    # Uniform sphere from (u0, u1).
    z = 2.0 * u0 - 1.0
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    unitvec3 = np.stack([r * np.cos(theta), r * np.sin(theta), z], axis=-1) * 0.5 + 0.5

    # Cosine-weighted hemisphere about +z (the variant every GI ray uses;
    # shaders decode with *2-1 then rotateVectorByNormal).
    cz = np.sqrt(np.maximum(1.0 - u0, 0.0))
    cr = np.sqrt(u0)
    unitvec3_cos = np.stack(
        [cr * np.cos(theta), cr * np.sin(theta), cz], axis=-1
    ) * 0.5 + 0.5

    return BlueNoise(
        scalar=jnp.asarray(scalar),
        vec2=jnp.asarray(vec2),
        vec3=jnp.asarray(vec3),
        unitvec2=jnp.asarray(unitvec2.astype(np.float32)),
        unitvec3=jnp.asarray(unitvec3.astype(np.float32)),
        unitvec3_cosine=jnp.asarray(unitvec3_cos.astype(np.float32)),
    )
