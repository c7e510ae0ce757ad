"""Hošek-Wilkie analytic sky + solar radiance.

Reference: host-side bake in ``crates/render/src/pipeline/sky.rs``
(quintic Bézier interpolation over the vendored datasets, solar direct
radiance with piecewise-polynomial fit) and device-side evaluation in
``assets/shaders/headers/sky.glsl`` (9-coefficient radiance model +
solar disc with limb darkening).

``dust_tpu/assets/hosek_sky.npz`` holds the public-domain ArHosekSkyModel
dataset (Hošek & Wilkie 2012 reference implementation), converted from
the binary blobs the reference vendors at
``crates/render/src/pipeline/dataset{,Solar}.bin``.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from dust_tpu.config import SunlightSettings
from dust_tpu.utils import color as colorlib

__all__ = ["SkyModelState", "bake_sky", "sky_radiance", "sun_radiance"]

_DATA = None


def _dataset():
    global _DATA
    if _DATA is None:
        path = os.path.join(os.path.dirname(__file__), "..", "assets", "hosek_sky.npz")
        _DATA = dict(np.load(path))
    return _DATA


class SkyModelState(NamedTuple):
    """The baked per-frame sky uniform (``SkyModelState``, sky.rs:78-85 /
    ``ArHosekSkyModelConfiguration`` in layout.playout). All fields are
    device arrays so the bake can be jitted away if needed."""

    configs: jnp.ndarray        # (3, 9) per-channel 9-coef model
    radiances: jnp.ndarray      # (3,) per-channel radiance scale
    ld_coefs: jnp.ndarray       # (3, 6) limb-darkening coefficients
    direction: jnp.ndarray      # (3,) unit, eye -> sun
    solar_intensity: jnp.ndarray  # (3,) XYZ direct solar radiance
    solar_radius: jnp.ndarray   # () angular radius (rad)


def _coefficient(elev_matrix: np.ndarray, x: float) -> np.ndarray:
    """Quintic Bézier over the 6 elevation control points (sky.rs:135-143).
    ``elev_matrix`` is (6, ...)."""
    rx = 1.0 - x
    w = np.array(
        [rx**5, 5 * rx**4 * x, 10 * rx**3 * x**2,
         10 * rx**2 * x**3, 5 * rx * x**4, x**5]
    )
    return np.tensordot(w, elev_matrix, axes=(0, 0))


def _cook(low: np.ndarray, high: np.ndarray, turbidity: float,
          albedo: np.ndarray, x: float) -> np.ndarray:
    """Bilinear turbidity/albedo blend (sky.rs:145-227). ``low``/``high``
    are (10, ..., 6, 3) indexed by integer turbidity."""
    it = int(turbidity)
    rem = turbidity - it
    res = (1.0 - albedo) * (1.0 - rem) * _coefficient(np.moveaxis(low[it - 1], -2, 0), x)
    res += albedo * (1.0 - rem) * _coefficient(np.moveaxis(high[it - 1], -2, 0), x)
    if it < 10:
        res += (1.0 - albedo) * rem * _coefficient(np.moveaxis(low[it], -2, 0), x)
        res += albedo * rem * _coefficient(np.moveaxis(high[it], -2, 0), x)
    return res


def _solar_radiance_internal(turbidity: int, elevation: float, data) -> np.ndarray:
    """arhosekskymodel_sr_internal_xyz (sky.rs:229-254)."""
    pieces, order = 45, 4
    elevation = max(elevation, 0.0)  # below-horizon suns clamp (the rust
    # powf would produce NaN; the sky eval is black there anyway)
    pos = int((2.0 * elevation / np.pi) ** (1.0 / 3.0) * pieces)
    pos = min(pos, pieces - 1)
    break_x = (pos / pieces) ** 3 * (np.pi / 2.0)
    x = elevation - break_x
    coefs = data["solar_dataset"][order * pieces * turbidity + order * pos:][:order]
    res = np.zeros(3)
    x_exp = 1.0
    for coef in coefs[::-1]:
        res += coef * x_exp
        x_exp *= x
    return res


def bake_sky(s: SunlightSettings) -> SkyModelState:
    """Host-side bake: Sunlight -> SkyModelState (sky.rs:87-133)."""
    data = _dataset()
    direction = np.asarray(s.direction, np.float64)
    direction = direction / np.linalg.norm(direction)
    albedo = np.asarray(s.albedo, np.float64)
    elevation = float(np.arcsin(np.clip(direction[1], -1.0, 1.0)))
    x = (max(elevation, 0.0) / (np.pi / 2.0)) ** (1.0 / 3.0)

    # configs: (9, 3) -> per-channel (3, 9)
    cfg = _cook(data["config_low_albedo"], data["config_high_albedo"],
                s.turbidity, albedo, x)  # (9, 3) after tensordot? shape check in tests
    rad = _cook(data["rad_low_albedo"], data["rad_high_albedo"], s.turbidity, albedo, x)

    # Solar direct radiance with turbidity interpolation (sky.rs:255-268).
    turb_low = int(s.turbidity) - 1
    turb_frac = s.turbidity - (turb_low + 1)
    if turb_low == 9:
        turb_low, turb_frac = 8, 1.0
    solar = (1.0 - turb_frac) * _solar_radiance_internal(turb_low, elevation, data) \
        + turb_frac * _solar_radiance_internal(turb_low + 1, elevation, data)

    ld = data["solar_ld"]  # (6, 3)
    return SkyModelState(
        configs=jnp.asarray(cfg.T, jnp.float32),          # (3, 9)
        radiances=jnp.asarray(rad, jnp.float32),          # (3,)
        ld_coefs=jnp.asarray(ld.T, jnp.float32),          # (3, 6)
        direction=jnp.asarray(direction, jnp.float32),
        solar_intensity=jnp.asarray(solar, jnp.float32),
        solar_radius=jnp.asarray(s.solar_radius, jnp.float32),
    )


def sky_radiance(state: SkyModelState, dirs: jnp.ndarray) -> jnp.ndarray:
    """arhosek_sky_radiance (sky.glsl:18-79): per-direction ACEScg radiance.

    ``dirs`` (..., 3) must be normalised. Returns 0 when the sun is below
    the horizon (the reference's NaN guard)."""
    cos_theta = jnp.clip(dirs[..., 1], 0.0, 1.0)
    cos_gamma = jnp.clip(jnp.sum(dirs * state.direction, axis=-1), -1.0, 1.0)
    # gamma stays f32: near the sun disc 1-cos_gamma is tiny and
    # arccos amplifies a bf16 cos_gamma's quantisation into a visibly
    # wrong aureole. Everything PAST the arccos runs in bf16 — the
    # model is smooth there and the output feeds an RGB9E5 history /
    # 8-bit tonemap; ~2x on the exp/sqrt/div VPU chain at 2M rays.
    gamma = jnp.arccos(cos_gamma)
    bf = jnp.bfloat16
    ct = cos_theta.astype(bf)
    cg = cos_gamma.astype(bf)

    c = state.configs.astype(bf)  # (3, 9)
    exp_m = jnp.exp(c[:, 4] * gamma.astype(bf)[..., None])
    ray_m = (cg * cg)[..., None]
    # d^1.5 written as d*sqrt(d): jnp.power lowers to exp(1.5*log(d)) on
    # the VPU, ~3x the cost of a sqrt+mul at identical precision.
    mie_d = 1.0 + c[:, 8] ** 2 - 2.0 * c[:, 8] * cg[..., None]
    mie = (1.0 + ray_m) / (mie_d * jnp.sqrt(mie_d))
    zenith = jnp.sqrt(ct)[..., None]
    xyz = (
        (1.0 + c[:, 0] * jnp.exp(c[:, 1] / (ct[..., None] + 0.01)))
        * (c[:, 2] + c[:, 3] * exp_m + c[:, 5] * ray_m + c[:, 6] * mie + c[:, 7] * zenith)
    ).astype(jnp.float32) * state.radiances
    xyz = xyz * 683.0
    out = colorlib.xyz_to_acescg(xyz, xp=jnp)
    sun_up = state.direction[1] > 0
    return jnp.where(sun_up, out, 0.0)


def sun_radiance(state: SkyModelState, dirs: jnp.ndarray) -> jnp.ndarray:
    """arhosek_sun_radiance (sky.glsl:81-113): solar disc with limb
    darkening. Nonzero only within the disc; ACEScg."""
    cos_gamma = jnp.sum(dirs * state.direction, axis=-1)
    sol_rad_sin = jnp.sin(state.solar_radius)
    ar2 = 1.0 / (sol_rad_sin * sol_rad_sin)
    singamma = 1.0 - cos_gamma * cos_gamma
    sc2 = 1.0 - ar2 * singamma * singamma
    sample_cosine = jnp.sqrt(jnp.maximum(sc2, 0.0))

    ld = state.ld_coefs  # (3, 6)
    darkening = ld[:, 0] + ld[:, 1] * sample_cosine[..., None]
    cur = sample_cosine
    for i in range(4):
        cur = cur * sample_cosine
        darkening = darkening + ld[:, 2 + i] * cur[..., None]
    xyz = state.solar_intensity * darkening
    out = colorlib.xyz_to_acescg(xyz, xp=jnp)
    visible = (cos_gamma >= 0.0) & (dirs[..., 1] >= 0.0) & (sc2 > 0.0)
    return jnp.where(visible[..., None], out, 0.0)
