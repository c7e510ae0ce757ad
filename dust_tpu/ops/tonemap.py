"""Tone mapping: albedo modulation, exposure, ACES fit, output OETFs.

Reference: ``assets/shaders/tone_map.comp`` — radiance (YCoCg-unpacked) ×
linearised albedo, exposure from the auto-exposure average, optional
color-space conversion matrix (a specialization constant; identity for
sRGB output), the Stephen Hill ACES RRT+ODT fit, then one of 9 output
transfer functions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dust_tpu.utils import color as colorlib

__all__ = ["aces_fitted", "oetf", "tonemap", "TRANSFER_FUNCTIONS"]

# sRGB => XYZ => D65_2_D60 => AP1 => RRT_SAT (tone_map.comp:47-52). The
# GLSL mat3 constructor is column-major; these are the row-major
# equivalents applied as color @ M (matching `fitted_color *= rgb_to_rrt`,
# i.e. vector-times-matrix).
_RGB_TO_RRT = np.array(
    [
        [0.59719, 0.35458, 0.04823],
        [0.07600, 0.90834, 0.01566],
        [0.02840, 0.13383, 0.83777],
    ],
    dtype=np.float32,
)
_ODT_TO_RGB = np.array(
    [
        [1.60475, -0.53108, -0.07367],
        [-0.10208, 1.10813, -0.00605],
        [-0.00327, -0.07276, 1.07602],
    ],
    dtype=np.float32,
)

TRANSFER_FUNCTIONS = (
    "linear", "srgb", "scrgb", "dci_p3", "display_p3", "itu", "pq", "hlg",
    "adobe_rgb",
)


def _rrt_and_odt_fit(v: jnp.ndarray) -> jnp.ndarray:
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return a / b


def aces_fitted(color: jnp.ndarray) -> jnp.ndarray:
    """ACESFitted (tone_map.comp:42-70): expects (display-)linear RGB."""
    c = jnp.einsum("...j,jk->...k", color, jnp.asarray(_RGB_TO_RRT.T), precision="highest")
    c = _rrt_and_odt_fit(c)
    return jnp.einsum("...j,jk->...k", c, jnp.asarray(_ODT_TO_RGB.T), precision="highest")


def oetf(c: jnp.ndarray, transfer: str = "srgb") -> jnp.ndarray:
    """SwapchainOETF (tone_map.comp:96-160)."""
    if transfer == "linear":
        return c
    if transfer == "srgb":
        return jnp.where(
            c <= 0.0031308, 12.92 * c,
            1.055 * jnp.maximum(c, 1e-12) ** (1.0 / 2.4) - 0.055,
        )
    if transfer == "scrgb":
        neg = -1.055 * jnp.maximum(-c, 1e-12) ** (1.0 / 2.4) + 0.055
        return jnp.where(c <= -0.0031308, neg, oetf(jnp.maximum(c, 0.0), "srgb"))
    if transfer == "dci_p3":
        return jnp.maximum(c / 52.37, 0.0) ** (1.0 / 2.6)
    if transfer == "display_p3":
        return jnp.where(
            c < 0.0030186, 12.92 * c,
            1.055 * jnp.maximum(c, 1e-12) ** (1.0 / 2.4) - 0.055,
        )
    if transfer == "itu":
        alpha, beta = 1.0993, 0.0181
        return jnp.where(
            c < beta, 4.5 * c,
            alpha * jnp.maximum(c, 1e-12) ** 0.45 - (alpha - 1.0),
        )
    if transfer == "pq":
        m1 = 2610.0 / 16384.0
        m2 = (2523.0 / 4096.0) * 128.0
        c2 = (2413.0 / 4096.0) * 32.0
        c3 = (2392.0 / 4096.0) * 32.0
        c1 = c3 - c2 + 1.0
        lm = jnp.maximum(c, 0.0) ** m1
        return ((c1 + c2 * lm) / (1.0 + c3 * lm)) ** m2
    if transfer == "hlg":
        a, b, cc = 0.17883277, 1.0 - 4.0 * 0.17883277, 0.55991073
        return jnp.where(
            c < 1.0 / 12.0, jnp.sqrt(jnp.maximum(3.0 * c, 0.0)),
            a * jnp.log(jnp.maximum(12.0 * c - b, 1e-12)) + cc,
        )
    if transfer == "adobe_rgb":
        return jnp.maximum(c, 0.0) ** (256.0 / 563.0)
    raise ValueError(f"unknown transfer function {transfer!r}")


def tonemap(radiance: jnp.ndarray, albedo_srgb: jnp.ndarray,
            exposure: jnp.ndarray, transfer: str = "srgb",
            color_matrix: np.ndarray | None = None) -> jnp.ndarray:
    """The tone_map.comp main body.

    ``radiance``: (...,3) linear ACEScg illuminance (already unpacked).
    ``albedo_srgb``: (...,3) sRGB-encoded albedo (as stored in the
    G-buffer / R10G10B10A2 image).
    """
    albedo_lin = colorlib.srgb_eotf(albedo_srgb, xp=jnp)
    srgb = colorlib.acescg_to_srgb(radiance, xp=jnp) * albedo_lin
    mapped = colorlib.srgb_to_acescg(srgb, xp=jnp) * exposure
    if color_matrix is not None:
        mapped = jnp.einsum("...j,jk->...k", mapped,
                            jnp.asarray(np.asarray(color_matrix, np.float32).T),
                            precision="highest")
    mapped = aces_fitted(mapped)
    return jnp.clip(oetf(mapped, transfer), 0.0, 1.0)
