"""Histogram auto-exposure.

Reference: ``assets/shaders/auto_exposure.comp`` (256-bin log-luminance
histogram with shared-memory atomics) + ``auto_exposure_avg.comp``
(index-weighted reduction + temporal adaptation). On TPU the histogram is
one ``scatter-add``/bincount — no atomics needed — and the reduction is a
dot product.
"""

from __future__ import annotations

import jax.numpy as jnp

from dust_tpu.config import ExposureSettings
from dust_tpu.utils import color as colorlib

__all__ = ["luminance_histogram", "adapt_average_luminance", "exposure_value"]


def luminance_histogram(radiance: jnp.ndarray, settings: ExposureSettings) -> jnp.ndarray:
    """colorToBin + histogram build (auto_exposure.comp:20-36,55-70).

    ``radiance``: (..., 3) linear radiance (already YCoCg-unpacked).
    Returns (256,) int32 counts.
    """
    lum = colorlib.luminance_rec601(radiance.reshape(-1, 3), xp=jnp)
    log_lum = jnp.clip(
        (jnp.log2(jnp.maximum(lum, 1e-30)) - settings.min_log_luminance)
        / settings.log_luminance_range,
        0.0,
        1.0,
    )
    bins = jnp.where(
        lum < 0.005, 0, (log_lum * 254.0 + 1.0).astype(jnp.int32)
    )
    # Histogram via sort + boundary search: TPU scatter-add into 256 bins
    # serialises; a 2M-element sort is ~3 ms and searchsorted is tiny.
    sorted_bins = jnp.sort(bins)
    edges = jnp.searchsorted(
        sorted_bins, jnp.arange(settings.num_bins + 1, dtype=jnp.int32)
    )
    return jnp.diff(edges).astype(jnp.int32)


def adapt_average_luminance(
    histogram: jnp.ndarray,
    previous_avg: jnp.ndarray,
    num_pixels: int,
    settings: ExposureSettings,
) -> jnp.ndarray:
    """auto_exposure_avg.comp: index-weighted mean -> log-space luminance,
    then temporal adaptation toward it."""
    idx = jnp.arange(settings.num_bins, dtype=jnp.float32)
    weighted = jnp.sum(histogram.astype(jnp.float32) * idx)
    weighted_log_avg = weighted / jnp.maximum(num_pixels, 1.0) - 1.0
    avg_lum = jnp.exp2(
        (weighted_log_avg / 254.0) * settings.log_luminance_range
        + settings.min_log_luminance
    )
    adapted = previous_avg + (avg_lum - previous_avg) * settings.time_coefficient
    return adapted


def exposure_value(avg_luminance: jnp.ndarray) -> jnp.ndarray:
    """tone_map.comp:198-199: exposure = 9.6 / (9.6 * avg) == 1/avg."""
    exposure = 1.0 / (9.6 * jnp.maximum(avg_luminance, 1e-8))
    return exposure * 9.6
