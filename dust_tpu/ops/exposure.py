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

__all__ = ["luminance_histogram", "adapt_average_luminance",
           "mean_bin", "exposure_value"]


def _bins(radiance: jnp.ndarray, settings: ExposureSettings) -> jnp.ndarray:
    """colorToBin (auto_exposure.comp:20-36): per-pixel log-luminance bin.
    Works in the input's native shape — reshaping to (N,3) here forces a
    whole-image layout copy (~3 ms at 1080p)."""
    lum = colorlib.luminance_rec601(radiance, xp=jnp)
    log_lum = jnp.clip(
        (jnp.log2(jnp.maximum(lum, 1e-30)) - settings.min_log_luminance)
        / settings.log_luminance_range,
        0.0,
        1.0,
    )
    return jnp.where(
        lum < 0.005, 0, (log_lum * 254.0 + 1.0).astype(jnp.int32)
    )


def luminance_histogram(radiance: jnp.ndarray, settings: ExposureSettings) -> jnp.ndarray:
    """Histogram build (auto_exposure.comp:55-70). Returns (256,) int32
    counts. Diagnostic/parity API — the render pipeline uses
    :func:`mean_bin`, which needs no histogram at all.
    """
    bins = _bins(radiance, settings).reshape(-1)
    # Histogram via sort + boundary search: TPU scatter-add into 256 bins
    # serialises; a 2M-element sort is ~3 ms and searchsorted is tiny.
    sorted_bins = jnp.sort(bins)
    edges = jnp.searchsorted(
        sorted_bins, jnp.arange(settings.num_bins + 1, dtype=jnp.int32)
    )
    return jnp.diff(edges).astype(jnp.int32)


def mean_bin(radiance: jnp.ndarray, settings: ExposureSettings) -> jnp.ndarray:
    """``sum(histogram * bin_index)`` without building the histogram:
    the index-weighted histogram total IS the sum of per-pixel bins
    (mathematically; the f32 reduction rounds past 2^24 just like the
    histogram path did), so the auto-exposure chain reduces to one
    ``jnp.sum`` over the bin image, skipping the 2M-element sort."""
    return jnp.sum(_bins(radiance, settings).astype(jnp.float32))


def adapt_average_luminance(
    histogram: jnp.ndarray,
    previous_avg: jnp.ndarray,
    num_pixels: int,
    settings: ExposureSettings,
    weighted: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """auto_exposure_avg.comp: index-weighted mean -> log-space luminance,
    then temporal adaptation toward it. Pass ``weighted`` (from
    :func:`mean_bin`) to skip the histogram entirely."""
    if weighted is None:
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
