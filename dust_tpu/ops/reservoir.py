"""Reservoir packing for future ReSTIR work.

Reference: ``assets/shaders/headers/reservoir.glsl`` (190 LoC) — RTXDI-
style reservoir pack/unpack + octahedral direction encode. The reference
ships it unused ("future ReSTIR work", SURVEY §2.7); ported for parity so
the sampling layer can grow into weighted reservoir resampling.

Packed layout (mirrors ``PackedReservoir`` in layout.playout):
  sample_count u16 | direction u32 (oct) | radiance u32 (LogLuv) | weight f32
Here the struct-of-arrays form is four arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dust_tpu.ops.packing import (
    decode_logluv, decode_oct_normal, encode_logluv, encode_oct_normal,
)

__all__ = ["Reservoir", "make_reservoirs", "reservoir_update", "pack_reservoir",
           "unpack_reservoir"]


class Reservoir(NamedTuple):
    sample_count: jnp.ndarray  # (N,) int32
    direction: jnp.ndarray     # (N,3) float32 unit
    radiance: jnp.ndarray      # (N,3) float32
    weight_sum: jnp.ndarray    # (N,) float32


def make_reservoirs(n: int) -> Reservoir:
    return Reservoir(
        sample_count=jnp.zeros(n, jnp.int32),
        direction=jnp.zeros((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        weight_sum=jnp.zeros(n, jnp.float32),
    )


def reservoir_update(res: Reservoir, direction, radiance, weight, u) -> Reservoir:
    """Weighted reservoir sampling step: keep the new sample with
    probability weight / (weight_sum + weight); ``u`` uniform in [0,1)."""
    new_sum = res.weight_sum + weight
    take = u * new_sum < weight
    return Reservoir(
        sample_count=res.sample_count + 1,
        direction=jnp.where(take[..., None], direction, res.direction),
        radiance=jnp.where(take[..., None], radiance, res.radiance),
        weight_sum=new_sum,
    )


def pack_reservoir(res: Reservoir):
    """-> (sample_count u16-range i32, oct-dir u32, LogLuv u32, weight f32)."""
    oct = encode_oct_normal(res.direction)
    dir_u = (jnp.clip(oct[..., 0] * 65535.0, 0, 65535).astype(jnp.uint32) << 16) | \
        jnp.clip(oct[..., 1] * 65535.0, 0, 65535).astype(jnp.uint32)
    return (
        jnp.clip(res.sample_count, 0, 65535),
        dir_u,
        encode_logluv(res.radiance),
        res.weight_sum,
    )


def unpack_reservoir(count, dir_u, rad_u, weight) -> Reservoir:
    oct = jnp.stack(
        [((dir_u >> 16) & 0xFFFF).astype(jnp.float32) / 65535.0,
         (dir_u & 0xFFFF).astype(jnp.float32) / 65535.0], axis=-1)
    return Reservoir(
        sample_count=count.astype(jnp.int32),
        direction=decode_oct_normal(oct),
        radiance=decode_logluv(rad_u),
        weight_sum=weight,
    )
