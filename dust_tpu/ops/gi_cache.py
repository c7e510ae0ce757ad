"""Dense GI radiance cache: the TPU-first replacement for the spatial hash.

The reference's GI cache (``assets/shaders/headers/spatial_hash.glsl``) is
a 32Mi-entry open-addressed hash keyed by (quantized leaf-center world
position, cube face id). A hash is the right call on a GPU with an
unbounded streamed world; it pays for generality with collisions, LRU
evictions, probe chains — and, on a TPU, with random 2M-row gathers from
a 64+ MB table (~32 ms) and a 345k-row scatter per insert (~35 ms).

This module keys the *same* quantity a different way. With ≤256³ models,
every cell the hash could ever hold is one of ``instances × leaf_rows ×
6 faces`` — a few hundred thousand rows that enumerate statically. The
cache is therefore a dense ``(R, 4)`` table ``[radiance_acescg rgb,
sample_count]`` indexed by ``(instance, leaf_row, world_face)``:

* **get** is a narrow gather from a ~3 MB table (fast; later rounds can
  lift it into the Pallas trace kernel, the table fits VMEM),
* **insert** is *elementwise*: the surfel pool in dense mode IS the cell
  list, so every cell updates its own row — no scatter, no sort, no
  collisions, no eviction, and deterministic by construction,
* the running-mean blend and the 404-sample cap replicate
  ``spatial_hash.glsl:179-195`` exactly.

Keying equivalence: for rigid instances the reference's world cell
``trunc(leaf_center_world / 4)`` is in 1:1 correspondence with
``(instance, leaf_row)`` — leaf centers are 4 voxels apart — and the face
id is the world-space cube face in both schemes. Two instances that
overlap the same world cell share radiance in the reference and keep
separate rows here (strictly less aliasing). The spatial hash remains
available (``RenderSettings.gi_cache = "hash"``) for unbounded scenes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = [
    "DenseGICache", "make_dense_gi_cache", "dense_rows", "dense_index",
    "dense_get", "dense_update", "MAX_SAMPLE_COUNT",
]

MAX_SAMPLE_COUNT = 404  # spatial_hash.glsl:179


class DenseGICache(NamedTuple):
    """[r, g, b (ACEScg), sample_count] per (instance, leaf_row, face).

    f16 storage halves the 2M-ray fetch (TPU gather cost scales with row
    bytes); the running mean runs in f32 and rounds on store — the same
    precision budget as the reference's LogLuv-packed hash rows. Counts
    ≤ 404 are exact in f16."""

    table: jnp.ndarray  # (R, 4) float16

    @property
    def radiance(self) -> jnp.ndarray:
        return self.table[:, :3].astype(jnp.float32)

    @property
    def count(self) -> jnp.ndarray:
        return self.table[:, 3].astype(jnp.float32)


def dense_rows(scene) -> int:
    """Static cache row count for a DeviceScene."""
    lmax = scene.mask_lo.shape[1]
    return scene.num_instances * lmax * 6


def make_dense_gi_cache(rows: int) -> DenseGICache:
    return DenseGICache(table=jnp.zeros((rows, 4), jnp.float16))


def dense_index(lmax: int, inst: jnp.ndarray, row: jnp.ndarray,
                face: jnp.ndarray) -> jnp.ndarray:
    """Flat cache row for a hit; miss lanes clamp to row 0 (callers gate
    with ``valid``)."""
    i = jnp.maximum(inst, 0)
    r = jnp.clip(row, 0, lmax - 1)
    f = jnp.clip(face, 0, 5)
    return (i * lmax + r) * 6 + f


def dense_get(cache: DenseGICache, idx: jnp.ndarray, valid: jnp.ndarray):
    """Returns (found, radiance_acescg, sample_count) — the hash_get
    contract (spatial_hash.glsl:200-220) without probes or fingerprints:
    a cell is found iff it has ever been written."""
    rows = jnp.take(cache.table, idx, axis=0).astype(jnp.float32)
    count = rows[..., 3]
    found = valid & (count > 0)
    radiance = jnp.where(found[..., None], rows[..., :3], 0.0)
    return found, radiance, jnp.where(found, count, 0.0)


def dense_update(cache: DenseGICache, value: jnp.ndarray,
                 valid: jnp.ndarray) -> DenseGICache:
    """Elementwise running-mean insert, one value per cache row
    (spatial_hash.glsl:186-195's blend, scatter-free: in dense mode the
    surfel pool enumerates the rows)."""
    c0 = jnp.minimum(cache.count, float(MAX_SAMPLE_COUNT - 1))
    new_rad = (cache.radiance * c0[:, None] + value) / (c0 + 1.0)[:, None]
    new_cnt = jnp.minimum(cache.count + 1.0, float(MAX_SAMPLE_COUNT))
    table = jnp.where(
        valid[:, None],
        jnp.concatenate([new_rad, new_cnt[:, None]],
                        axis=-1).astype(jnp.float16),
        cache.table,
    )
    return DenseGICache(table=table)
