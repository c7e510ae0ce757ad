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
cache is therefore a dense table indexed by ``(instance, leaf_row,
world_face)``:

Rows are FACE-MAJOR (``row = face * cells + cell``; cell = per-instance
base + leaf_row): the surfel pass enumerates rows in order, and a face-
major pool gives every lockstep ray tile one face (coherent hemisphere,
tile-uniform NEE facing — measured in tools/surfel_sim.py).

* **get** is one narrow gather from a ~MB-scale table (fast),
* **insert** is *elementwise*: the surfel pool in dense mode IS the cell
  list, so every cell updates its own row — no scatter, no sort, no
  collisions, no eviction, and deterministic by construction,
* the running-mean blend and the 404-sample cap replicate
  ``spatial_hash.glsl:179-195`` exactly.

Row layout (3 × int32 = 12 B — TPU gather cost scales with row count,
and the 2M-ray fetch pays once per frame, so the row also CARRIES the
leaf's average albedo; that deletes the separate per-hit ``leaf_attr_fg``
gather the final-gather/surfel shading used to pay):

    w0 = f16(radiance r) | f16(radiance g) << 16      (ACEScg)
    w1 = f16(radiance b) | sample_count(u16) << 16     (count ≤ 404 exact)
    w2 = leaf avg albedo (R10G10B10A2, vox geometry pack)

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

import jax
import jax.numpy as jnp

__all__ = [
    "DenseGICache", "make_dense_gi_cache", "dense_rows", "dense_cells",
    "cell_layout", "dense_index", "dense_get", "dense_update",
    "dense_update_slice", "pack_working_set", "MAX_SAMPLE_COUNT",
    "padded_cells",
]

MAX_SAMPLE_COUNT = 404  # spatial_hash.glsl:179

# Cache CELLS are padded to a multiple of this so the table's leading
# axis (6 * cells, face-major) divides evenly over any power-of-two
# device mesh (and over the Pallas 8x128 ray blocks): the multi-chip
# path shards the table BY ROW RANGE — each device updates its 1/N of
# the rows elementwise (zero-collective insert) and readers pay one
# small all-gather instead of the old full-table all-reduce merge
# (ARCHITECTURE.md v5e-8 Amdahl analysis).
#
# Row layout is FACE-MAJOR: ``row = face * cells + cell``. The surfel
# pass enumerates the pool in row order, so face-major makes every
# 1024-ray Pallas tile a run of consecutive hierarchy-order cells of
# ONE world face — a coherent cosine hemisphere, and (the measured win,
# tools/surfel_sim.py) tile-uniform sun-NEE facing: 83/171 canonical
# shadow tiles become entirely dead and skip the march loop outright
# (cell-major: 0 dead tiles, every tile mixed 6 faces).
CELL_PAD = 512


def padded_cells(n: int) -> int:
    """Smallest STRICTLY larger CELL_PAD multiple — ≥1 padding cell so
    the routing row (last row of the table) is never a real cell."""
    return (n // CELL_PAD + 1) * CELL_PAD


def _f16_bits(x):
    return jax.lax.bitcast_convert_type(
        x.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)


def _bits_f16(b):
    return jax.lax.bitcast_convert_type(
        (b & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)


class DenseGICache(NamedTuple):
    """Packed rows per (instance, leaf_row, face) — layout in module doc."""

    table: jnp.ndarray  # (R, 3) int32

    @property
    def radiance(self) -> jnp.ndarray:
        w = self.table.astype(jnp.uint32)
        return jnp.stack(
            [_bits_f16(w[:, 0]), _bits_f16(w[:, 0] >> 16),
             _bits_f16(w[:, 1])], axis=-1)

    @property
    def count(self) -> jnp.ndarray:
        return (self.table[:, 1].astype(jnp.uint32) >> 16).astype(jnp.float32)


def cell_layout(scene) -> tuple[tuple, tuple, int]:
    """Per-INSTANCE (cell_base, cell_cap) of the cache's (instance,
    leaf_row, face) key space, plus the total cell count.

    Cell capacities are the scene's pinned ``gi_cell_cap`` (TIGHT
    64-aligned per-model leaf counts) rather than the flat leaf tables'
    25%-headroom segments: the cache's row count is what the per-frame
    2M-ray GI gather pays for (fast gather emitter below ~220k rows,
    render/scene.py dead-zone note), while splice growth past the
    pinned cap just shades uncached (dense_index routes those rows to
    the zero padding tail — no aliasing) until the next full rebuild."""
    caps = tuple(scene.gi_cell_cap[m] for m in scene.inst_model)
    bases = []
    b = 0
    for c in caps:
        bases.append(b)
        b += c
    return tuple(bases), caps, b


def dense_cells(scene) -> int:
    """Cache length in CELLS (rows / 6) — the padded cell-list length
    the surfel pass and working-set enumeration must use to stay
    row-aligned with the (face-major) table. Padded so the ×6 row count
    clears the gather emitter's dead zone (render/scene.py note)."""
    from dust_tpu.render.scene import pad_rows_past_dead_zone
    _, _, total = cell_layout(scene)
    c = padded_cells(total)
    while True:
        c2 = -(-pad_rows_past_dead_zone(c * 6) // 6)
        if c2 == c:
            return c
        c = padded_cells(c2 - 1)


def dense_rows(scene) -> int:
    """Static cache row count (= table length, 6 × padded cells,
    face-major ``row = face * cells + cell``). The padding holds zero
    rows; dense_index also routes leaf rows past the pinned cell caps
    there (count 0 -> found=False)."""
    return dense_cells(scene) * 6


def _albedo_words(scene) -> jnp.ndarray:
    """Per-(instance, leaf, face) albedo word — 6 faces share the leaf's
    average albedo (R10G10B10A2). Face-major: the per-cell column tiles
    6× (a broadcast, not the scalar-path ``jnp.repeat``). Padded with
    zeros to dense_cells."""
    _, caps, _ = cell_layout(scene)
    parts = [scene.avg_albedo[m, :caps[i]]
             for i, m in enumerate(scene.inst_model)]
    alb = jnp.concatenate(parts) if parts else jnp.zeros(0, jnp.uint32)
    alb = alb.astype(jnp.uint32)
    pad = dense_cells(scene) - alb.shape[0]
    if pad:
        alb = jnp.concatenate([alb, jnp.zeros(pad, jnp.uint32)])
    return jnp.broadcast_to(alb[None, :], (6, alb.shape[0])).reshape(-1)


def make_dense_gi_cache(scene) -> DenseGICache:
    """Zero-radiance cache with each row's albedo word pre-filled from
    the scene's per-leaf average albedo (6 faces share the leaf's)."""
    alb6 = _albedo_words(scene)
    zeros = jnp.zeros_like(alb6)
    return DenseGICache(table=jax.lax.bitcast_convert_type(
        jnp.stack([zeros, zeros, alb6], axis=-1), jnp.int32))


def pack_working_set_rows(radiance: jnp.ndarray, count: jnp.ndarray,
                          albedo_col: jnp.ndarray) -> jnp.ndarray:
    """Pack probed radiance/counts into (S, 3) int32 cache rows, carrying
    the caller's (S, 1) int32 albedo column through (the albedo words are
    static per scene — rotating-slice updates re-use the persistent
    working set's own column 2)."""
    cnt = jnp.clip(count, 0, MAX_SAMPLE_COUNT).astype(jnp.uint32)
    w0 = _f16_bits(radiance[:, 0]) | (_f16_bits(radiance[:, 1]) << 16)
    w1 = _f16_bits(radiance[:, 2]) | (cnt << 16)
    packed = jax.lax.bitcast_convert_type(
        jnp.stack([w0, w1], axis=-1), jnp.int32)
    return jnp.concatenate([packed, albedo_col], axis=-1)


def pack_working_set(radiance: jnp.ndarray, count: jnp.ndarray,
                     scene) -> DenseGICache:
    """Pack per-(instance, leaf, face) radiance + sample counts into
    dense-cache rows (the hash mode's per-frame working set: ray-side
    GI reads become the same small-table gather as dense mode — see
    render/pipeline.py's hash branch)."""
    cnt = jnp.clip(count, 0, MAX_SAMPLE_COUNT).astype(jnp.uint32)
    w0 = _f16_bits(radiance[:, 0]) | (_f16_bits(radiance[:, 1]) << 16)
    w1 = _f16_bits(radiance[:, 2]) | (cnt << 16)
    return DenseGICache(table=jax.lax.bitcast_convert_type(
        jnp.stack([w0, w1, _albedo_words(scene)], axis=-1), jnp.int32))


def dense_index(scene, inst: jnp.ndarray, row: jnp.ndarray,
                face: jnp.ndarray) -> jnp.ndarray:
    """Flat cache row for a hit (per-instance segment layout, see
    :func:`cell_layout`); miss lanes clamp into valid rows (callers gate
    with ``valid``), and leaf rows past the instance's pinned cell cap
    read the zero padding tail (found=False, never aliased)."""
    bases, caps, _ = cell_layout(scene)
    i = jnp.maximum(inst, 0)
    base = jnp.asarray(bases, jnp.int32)[i]
    cap = jnp.asarray(caps, jnp.int32)[i]
    r = jnp.maximum(row, 0)
    f = jnp.clip(face, 0, 5)
    cells = dense_cells(scene)
    idx = f * cells + base + jnp.minimum(r, cap - 1)
    return jnp.where(r < cap, idx, cells * 6 - 1)


def dense_get(cache: DenseGICache, idx: jnp.ndarray, valid: jnp.ndarray):
    """Returns (found, radiance_acescg, sample_count, albedo_u32) — the
    hash_get contract (spatial_hash.glsl:200-220) without probes or
    fingerprints, plus the leaf albedo riding in the same row."""
    # Plain column slicing: XLA fuses the gather into one transpose-copy
    # to channel-planar (~5.6 ms total at 2M rays). Both masked-sum
    # variants measured WORSE here (10-12.5 ms): with a barrier the
    # (N,3) row-major gather output materialises tile-padded (3->128
    # lanes, ~170 MB of traffic); without one the gather duplicates into
    # each reduce. The shade.resolve_hits trick only pays when the row
    # reduces to a single (N,) output inside ONE fusion.
    rows = jnp.take(cache.table, idx, axis=0).astype(jnp.uint32)
    count = (rows[..., 1] >> 16).astype(jnp.float32)
    found = valid & (count > 0)
    radiance = jnp.stack(
        [_bits_f16(rows[..., 0]), _bits_f16(rows[..., 0] >> 16),
         _bits_f16(rows[..., 1])], axis=-1)
    radiance = jnp.where(found[..., None], radiance, 0.0)
    return found, radiance, jnp.where(found, count, 0.0), rows[..., 2]


def dense_update(cache: DenseGICache, value: jnp.ndarray,
                 valid: jnp.ndarray) -> DenseGICache:
    """Elementwise running-mean insert, one value per cache row
    (spatial_hash.glsl:186-195's blend, scatter-free: in dense mode the
    surfel pool enumerates the rows). The albedo word is preserved."""
    c0 = jnp.minimum(cache.count, float(MAX_SAMPLE_COUNT - 1))
    new_rad = (cache.radiance * c0[:, None] + value) / (c0 + 1.0)[:, None]
    new_cnt = jnp.minimum(cache.count + 1.0,
                          float(MAX_SAMPLE_COUNT)).astype(jnp.uint32)
    w0 = _f16_bits(new_rad[:, 0]) | (_f16_bits(new_rad[:, 1]) << 16)
    w1 = _f16_bits(new_rad[:, 2]) | (new_cnt << 16)
    old = cache.table.astype(jnp.uint32)
    table = jax.lax.bitcast_convert_type(
        jnp.where(valid[:, None], jnp.stack([w0, w1, old[:, 2]], axis=-1),
                  old),
        jnp.int32)
    return DenseGICache(table=table)


def dense_update_slice(cache: DenseGICache, start: jnp.ndarray,
                       value: jnp.ndarray,
                       valid: jnp.ndarray) -> DenseGICache:
    """Running-mean insert over the contiguous row window
    ``[start, start+len(value))`` — the budgeted-refresh path
    (``SurfelSettings.dense_refresh_budget``): a dynamic slice in, the
    elementwise :func:`dense_update`, a dynamic slice back out. Still no
    scatter anywhere."""
    rows = jax.lax.dynamic_slice(cache.table, (start, 0),
                                 (value.shape[0], 3))
    sub = dense_update(DenseGICache(table=rows), value, valid)
    return DenseGICache(table=jax.lax.dynamic_update_slice(
        cache.table, sub.table, (start, 0)))


def refresh_dense_albedo(cache: DenseGICache, scene) -> DenseGICache:
    """Rebuild every row's albedo word from a (possibly refitted) scene,
    keeping accumulated radiance. After a SceneEditor refit the leaf-row
    order of an edited model shifts, so its rows' radiance keys are
    transiently stale — the running mean re-converges within frames
    (the reference's spatial hash goes stale on edits the same way,
    spatial_hash.glsl's LRU just evicts old cells eventually)."""
    alb6 = _albedo_words(scene)
    old = cache.table.astype(jnp.uint32)
    table = jax.lax.bitcast_convert_type(
        jnp.stack([old[:, 0], old[:, 1], alb6], axis=-1), jnp.int32)
    return DenseGICache(table=table)
