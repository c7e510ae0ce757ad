"""Spatial-hash GI radiance cache.

Reference: ``assets/shaders/headers/spatial_hash.glsl`` — a 3-probe
open-addressed hash keyed by (quantised leaf centre, cube face id):
pcg-chained location hash, xxhash32-chained fingerprint, LogLuv-packed
radiance, LRU eviction by last-accessed frame, running-mean blending
capped at 404 samples.

TPU adaptation (SURVEY §7.6): the GLSL inserts race via atomicCompSwap and
unsynchronised field writes (spatial_hash.glsl:147-198, "embraced"
per SURVEY §5.2). Here inserts are *deterministic*: batch duplicates of
the same cell are pre-combined with an exact closed-form running mean
(sequential mean with a constant value has the closed form
``(r0*c0 + v*k)/(c0+k)``), then applied with unique-index scatters.
Deviations from the GLSL, by design:

* ``get`` does not update ``last_accessed_frame`` (pure function);
  recency is refreshed on insert only, so LRU decisions can be staler.
* In-batch collisions of *different* keys on the same slot resolve by
  "first ray in sort order" instead of thread-race order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dust_tpu.ops.packing import decode_logluv, encode_logluv

__all__ = ["SpatialHash", "make_spatial_hash", "hash_get", "hash_insert",
           "spatial_hash_key", "key_fingerprint", "key_location"]

MAX_SAMPLE_COUNT = 404
NUM_PROBES = 3


class SpatialHash(NamedTuple):
    """One packed (C,4) int32 table: [fingerprint, LogLuv radiance,
    last_accessed_frame, sample_count] — row-granular gathers/scatters
    are ~4x cheaper on TPU than four parallel arrays."""

    table: jnp.ndarray  # (C, 4) int32

    @property
    def capacity(self) -> int:
        return self.table.shape[0]

    @property
    def fingerprint(self) -> jnp.ndarray:
        return self.table[:, 0].astype(jnp.uint32)

    @property
    def radiance(self) -> jnp.ndarray:
        return self.table[:, 1].astype(jnp.uint32)

    @property
    def last_frame(self) -> jnp.ndarray:
        return self.table[:, 2]

    @property
    def sample_count(self) -> jnp.ndarray:
        return self.table[:, 3]


def make_spatial_hash(capacity: int) -> SpatialHash:
    return SpatialHash(table=jnp.zeros((capacity, 4), jnp.int32))


def _pcg(v: jnp.ndarray) -> jnp.ndarray:
    """pcg (spatial_hash.glsl:105-111), u32 wrap-around semantics."""
    state = v * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> 28) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return (word >> 22) ^ word


def _xxhash32(p: jnp.ndarray) -> jnp.ndarray:
    """xxhash32 (spatial_hash.glsl:115-126)."""
    p2 = jnp.uint32(2246822519)
    p3 = jnp.uint32(3266489917)
    p4 = jnp.uint32(668265263)
    p5 = jnp.uint32(374761393)
    h = p + p5
    h = p4 * ((h << 17) | (h >> 15))
    h = p2 * (h ^ (h >> 15))
    h = p3 * (h ^ (h >> 13))
    return h ^ (h >> 16)


def spatial_hash_key(world_pos: jnp.ndarray, face_id: jnp.ndarray,
                     cell_size: float = 4.0):
    """SpatialHashKey from a leaf-centre world position + face id
    (final_gather.rchit:42-44: ``ivec3(aabbCenterWorld / 4.0)``).

    Note GLSL ``ivec3()`` truncates toward zero; replicated here."""
    q = jnp.trunc(world_pos / cell_size).astype(jnp.int32)
    return q, jnp.asarray(face_id, jnp.int32)


def key_fingerprint(qpos: jnp.ndarray, face_id: jnp.ndarray) -> jnp.ndarray:
    h = _xxhash32(qpos[..., 0].astype(jnp.uint32))
    h = _xxhash32(qpos[..., 1].astype(jnp.uint32) + h)
    h = _xxhash32(qpos[..., 2].astype(jnp.uint32) + h)
    h = _xxhash32(face_id.astype(jnp.uint32) + h)
    return jnp.maximum(jnp.uint32(1), h)


def key_location(qpos: jnp.ndarray, face_id: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Base slot for a key. Deviation from the GLSL: the base is aligned
    to a 4-slot group so all probes live in one contiguous row-gather
    (the GLSL probes loc..loc+2 unaligned); load-factor behaviour is
    equivalent."""
    h = _pcg(qpos[..., 0].astype(jnp.uint32))
    h = _pcg(qpos[..., 1].astype(jnp.uint32) + h)
    h = _pcg(qpos[..., 2].astype(jnp.uint32) + h)
    h = _pcg(face_id.astype(jnp.uint32) + h)
    return ((h % jnp.uint32(capacity // 4)) * 4).astype(jnp.int32)


def hash_get(hash_: SpatialHash, qpos: jnp.ndarray, face_id: jnp.ndarray):
    """SpatialHashGet (spatial_hash.glsl:200-220).

    Returns (found, radiance_acescg, sample_count)."""
    fingerprint = key_fingerprint(qpos, face_id)
    loc = key_location(qpos, face_id, hash_.capacity)
    # One 16-wide row gather fetches the whole aligned probe group.
    group = jnp.take(hash_.table.reshape(-1, 16), loc >> 2, axis=0)
    rows = group.reshape(group.shape[:-1] + (4, 4))[..., :NUM_PROBES, :]
    fp = rows[..., 0].astype(jnp.uint32)

    match = fp == fingerprint[..., None]
    empty = fp == 0
    # Probe i is reached only if all earlier probes were occupied non-matches.
    blocked = jnp.cumsum((match | empty).astype(jnp.int32), axis=-1) \
        - (match | empty).astype(jnp.int32)
    reach = blocked == 0
    hit = match & reach
    found = jnp.any(hit, axis=-1)
    best = jnp.argmax(hit, axis=-1)[..., None, None]
    row = jnp.take_along_axis(rows, best, axis=-2)[..., 0, :]
    radiance = decode_logluv(row[..., 1].astype(jnp.uint32))
    count = row[..., 3]
    zero = jnp.zeros_like(radiance)
    return found, jnp.where(found[..., None], radiance, zero), jnp.where(found, count, 0)


def hash_insert(hash_: SpatialHash, qpos: jnp.ndarray, face_id: jnp.ndarray,
                value: jnp.ndarray, frame_index, valid=None) -> SpatialHash:
    """SpatialHashInsert (spatial_hash.glsl:147-195), batched + deterministic.

    ``value`` is ACEScg radiance (..., 3). ``valid`` masks inactive lanes.
    """
    qpos = qpos.reshape(-1, 3)
    face_id = face_id.reshape(-1)
    value = value.reshape(-1, 3)
    n = qpos.shape[0]
    valid = jnp.ones(n, bool) if valid is None else valid.reshape(-1)

    fingerprint = key_fingerprint(qpos, face_id)
    loc = key_location(qpos, face_id, hash_.capacity)
    slots = loc[..., None] + jnp.arange(NUM_PROBES, dtype=jnp.int32)
    group = jnp.take(hash_.table.reshape(-1, 16), loc >> 2, axis=0)
    rows = group.reshape(group.shape[:-1] + (4, 4))[..., :NUM_PROBES, :]
    fp = rows[..., 0].astype(jnp.uint32)

    # Slot choice per the GLSL: first probe whose fingerprint matches or is
    # empty; else the LRU of the three.
    match_or_empty = (fp == fingerprint[:, None]) | (fp == 0)
    any_me = jnp.any(match_or_empty, axis=-1)
    first_me = jnp.argmax(match_or_empty, axis=-1)
    last = rows[..., 2]
    lru = jnp.argmin(last, axis=-1)
    probe = jnp.where(any_me, first_me, lru)
    slot = jnp.take_along_axis(slots, probe[:, None], axis=-1)[:, 0]

    # ---- combine batch duplicates per (slot, fingerprint) --------------
    # Single-key sort by slot (lexsort chains two full sorts; a slot run
    # holding two *different* fingerprints is a rare hash collision, and
    # fragmented groups merely drop the later fragment).
    slot_s = jnp.where(valid, slot, hash_.capacity)  # invalid -> sentinel
    order = jnp.argsort(slot_s, stable=True)
    s_slot = slot_s[order]
    s_fp = fingerprint[order]
    s_val = value[order]
    s_valid = valid[order]

    first = jnp.concatenate(
        [jnp.ones(1, bool),
         (s_slot[1:] != s_slot[:-1]) | (s_fp[1:] != s_fp[:-1])]
    ) & s_valid

    # Group totals at run starts via a reverse segmented scan — pure
    # vector work (a scatter-add into n rows costs ~100 ns/row on TPU;
    # log2(n) vector passes cost ~1 ms total). Elements of a run are
    # contiguous after the sort, so the suffix-sum within each run,
    # evaluated at the run's first element, is exactly the group total.
    contrib = jnp.concatenate(
        [jnp.where(s_valid[:, None], s_val, 0.0),
         s_valid.astype(jnp.float32)[:, None]], axis=-1)
    rf = first[::-1]
    # In the reversed order, element j starts a fresh segment iff the
    # element *before* it (reversed) was a run start in original order.
    q = jnp.concatenate([jnp.ones(1, bool), rf[:-1]])

    def seg_op(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf[:, None], bv, av + bv)

    _, suffix_rev = jax.lax.associative_scan(
        seg_op, (q, contrib[::-1]))
    totals = suffix_rev[::-1]  # at run starts: the whole group's sum
    gsum = totals[:, :3]
    gcnt = totals[:, 3]

    # One representative per group: the sorted position where first=True.
    num_groups_mask = first
    rep_slot = jnp.where(num_groups_mask, s_slot, hash_.capacity)
    rep_fp = s_fp
    k = jnp.where(num_groups_mask, gcnt, 0.0)
    vbar = gsum / jnp.maximum(gcnt, 1.0)[:, None]

    # Collision rule: if two *different* fingerprints map to one slot in
    # this batch, keep only the first group for that slot.
    slot_first = jnp.concatenate(
        [jnp.ones(1, bool), s_slot[1:] != s_slot[:-1]]
    )
    apply_mask = num_groups_mask & slot_first & (rep_slot < hash_.capacity)

    tgt = jnp.where(apply_mask, rep_slot, hash_.capacity - 1)
    cur = jnp.take(hash_.table, tgt, axis=0)
    cur_fp = cur[:, 0].astype(jnp.uint32)
    same = cur_fp == rep_fp
    c0 = jnp.where(same, cur[:, 3], 0).astype(jnp.float32)
    c0 = jnp.minimum(c0, MAX_SAMPLE_COUNT - 1)
    r0 = jnp.where(same[:, None], decode_logluv(cur[:, 1].astype(jnp.uint32)), 0.0)

    new_cnt = jnp.minimum(c0 + k, MAX_SAMPLE_COUNT)
    new_rad = (r0 * c0[:, None] + vbar * k[:, None]) / jnp.maximum(c0 + k, 1.0)[:, None]

    # One unique-slot row scatter (apply_mask guarantees uniqueness).
    enc = encode_logluv(new_rad)
    fi = jnp.asarray(frame_index, jnp.int32)
    sel = apply_mask
    upd_slot = jnp.where(sel, tgt, hash_.capacity)  # OOB drops
    new_rows = jnp.stack(
        [jnp.where(sel, rep_fp.astype(jnp.int32), 0),
         jnp.where(sel, enc.astype(jnp.int32), 0),
         jnp.where(sel, jnp.broadcast_to(fi, sel.shape), 0),
         jnp.where(sel, new_cnt.astype(jnp.int32), 0)], axis=-1)
    return SpatialHash(
        table=hash_.table.at[upd_slot].set(new_rows, mode="drop")
    )
