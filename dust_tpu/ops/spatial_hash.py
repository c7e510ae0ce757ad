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

Storage is ONE ``(capacity/4, 16) int32`` table of 64 B *probe-group*
rows — four slots of ``[fingerprint, LogLuv radiance, last_frame,
sample_count]`` each. The probe walk of a key stays inside one group
(key_location aligns bases to 4), so a get is a single 64 B row gather
and an insert is a read-modify-write of whole group rows. Group rows are
the native stored layout: a ``(C, 4)`` table viewed ``(C/4, 16)`` would
relayout (copy) all 256+ MB on *every* frame — measured 260 ms at 2²⁴
capacity, the round-2 hash mode's dominant cost.

Deviations from the GLSL, by design:

* ``get`` does not update ``last_accessed_frame`` (pure function);
  recency is refreshed on insert only, so LRU decisions can be staler.
* In-batch collisions on the same *group* (different keys whose probe
  walks share an aligned group — rare) resolve by "first ray in sort
  order" instead of thread-race order: later keys' inserts drop for
  that batch.
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
    """One packed (C/4, 16) int32 table of probe-group rows (module doc)."""

    table: jnp.ndarray  # (C/4, 16) int32

    @property
    def capacity(self) -> int:
        return self.table.shape[0] * 4

    # Slot-major field views (test/introspection convenience — the
    # minor-dim reshape relayouts the table; don't use per frame).
    @property
    def fingerprint(self) -> jnp.ndarray:
        return self.table.reshape(-1, 4)[:, 0].astype(jnp.uint32)

    @property
    def radiance(self) -> jnp.ndarray:
        return self.table.reshape(-1, 4)[:, 1].astype(jnp.uint32)

    @property
    def last_frame(self) -> jnp.ndarray:
        return self.table.reshape(-1, 4)[:, 2]

    @property
    def sample_count(self) -> jnp.ndarray:
        return self.table.reshape(-1, 4)[:, 3]


def make_spatial_hash(capacity: int) -> SpatialHash:
    if capacity % 4:
        raise ValueError("spatial hash capacity must be a multiple of 4")
    return SpatialHash(table=jnp.zeros((capacity // 4, 16), jnp.int32))


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
    # One 64 B row gather fetches the whole aligned probe group. Fields
    # are extracted with masked minor-axis sums: ``group[..., i]`` column
    # slicing would relayout the gather output channel-planar (~17 ms at
    # 2M rays), masked reduces fuse into the gather consumer row-major.
    group = jax.lax.optimization_barrier(
        jnp.take(hash_.table, loc >> 2, axis=0))
    minor = jnp.arange(16, dtype=jnp.int32)

    def word(i):
        i = jnp.asarray(i, jnp.int32)
        if i.ndim:
            i = i[..., None]
        return jnp.sum(jnp.where(minor == i, group, 0),
                       axis=-1).astype(jnp.uint32)

    # Probe i is reached only if all earlier probes were occupied
    # non-matches (the walk stops at the first match or empty slot).
    fp0, fp1, fp2 = word(0), word(4), word(8)
    me0 = (fp0 == fingerprint) | (fp0 == 0)
    me1 = (fp1 == fingerprint) | (fp1 == 0)
    hit0 = fp0 == fingerprint
    hit1 = (fp1 == fingerprint) & ~me0
    hit2 = (fp2 == fingerprint) & ~me0 & ~me1
    found = hit0 | hit1 | hit2
    probe = jnp.where(hit0, 0, jnp.where(hit1, 1, 2))
    radiance = decode_logluv(word(probe * 4 + 1))
    count = word(probe * 4 + 3).astype(jnp.int32)
    zero = jnp.zeros_like(radiance)
    return found, jnp.where(found[..., None], radiance, zero), jnp.where(found, count, 0)


def hash_insert(hash_: SpatialHash, qpos: jnp.ndarray, face_id: jnp.ndarray,
                value: jnp.ndarray, frame_index, valid=None,
                max_updates: int | None = None) -> SpatialHash:
    """SpatialHashInsert (spatial_hash.glsl:147-195), batched + deterministic.

    ``value`` is ACEScg radiance (..., 3). ``valid`` masks inactive lanes.
    ``max_updates`` (static) caps the scatter width: the row scatter is
    the insert's dominant cost and is row-COUNT bound (a dropped OOB row
    costs the same as a live one — measured), so the unique-cell updates
    are compacted to the front and only the first ``max_updates`` rows
    scatter. Batches touching more unique cells than the cap defer the
    overflow (deterministically, in group-sort order) to later frames —
    the same convergence-lag class as the GLSL's fixed surfel pool."""
    qpos = qpos.reshape(-1, 3)
    face_id = face_id.reshape(-1)
    value = value.reshape(-1, 3)
    n = qpos.shape[0]
    valid = jnp.ones(n, bool) if valid is None else valid.reshape(-1)

    fingerprint = key_fingerprint(qpos, face_id)
    ngroups = hash_.table.shape[0]
    group = key_location(qpos, face_id, hash_.capacity) >> 2

    # ---- combine batch duplicates per (group, fingerprint) -------------
    # Single-key sort by group (a group holding two *different*
    # fingerprints in one batch is a rare hash collision, and fragmented
    # groups merely drop the later fragment).
    group_s = jnp.where(valid, group, ngroups)  # invalid -> sentinel
    order = jnp.argsort(group_s, stable=True)
    s_group = group_s[order]
    s_fp = fingerprint[order]
    s_val = value[order]
    s_valid = valid[order]

    first = jnp.concatenate(
        [jnp.ones(1, bool),
         (s_group[1:] != s_group[:-1]) | (s_fp[1:] != s_fp[:-1])]
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

    # One representative per group: the sorted position where first=True;
    # if two fingerprints share a group in-batch, only the first applies
    # (group read-modify-write must be unique per scatter row).
    grp_first = jnp.concatenate(
        [jnp.ones(1, bool), s_group[1:] != s_group[:-1]])
    apply_mask = first & grp_first & (s_group < ngroups)
    k = jnp.where(apply_mask, gcnt, 0.0)
    vbar = gsum / jnp.maximum(gcnt, 1.0)[:, None]

    # ---- read-modify-write the unique group rows ----------------------
    # Field extraction via masked minor-axis sums (same row-major trick
    # as hash_get — column slicing would relayout the gathered rows).
    tgt = jnp.where(apply_mask, s_group, ngroups - 1)
    cur = jax.lax.optimization_barrier(jnp.take(hash_.table, tgt, axis=0))
    minor = jnp.arange(16, dtype=jnp.int32)

    def word(i):
        i = jnp.asarray(i, jnp.int32)
        if i.ndim:
            i = i[..., None]
        return jnp.sum(jnp.where(minor == i, cur, 0), axis=-1)

    # Slot choice per the GLSL: first probe whose fingerprint matches or
    # is empty; else the LRU of the three.
    fp0, fp1, fp2 = (word(0).astype(jnp.uint32), word(4).astype(jnp.uint32),
                     word(8).astype(jnp.uint32))
    me0 = (fp0 == s_fp) | (fp0 == 0)
    me1 = (fp1 == s_fp) | (fp1 == 0)
    me2 = (fp2 == s_fp) | (fp2 == 0)
    lf0, lf1, lf2 = word(2), word(6), word(10)
    lru = jnp.where(lf0 <= jnp.minimum(lf1, lf2), 0,
                    jnp.where(lf1 <= lf2, 1, 2))
    probe = jnp.where(me0, 0, jnp.where(me1, 1, jnp.where(me2, 2, lru)))

    same = word(probe * 4).astype(jnp.uint32) == s_fp
    c0 = jnp.where(same, word(probe * 4 + 3), 0).astype(jnp.float32)
    c0 = jnp.minimum(c0, MAX_SAMPLE_COUNT - 1)
    r0 = jnp.where(same[:, None],
                   decode_logluv(word(probe * 4 + 1).astype(jnp.uint32)), 0.0)

    new_cnt = jnp.minimum(c0 + k, MAX_SAMPLE_COUNT)
    new_rad = (r0 * c0[:, None] + vbar * k[:, None]) / jnp.maximum(c0 + k, 1.0)[:, None]
    enc = encode_logluv(new_rad)
    fi = jnp.asarray(frame_index, jnp.int32)
    fields = jnp.stack(
        [s_fp.astype(jnp.int32), enc.astype(jnp.int32),
         jnp.broadcast_to(fi, s_fp.shape).astype(jnp.int32),
         new_cnt.astype(jnp.int32)], axis=-1)           # (n, 4)
    # Splice the chosen slot's 4 words into the gathered 64 B row.
    word_slot = jnp.arange(16, dtype=jnp.int32) >> 2    # word -> slot id
    new_rows = jnp.where(word_slot == probe[:, None],
                         jnp.tile(fields, (1, 4)), cur)

    # One unique-group row scatter (apply_mask guarantees uniqueness).
    upd = jnp.where(apply_mask, tgt, ngroups)           # OOB drops
    if max_updates is not None and max_updates < n:
        # Stable partition (applied-first) + slice: the scatter only
        # processes `max_updates` rows instead of n.
        porder = jnp.argsort(~apply_mask, stable=True)[:max_updates]
        upd = jnp.take(upd, porder)
        new_rows = jnp.take(new_rows, porder, axis=0)
    return SpatialHash(
        table=hash_.table.at[upd].set(new_rows, mode="drop")
    )
