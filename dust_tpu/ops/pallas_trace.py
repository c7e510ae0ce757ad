"""Pallas HDDA: the speed-of-light sparse-voxel traversal kernel.

Why this exists: XLA's scalar gather tops out at ~135 M lookups/s on a
v5e TensorCore, which caps any gather-per-step wavefront (the
:mod:`dust_tpu.ops.traverse` fallback) far below the 500 Mrays/s/chip
target. Inside a Mosaic kernel, a table lookup built from the two
shuffle primitives the VPU actually has — lane gather
(``take_along_axis`` on 128 lanes) and sublane select — sustains ~5 G
lookups/s with every table resident in VMEM. This kernel keeps the whole
traversal loop on-core: ray state in registers, acceleration tables in
VMEM, zero HBM traffic between iterations.

Structure (per instance, mirroring the reference's intersection shaders,
``assets/shaders/primary/hit.rint`` etc.):

* **Acceleration tables** (built host-side from a FlatTree):
  - L1 bitmap: 16³ occupancy of 16-voxel cells (128 u32, one VMEM row),
  - L2 bitmap: 64³ occupancy of 4-voxel blocks (8192 u32, 8 chunks)
    plus an exclusive popcount-rank table — ``leaf_row = rank[word] +
    popcount(word & (bit-1))``, which is why flat leaf arrays are sorted
    in block-linear order,
  - leaf occupancy masks (2×u32 per leaf) in chunked layout.
* **Phased rounds** (static ``rounds``): a *march* while-loop walks the
  L1/L2 DDA until each ray freezes on a candidate occupied block (or
  dies); one batched mask fetch; a *micro* while-loop runs the 4×4×4
  Amanatides-Woo DDA in registers. Rays whose candidate block missed
  re-enter the next round at the block exit. This keeps the expensive
  leaf-mask gather out of the per-step loop.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["PallasTables", "build_pallas_tables", "trace_instance_pallas"]

_EPS = 1e-3      # reference DDA exit epsilon (hit.rint:107)
_STEP_EPS = 1e-4  # cell-sampling nudge

LANES = 128
# Sublane rows per program (ROWS*128 rays/program). Overridable for tuning
# experiments via env; see tools/sweep_rows.py for the recorded sweep.
import os as _os
ROWS = int(_os.environ.get("DUST_PALLAS_ROWS", "8"))
# Leaf-mask gather gating strategy for A/B experiments:
# "" = ungated full chunk walk (the round-1/2 measured default),
# "one" = single-cond all-in-one-chunk fast path, "spanN" (N=4/8/16;
# bare "span" = 4) = N-chunk window at the tile's valid-lane min chunk,
# "chunks" = per-chunk conds.
# DUST_MASK_GATE overrides globally; defaults are per trace MODE (see
# _mask_gate_for) so coherent primary tiles can gate while incoherent
# secondary walks stay ungated.
_MASK_GATE_ENV = _os.environ.get("DUST_MASK_GATE")


def _gate_value(name: str):
    return {"": False, "one": True}.get(name, name)


def _mask_gate_for(mode: str):
    if _MASK_GATE_ENV is not None:
        return _gate_value(_MASK_GATE_ENV)
    # Per-mode defaults from the round-4 TPU sweep on the 29-chunk
    # castle (tools/bench_trace.py, pair-gather kernels, best-of-3
    # amortized ms — primary/shadow/ao):
    #   ungated 9.35/10.54/4.83 · span16 9.12/9.32/4.54 ·
    #   span8 8.74/10.05/4.38 · one 14.08/14.57/7.37
    # span8 wins precise + ao_threshold; the fused ao_fg walk (the
    # pipeline's shadow path) keeps span16 (its standalone-precise
    # proxy preferred the wider window). Gains are ~5-10%: the
    # chunk_span_sim's 2x model overestimated the walk's share of
    # round time — the VPU hides most of the select cost.
    return _gate_value({"precise": "span8", "ao_threshold": "span8",
                        "ao_fg": "span16"}.get(mode, ""))
# While-loop body unroll factors. Every while cond is a vector->scalar
# sync (~120 cycles); at ~170-340 cycles of body work per iteration the
# sync is a double-digit percentage of the loop, and frozen/dead lanes
# are masked no-ops so over-running by unroll-1 iterations is harmless.
_MARCH_UNROLL = int(_os.environ.get("DUST_MARCH_UNROLL", "2"))
_MICRO_UNROLL_ENV = _os.environ.get("DUST_MICRO_UNROLL")


def _micro_prologue_for(mode: str) -> int:
    """Fixed UNCONDITIONED micro-DDA iterations run before the while
    loop: every while cond is a ~120-cycle vector->scalar sync, and the
    typical candidate resolves in a handful of steps, so running the
    first K iterations maskedly without asking "anyone left?" trades
    dead-lane no-ops for most of the micro syncs. DUST_MICRO_PROLOGUE
    overrides for sweeps."""
    env = _os.environ.get("DUST_MICRO_PROLOGUE")
    if env is not None:
        return int(env)
    # Round-5 TPU sweep (castle 2x, tools/bench_trace.py best-of-3 ms):
    #   prologue:  0     2     4     6
    #   primary   7.80  7.34  7.39   —
    #   ao        3.64  3.41  3.52   —
    # (fg has no micro loop; the fused ao_fg walk's micro is gated by a
    # cond and keeps the short default.)
    return {"precise": 2, "ao_threshold": 2, "ao_fg": 2}.get(mode, 0)


def _micro_unroll_for(mode: str) -> int:
    """Micro-DDA loop unroll, per trace mode (DUST_MICRO_UNROLL
    overrides for sweeps). Round-4 sweep on the 29k-leaf castle
    (tools/bench_trace.py, best-of-2 runs, ms): unroll 1 -> 2 takes
    primary 8.8 -> 8.0 and ao 4.6 -> 2.7 (the short AO micro walks are
    sync-bound), while the fused ao_fg shadow walk regresses 6.7 -> 9.0
    (its union body is long; over-running costs more than the syncs
    save). "rough" has no micro loop — the knob is inert there.

    Round-5 re-sweep after the freeze-on-occupancy register diet
    (best-of-12, ms): unroll 3 takes primary 7.92 -> 7.54 but shadow
    (same "precise" mode) 8.43 -> 8.76 and ao 3.70 -> 3.79 — the net
    frame effect is a wash, so the default stays 2. The same sweep
    re-measured prologue 3/4 (neutral-to-worse) and march unroll 1/3
    (7.71/8.28 vs 7.92 baseline — within session noise)."""
    if _MICRO_UNROLL_ENV is not None:
        return int(_MICRO_UNROLL_ENV)
    return {"precise": 2, "ao_threshold": 2, "ao_fg": 1}.get(mode, 1)


def _compose(body, n: int):
    """body applied n times (while-loop body unrolling)."""
    if n <= 1:
        return body

    def unrolled(st):
        for _ in range(n):
            st = body(st)
        return st

    return unrolled


# March in-cell block sub-steps per iteration: K extra cheap block
# advances for lanes staying inside the register-resident L1 cell.
# Measured sweep (castle+teapot in-frame rays, v5e): K=1 vs 0: primary
# 10.3->8.6, fg 6.6->5.2, ao 3.7->3.0; K=2 helps primary/shadow/fg a
# further ~5-8% but regresses the short-range ao walk (3.0->3.6), hence
# the per-mode default. DUST_MARCH_SUBSTEP overrides for sweeps.
_MARCH_SUBSTEP = _os.environ.get("DUST_MARCH_SUBSTEP")


def _substeps_for(mode: str) -> int:
    if _MARCH_SUBSTEP is not None:
        return int(_MARCH_SUBSTEP)
    # Recorded sweep (ms, castle+teapot in-frame rays):
    #   K:        0     1     2     3     5
    #   primary  10.31  8.62  8.09  7.61  7.78
    #   shadow    8.14  7.44  7.13  7.10   —
    #   ao        3.69  3.00  3.55   —    3.77
    #   fg(rough) 6.61  5.18  4.75  4.38  4.11
    return {"ao_threshold": 1, "precise": 3, "rough": 5}.get(mode, 2)


class PallasTables(NamedTuple):
    """VMEM-resident acceleration tables for one model."""

    # 16³ L1 cells (16 voxels each): chebyshev distance to the nearest
    # occupied cell, clamped to 15, packed 8 nibbles per i32 (512 words in
    # one (8,128) chunk; one lane shuffle per lookup). 0 = occupied.
    l1: np.ndarray       # (8, 128) int32 packed nibbles (rows 0-3 used)
    # Per-cell L2 words, indexed by cell id cl in [0,4096): w0 = blocks
    # 0-31 (local index), w1 = blocks 32-63; rank0/rank1 the matching
    # exclusive popcount prefixes (leaf row = rank + popcount below bit).
    l2_w0: np.ndarray    # (4, 8, 128) int32
    l2_w1: np.ndarray    # (4, 8, 128) int32
    l2_r0: np.ndarray    # (4, 8, 128) int32
    l2_r1: np.ndarray    # (4, 8, 128) int32
    mask_lo: np.ndarray  # (CL, 8, 128) int32
    mask_hi: np.ndarray  # (CL, 8, 128) int32

    @property
    def mask_chunks(self) -> int:
        return self.mask_lo.shape[0]


def build_pallas_tables(flat) -> PallasTables:
    """Build kernel tables from a FlatTree (rows MUST be in hierarchy
    order, which :meth:`VoxTree.flatten` guarantees).

    L2 word layout is **cell-grouped**: word ``cl*2 + (local>>5)`` holds
    the occupancy bits of L1 cell ``cl``'s 64 blocks — so a ray entering
    an occupied cell fetches its two words once and steps blocks from
    registers."""
    from dust_tpu.voxtree.tree import hierarchy_key

    b = flat.leaf_origin >> 2
    key = hierarchy_key(b)
    assert np.all(np.diff(key) > 0), "flat rows must be hierarchy sorted"

    l2 = np.zeros(8192, dtype=np.uint32)
    np.bitwise_or.at(l2, key >> 5, np.uint32(1) << (key & 31).astype(np.uint32))
    pop = np.array([int(w).bit_count() for w in l2], dtype=np.int64)
    rank = np.zeros(8192, dtype=np.int64)
    np.cumsum(pop[:-1], out=rank[1:])
    # Split by half: word index = cl*2 + half  ->  tables indexed by cl.
    l2_w0, l2_w1 = l2[0::2], l2[1::2]
    l2_r0, l2_r1 = rank[0::2], rank[1::2]

    # L1 chebyshev skip field over 16³ cells, packed 8 nibbles per word.
    cell = b >> 2
    occ16 = np.zeros((16, 16, 16), dtype=bool)
    occ16[cell[:, 0], cell[:, 1], cell[:, 2]] = True
    dist = np.full((16, 16, 16), 15, dtype=np.int64)
    dist[occ16] = 0
    frontier = occ16.copy()
    for dd in range(1, 15):
        if frontier.all():
            break
        p = np.pad(frontier, 1, constant_values=False)
        grown = np.zeros_like(frontier)
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                for dz in (0, 1, 2):
                    grown |= p[dx:dx + 16, dy:dy + 16, dz:dz + 16]
        dist[grown & ~frontier] = dd
        frontier = grown
    flat_dist = dist.reshape(-1)  # x-major (cx*256 + cy*16 + cz)
    l1 = np.zeros(512, dtype=np.uint32)
    for i in range(4096):
        l1[i >> 3] |= np.uint32(flat_dist[i]) << ((i & 7) * 4)
    l1_pad = np.zeros((8, 128), dtype=np.uint32)
    l1_pad.reshape(-1)[:512] = l1

    n = len(key)
    chunks = max((n + 1023) // 1024, 1)
    mlo = np.zeros(chunks * 1024, dtype=np.uint32)
    mhi = np.zeros(chunks * 1024, dtype=np.uint32)
    mlo[:n] = flat.mask_lo
    mhi[:n] = flat.mask_hi
    return PallasTables(
        l1=l1_pad.view(np.int32),
        l2_w0=l2_w0.view(np.int32).reshape(4, 8, 128),
        l2_w1=l2_w1.view(np.int32).reshape(4, 8, 128),
        l2_r0=l2_r0.astype(np.int32).reshape(4, 8, 128),
        l2_r1=l2_r1.astype(np.int32).reshape(4, 8, 128),
        mask_lo=mlo.view(np.int32).reshape(chunks, 8, 128),
        mask_hi=mhi.view(np.int32).reshape(chunks, 8, 128),
    )


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------

def _gather_chunked_multi(refs, idx, nchunks, gate=False, base=0,
                          valid=None):
    """Gather int32 ``ref[base*1024 + idx]`` for EVERY ref in ``refs``
    (a tuple of VMEM refs of shape (>=base+nchunks, 8, 128)), idx (R,
    128) in [0, nchunks*1024). Built from lane shuffles + sublane
    selects; the ``(chunk == c) & (row == r)`` predicates are computed
    once and shared across all refs, so gathering the lo+hi mask words
    (or the two rank halves) costs ~2/3 of two independent walks.

    ``base`` (chunk units; may be a traced scalar) selects a model's
    table slice out of a stacked multi-model array. ``valid`` (bool,
    same shape) marks lanes whose idx is meaningful: gated strategies
    compute their chunk window over valid lanes only (inactive lanes
    are zero-filled by callers, which would otherwise drag the window
    to chunk 0 — the round-3 "span" gate's flaw). Invalid lanes return
    garbage; callers mask.

    Gates (see _mask_gate_for): False = ungated full walk; True =
    single-chunk fast path; "spanN" (N in 4/8/16) = N-chunk dynamic
    window at the valid-lane min chunk with a cond fallback to the full
    walk (the round-4 chunk_span_sim measured castle tile-round spans
    p99<=15, so span16 never falls back); "chunks" = per-chunk conds.
    The chunk loops use dynamic *ref* indices so compiled code size is
    O(1) in table size (Mosaic has no dynamic_slice on values, but refs
    index dynamically)."""
    shape = idx.shape
    chunk = idx >> 10
    row = (idx >> 7) & 7
    lane = idx & 127
    nrefs = len(refs)

    def zeros():
        return tuple(jnp.zeros(shape, jnp.int32) for _ in range(nrefs))

    def accum(out, tabs, pred_chunk):
        """One chunk's 8 sublane selects across all refs, predicates
        shared."""
        res = list(out)
        for r in range(8):
            pred = (row == r) if pred_chunk is None else \
                pred_chunk & (row == r)
            for k in range(nrefs):
                trow = jnp.broadcast_to(tabs[k][r : r + 1, :], shape)
                cand = jnp.take_along_axis(trow, lane, axis=1)
                res[k] = jnp.where(pred, cand, res[k])
        return tuple(res)

    def load(c):
        return tuple(ref[base + c] for ref in refs)

    def one_chunk(c):
        return accum(zeros(), load(c), None)

    if nchunks == 1:
        return one_chunk(0)

    def full():
        out = zeros()
        for c in range(nchunks):
            out = accum(out, load(c), chunk == c)
        return out

    if not gate:
        # Reduction-free path: every chunk unconditionally. Scalar<->vector
        # sync stalls from any()/cond gating cost far more than the extra
        # shuffles on this hardware (measured ~2800 vs ~400 cycles/iter).
        return full()

    vmin = chunk if valid is None else jnp.where(valid, chunk, nchunks)
    vmax = chunk if valid is None else jnp.where(valid, chunk, -1)

    if isinstance(gate, str) and gate.startswith("span"):
        # Walk a W-chunk window starting at the (valid-lane) min chunk
        # (2 reductions + 1 cond); tiles spanning more fall back to the
        # full walk.
        W = int(gate[4:] or 4)
        if nchunks <= W:
            return full()
        cmin = jnp.min(vmin)
        cmax = jnp.max(vmax)

        def spanw():
            out = zeros()
            for c in range(W):
                # Clamp the load index (cmin may sit near the table end,
                # or past it when no lane is valid); the chunk match
                # below still keys on the true chunk id.
                out = accum(out,
                            load(jnp.minimum(cmin + c, nchunks - 1)),
                            chunk == cmin + c)
            return out

        return jax.lax.cond(cmax - cmin < W, spanw, full)

    def general():
        def chunk_body(c, out):
            def do_chunk(out):
                return accum(out, load(c), chunk == c)

            return jax.lax.cond(jnp.any(chunk == c), do_chunk,
                                lambda o: o, out)

        return jax.lax.fori_loop(0, nchunks, chunk_body, zeros())

    if gate == "chunks":
        # Per-chunk cond only (one ~120-cycle sync gates ~220 cycles of
        # shuffles; wins when the tile touches few of many chunks).
        return general()

    # gate is True ("one"): coherent tiles land in one chunk — single
    # dynamic-indexed chunk with no per-chunk masking.
    cmin = jnp.min(vmin)
    return jax.lax.cond(jnp.max(vmax) == cmin,
                        lambda: one_chunk(jnp.minimum(cmin, nchunks - 1)),
                        general)


def _gather_chunked(tab_ref, idx, nchunks, gate=False, base=0, valid=None):
    """Single-table :func:`_gather_chunked_multi`."""
    return _gather_chunked_multi((tab_ref,), idx, nchunks, gate=gate,
                                 base=base, valid=valid)[0]


def _gather_chunked_pair(ref_a, ref_b, idx, nchunks, gate=False, base=0,
                         valid=None):
    """Two-table :func:`_gather_chunked_multi` (shared predicates)."""
    return _gather_chunked_multi((ref_a, ref_b), idx, nchunks, gate=gate,
                                 base=base, valid=valid)


def _gather_l1_dist(l1, cl):
    """L1 chebyshev distance for cell index ``cl`` in [0,4096): one
    sublane-select gather over 512 packed words + nibble extract."""
    widx = cl >> 3
    row = (widx >> 7) & 7
    lane = widx & 127
    word = jnp.zeros(cl.shape, jnp.int32)
    for r in range(4):  # 512 words occupy rows 0-3
        trow = jnp.broadcast_to(l1[r : r + 1, :], cl.shape)
        cand = jnp.take_along_axis(trow, lane, axis=1)
        word = jnp.where(row == r, cand, word)
    shift = ((cl & 7) * 4).astype(jnp.uint32)
    return ((word.astype(jnp.uint32) >> shift) & 15).astype(jnp.int32)


def _bit_test_i32(word, bit):
    """Bit test returning int32 0/1 (Mosaic cannot select between i1
    vectors, so boolean conversion happens at the use site)."""
    return ((word.astype(jnp.uint32) >> bit.astype(jnp.uint32)) & 1).astype(jnp.int32)


def _popcount_below(word, bit):
    mask = (jnp.uint32(1) << bit.astype(jnp.uint32)) - jnp.uint32(1)
    return jax.lax.population_count(word.astype(jnp.uint32) & mask).astype(jnp.int32)


def _safe_rcp(v):
    tiny = jnp.abs(v) < 1e-20
    big = jnp.where(v < 0, -1e20, 1e20)
    return jnp.where(tiny, big, 1.0 / jnp.where(tiny, 1.0, v))


def _slab3(ox, oy, oz, rx, ry, rz, mnx, mny, mnz, mxx, mxy, mxz):
    """Per-component AABB slab -> (entry, exit)."""
    t0x, t1x = (mnx - ox) * rx, (mxx - ox) * rx
    t0y, t1y = (mny - oy) * ry, (mxy - oy) * ry
    t0z, t1z = (mnz - oz) * rz, (mxz - oz) * rz
    lo = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                     jnp.minimum(t0z, t1z))
    hi = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                     jnp.maximum(t0z, t1z))
    return lo, hi


def _traverse_core(l1t, l2w0_ref, l2w1_ref, l2r0_ref, l2r1_ref,
                   mlo_ref, mhi_ref,
                   ox, oy, oz, dx, dy, dz, s_min, s_stop,
                   mask_chunks: int, mode: str, rounds: int,
                   march_cap: int, micro_cap: int,
                   s_ao=None, l2_base=0, mask_base=0):
    """The traversal loop on VALUES + table refs — shared by the
    single-instance kernel (:func:`_make_kernel`) and the batched
    multi-instance scene kernel (:func:`_make_scene_kernel`).

    ``l1t`` is the model's (8,128) packed L1 field as a value; the l2 /
    mask tables are VMEM refs whose leading chunk axis may stack several
    models — ``l2_base``/``mask_base`` (chunk units, possibly traced
    scalars) select the model's slice.

    Returns ``(ao_t, fg_t, fg_row)`` in fused ``"ao_fg"`` mode, else
    ``(hit_s, hit_row, hit_bit, s_resume, active_i32)``.

    ``mode="ao_fg"`` fuses the AO and final-gather passes into ONE
    traversal (they continue the same ray: ambient_occlusion.rgen +
    final_gather.rgen share the cosine sample): below ``s_ao`` the
    ao_threshold semantics apply (entry-report quirk included), past it
    the rough semantics (hit = block entry)."""
    fused = mode == "ao_fg"
    # Cross-round cell-register carry (round-5): long walks resume after
    # a micro miss inside the SAME cell (a block is a quarter of a
    # cell), so carrying (w0, w1, rank0, rank1, reg_cl) across rounds
    # deletes both the every-round full refresh AND the per-round rank
    # pair gather. Per-mode: the short ao_threshold walks measured
    # 2.25 -> 3.68 ms WITH the carry (no reuse, pure register
    # pressure); primary measured 8.68 -> 8.24 with the w-carry alone.
    carry = mode in ("precise", "ao_fg")
    shape = ox.shape
    rx, ry, rz = _safe_rcp(dx), _safe_rcp(dy), _safe_rcp(dz)
    sx = jnp.where(dx > 0, 1, -1).astype(jnp.int32)
    sy = jnp.where(dy > 0, 1, -1).astype(jnp.int32)
    sz = jnp.where(dz > 0, 1, -1).astype(jnp.int32)
    p01x = (dx > 0).astype(jnp.float32)
    p01y = (dy > 0).astype(jnp.float32)
    p01z = (dz > 0).astype(jnp.float32)

    zero = jnp.zeros(shape, jnp.float32)
    g0, g1 = _slab3(ox, oy, oz, rx, ry, rz,
                    zero, zero, zero, zero + 256.0, zero + 256.0, zero + 256.0)
    s_end = jnp.minimum(g1, s_stop)
    s = jnp.maximum(g0 + _STEP_EPS, s_min)
    active = (g0 < g1) & (s < s_end)

    hit_s = jnp.full(shape, jnp.inf, jnp.float32)
    hit_row = jnp.full(shape, -1, jnp.int32)
    hit_bit = jnp.full(shape, -1, jnp.int32)

    def march(active, s, w0, w1, rr0, rr1, reg_cl):
        """Walk L1/L2 until every active ray freezes on an occupied
        block or dies. Loop-carried masks are int32 0/1 — Mosaic
        cannot yield i1 vectors from scf loops.

        The two L2 words of the L1 cell a ray is inside are carried in
        registers (cell-grouped word layout); the expensive chunked
        gather runs only on iterations where some ray enters a new
        occupied cell. ``w0/w1/reg_cl`` are carried ACROSS rounds
        (round-5): a ray resuming after a micro miss usually re-enters
        the march inside the SAME cell (a block is a quarter of a
        cell), and before the carry every round's first iteration paid
        the full 2x4-chunk refresh for every active lane.

        Returns (active, s, cand, w0, w1, reg_cl): candidate block/word
        details are NOT carried through the loop — a frozen ray's s
        stays at its freeze sample, so :func:`cand_info` recomputes
        them once post-march (bit-identical expressions). That keeps
        the loop at 7 carried (R,128) arrays instead of 13 (the
        vector register file spills past ~13) and drops 7 masked
        selects per iteration."""
        cand = jnp.zeros(shape, jnp.bool_)

        def cond(st):
            active_i, s, cand_i, i = st[0], st[1], st[2], st[-1]
            return jnp.any((active_i != 0) & (cand_i == 0)) & (i < march_cap)

        def body(st):
            if carry:
                (active_i, s, cand_i, w0, w1, rr0, rr1, reg_cl, i) = st
            else:
                (active_i, s, cand_i, w0, w1, reg_cl, i) = st
                rr0 = rr1 = None
            active = active_i != 0
            cand = cand_i != 0
            stepping = active & ~cand
            se = s + _STEP_EPS
            px = ox + dx * se
            py = oy + dy * se
            pz = oz + dz * se

            # --- L1 skip-field test (16-voxel cells) ---------------
            c1x = jnp.clip(jnp.floor(px * (1.0 / 16.0)).astype(jnp.int32), 0, 15)
            c1y = jnp.clip(jnp.floor(py * (1.0 / 16.0)).astype(jnp.int32), 0, 15)
            c1z = jnp.clip(jnp.floor(pz * (1.0 / 16.0)).astype(jnp.int32), 0, 15)
            # In-box test: s_end <= g1 (the 256-box exit), so a sample
            # at se < s_end is inside up to the eps sliver the clips
            # absorb — one compare replaces the six-plane test.
            inb = se < s_end
            cl = (c1x * 16 + c1y) * 16 + c1z
            dist = _gather_l1_dist(l1t, cl)
            occ1 = (dist == 0) & inb & stepping

            # --- refresh cell-word registers on cell entry. Gated:
            # the 2x4-chunk gather (~1300 cyc) fires on well under
            # half the iterations for coherent tiles, beating the
            # ~120-cycle scalar sync of the gate.
            need = occ1 & (cl != reg_cl)

            if carry:
                # Rank words ride in the SAME shared-predicate walk
                # (4 refs cost ~1.5x the pair, and the per-round rank
                # gather in the round body disappears entirely).
                def refresh(args):
                    w0, w1, rr0, rr1, reg_cl = args
                    clm = jnp.where(need, cl, 0)
                    nw0, nw1, nr0, nr1 = _gather_chunked_multi(
                        (l2w0_ref, l2w1_ref, l2r0_ref, l2r1_ref), clm, 4,
                        base=l2_base)
                    return (jnp.where(need, nw0, w0),
                            jnp.where(need, nw1, w1),
                            jnp.where(need, nr0, rr0),
                            jnp.where(need, nr1, rr1),
                            jnp.where(need, cl, reg_cl))

                w0, w1, rr0, rr1, reg_cl = jax.lax.cond(
                    jnp.any(need), refresh, lambda a: a,
                    (w0, w1, rr0, rr1, reg_cl))
            else:
                def refresh(args):
                    w0, w1, reg_cl = args
                    clm = jnp.where(need, cl, 0)
                    nw0, nw1 = _gather_chunked_pair(
                        l2w0_ref, l2w1_ref, clm, 4, base=l2_base)
                    return (jnp.where(need, nw0, w0),
                            jnp.where(need, nw1, w1),
                            jnp.where(need, cl, reg_cl))

                w0, w1, reg_cl = jax.lax.cond(
                    jnp.any(need), refresh, lambda a: a, (w0, w1, reg_cl))

            # --- L2 test from registers ----------------------------
            bx = jnp.clip(jnp.floor(px * 0.25).astype(jnp.int32), 0, 63)
            by = jnp.clip(jnp.floor(py * 0.25).astype(jnp.int32), 0, 63)
            bz = jnp.clip(jnp.floor(pz * 0.25).astype(jnp.int32), 0, 63)
            local = ((bx & 3) << 4) | ((by & 3) << 2) | (bz & 3)
            word = jnp.where(local < 32, w0, w1)
            occ2 = (_bit_test_i32(word, local & 31) != 0) & occ1

            # Freeze candidates: s stays at the freeze sample, so all
            # block/word details are recoverable post-march.
            newly = occ2 & ~cand
            cand = cand | newly

            # Advance: occupied cell -> one block; empty cell with
            # chebyshev distance d -> exit the whole (2d-1)³ empty box.
            # Only the EXIT planes matter here (the sample point is
            # inside the box by construction), so instead of a full
            # 6-plane slab test this computes one plane per axis —
            # the face in the direction of travel (p01 selects it).
            df = jnp.maximum(dist, 1).astype(jnp.float32)
            fx = jnp.where(occ1, bx.astype(jnp.float32) * 4.0,
                           (c1x.astype(jnp.float32) - (df - 1.0)) * 16.0)
            fy = jnp.where(occ1, by.astype(jnp.float32) * 4.0,
                           (c1y.astype(jnp.float32) - (df - 1.0)) * 16.0)
            fz = jnp.where(occ1, bz.astype(jnp.float32) * 4.0,
                           (c1z.astype(jnp.float32) - (df - 1.0)) * 16.0)
            wsize = jnp.where(occ1, 4.0, (2.0 * df - 1.0) * 16.0)
            # abs() covers both signs AND zero directions: for d<0 the
            # product is positive anyway; for d≈0 (r = ±1e20 with the
            # sample inside the box) it flips -huge to +huge — matching
            # the old full-slab behavior without any loop-carried guard.
            ex = jnp.abs((fx + p01x * wsize - ox) * rx)
            ey = jnp.abs((fy + p01y * wsize - oy) * ry)
            ez = jnp.abs((fz + p01z * wsize - oz) * rz)
            s_exit = jnp.minimum(jnp.minimum(ex, ey), ez)
            s_next = jnp.maximum(s_exit, s + _STEP_EPS)
            advance = stepping & ~newly
            s = jnp.where(advance, s_next, s)
            active = active & ~(stepping & (s >= s_end) & ~newly)

            for _ss in range(_substeps_for(mode)):
                # In-cell block sub-step: lanes still unresolved whose
                # next sample stays inside the cell whose L2 words are
                # already in registers advance one more block without
                # the L1 lookup / refresh machinery (~half the ops of a
                # full iteration; empty-jump lanes mask through).
                stepping2 = active & ~cand
                se2 = s + _STEP_EPS
                px2 = ox + dx * se2
                py2 = oy + dy * se2
                pz2 = oz + dz * se2
                bx2 = jnp.clip(jnp.floor(px2 * 0.25).astype(jnp.int32),
                               0, 63)
                by2 = jnp.clip(jnp.floor(py2 * 0.25).astype(jnp.int32),
                               0, 63)
                bz2 = jnp.clip(jnp.floor(pz2 * 0.25).astype(jnp.int32),
                               0, 63)
                cl2 = ((bx2 >> 2) * 16 + (by2 >> 2)) * 16 + (bz2 >> 2)
                ok2 = stepping2 & (cl2 == reg_cl) & (se2 < s_end)
                local2 = ((bx2 & 3) << 4) | ((by2 & 3) << 2) | (bz2 & 3)
                word2 = jnp.where(local2 < 32, w0, w1)
                newly2 = (_bit_test_i32(word2, local2 & 31) != 0) & ok2
                cand = cand | newly2
                adv2 = ok2 & ~newly2
                fx2 = bx2.astype(jnp.float32) * 4.0
                fy2 = by2.astype(jnp.float32) * 4.0
                fz2 = bz2.astype(jnp.float32) * 4.0
                ex2 = jnp.abs((fx2 + p01x * 4.0 - ox) * rx)
                ey2 = jnp.abs((fy2 + p01y * 4.0 - oy) * ry)
                ez2 = jnp.abs((fz2 + p01z * 4.0 - oz) * rz)
                s_exit2 = jnp.minimum(jnp.minimum(ex2, ey2), ez2)
                s = jnp.where(adv2, jnp.maximum(s_exit2, s + _STEP_EPS),
                              s)
                active = active & ~(adv2 & (s >= s_end))

            if carry:
                return (active.astype(jnp.int32), s,
                        cand.astype(jnp.int32), w0, w1, rr0, rr1, reg_cl,
                        i + jnp.int32(1))
            return (active.astype(jnp.int32), s, cand.astype(jnp.int32),
                    w0, w1, reg_cl, i + jnp.int32(1))

        if carry:
            st = (active.astype(jnp.int32), s, cand.astype(jnp.int32),
                  w0, w1, rr0, rr1, reg_cl, jnp.int32(0))
        else:
            st = (active.astype(jnp.int32), s, cand.astype(jnp.int32),
                  w0, w1, reg_cl, jnp.int32(0))
        st = jax.lax.while_loop(cond, _compose(body, _MARCH_UNROLL), st)
        if carry:
            return (st[0] != 0, st[1], st[2] != 0, st[3], st[4], st[5],
                    st[6], st[7])
        return (st[0] != 0, st[1], st[2] != 0, st[3], st[4], rr0, rr1,
                st[5])

    def cand_info(s, w0, w1):
        """Candidate block/word details for frozen rays, recomputed
        from the freeze sample (the exact expressions march used, so
        the values are bit-identical to the old loop-carried ones)."""
        se = s + _STEP_EPS
        px = ox + dx * se
        py = oy + dy * se
        pz = oz + dz * se
        c1x = jnp.clip(jnp.floor(px * (1.0 / 16.0)).astype(jnp.int32), 0, 15)
        c1y = jnp.clip(jnp.floor(py * (1.0 / 16.0)).astype(jnp.int32), 0, 15)
        c1z = jnp.clip(jnp.floor(pz * (1.0 / 16.0)).astype(jnp.int32), 0, 15)
        cl = (c1x * 16 + c1y) * 16 + c1z
        bx = jnp.clip(jnp.floor(px * 0.25).astype(jnp.int32), 0, 63)
        by = jnp.clip(jnp.floor(py * 0.25).astype(jnp.int32), 0, 63)
        bz = jnp.clip(jnp.floor(pz * 0.25).astype(jnp.int32), 0, 63)
        local = ((bx & 3) << 4) | ((by & 3) << 2) | (bz & 3)
        word = jnp.where(local < 32, w0, w1)
        cwidx = cl * 2 + (local >> 5)
        cbit = local & 31
        return word, cwidx, cbit, bx, by, bz

    def round_body_rough(rstate):
        """rough.rint: hit at the block entry; entries before s_min
        are rejected and skipped. The leaf row is NOT resolved here:
        a rough freeze is final, so the round stores (word, widx,
        bit) and ONE rank gather after the outer loop replaces the
        2x4-chunk gathers every round would pay."""
        active_i, s, hit_s, hit_widx, hit_bitc, hit_word, rnd = rstate
        active = active_i != 0
        w0 = jnp.zeros(shape, jnp.int32)
        w1 = jnp.zeros(shape, jnp.int32)
        reg_cl0 = jnp.full(shape, -1, jnp.int32)
        active, s, cand, w0, w1, _rr0, _rr1, _cl = march(
            active, s, w0, w1, None, None, reg_cl0)
        cword, cwidx, cbit, cbx, cby, cbz = cand_info(s, w0, w1)

        fx = cbx.astype(jnp.float32) * 4.0
        fy = cby.astype(jnp.float32) * 4.0
        fz = cbz.astype(jnp.float32) * 4.0
        blk_in, blk_out = _slab3(ox, oy, oz, rx, ry, rz,
                                 fx, fy, fz, fx + 4.0, fy + 4.0, fz + 4.0)

        ok = cand & active & (blk_in >= s_min) & (blk_in <= s_end)
        hit_s = jnp.where(ok, jnp.maximum(blk_in, 0.0), hit_s)
        hit_widx = jnp.where(ok, cwidx, hit_widx)
        hit_bitc = jnp.where(ok, cbit, hit_bitc)
        hit_word = jnp.where(ok, cword, hit_word)
        active = active & ~ok
        s = jnp.where(cand & active,
                      jnp.maximum(blk_out, s + _STEP_EPS), s)
        active = active & (s < s_end)
        return (active.astype(jnp.int32), s, hit_s, hit_widx, hit_bitc,
                hit_word, rnd + jnp.int32(1))

    def round_body(rstate):
        if carry:
            (active_i, s, hit_s, hit_row, hit_bit, w0, w1, rr0, rr1,
             reg_cl, rnd) = rstate
        else:
            active_i, s, hit_s, hit_row, hit_bit, rnd = rstate
            w0 = jnp.zeros(shape, jnp.int32)
            w1 = jnp.zeros(shape, jnp.int32)
            rr0 = rr1 = None
            reg_cl = jnp.full(shape, -1, jnp.int32)
        active = active_i != 0
        active, s, cand, w0, w1, rr0, rr1, reg_cl = march(
            active, s, w0, w1, rr0, rr1, reg_cl)
        cword, cwidx, cbit, cbx, cby, cbz = cand_info(s, w0, w1)

        # Leaf row: rank word + in-word popcount. Carried modes read the
        # rank straight from the refresh registers (zero gathers here).
        half = cwidx & 1
        if carry:
            rank = jnp.where(half == 0, rr0, rr1)
        else:
            ccl = jnp.where(cand, cwidx >> 1, 0)
            r0, r1 = _gather_chunked_pair(l2r0_ref, l2r1_ref, ccl, 4,
                                          base=l2_base)
            rank = jnp.where(half == 0, r0, r1)
        row = rank + _popcount_below(cword, cbit)

        # Block entry/exit.
        fx = cbx.astype(jnp.float32) * 4.0
        fy = cby.astype(jnp.float32) * 4.0
        fz = cbz.astype(jnp.float32) * 4.0
        blk_in, blk_out = _slab3(ox, oy, oz, rx, ry, rz,
                                 fx, fy, fz, fx + 4.0, fy + 4.0, fz + 4.0)

        if mode == "ao_threshold":
            # The entry-report quirk plane is the ray's committed tmax
            # (ambient_occlusion.rint reads gl_RayTmaxEXT, which hardware
            # never clips to a BLAS AABB). Callers that tighten s_stop to
            # the model box must pass the true threshold via ``s_ao`` or
            # keep s_stop unclipped — a box-clipped plane fires spurious
            # entry-reports in boundary blocks.
            s_thr = s_stop if s_ao is None else s_ao
            thr_inside = cand & active & (s <= s_thr) & (s_thr <= blk_out)
            ok = thr_inside & (s <= s_end)
            hit_s = jnp.where(ok, s, hit_s)
            hit_row = jnp.where(ok, row, hit_row)
            hit_bit = jnp.where(ok, 255, hit_bit)
            active = active & ~ok

        # ---- micro DDA (hit.rint:43-137) -------------------------
        # Mask fetch gating: round 2 measured gate="chunks" a loss on
        # the 15-chunk castle (83 vs 69 ms/frame — per-chunk cond syncs
        # are pure overhead when secondary tiles touch most chunks),
        # but the round-4 29-chunk castle changed the economics: the
        # chunk_span_sim measured tile-round spans p99<=15 for all
        # mask-fetching modes, so a span16 window (valid-lane min
        # chunk, one cond, never falls back in practice) halves the
        # ungated walk. Defaults per mode in _mask_gate_for.
        in_micro = cand & active
        mrow = jnp.where(in_micro, row, 0)
        mask_lo, mask_hi = _gather_chunked_pair(
            mlo_ref, mhi_ref, mrow, mask_chunks,
            gate=_mask_gate_for(mode), base=mask_base, valid=in_micro)

        s_m = jnp.maximum(s, s_min)
        pmx = ox + dx * s_m
        pmy = oy + dy * s_m
        pmz = oz + dz * s_m
        mx = jnp.clip(jnp.floor(pmx).astype(jnp.int32), cbx * 4, cbx * 4 + 3)
        my = jnp.clip(jnp.floor(pmy).astype(jnp.int32), cby * 4, cby * 4 + 3)
        mz = jnp.clip(jnp.floor(pmz).astype(jnp.int32), cbz * 4, cbz * 4 + 3)
        # Zero-direction axes never cross (see traverse.py note).
        tmx = jnp.where(jnp.abs(dx) < 1e-20, 1e30,
                        (mx.astype(jnp.float32) + p01x - ox) * rx)
        tmy = jnp.where(jnp.abs(dy) < 1e-20, 1e30,
                        (my.astype(jnp.float32) + p01y - oy) * ry)
        tmz = jnp.where(jnp.abs(dz) < 1e-20, 1e30,
                        (mz.astype(jnp.float32) + p01z - oz) * rz)

        def mcond(st):
            return jnp.any(st[0] != 0) & (st[-1] < micro_cap)

        # The loop FREEZES a lane on its first occupied voxel (position
        # and s stop advancing) and the hit outputs are derived post-loop
        # from the frozen DDA state: carrying only (in_micro, s, pos,
        # tMax) keeps the micro loop at 8 (R,128) arrays instead of 12
        # (the register file spills past ~13, and this loop nests inside
        # the round loop's own carries) and drops the 5 masked hit/active
        # selects from every iteration.
        def mbody(st):
            (in_micro_i, s_m, mx, my, mz, tmx, tmy, tmz, i) = st
            in_micro = in_micro_i != 0
            bit = ((mx & 3) << 4) | ((my & 3) << 2) | (mz & 3)
            in_lo = bit < 32
            blo = _bit_test_i32(mask_lo, jnp.where(in_lo, bit, 0))
            bhi = _bit_test_i32(mask_hi, jnp.where(in_lo, 0, bit - 32))
            occ = jnp.where(in_lo, blo, bhi) != 0

            # Freeze on occupancy (hit vs past-range resolved post-loop).
            in_micro = in_micro & ~occ

            # Step the axis with the smallest tMax.
            s_next = jnp.minimum(jnp.minimum(tmx, tmy), tmz)
            exited = in_micro & (s_next + _EPS >= blk_out)
            adv = in_micro & ~exited
            take_x = adv & (tmx <= tmy) & (tmx <= tmz)
            take_y = adv & ~take_x & (tmy <= tmz)
            take_z = adv & ~take_x & ~take_y
            mx = jnp.where(take_x, mx + sx, mx)
            my = jnp.where(take_y, my + sy, my)
            mz = jnp.where(take_z, mz + sz, mz)
            tmx = jnp.where(take_x, tmx + jnp.abs(rx), tmx)
            tmy = jnp.where(take_y, tmy + jnp.abs(ry), tmy)
            tmz = jnp.where(take_z, tmz + jnp.abs(rz), tmz)
            s_m = jnp.where(adv, s_next, s_m)
            in_micro = in_micro & ~exited
            return (in_micro.astype(jnp.int32), s_m, mx, my, mz,
                    tmx, tmy, tmz, i + jnp.int32(1))

        st = (in_micro.astype(jnp.int32), s_m, mx, my, mz, tmx, tmy, tmz,
              jnp.int32(0))
        for _p in range(_micro_prologue_for(mode)):
            st = mbody(st)  # sync-free prologue (see _micro_prologue_for)
        st = jax.lax.while_loop(mcond, _compose(mbody, _micro_unroll_for(mode)), st)
        s_f, mx_f, my_f, mz_f = st[1], st[2], st[3], st[4]

        # Post-loop hit resolution from the frozen state: a lane that
        # froze on occupancy sits ON its first occupied voxel; exited /
        # never-entered lanes sit on a tested-empty voxel or are masked
        # by ``in_micro`` (the loop-ENTRY mask). Expressions match the
        # old in-loop writes bit-for-bit.
        bit_f = ((mx_f & 3) << 4) | ((my_f & 3) << 2) | (mz_f & 3)
        in_lo_f = bit_f < 32
        blo_f = _bit_test_i32(mask_lo, jnp.where(in_lo_f, bit_f, 0))
        bhi_f = _bit_test_i32(mask_hi, jnp.where(in_lo_f, 0, bit_f - 32))
        occ_f = in_micro & (jnp.where(in_lo_f, blo_f, bhi_f) != 0)
        hit_now = occ_f & (s_f <= s_end)
        hit_s = jnp.where(hit_now, s_f, hit_s)
        hit_row = jnp.where(hit_now, row, hit_row)
        hit_bit = jnp.where(hit_now, bit_f, hit_bit)
        active = active & ~occ_f  # hit or past-range: done either way

        # Rays whose block had no voxel hit resume past the block.
        resumed = cand & active & ~jnp.isfinite(hit_s)
        s = jnp.where(resumed, jnp.maximum(blk_out, s + _STEP_EPS), s)
        active = active & (s < s_end) & ~(cand & jnp.isfinite(hit_s))
        if carry:
            return (active.astype(jnp.int32), s, hit_s, hit_row, hit_bit,
                    w0, w1, rr0, rr1, reg_cl, rnd + jnp.int32(1))
        return (active.astype(jnp.int32), s, hit_s, hit_row, hit_bit,
                rnd + jnp.int32(1))

    def round_body_fused(rstate):
        """AO + final gather in one walk. Candidate dispatch:
        1. threshold inside the block  -> AO entry-report (ao.rint's
           0xFF quirk; the ray is done — final gather only runs for
           AO-miss rays, final_gather.rgen:24),
        2. block fully below s_ao      -> micro DDA, voxel hit = AO,
        3. block fully past s_ao       -> rough: hit at block entry
           if it is >= s_ao (the split FG pass rejects straddling
           blocks the same way), else skip past."""
        (active_i, s, ao_t, fg_t, fg_row, w0, w1, rr0, rr1, reg_cl,
         rnd) = rstate
        active = active_i != 0
        active, s, cand, w0, w1, rr0, rr1, reg_cl = march(
            active, s, w0, w1, rr0, rr1, reg_cl)
        cword, cwidx, cbit, cbx, cby, cbz = cand_info(s, w0, w1)

        half = cwidx & 1
        rank = jnp.where(half == 0, rr0, rr1)
        row = rank + _popcount_below(cword, cbit)

        fx = cbx.astype(jnp.float32) * 4.0
        fy = cby.astype(jnp.float32) * 4.0
        fz = cbz.astype(jnp.float32) * 4.0
        blk_in, blk_out = _slab3(ox, oy, oz, rx, ry, rz,
                                 fx, fy, fz, fx + 4.0, fy + 4.0, fz + 4.0)

        # 1. AO entry-report.
        thr_inside = cand & active & (s <= s_ao) & (s_ao <= blk_out)
        ao_t = jnp.where(thr_inside, s, ao_t)
        active = active & ~thr_inside

        # 3. rough final-gather past the threshold.
        fg_blk = cand & active & (s > s_ao)
        ok_fg = fg_blk & (blk_in >= s_ao) & (blk_in <= s_end)
        fg_t = jnp.where(ok_fg, jnp.maximum(blk_in, 0.0), fg_t)
        fg_row = jnp.where(ok_fg, row, fg_row)
        active = active & ~ok_fg
        skip = fg_blk & ~ok_fg & active
        s = jnp.where(skip, jnp.maximum(blk_out, s + _STEP_EPS), s)
        active = active & (s < s_end)

        # 2. micro DDA below the threshold (s_ao > blk_out here, so
        # every voxel in the block is within AO range). The whole
        # section — including the 15-chunk mask gathers — is gated:
        # AO lanes drain within the first couple of rounds (the
        # threshold spans at most 3 blocks), after which the fused
        # walk is pure rough-FG and must not pay mask fetches.
        in_micro = cand & active & ~thr_inside & ~fg_blk

        def do_micro(args):
            active_i2, s, ao_t = args
            active = active_i2 != 0
            mrow = jnp.where(in_micro, row, 0)
            mask_lo, mask_hi = _gather_chunked_pair(
                mlo_ref, mhi_ref, mrow, mask_chunks,
                gate=_mask_gate_for(mode), base=mask_base, valid=in_micro)

            s_m = jnp.maximum(s, s_min)
            pmx = ox + dx * s_m
            pmy = oy + dy * s_m
            pmz = oz + dz * s_m
            mx = jnp.clip(jnp.floor(pmx).astype(jnp.int32),
                          cbx * 4, cbx * 4 + 3)
            my = jnp.clip(jnp.floor(pmy).astype(jnp.int32),
                          cby * 4, cby * 4 + 3)
            mz = jnp.clip(jnp.floor(pmz).astype(jnp.int32),
                          cbz * 4, cbz * 4 + 3)
            tmx = jnp.where(jnp.abs(dx) < 1e-20, 1e30,
                            (mx.astype(jnp.float32) + p01x - ox) * rx)
            tmy = jnp.where(jnp.abs(dy) < 1e-20, 1e30,
                            (my.astype(jnp.float32) + p01y - oy) * ry)
            tmz = jnp.where(jnp.abs(dz) < 1e-20, 1e30,
                            (mz.astype(jnp.float32) + p01z - oz) * rz)

            def mcond(st):
                return jnp.any(st[0] != 0) & (st[-1] < micro_cap)

            # Freeze-on-occupancy micro loop; ao_t/active derived
            # post-loop from the frozen state (see the precise-mode
            # micro loop note — same 12 -> 8 carry diet).
            def mbody(st):
                (in_micro_i, s_m, mx, my, mz, tmx, tmy, tmz, i) = st
                in_micro = in_micro_i != 0
                bit = ((mx & 3) << 4) | ((my & 3) << 2) | (mz & 3)
                in_lo = bit < 32
                blo = _bit_test_i32(mask_lo, jnp.where(in_lo, bit, 0))
                bhi = _bit_test_i32(mask_hi, jnp.where(in_lo, 0, bit - 32))
                occ = jnp.where(in_lo, blo, bhi) != 0

                in_micro = in_micro & ~occ

                s_next = jnp.minimum(jnp.minimum(tmx, tmy), tmz)
                exited = in_micro & (s_next + _EPS >= blk_out)
                adv = in_micro & ~exited
                take_x = adv & (tmx <= tmy) & (tmx <= tmz)
                take_y = adv & ~take_x & (tmy <= tmz)
                take_z = adv & ~take_x & ~take_y
                mx = jnp.where(take_x, mx + sx, mx)
                my = jnp.where(take_y, my + sy, my)
                mz = jnp.where(take_z, mz + sz, mz)
                tmx = jnp.where(take_x, tmx + jnp.abs(rx), tmx)
                tmy = jnp.where(take_y, tmy + jnp.abs(ry), tmy)
                tmz = jnp.where(take_z, tmz + jnp.abs(rz), tmz)
                s_m = jnp.where(adv, s_next, s_m)
                in_micro = in_micro & ~exited
                return (in_micro.astype(jnp.int32), s_m, mx, my, mz,
                        tmx, tmy, tmz, i + jnp.int32(1))

            st = (in_micro.astype(jnp.int32), s_m, mx, my, mz,
                  tmx, tmy, tmz, jnp.int32(0))
            for _p in range(_micro_prologue_for(mode)):
                st = mbody(st)  # sync-free prologue
            st = jax.lax.while_loop(mcond, _compose(mbody, _micro_unroll_for(mode)), st)
            s_f, mx_f, my_f, mz_f = st[1], st[2], st[3], st[4]

            bit_f = ((mx_f & 3) << 4) | ((my_f & 3) << 2) | (mz_f & 3)
            in_lo_f = bit_f < 32
            blo_f = _bit_test_i32(mask_lo, jnp.where(in_lo_f, bit_f, 0))
            bhi_f = _bit_test_i32(mask_hi,
                                  jnp.where(in_lo_f, 0, bit_f - 32))
            hit_f = in_micro & (jnp.where(in_lo_f, blo_f, bhi_f) != 0)
            ao_t = jnp.where(hit_f, s_f, ao_t)
            active2 = active & ~hit_f

            resumed = in_micro & active2
            s2 = jnp.where(resumed, jnp.maximum(blk_out, s + _STEP_EPS),
                           s)
            return active2.astype(jnp.int32), s2, ao_t

        active_i2, s, ao_t = jax.lax.cond(
            jnp.any(in_micro), do_micro, lambda a: a,
            (active.astype(jnp.int32), s, ao_t))
        active = (active_i2 != 0) & (s < s_end)
        return (active.astype(jnp.int32), s, ao_t, fg_t, fg_row,
                w0, w1, rr0, rr1, reg_cl, rnd + jnp.int32(1))

    def round_cond(rstate):
        return jnp.any(rstate[0] != 0) & (rstate[-1] < rounds)

    # Cross-round cell-register carry (see march): w0/w1/ranks start
    # dead with reg_cl = -1 so the first entry into an occupied cell
    # refreshes.
    if carry:
        cw0 = jnp.zeros(shape, jnp.int32)
        cw1 = jnp.zeros(shape, jnp.int32)
        cr0 = jnp.zeros(shape, jnp.int32)
        cr1 = jnp.zeros(shape, jnp.int32)
        ccl0 = jnp.full(shape, -1, jnp.int32)

    if fused:
        rstate = (active.astype(jnp.int32), s, hit_s,
                  jnp.full(shape, jnp.inf, jnp.float32), hit_row,
                  cw0, cw1, cr0, cr1, ccl0, jnp.int32(0))
        rstate = jax.lax.while_loop(round_cond, round_body_fused, rstate)
        return rstate[2], rstate[3], rstate[4]  # ao_t, fg_t, fg_row

    if mode == "rough":
        rstate = (active.astype(jnp.int32), s, hit_s, hit_row, hit_bit,
                  jnp.zeros(shape, jnp.int32), jnp.int32(0))
        rstate = jax.lax.while_loop(round_cond, round_body_rough, rstate)
        hit_s, hit_widx, hit_bitc, hit_word = (rstate[2], rstate[3],
                                               rstate[4], rstate[5])
        # Deferred leaf-row resolution: one rank gather for the whole
        # trace instead of one per round.
        got = hit_widx >= 0
        ccl = jnp.where(got, hit_widx >> 1, 0)
        r0, r1 = _gather_chunked_pair(l2r0_ref, l2r1_ref, ccl, 4,
                                      base=l2_base)
        rank = jnp.where((hit_widx & 1) == 0, r0, r1)
        hit_row = jnp.where(
            got, rank + _popcount_below(hit_word,
                                        jnp.maximum(hit_bitc, 0)), -1)
        hit_bit = jnp.full(shape, -1, jnp.int32)
    elif carry:
        rstate = (active.astype(jnp.int32), s, hit_s, hit_row, hit_bit,
                  cw0, cw1, cr0, cr1, ccl0, jnp.int32(0))
        rstate = jax.lax.while_loop(round_cond, round_body, rstate)
        hit_s, hit_row, hit_bit = rstate[2], rstate[3], rstate[4]
    else:
        rstate = (active.astype(jnp.int32), s, hit_s, hit_row, hit_bit,
                  jnp.int32(0))
        rstate = jax.lax.while_loop(round_cond, round_body, rstate)
        hit_s, hit_row, hit_bit = rstate[2], rstate[3], rstate[4]

    # s/active of rays still live at round exhaustion ride along for
    # callers that care (the batched scene kernel ignores them).
    return hit_s, hit_row, hit_bit, rstate[1], rstate[0]


def _make_kernel(mask_chunks: int, mode: str, rounds: int,
                 march_cap: int, micro_cap: int):
    """Single-instance kernel: refs in/out around :func:`_traverse_core`."""
    fused = mode == "ao_fg"

    def kernel(*refs):
        (l1_ref, l2w0_ref, l2w1_ref, l2r0_ref, l2r1_ref,
         mlo_ref, mhi_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         smin_ref) = refs[:14]
        if fused:
            sao_ref, smax_ref, hit_ref, row_ref, bit_ref = refs[14:]
        else:
            smax_ref, hit_ref, row_ref, bit_ref = refs[14:]
        out = _traverse_core(
            l1_ref[:], l2w0_ref, l2w1_ref, l2r0_ref, l2r1_ref,
            mlo_ref, mhi_ref,
            ox_ref[:], oy_ref[:], oz_ref[:],
            dx_ref[:], dy_ref[:], dz_ref[:],
            smin_ref[:], smax_ref[:],
            mask_chunks, mode, rounds, march_cap, micro_cap,
            s_ao=sao_ref[:] if fused else None,
        )
        if fused:
            hit_ref[:], row_ref[:], bit_ref[:] = out  # ao_t, fg_t, fg_row
            return
        hit_ref[:], row_ref[:], bit_ref[:] = out[:3]

    return kernel


def _make_scene_kernel(CL: int, model_chunks: tuple, inst_counts: tuple,
                       mode: str, rounds: int,
                       march_cap: int, micro_cap: int):
    """Batched multi-instance kernel — the TLAS equivalent
    (``crates/render/src/accel_struct/tlas.rs:29-143``): ONE dispatch
    traces every instance. The grid covers ray tiles only; inside the
    kernel a STATIC loop over models (code size O(M)) wraps a fori_loop
    over that model's instances, so each model's REAL mask-chunk count
    is baked into its gathers (a 1-chunk teapot must not walk the
    castle's 15 padded chunks) and the closest-hit accumulators stay in
    registers for the whole sweep. Per instance the kernel transforms
    the WORLD-space ray tile by the instance affine (SMEM scalars),
    clips to the model AABB and the best hit so far (per-tile instance
    culling: a tile whose rays all miss the box runs zero traversal
    rounds — the hardware-TLAS "skip this BLAS" analog), then merges.

    Instances arrive sorted by model; ``ids_ref`` maps the sorted
    position back to the caller's instance index for the output.

    ``mode="ao_fg"`` (the fused AO/shadow near + rough far walk) takes
    an extra per-ray ``t_ao`` input and writes five outputs
    (ao_t, ao_inst, fg_t, fg_inst, fg_row): both the near and the far
    closest hits merge across instances in registers.

    At >2 instances a scalar cond skips an instance's traversal rounds
    + merge whenever the whole tile misses its AABB (or is already
    capped closer): a culled instance still pays ~2k cycles of round
    bookkeeping/`any()` syncs otherwise, which is what made an 11-
    instance scene cost 4.4× the 2-instance frame. At ≤2 instances the
    ~120-cycle gate sync can't pay for itself, so the code is emitted
    gate-free (headline path unchanged)."""
    fused = mode == "ao_fg"
    cull_gate = sum(inst_counts) > 2

    def kernel(*refs):
        (l1_ref, l2w0_ref, l2w1_ref, l2r0_ref, l2r1_ref,
         mlo_ref, mhi_ref, ids_ref, aff_ref, aabb_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         tn_ref, tx_ref) = refs[:18]
        if fused:
            ta_ref = refs[18]
            aot_ref, aoi_ref, fgt_ref, fgi_ref, fgr_ref = refs[19:]
        else:
            t_ref, inst_ref, row_ref, bit_ref = refs[18:]
        shape = ox_ref.shape
        owx, owy, owz = ox_ref[:], oy_ref[:], oz_ref[:]
        dwx, dwy, dwz = dx_ref[:], dy_ref[:], dz_ref[:]
        tn = tn_ref[:]
        tx0 = tx_ref[:]
        ta0 = ta_ref[:] if fused else None

        inf = jnp.full(shape, jnp.inf, jnp.float32)
        neg1 = jnp.full(shape, -1, jnp.int32)

        def sweep(carry, merge):
            """Static model loop x fori instance loop around
            :func:`_traverse_core`; ``merge(carry, core_out, inv, oid)``
            folds one instance's results into the accumulators."""
            start = 0
            for m, cnt in enumerate(inst_counts):
                if cnt == 0:
                    continue
                l1t = l1_ref[m]

                def one_instance(i, carry, _m=m, _l1t=l1t):
                    def a(k):
                        return aff_ref[i, k]

                    # world -> object affine (world_to_obj rows).
                    ox = a(0) * owx + a(1) * owy + a(2) * owz + a(3)
                    oy = a(4) * owx + a(5) * owy + a(6) * owz + a(7)
                    oz = a(8) * owx + a(9) * owy + a(10) * owz + a(11)
                    dx = a(0) * dwx + a(1) * dwy + a(2) * dwz
                    dy = a(4) * dwx + a(5) * dwy + a(6) * dwz
                    dz = a(8) * dwx + a(9) * dwy + a(10) * dwz
                    dlen = jnp.maximum(
                        jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-20)
                    inv = 1.0 / dlen
                    dx, dy, dz = dx * inv, dy * inv, dz * inv

                    # Closest-so-far cap: in fused mode the far (fg)
                    # accumulator bounds the walk — fg hits only exist
                    # past t_ao, so the cap never truncates the near
                    # (ao) search range.
                    tx = jnp.minimum(tx0, carry[2] if fused else carry[0])

                    # Model-AABB clip in s units (clip_to_model_aabb
                    # parity).
                    rx, ry, rz = _safe_rcp(dx), _safe_rcp(dy), _safe_rcp(dz)
                    zero = jnp.zeros(shape, jnp.float32)
                    lo, hi = _slab3(
                        ox, oy, oz, rx, ry, rz,
                        zero + aabb_ref[_m, 0], zero + aabb_ref[_m, 1],
                        zero + aabb_ref[_m, 2], zero + aabb_ref[_m, 3],
                        zero + aabb_ref[_m, 4], zero + aabb_ref[_m, 5])
                    s_min = jnp.maximum(tn * dlen, lo)
                    s_stop = jnp.minimum(tx * dlen, hi)

                    if fused:
                        s_ao_val = ta0 * dlen
                    elif mode == "ao_threshold":
                        # True quirk plane: committed tmax, NOT clipped
                        # to the model box (see _traverse_core note).
                        s_ao_val = tx * dlen
                    else:
                        s_ao_val = None

                    def run(c):
                        core = _traverse_core(
                            _l1t, l2w0_ref, l2w1_ref, l2r0_ref, l2r1_ref,
                            mlo_ref, mhi_ref,
                            ox, oy, oz, dx, dy, dz, s_min, s_stop,
                            model_chunks[_m], mode, rounds, march_cap,
                            micro_cap,
                            s_ao=s_ao_val,
                            l2_base=_m * 4, mask_base=_m * CL,
                        )
                        return merge(c, core, inv, ids_ref[i])

                    if cull_gate:
                        # Conservative superset of _traverse_core's
                        # activation (active ⇒ s_min < s_stop), so the
                        # skip is exact.
                        return jax.lax.cond(jnp.any(s_min < s_stop),
                                            run, lambda c: c, carry)
                    return run(carry)

                if cnt == 1:
                    carry = one_instance(jnp.int32(start), carry)
                else:
                    carry = jax.lax.fori_loop(start, start + cnt,
                                              one_instance, carry)
                start += cnt
            return carry

        if fused:
            def merge(carry, core, inv, oid):
                ao_b, ao_i, fg_b, fg_i, fg_r = carry
                ao_s, fg_s, fg_row = core
                ao_t = ao_s * inv
                fg_t = fg_s * inv
                ao_c = ao_t < ao_b
                fg_c = fg_t < fg_b
                return (jnp.where(ao_c, ao_t, ao_b),
                        jnp.where(ao_c, oid, ao_i),
                        jnp.where(fg_c, fg_t, fg_b),
                        jnp.where(fg_c, oid, fg_i),
                        jnp.where(fg_c, fg_row, fg_r))

            ao_b, ao_i, fg_b, fg_i, fg_r = sweep(
                (inf, neg1, inf, neg1, neg1), merge)
            aot_ref[:] = ao_b
            aoi_ref[:] = ao_i
            fgt_ref[:] = fg_b
            fgi_ref[:] = fg_i
            fgr_ref[:] = fg_r
        else:
            def merge(carry, core, inv, oid):
                best, binst, brow, bbit = carry
                hit_s, hit_row, hit_bit = core[:3]
                t_new = hit_s * inv
                closer = t_new < best
                return (jnp.where(closer, t_new, best),
                        jnp.where(closer, oid, binst),
                        jnp.where(closer, hit_row, brow),
                        jnp.where(closer, hit_bit, bbit))

            best, binst, brow, bbit = sweep((inf, neg1, neg1, neg1), merge)
            t_ref[:] = best
            inst_ref[:] = binst
            row_ref[:] = brow
            bit_ref[:] = bbit

    return kernel


@partial(jax.jit, static_argnames=("CL", "model_chunks", "inst_counts",
                                   "mode", "rounds", "march_cap",
                                   "interpret"))
def _trace_pallas_scene(l1, l2w0, l2w1, l2r0, l2r1, mlo, mhi,
                        ids, aff, aabb,
                        ox, oy, oz, dx, dy, dz, tn, tx,
                        CL, model_chunks, inst_counts, mode, rounds,
                        march_cap=160, interpret=False, ta=None):
    n_rows = ox.shape[0]
    grid = (n_rows // ROWS,)
    fused = mode == "ao_fg"
    kernel = _make_scene_kernel(CL, model_chunks, inst_counts, mode, rounds,
                                march_cap=march_cap, micro_cap=12)

    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    n_ray_in = 9 if fused else 8
    f32 = jnp.float32
    if fused:
        out_shape = [
            jax.ShapeDtypeStruct((n_rows, LANES), f32),        # ao_t
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),  # ao_inst
            jax.ShapeDtypeStruct((n_rows, LANES), f32),        # fg_t
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),  # fg_inst
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),  # fg_row
        ]
    else:
        out_shape = [
            jax.ShapeDtypeStruct((n_rows, LANES), f32),        # t (param)
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),  # inst
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),  # row
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),  # bit
        ]
    args = [l1, l2w0, l2w1, l2r0, l2r1, mlo, mhi, ids, aff, aabb,
            ox, oy, oz, dx, dy, dz, tn, tx] + ([ta] if fused else [])
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tab_spec] * 7 + [smem_spec] * 3 + [ray_spec] * n_ray_in,
        out_specs=[ray_spec] * len(out_shape),
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    return out


@partial(jax.jit, static_argnames=("mask_chunks", "mode", "rounds",
                                   "march_cap", "interpret"))
def _trace_pallas(l1, l2w0, l2w1, l2r0, l2r1, mlo, mhi,
                  ox, oy, oz, dx, dy, dz,
                  smin, smax, mask_chunks, mode, rounds,
                  march_cap=160, interpret=False):
    n_rows = ox.shape[0]
    grid = n_rows // ROWS
    kernel = _make_kernel(mask_chunks, mode, rounds,
                          march_cap=march_cap, micro_cap=12)

    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[tab_spec] * 7 + [ray_spec] * 8,
        out_specs=[ray_spec] * 3,
        out_shape=out_shapes,
        interpret=interpret,
    )(l1, l2w0, l2w1, l2r0, l2r1, mlo, mhi, ox, oy, oz, dx, dy, dz, smin, smax)
    return out


def trace_instance_pallas(tables, origin, direction, t_min, t_max,
                          mode: str = "precise", rounds: int = 64,
                          interpret: bool = False):
    """Trace rays against one model with the Pallas kernel.

    Same contract as :func:`dust_tpu.ops.traverse.trace_instance`:
    object-space rays, unnormalised directions, parameter-space t bounds;
    returns (t, row, bit) with ``t = inf`` on miss.
    """
    n = origin.shape[0]
    dlen = jnp.maximum(jnp.linalg.norm(direction, axis=-1), 1e-20)
    dn = direction / dlen[:, None]

    block = ROWS * LANES
    pad = (-n) % block

    def prep(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, jnp.float32)])
        return x.reshape(-1, LANES)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    hit_s, row, bit = _trace_pallas(
        tables.l1, tables.l2_w0, tables.l2_w1, tables.l2_r0, tables.l2_r1,
        tables.mask_lo, tables.mask_hi,
        prep(origin[:, 0]), prep(origin[:, 1]), prep(origin[:, 2]),
        prep(dn[:, 0], 1.0), prep(dn[:, 1], 1.0), prep(dn[:, 2], 1.0),
        prep(t_min * dlen), prep(t_max * dlen, -1.0),
        mask_chunks=tables.mask_chunks, mode=mode, rounds=rounds,
        interpret=interpret,
    )
    hit_s = hit_s.reshape(-1)[:n]
    return hit_s / dlen, row.reshape(-1)[:n], bit.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("mask_chunks", "rounds", "interpret"))
def _trace_pallas_ao_fg(l1, l2w0, l2w1, l2r0, l2r1, mlo, mhi,
                        ox, oy, oz, dx, dy, dz,
                        smin, sao, smax, mask_chunks, rounds,
                        interpret=False):
    n_rows = ox.shape[0]
    grid = n_rows // ROWS
    kernel = _make_kernel(mask_chunks, "ao_fg", rounds,
                          march_cap=160, micro_cap=12)

    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[tab_spec] * 7 + [ray_spec] * 9,
        out_specs=[ray_spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),  # ao_t
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),  # fg_t
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),    # fg_row
        ],
        interpret=interpret,
    )(l1, l2w0, l2w1, l2r0, l2r1, mlo, mhi,
      ox, oy, oz, dx, dy, dz, smin, sao, smax)
    return out


def trace_instance_pallas_ao_fg(tables, origin, direction,
                                t_min, t_ao, t_max,
                                rounds: int = 64, interpret: bool = False):
    """Fused AO + final-gather trace against one model: one traversal of
    the shared cosine ray (inactive lanes carry ``t_ao = t_max = -1``).
    ``t_ao`` may exceed ``t_max`` (e.g. a box-clipped t_max): the quirk
    plane then lies past every reachable block and never fires, matching
    hardware (gl_RayTmaxEXT is not box-clipped). Returns
    (ao_t, fg_t, fg_row) with t = inf on miss."""
    n = origin.shape[0]
    dlen = jnp.maximum(jnp.linalg.norm(direction, axis=-1), 1e-20)
    dn = direction / dlen[:, None]

    block = ROWS * LANES
    pad = (-n) % block

    def prep(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, jnp.float32)])
        return x.reshape(-1, LANES)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_ao = jnp.broadcast_to(jnp.asarray(t_ao, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    ao_s, fg_s, fg_row = _trace_pallas_ao_fg(
        tables.l1, tables.l2_w0, tables.l2_w1, tables.l2_r0, tables.l2_r1,
        tables.mask_lo, tables.mask_hi,
        prep(origin[:, 0]), prep(origin[:, 1]), prep(origin[:, 2]),
        prep(dn[:, 0], 1.0), prep(dn[:, 1], 1.0), prep(dn[:, 2], 1.0),
        prep(t_min * dlen), prep(t_ao * dlen, -1.0),
        prep(t_max * dlen, -1.0),
        mask_chunks=tables.mask_chunks, rounds=rounds, interpret=interpret,
    )
    ao_s = ao_s.reshape(-1)[:n]
    fg_s = fg_s.reshape(-1)[:n]
    return ao_s / dlen, fg_s / dlen, fg_row.reshape(-1)[:n]


def trace_scene_pallas_ao_fg(scene, origin, direction, t_min, t_ao, t_max,
                             rounds: int = 64,
                             interpret: bool | None = None):
    """Fused AO + final-gather over every instance. Returns two
    TraceResults (ao, fg): ao carries only t/inst (row/bit are -1 — the
    pipeline reads ao.hit and ao.t; ambient_occlusion.rchit packs hitT
    alone), fg matches the rough trace contract.

    Default path is the batched one-dispatch scene kernel (both the
    near and far closest-hit accumulators merge across instances in
    registers); ``DUST_PALLAS_SCENE=loop`` forces the per-instance loop
    for A/B."""
    from dust_tpu.ops.traverse import TraceResult, clip_to_model_aabb

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    if _os.environ.get("DUST_PALLAS_SCENE") != "loop":
        return _trace_scene_ao_fg_batched(
            scene, origin, direction, t_min, t_ao, t_max,
            rounds=rounds, interpret=interpret)

    n = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_ao = jnp.broadcast_to(jnp.asarray(t_ao, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    ao_t = jnp.full(n, jnp.inf)
    ao_inst = -jnp.ones(n, jnp.int32)
    fg_t = jnp.full(n, jnp.inf)
    fg_inst = -jnp.ones(n, jnp.int32)
    fg_row = -jnp.ones(n, jnp.int32)

    for i, m in enumerate(scene.inst_model):
        tables = PallasTables(
            l1=scene.pl_l1[m],
            l2_w0=scene.pl_l2w0[m], l2_w1=scene.pl_l2w1[m],
            l2_r0=scene.pl_l2r0[m], l2_r1=scene.pl_l2r1[m],
            mask_lo=scene.pl_mlo[m], mask_hi=scene.pl_mhi[m],
        )
        w2o = scene.world_to_obj[i]
        o_obj = _xform_point(w2o, origin)
        d_obj = _xform_dir(w2o, direction)
        # fg hits satisfy fg_t >= t_ao, so capping by the best fg so far
        # never clips the AO range.
        cap = jnp.minimum(t_max, fg_t)
        tn, cap = clip_to_model_aabb(scene, m, o_obj, d_obj, t_min, cap)
        # t_ao passes through UNCLIPPED: the AO quirk plane is the ray's
        # committed tmax, never the model-box exit (see _traverse_core).
        a_t, f_t, f_row = trace_instance_pallas_ao_fg(
            tables, o_obj, d_obj, tn, t_ao, cap,
            rounds=rounds, interpret=interpret,
        )
        a_closer = a_t < ao_t
        ao_t = jnp.where(a_closer, a_t, ao_t)
        ao_inst = jnp.where(a_closer, i, ao_inst)
        f_closer = f_t < fg_t
        fg_t = jnp.where(f_closer, f_t, fg_t)
        fg_inst = jnp.where(f_closer, i, fg_inst)
        fg_row = jnp.where(f_closer, f_row, fg_row)

    neg1 = -jnp.ones(n, jnp.int32)
    ao = TraceResult(t=ao_t, inst=ao_inst, row=neg1, bit=neg1)
    fg = TraceResult(t=fg_t, inst=fg_inst, row=fg_row, bit=neg1)
    return ao, fg


def _front_to_back_ids(scene, origin, order, inst_counts):
    """Near-to-far instance order for the batched scene kernel — the
    TLAS front-to-back sweep analog. WITHIN each model group (the
    model grouping is static: chunk counts are baked per group),
    instances are sorted by squared distance from the ray population's
    mean origin to the instance's world-space box center.

    Pure perf, zero semantics: the kernel's closest-hit merge is
    order-independent, but its per-tile cull (instance active iff
    s_min < s_stop, with s_stop capped by the best hit so far) can
    only skip an instance if a closer one was swept FIRST — so on
    many-instance scenes near-to-far order turns occluded instances
    into culled ones. The order is TRACED data (ids/aff are kernel
    inputs): camera motion costs an (I,)-argsort per dispatch and no
    recompile. Callers keep the static order at <=2 instances, where
    the cull gate is not emitted (see _make_scene_kernel)."""
    ids_static = np.asarray(order, np.int32)
    center_m = 0.5 * (scene.model_aabb_min + scene.model_aabb_max)
    models = np.asarray(scene.inst_model, np.int64)[ids_static]
    c = jnp.take(center_m, jnp.asarray(models), axis=0)          # (I, 3)
    o2w = jnp.take(scene.obj_to_world, jnp.asarray(ids_static), axis=0)
    cw = jnp.sum(o2w[:, :, :3] * c[:, None, :], axis=-1) + o2w[:, :, 3]
    mo = jnp.mean(jnp.asarray(origin, jnp.float32), axis=0)
    dist = jnp.sum((cw - mo[None, :]) ** 2, axis=-1)             # (I,)
    parts = []
    start = 0
    for cnt in inst_counts:
        if cnt == 0:
            continue
        seg = jnp.asarray(ids_static[start:start + cnt])
        if cnt > 1:
            seg = jnp.take(seg, jnp.argsort(dist[start:start + cnt]))
        parts.append(seg)
        start += cnt
    ids = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    aff = jnp.take(scene.world_to_obj.reshape(-1, 12), ids, axis=0)
    return ids, aff


def _trace_scene_ao_fg_batched(scene, origin, direction, t_min, t_ao,
                               t_max, rounds: int, interpret: bool):
    """Batched-kernel body of :func:`trace_scene_pallas_ao_fg`."""
    from dust_tpu.ops.traverse import TraceResult

    n = origin.shape[0]
    I = scene.num_instances
    M = scene.num_models
    CL = scene.pl_mlo.shape[1]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_ao = jnp.broadcast_to(jnp.asarray(t_ao, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    neg1 = -jnp.ones(n, jnp.int32)
    if I == 0:
        inf = jnp.full(n, jnp.inf)
        return (TraceResult(t=inf, inst=neg1, row=neg1, bit=neg1),
                TraceResult(t=inf, inst=neg1, row=neg1, bit=neg1))

    block = ROWS * LANES
    pad = (-n) % block

    def prep(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, jnp.float32)])
        return x.reshape(-1, LANES)

    order = sorted(range(I), key=lambda i: scene.inst_model[i])
    inst_counts = tuple(
        sum(1 for im in scene.inst_model if im == m) for m in range(M))
    if I > 2:
        # Near-to-far within each model group: feeds the in-kernel
        # per-tile cull (emitted at >2 instances) occluders first.
        ids, aff = _front_to_back_ids(scene, origin, order, inst_counts)
    else:
        ids = jnp.asarray(order, jnp.int32)
        aff = scene.world_to_obj[np.asarray(order)].reshape(I, 12)
    aabb = jnp.concatenate([scene.model_aabb_min, scene.model_aabb_max],
                           axis=-1)

    ao_t, ao_i, fg_t, fg_i, fg_row = _trace_pallas_scene(
        scene.pl_l1,
        scene.pl_l2w0.reshape(M * 4, 8, 128),
        scene.pl_l2w1.reshape(M * 4, 8, 128),
        scene.pl_l2r0.reshape(M * 4, 8, 128),
        scene.pl_l2r1.reshape(M * 4, 8, 128),
        scene.pl_mlo.reshape(M * CL, 8, 128),
        scene.pl_mhi.reshape(M * CL, 8, 128),
        ids, aff, aabb,
        prep(origin[:, 0]), prep(origin[:, 1]), prep(origin[:, 2]),
        prep(direction[:, 0], 1.0), prep(direction[:, 1], 1.0),
        prep(direction[:, 2], 1.0),
        prep(t_min), prep(t_max, -1.0),
        CL=CL, model_chunks=tuple(scene.pl_chunks),
        inst_counts=inst_counts, mode="ao_fg", rounds=rounds,
        interpret=interpret, ta=prep(t_ao, -1.0),
    )
    ao = TraceResult(t=ao_t.reshape(-1)[:n], inst=ao_i.reshape(-1)[:n],
                     row=neg1, bit=neg1)
    fg = TraceResult(t=fg_t.reshape(-1)[:n], inst=fg_i.reshape(-1)[:n],
                     row=fg_row.reshape(-1)[:n], bit=neg1)
    return ao, fg


def stack_tables(tables: list[PallasTables], min_chunks: int = 1):
    """Stack per-model tables into (M, ...) arrays padded to a common
    mask-chunk count (for DeviceScene storage). ``min_chunks`` reserves
    headroom so incremental refits can splice a grown model in place."""
    m = len(tables)
    cl = max([t.mask_chunks for t in tables] + [min_chunks]) if tables else 1
    l1 = np.stack([t.l1 for t in tables]) if m else np.zeros((0, 8, 128), np.int32)
    l2w0 = np.stack([t.l2_w0 for t in tables]) if m else np.zeros((0, 4, 8, 128), np.int32)
    l2w1 = np.stack([t.l2_w1 for t in tables]) if m else np.zeros((0, 4, 8, 128), np.int32)
    l2r0 = np.stack([t.l2_r0 for t in tables]) if m else np.zeros((0, 4, 8, 128), np.int32)
    l2r1 = np.stack([t.l2_r1 for t in tables]) if m else np.zeros((0, 4, 8, 128), np.int32)
    mlo = np.zeros((m, cl, 8, 128), np.int32)
    mhi = np.zeros((m, cl, 8, 128), np.int32)
    for i, t in enumerate(tables):
        mlo[i, : t.mask_chunks] = t.mask_lo
        mhi[i, : t.mask_chunks] = t.mask_hi
    return l1, l2w0, l2w1, l2r0, l2r1, mlo, mhi


def _xform_point(a34, p):
    # Scalar-broadcast VPU apply — an einsum pads (N,3)@(3,3) onto the
    # MXU at 3/128 lane use (~8x the cost; see shade._inst_xform).
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    return jnp.stack(
        [a34[k, 0] * x + a34[k, 1] * y + a34[k, 2] * z + a34[k, 3]
         for k in range(3)], axis=-1)


def _xform_dir(a34, d):
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack(
        [a34[k, 0] * x + a34[k, 1] * y + a34[k, 2] * z
         for k in range(3)], axis=-1)


def trace_scene_pallas_batched(scene, origin, direction, t_min, t_max,
                               mode: str = "precise", rounds: int = 64,
                               interpret: bool | None = None):
    """Closest-hit trace against every instance in ONE batched kernel
    dispatch (see :func:`_make_scene_kernel`) — same contract as
    :func:`dust_tpu.ops.traverse.trace_scene`. Unlike the per-instance
    loop this costs O(1) dispatches and O(N) ray-stream HBM traffic
    regardless of the instance count; per-(tile, instance) work is
    culled in-kernel against the model AABB and the best hit so far."""
    from dust_tpu.ops.traverse import TraceResult

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    n = origin.shape[0]
    I = scene.num_instances
    M = scene.num_models
    CL = scene.pl_mlo.shape[1]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if I == 0:
        neg1 = -jnp.ones(n, jnp.int32)
        return TraceResult(t=jnp.full(n, jnp.inf), inst=neg1, row=neg1,
                           bit=neg1)

    block = ROWS * LANES
    pad = (-n) % block

    def prep(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, jnp.float32)])
        return x.reshape(-1, LANES)

    # Instances sorted by model (static): the kernel sweeps each model's
    # contiguous group with that model's real chunk count baked in.
    order = sorted(range(I), key=lambda i: scene.inst_model[i])
    inst_counts = tuple(
        sum(1 for im in scene.inst_model if im == m) for m in range(M))
    if I > 2:
        # Near-to-far within each model group: feeds the in-kernel
        # per-tile cull (emitted at >2 instances) occluders first.
        ids, aff = _front_to_back_ids(scene, origin, order, inst_counts)
    else:
        ids = jnp.asarray(order, jnp.int32)
        aff = scene.world_to_obj[np.asarray(order)].reshape(I, 12)
    aabb = jnp.concatenate([scene.model_aabb_min, scene.model_aabb_max],
                           axis=-1)  # (M, 6)

    t, inst, row, bit = _trace_pallas_scene(
        scene.pl_l1,
        scene.pl_l2w0.reshape(M * 4, 8, 128),
        scene.pl_l2w1.reshape(M * 4, 8, 128),
        scene.pl_l2r0.reshape(M * 4, 8, 128),
        scene.pl_l2r1.reshape(M * 4, 8, 128),
        scene.pl_mlo.reshape(M * CL, 8, 128),
        scene.pl_mhi.reshape(M * CL, 8, 128),
        ids, aff, aabb,
        prep(origin[:, 0]), prep(origin[:, 1]), prep(origin[:, 2]),
        prep(direction[:, 0], 1.0), prep(direction[:, 1], 1.0),
        prep(direction[:, 2], 1.0),
        prep(t_min), prep(t_max, -1.0),
        CL=CL, model_chunks=tuple(scene.pl_chunks),
        inst_counts=inst_counts, mode=mode, rounds=rounds,
        interpret=interpret,
    )
    return TraceResult(
        t=t.reshape(-1)[:n],
        inst=inst.reshape(-1)[:n],
        row=row.reshape(-1)[:n],
        bit=bit.reshape(-1)[:n],
    )


def trace_scene_pallas(scene, origin, direction, t_min, t_max,
                       mode: str = "precise", rounds: int = 64,
                       interpret: bool | None = None):
    """Closest-hit trace against every instance with the Pallas kernel —
    same contract as :func:`dust_tpu.ops.traverse.trace_scene`.

    The default path is the batched one-dispatch TLAS-style kernel
    (:func:`trace_scene_pallas_batched`); ``DUST_PALLAS_SCENE=loop``
    forces the per-instance loop for A/B measurement. (A two-phase
    straggler-decoupled variant existed through round 3 — measured +12%
    on the castle frame, pruned round 4; measurements recorded in
    ARCHITECTURE.md.)"""
    from dust_tpu.ops.traverse import TraceResult

    if interpret is None:
        # CPU backend (tests, virtual meshes) only supports interpret mode.
        interpret = jax.default_backend() == "cpu"

    if _os.environ.get("DUST_PALLAS_SCENE") != "loop":
        return trace_scene_pallas_batched(
            scene, origin, direction, t_min, t_max, mode=mode,
            rounds=rounds, interpret=interpret)

    n = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    best_t = jnp.full(n, jnp.inf)
    best_inst = -jnp.ones(n, jnp.int32)
    best_row = -jnp.ones(n, jnp.int32)
    best_bit = -jnp.ones(n, jnp.int32)

    for i, m in enumerate(scene.inst_model):
        tables = PallasTables(
            l1=scene.pl_l1[m],
            l2_w0=scene.pl_l2w0[m], l2_w1=scene.pl_l2w1[m],
            l2_r0=scene.pl_l2r0[m], l2_r1=scene.pl_l2r1[m],
            mask_lo=scene.pl_mlo[m], mask_hi=scene.pl_mhi[m],
        )
        w2o = scene.world_to_obj[i]
        o_obj = _xform_point(w2o, origin)
        d_obj = _xform_dir(w2o, direction)
        cap0 = jnp.minimum(t_max, best_t)
        from dust_tpu.ops.traverse import clip_to_model_aabb
        tn, cap = clip_to_model_aabb(scene, m, o_obj, d_obj, t_min, cap0)
        if mode == "ao_threshold":
            # The quirk plane is s_stop in the instance kernel; keep it
            # at the committed tmax (box-clipping it fires spurious
            # entry-reports in boundary blocks — hardware never clips
            # gl_RayTmaxEXT per BLAS). The box clip still culls misses.
            cap = jnp.where(cap < tn, cap, cap0)
        t, row, bit = trace_instance_pallas(
            tables, o_obj, d_obj, tn, cap, mode=mode, rounds=rounds,
            interpret=interpret,
        )
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        best_inst = jnp.where(closer, i, best_inst)
        best_row = jnp.where(closer, row, best_row)
        best_bit = jnp.where(closer, bit, best_bit)

    return TraceResult(t=best_t, inst=best_inst, row=best_row, bit=best_bit)
