"""Wavefront HDDA: sparse-voxel ray traversal as a lockstep XLA loop.

This replaces the reference's *entire* hardware ray-tracing path — TLAS
traversal + the AABB intersection shaders — with a TPU-native wavefront
formulation (SURVEY §7.3, BASELINE north star):

* Macro level: rays march the 64³ block grid. One int32 gather per step
  reads ``cell_info``: an occupied cell yields the leaf row; an empty cell
  yields a chebyshev skip distance so the ray jumps the whole known-empty
  box in one step (the empty-space skipping hardware TLAS provided).
* Micro level: inside an occupied block, the branchless 4×4×4
  Amanatides-Woo DDA over the 64-bit occupancy mask — the exact algorithm
  of ``assets/shaders/primary/hit.rint:43-137`` including the
  ``(x<<4)|(y<<2)|z`` voxel encoding, the ``hitDistance + 0.001``
  exit-epsilon, and the 2×u32 mask split (hit.rint:13-16).

All rays advance in lockstep inside ``lax.while_loop``; each ray carries a
mode flag (macro/micro). There is no divergence penalty beyond the usual
SIMT-style wasted lanes, and every memory access is an XLA gather from
tables small enough to live in VMEM (64³ int32 = 1 MiB + leaf masks).

Variants (selected per pass, mirroring the reference's four intersection
shaders):

* ``precise``  — full DDA (``primary/hit.rint``),
* ``rough``    — report the leaf-AABB entry t without per-voxel DDA
  (``final_gather/rough.rint``); hit ``bit`` is -1,
* ``ao_threshold`` — like precise, but if the AO tmax falls inside an
  occupied leaf's AABB span, report a hit at the AABB entry with bit 0xFF
  (``final_gather/ambient_occlusion.rint:60-74``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["TraceResult", "trace_instance", "trace_scene", "trace_scene_tiled"]

_EPS = 1e-3  # the reference's DDA exit epsilon (hit.rint:107), voxel units
_STEP_EPS = 1e-4  # nudge when sampling the cell a ray sits in

GRID_BLOCKS = 64
BLOCK_WIDTH = 4.0
GRID_WIDTH = GRID_BLOCKS * BLOCK_WIDTH  # 256 voxel units


class TraceResult(NamedTuple):
    t: jnp.ndarray        # (N,) world-parameter t of the hit, inf on miss
    inst: jnp.ndarray     # (N,) int32 instance index, -1 on miss
    row: jnp.ndarray      # (N,) int32 leaf row in the model's flat arrays
    bit: jnp.ndarray      # (N,) int32 voxel bit (x<<4|y<<2|z), -1 rough, 255 ao

    @property
    def hit(self) -> jnp.ndarray:
        return self.inst >= 0


def _safe_rcp(v):
    """1/v with ±0 mapped to ±1e20 (finite stand-in for GLSL's inf)."""
    tiny = jnp.abs(v) < 1e-20
    big = jnp.where(v < 0, -1e20, 1e20)
    return jnp.where(tiny, big, 1.0 / jnp.where(tiny, 1.0, v))


def _slab(o, rcp, box_min, box_max):
    """Entry/exit t of an AABB (hit.rint:20-28)."""
    t_lo = (box_min - o) * rcp
    t_hi = (box_max - o) * rcp
    t1 = jnp.minimum(t_lo, t_hi)
    t2 = jnp.maximum(t_lo, t_hi)
    return jnp.max(t1, axis=-1), jnp.min(t2, axis=-1)


@partial(jax.jit, static_argnames=("mode", "max_iters"))
def trace_instance(
    cell_info: jnp.ndarray,   # (64,64,64) int32
    mask_lo: jnp.ndarray,     # (L,) uint32
    mask_hi: jnp.ndarray,     # (L,) uint32
    origin: jnp.ndarray,      # (N,3) object-space ray origins (voxel units)
    direction: jnp.ndarray,   # (N,3) object-space directions (NOT normalised;
                              #        t is in the caller's parameter units)
    t_min: jnp.ndarray,       # (N,) parameter-space
    t_max: jnp.ndarray,       # (N,) parameter-space (also closest-so-far)
    mode: str = "precise",
    max_iters: int = 256,
):
    """Trace rays against one model. Returns (t, row, bit) with t=inf miss."""
    if mode not in ("precise", "rough", "ao_threshold"):
        raise ValueError(mode)

    n = origin.shape[0]
    dlen = jnp.linalg.norm(direction, axis=-1)
    dlen = jnp.maximum(dlen, 1e-20)
    dn = direction / dlen[:, None]
    rcp = _safe_rcp(dn)
    step01 = (dn > 0).astype(jnp.float32)
    sstep = jnp.where(dn > 0, 1, -1).astype(jnp.int32)
    tdelta = jnp.abs(rcp)

    # Distance-space bounds (object units along the normalised direction).
    s_min = t_min * dlen
    s_stop = t_max * dlen

    g0, g1 = _slab(origin, rcp, jnp.zeros(3), jnp.full(3, GRID_WIDTH))
    s = jnp.maximum(g0 + _STEP_EPS, s_min)
    s_end = jnp.minimum(g1, s_stop)
    active = (g0 < g1) & (s < s_end)

    cell_flat = cell_info.reshape(-1)
    zero_i = jnp.zeros(n, jnp.int32)
    state = dict(
        active=active,
        in_micro=jnp.zeros(n, bool),
        s=s,
        # micro registers
        mpos=jnp.zeros((n, 3), jnp.int32),
        tmax3=jnp.zeros((n, 3), jnp.float32),
        mlo=jnp.zeros(n, jnp.uint32),
        mhi=jnp.zeros(n, jnp.uint32),
        row=zero_i,
        s_exit=jnp.zeros(n, jnp.float32),
        # results (distance units; converted at the end)
        hit_s=jnp.full(n, jnp.inf, jnp.float32),
        hit_row=-jnp.ones(n, jnp.int32),
        hit_bit=-jnp.ones(n, jnp.int32),
        iters=jnp.zeros((), jnp.int32),
    )

    def macro_step(st):
        p = origin + dn * (st["s"] + _STEP_EPS)[:, None]
        cell = jnp.floor(p * (1.0 / BLOCK_WIDTH)).astype(jnp.int32)
        inb = jnp.all((cell >= 0) & (cell < GRID_BLOCKS), axis=-1)
        alive = st["active"] & ~st["in_micro"] & inb & (st["s"] < s_end)

        lin = (cell[:, 0] * GRID_BLOCKS + cell[:, 1]) * GRID_BLOCKS + cell[:, 2]
        v = jnp.take(cell_flat, jnp.where(alive, lin, 0), mode="clip")
        occupied = alive & (v >= 0)

        # --- occupied: compute block entry/exit and descend (or report).
        bmin = cell.astype(jnp.float32) * BLOCK_WIDTH
        s_blk_entry, s_exit = _slab(origin, rcp, bmin, bmin + BLOCK_WIDTH)
        s_entry = st["s"]

        if mode == "rough":
            # rough.rint: hit at the leaf AABB's true entry t, no DDA. Like
            # the hardware path, an entry before t_min is rejected and the
            # ray marches on (the block is skipped).
            report = occupied & (s_blk_entry >= s_min) & (s_blk_entry <= s_end)
            new = dict(st)
            new["hit_s"] = jnp.where(report, jnp.maximum(s_blk_entry, 0.0), st["hit_s"])
            new["hit_row"] = jnp.where(report, v, st["hit_row"])
            new["hit_bit"] = jnp.where(report, -1, st["hit_bit"])
            new["active"] = st["active"] & ~report
            # Rejected occupied blocks: jump to the block's exit.
            new["s"] = jnp.where(
                occupied & ~report, jnp.maximum(s_exit, st["s"] + _STEP_EPS), st["s"]
            )
            descend = jnp.zeros_like(occupied)
        else:
            report = jnp.zeros_like(occupied)
            if mode == "ao_threshold":
                # ambient_occlusion.rint:60-74: tmax within this leaf's span
                # -> report entry with voxelId 0xFF.
                thr_inside = occupied & (s_entry <= s_stop) & (s_stop <= s_exit)
                report = thr_inside & (s_entry <= s_end)
            new = dict(st)
            new["hit_s"] = jnp.where(report, s_entry, st["hit_s"])
            new["hit_row"] = jnp.where(report, v, st["hit_row"])
            new["hit_bit"] = jnp.where(report, 255, st["hit_bit"])
            new["active"] = st["active"] & ~report
            # Corner-grazing guard: if the cell's exit is not measurably
            # past the entry, a descend would bounce straight back to the
            # same s forever (seen on TPU where fp ties differently than
            # CPU). Nudge past the graze instead.
            graze = occupied & ~report & (s_exit <= s_entry + _STEP_EPS)
            descend = occupied & ~report & ~graze
            new["s"] = jnp.where(graze, s_entry + _STEP_EPS, new["s"])

        row = jnp.where(descend, v, 0)
        new["mlo"] = jnp.where(descend, jnp.take(mask_lo, row), st["mlo"])
        new["mhi"] = jnp.where(descend, jnp.take(mask_hi, row), st["mhi"])
        new["row"] = jnp.where(descend, row, st["row"])
        s_m = jnp.maximum(s_entry, s_min)
        pm = origin + dn * s_m[:, None]
        base = cell * 4
        mpos = jnp.clip(jnp.floor(pm).astype(jnp.int32), base, base + 3)
        # Zero-direction axes never cross: force +inf (otherwise an origin
        # exactly on a cell boundary yields 0 * 1e20 = 0 and a bogus hit).
        tmax3 = jnp.where(
            jnp.abs(dn) < 1e-20, 1e30,
            (mpos.astype(jnp.float32) + step01 - origin) * rcp,
        )
        new["mpos"] = jnp.where(descend[:, None], mpos, st["mpos"])
        new["tmax3"] = jnp.where(descend[:, None], tmax3, st["tmax3"])
        new["s_exit"] = jnp.where(descend, s_exit, st["s_exit"])
        new["in_micro"] = st["in_micro"] | descend
        # Micro starts at the block-entry parameter (hit.rint:70).
        new["s"] = jnp.where(descend, s_m, new["s"])

        # --- empty: chebyshev skip to the boundary of the known-empty box.
        dist = jnp.maximum(-v, 1).astype(jnp.float32)
        box_min = (cell.astype(jnp.float32) - (dist[:, None] - 1.0)) * BLOCK_WIDTH
        box_max = (cell.astype(jnp.float32) + dist[:, None]) * BLOCK_WIDTH
        _, s_box = _slab(origin, rcp, box_min, box_max)
        skip = alive & (v < 0)
        s_next = jnp.maximum(s_box, st["s"] + _STEP_EPS)
        new["s"] = jnp.where(skip, s_next, new["s"])

        # Rays that walked out of the grid or past their range die.
        new["active"] = new["active"] & ~(
            (st["active"] & ~st["in_micro"]) & (~inb | (st["s"] >= s_end))
        )
        return new

    def micro_step(st):
        alive = st["active"] & st["in_micro"]
        m = st["mpos"]
        bit = ((m[:, 0] & 3) << 4) | ((m[:, 1] & 3) << 2) | (m[:, 2] & 3)
        in_lo = bit < 32
        lo_hit = (st["mlo"] >> jnp.where(in_lo, bit, 0).astype(jnp.uint32)) & 1
        hi_hit = (st["mhi"] >> jnp.where(in_lo, 0, bit - 32).astype(jnp.uint32)) & 1
        occ = jnp.where(in_lo, lo_hit, hi_hit).astype(bool)

        hit_now = alive & occ & (st["s"] <= s_end)
        dead_far = alive & occ & (st["s"] > s_end)  # closest already better

        new = dict(st)
        new["hit_s"] = jnp.where(hit_now, st["s"], st["hit_s"])
        new["hit_row"] = jnp.where(hit_now, st["row"], st["hit_row"])
        new["hit_bit"] = jnp.where(hit_now, bit, st["hit_bit"])
        new["active"] = st["active"] & ~(hit_now | dead_far)

        stepping = alive & ~occ
        # Branchless axis pick (hit.rint:102): strictly the reference uses
        # step(tMax.xyz, tMax.zxy)*step(tMax.xyz, tMax.yzx) which can step
        # two axes at once on exact ties; argmin picks one, which only
        # differs on zero-measure corner cases.
        axis = jnp.argmin(st["tmax3"], axis=-1)
        s_next = jnp.min(st["tmax3"], axis=-1)
        exited = stepping & (s_next + _EPS >= st["s_exit"])
        advance = stepping & ~exited

        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        new["mpos"] = jnp.where(advance[:, None], m + onehot * sstep, m)
        new["tmax3"] = jnp.where(
            advance[:, None], st["tmax3"] + onehot.astype(jnp.float32) * tdelta, st["tmax3"]
        )
        new["s"] = jnp.where(
            advance, s_next,
            jnp.where(exited, jnp.maximum(st["s_exit"], st["s"]), st["s"]),
        )
        new["in_micro"] = st["in_micro"] & ~exited
        return new

    def body(st):
        st = macro_step(st)
        st = micro_step(st)
        st["iters"] = st["iters"] + 1
        return st

    def cond(st):
        return jnp.any(st["active"]) & (st["iters"] < max_iters)

    final = jax.lax.while_loop(cond, body, state)
    t_hit = final["hit_s"] / dlen
    return t_hit, final["hit_row"], final["hit_bit"]


def clip_to_model_aabb(scene, m, o_obj, d_obj, t_min, t_max):
    """Tighten per-ray [t_min, t_max] to the model's occupied AABB. Rays
    that miss the box entirely get t_max < t_min (immediately inactive).
    Pure elementwise math — benefits both traversal backends."""
    bmin = scene.model_aabb_min[m]
    bmax = scene.model_aabb_max[m]
    dlen = jnp.maximum(jnp.linalg.norm(d_obj, axis=-1, keepdims=True), 1e-20)
    dn = d_obj / dlen
    tiny = jnp.abs(dn) < 1e-20
    rcp = jnp.where(tiny, jnp.where(dn < 0, -1e20, 1e20),
                    1.0 / jnp.where(tiny, 1.0, dn))
    t_lo = (bmin - o_obj) * rcp
    t_hi = (bmax - o_obj) * rcp
    enter = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1) / dlen[:, 0]
    exit_ = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1) / dlen[:, 0]
    return jnp.maximum(t_min, enter), jnp.minimum(t_max, exit_)


def _xform_point(a34, p):
    return jnp.einsum("ij,nj->ni", a34[:, :3], p, precision="highest") + a34[:, 3]


def _xform_dir(a34, d):
    return jnp.einsum("ij,nj->ni", a34[:, :3], d, precision="highest")


def trace_scene(
    scene,
    origin: jnp.ndarray,     # (N,3) world
    direction: jnp.ndarray,  # (N,3) world (not necessarily normalised)
    t_min,
    t_max,
    mode: str = "precise",
    max_iters: int = 256,
) -> TraceResult:
    """Closest-hit trace against every instance (the TLAS role).

    Instances are a static python loop — the reference's castle scene has
    two (castle + teapot, examples/castle.rs:107-117); each later instance
    uses the best-so-far t as its far plane so work shrinks monotonically.
    """
    n = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    best_t = jnp.full(n, jnp.inf)
    best_inst = -jnp.ones(n, jnp.int32)
    best_row = -jnp.ones(n, jnp.int32)
    best_bit = -jnp.ones(n, jnp.int32)

    for i, m in enumerate(scene.inst_model):
        w2o = scene.world_to_obj[i]
        o_obj = _xform_point(w2o, origin)
        d_obj = _xform_dir(w2o, direction)
        cap0 = jnp.minimum(t_max, best_t)
        tn, cap = clip_to_model_aabb(scene, m, o_obj, d_obj, t_min, cap0)
        if mode == "ao_threshold":
            # The AO entry-report quirk plane is the committed tmax
            # (gl_RayTmaxEXT) — hardware never clips it to a BLAS AABB,
            # so the box clip must not lower it either (it fires spurious
            # entry-reports in boundary blocks). The clip still culls
            # box-missing rays via tn > cap.
            cap = jnp.where(cap < tn, cap, cap0)
        t, row, bit = trace_instance(
            scene.cell_info[m], scene.mask_lo[m], scene.mask_hi[m],
            o_obj, d_obj, tn, cap, mode=mode, max_iters=max_iters,
        )
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        best_inst = jnp.where(closer, i, best_inst)
        best_row = jnp.where(closer, row, best_row)
        best_bit = jnp.where(closer, bit, best_bit)

    return TraceResult(t=best_t, inst=best_inst, row=best_row, bit=best_bit)


def trace_scene_tiled(scene, origin, direction, t_min, t_max,
                      mode: str = "precise", tile: int = 16384,
                      max_iters: int = 256) -> TraceResult:
    """Trace in fixed-size tiles via ``lax.map`` so each tile's lockstep
    loop terminates as soon as *its* rays finish (coherent tiles — sky,
    nearby walls — stop early instead of running to the global max)."""
    n = origin.shape[0]
    pad = (-n) % tile
    def padded(x, fill=0.0):
        return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]) if pad else x
    o = padded(origin).reshape(-1, tile, 3)
    d = padded(jnp.asarray(direction, jnp.float32), 1.0).reshape(-1, tile, 3)
    tn = padded(jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))).reshape(-1, tile)
    tx = padded(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)), -1.0).reshape(-1, tile)

    def one(args):
        o, d, tn, tx = args
        return trace_scene(scene, o, d, tn, tx, mode=mode, max_iters=max_iters)

    res = jax.lax.map(one, (o, d, tn, tx))
    return TraceResult(*(x.reshape(-1)[:n] for x in res))
