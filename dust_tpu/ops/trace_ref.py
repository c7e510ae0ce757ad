"""Scalar reference tracer — the correctness oracle.

A direct, slow transcription of the reference intersection pipeline:
per ray, test every leaf AABB (the role of hardware TLAS traversal,
candidates in ascending entry order) and run the scalar Amanatides-Woo
DDA of ``assets/shaders/primary/hit.rint:43-137`` inside each candidate.
Used only by tests (SURVEY §4: "a scalar reference tracer can serve as
ground truth"); never on device.
"""

from __future__ import annotations

import numpy as np

__all__ = ["dda_leaf", "trace_rays_ref"]


def _slab(o, d, bmin, bmax):
    with np.errstate(divide="ignore", invalid="ignore"):
        t_lo = (bmin - o) / d
        t_hi = (bmax - o) / d
    t1 = np.minimum(t_lo, t_hi)
    t2 = np.maximum(t_lo, t_hi)
    return np.nanmax(t1, axis=-1), np.nanmin(t2, axis=-1)


def dda_leaf(origin, direction, mask: int, t_min: float, t_max: float):
    """The 4×4×4 DDA of hit.rint:43-137. ``origin`` is block-local (the
    caller subtracts the leaf position); returns (t, voxel_bit) or None."""
    o = np.asarray(origin, dtype=np.float64)
    d = np.asarray(direction, dtype=np.float64)
    t0, t1 = _slab(o, d, np.zeros(3), np.full(3, 4.0))
    if t0 >= t1 or t1 <= 0.0:
        return None

    hit_distance = max(t0, t_min)
    p = o + d * hit_distance
    pos = np.clip(np.floor(p).astype(np.int64), 0, 3)
    step = np.sign(d)
    # Zero direction components: the axis never steps (tmax = +inf so the
    # axis-compare never selects it). Without the guard 1/0 = inf turns
    # ``pos*inf - inf`` into NaN, NaN poisons every comparison and the
    # DDA silently never advances — axis-aligned rays (e.g. sun-NEE
    # shadow rays with the default sun's x = 0) reported misses through
    # occupied leaves. Found by tests/test_frame_oracle.py.
    zero = np.abs(d) < 1e-30
    with np.errstate(divide="ignore"):
        t_coef = np.where(zero, np.inf, 1.0 / np.where(zero, 1.0, d))
    t_bias = np.where(zero, 0.0, t_coef * o)
    tmax = np.where(zero, np.inf,
                    (pos + np.maximum(step, 0.0)) * t_coef - t_bias)
    tdelta = np.where(zero, 0.0, t_coef * step)

    def enc(p):
        return (int(p[0]) & 3) << 4 | (int(p[1]) & 3) << 2 | (int(p[2]) & 3)

    bit = enc(pos)
    for _ in range(64):
        if (mask >> bit) & 1:
            if hit_distance <= t_max:
                return hit_distance, bit
            return None
        comp = (tmax <= np.roll(tmax, 1)) & (tmax <= np.roll(tmax, -1))
        pos = pos + (step * comp).astype(np.int64)
        hit_distance = tmax.min()
        if hit_distance + 0.001 >= t1:
            return None
        tmax = tmax + tdelta * comp
        bit = enc(pos)
    return None


def trace_rays_ref(geometries, instances, origins, directions, t_min, t_max,
                   mode: str = "precise", ao_threshold: float | None = None):
    """Trace rays against (geometry, transform) instances.

    Args:
      geometries: list of FlatTree-like objects (leaf_origin + masks).
      instances: list of (geometry_index, world_to_object 4x4).
    Returns dict of arrays: t, inst, row, bit (matching TraceResult).
    """
    n = len(origins)
    out_t = np.full(n, np.inf)
    out_inst = np.full(n, -1, dtype=np.int64)
    out_row = np.full(n, -1, dtype=np.int64)
    out_bit = np.full(n, -1, dtype=np.int64)

    pre = []
    for gi, w2o in instances:
        flat = geometries[gi]
        aabb_min = flat.leaf_origin.astype(np.float64)
        masks = flat.occupancy_u64()
        pre.append((np.asarray(w2o, np.float64), aabb_min, masks))

    for r in range(n):
        o_w = np.asarray(origins[r], np.float64)
        d_w = np.asarray(directions[r], np.float64)
        for ii, (w2o, aabb_min, masks) in enumerate(pre):
            o = w2o[:3, :3] @ o_w + w2o[:3, 3]
            d = w2o[:3, :3] @ d_w
            t0, t1 = _slab(o[None], d[None], aabb_min, aabb_min + 4.0)
            cand = np.flatnonzero((t0 < t1) & (t1 > 0) & (t0 < min(t_max, out_t[r])))
            for j in cand[np.argsort(t0[cand])]:
                if t0[j] >= out_t[r]:
                    break
                if mode == "rough":
                    if t0[j] >= t_min and t0[j] < out_t[r]:
                        out_t[r], out_inst[r], out_row[r], out_bit[r] = t0[j], ii, j, -1
                        break
                    continue
                if mode == "ao_threshold":
                    thr = t_max if ao_threshold is None else ao_threshold
                    if t0[j] <= thr <= t1[j]:
                        if t0[j] < out_t[r]:
                            out_t[r], out_inst[r], out_row[r], out_bit[r] = t0[j], ii, j, 255
                        break
                hit = dda_leaf(o - aabb_min[j], d, int(masks[j]), t_min, min(t_max, out_t[r]))
                if hit is not None and hit[0] < out_t[r]:
                    out_t[r], out_inst[r], out_row[r], out_bit[r] = hit[0], ii, j, hit[1]
                    break
    return dict(t=out_t, inst=out_inst, row=out_row, bit=out_bit)
