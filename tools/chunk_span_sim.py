"""Per-(tile, round) mask-chunk span distribution — decides the mask-gate
window design (VERDICT r3 item 1 follow-through; ARCHITECTURE round-4
march-economy section).

The kernel's micro rounds fetch each candidate's 64-bit leaf mask with a
chunked VMEM walk (`pallas_trace._gather_chunked`, 1024 rows/chunk). The
round-4 castle has 29 chunks; ungated, every (tile, round) pays 29x8x2
sublane-select triples whether its rays touch 1 chunk or 29. A gate with
a W-chunk dynamic window at the tile's min chunk pays W x 8 x 2 + one
reduction + one cond — IF tiles actually span <= W chunks. This script
measures the span distribution over real (tile, round) pairs for the
primary / shadow / AO ray populations (the three mask-fetching modes) by
simulating successive freeze rounds with `march_sim.march_counts`-style
stepping and mapping frozen blocks to leaf rows (hierarchy order = row
order, `voxtree.tree.hierarchy_key`).

Usage: python tools/chunk_span_sim.py [--width 512 --height 288]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from march_sim import build_fields, tiles_order  # noqa: E402


def freeze_rounds(dist16, occ64, block_row, o, d, smin, smax, substeps,
                  max_rounds=48):
    """Simulate the kernel's outer rounds: each round marches every
    unresolved ray to its next occupied block (freeze), records the
    candidate's leaf row, then resumes every ray past its block (the
    worst case: no voxel hit — real rays resolve sooner, so measured
    spans are an upper bound per round while the ROUND COUNT is an upper
    bound too). Returns rows[r] = (n,) leaf row per ray at round r (-1 =
    not frozen this round)."""
    n = o.shape[0]
    STEP_EPS = 1e-4
    rcp = np.where(np.abs(d) < 1e-20, np.where(d < 0, -1e20, 1e20), 1.0 / d)
    p01 = (d > 0).astype(np.float32)

    def slab(lo, hi):
        t0 = (lo - o) * rcp
        t1 = (hi - o) * rcp
        return (np.minimum(t0, t1).max(-1), np.maximum(t0, t1).min(-1))

    g0, g1 = slab(np.zeros(3, np.float32), np.full(3, 256.0, np.float32))
    s = np.maximum(g0 + STEP_EPS, smin)
    s_end = np.minimum(g1, smax)
    active = (g0 < g1) & (s < s_end)
    df = dist16.reshape(-1)
    of = occ64.reshape(-1)
    rows_per_round = []

    for _r in range(max_rounds):
        if not active.any():
            break
        frozen = np.zeros(n, bool)
        blk = np.zeros((n, 3), np.int32)
        # --- march: step until frozen or dead -------------------------
        for _it in range(400):
            stepping = active & ~frozen
            if not stepping.any():
                break
            se = s + STEP_EPS
            p = o + d * se[:, None]
            c1 = np.clip(np.floor(p / 16.0).astype(np.int32), 0, 15)
            cl = (c1[:, 0] * 16 + c1[:, 1]) * 16 + c1[:, 2]
            dd = df[cl]
            inb = se < s_end
            occ1 = (dd == 0) & inb & stepping
            bq = np.clip(np.floor(p / 4.0).astype(np.int32), 0, 63)
            lin = (bq[:, 0] * 64 + bq[:, 1]) * 64 + bq[:, 2]
            occ2 = of[lin] & occ1
            newly = occ2 & ~frozen
            frozen |= newly
            blk[newly] = bq[newly]
            ddf = np.maximum(dd, 1).astype(np.float32)
            fx = np.where(occ1[:, None], bq * 4.0,
                          (c1.astype(np.float32) - (ddf[:, None] - 1.0)) * 16.0)
            wsize = np.where(occ1, 4.0, (2.0 * ddf - 1.0) * 16.0)
            ex = np.abs((fx + p01 * wsize[:, None] - o) * rcp).min(-1)
            adv = stepping & ~newly
            s = np.where(adv, np.maximum(ex, s + STEP_EPS), s)
            active &= ~(adv & (s >= s_end))
        # Record rows for this round's frozen candidates.
        lin = (blk[:, 0] * 64 + blk[:, 1]) * 64 + blk[:, 2]
        r = np.where(frozen, block_row[lin], -1)
        rows_per_round.append(r)
        # Resume frozen rays past their block (worst case: no voxel hit).
        fx = blk.astype(np.float32) * 4.0
        t1 = np.maximum((fx - o) * rcp, (fx + 4.0 - o) * rcp).min(-1)
        s = np.where(frozen, np.maximum(t1, s + STEP_EPS), s)
        active &= ~(frozen & (s >= s_end))
        active &= s < s_end
    return rows_per_round


def span_stats(rows_per_round, order, label, tile=1024):
    """Histogram of per-(tile, round) chunk spans (cmax-cmin+1) and the
    modeled select-walk cost of each gate strategy."""
    spans = []
    rowspans = []
    touched = []
    for r in rows_per_round:
        rt = r[order].reshape(-1, tile)
        has = rt >= 0
        any_t = has.any(axis=1)
        if not any_t.any():
            continue
        c = np.where(has, rt >> 10, 0)
        cmin = np.where(any_t, np.where(has, c, 10 ** 9).min(axis=1), 0)
        cmax = np.where(any_t, np.where(has, c, -1).max(axis=1), -1)
        spans.append((cmax - cmin + 1)[any_t])
        # Exact leaf-row span (decides whether an UNALIGNED 1024-leaf
        # window — scalar dynamic ref slice — could replace the walk).
        rmin = np.where(any_t, np.where(has, rt, 10 ** 9).min(axis=1), 0)
        rmax = np.where(any_t, np.where(has, rt, -1).max(axis=1), -1)
        rowspans.append((rmax - rmin + 1)[any_t])
        # distinct chunks actually touched (for the per-chunk-cond model)
        for t in np.nonzero(any_t)[0]:
            touched.append(len(np.unique(c[t][has[t]])))
    if not spans:
        print(f"[{label}] no rounds with candidates")
        return
    sp = np.concatenate(spans)
    rs = np.concatenate(rowspans)
    rq = np.percentile(rs, [50, 90, 99])
    print(f"[{label}] leaf-row span p50/p90/p99 = "
          f"{rq[0]:.0f}/{rq[1]:.0f}/{rq[2]:.0f}; "
          f"<=1024 {(rs <= 1024).mean():.1%}, <=2048 {(rs <= 2048).mean():.1%}")
    tc = np.asarray(touched)
    q = np.percentile(sp, [50, 90, 99])
    hist = [(sp <= w).mean() for w in (1, 2, 4, 8, 16)]
    print(f"[{label}] tile-rounds {len(sp)}: span p50/p90/p99 = "
          f"{q[0]:.0f}/{q[1]:.0f}/{q[2]:.0f};  <=1 {hist[0]:.1%}, "
          f"<=2 {hist[1]:.1%}, <=4 {hist[2]:.1%}, <=8 {hist[3]:.1%}, "
          f"<=16 {hist[4]:.1%}; touched mean {tc.mean():.1f}")
    # Cost model per tile-round (select triples, 8 per chunk, x2 lo/hi;
    # sync ~4.5 triples-equivalent at 27cyc/triple, 120cyc/sync):
    C, SY = 29, 4.5
    ungated = C * 16
    for w in (4, 8):
        cost = np.where(sp <= w, w * 16 + 2 * SY, ungated + 2 * SY).mean()
        print(f"    span{w}: modeled {cost:.0f} vs ungated {ungated} "
              f"triples/tile-round ({cost / ungated:.2f}x)")
    chunks_cost = (C * SY + tc.mean() * 16)
    print(f"    chunks-gate: modeled {chunks_cost:.0f} ({chunks_cost / ungated:.2f}x)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=288)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from dust_tpu.ops import camera as cameralib
    from dust_tpu.ops import packing as pk
    from dust_tpu.ops import shade
    from dust_tpu.ops.noise import load_blue_noise
    from dust_tpu.ops.traverse import trace_scene
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    W, H = args.width, args.height
    vox = load_vox_scene(procgen.castle_scene_bytes())
    procgen.add_teapot(vox)
    scene = build_device_scene(vox)

    valid = (np.asarray(scene.mask_lo[0]) | np.asarray(scene.mask_hi[0])) != 0
    leaf_origin = np.asarray(scene.leaf_origin[0])[valid]

    class Flat:
        pass

    Flat.leaf_origin = leaf_origin
    dist16, occ64 = build_fields(Flat)
    # Block linear index -> leaf row (hierarchy order = row order).
    b = leaf_origin >> 2
    block_row = np.full(64 * 64 * 64, -1, np.int64)
    block_row[(b[:, 0] * 64 + b[:, 1]) * 64 + b[:, 2]] = np.arange(len(b))
    print(f"castle: {len(b)} leaves, {(len(b) + 1023) // 1024} mask chunks")

    cs = cameralib.camera_settings(
        cameralib.look_at((122.0, 300.61, 54.45), (0.0, 0.0, 0.0)),
        np.pi / 2, 0.1, 100000.0, W, H)
    dirs = np.asarray(cameralib.camera_ray_dirs(cs, W, H)).reshape(-1, 3)
    n = dirs.shape[0]
    org = np.broadcast_to(np.asarray(cs.position), (n, 3)).astype(np.float32)
    w2o = np.asarray(scene.world_to_obj[0])
    order = tiles_order(H, W)

    def to_obj(o, d):
        oo = o @ w2o[:, :3].T + w2o[:, 3]
        dd = d @ w2o[:, :3].T
        dl = np.linalg.norm(dd, axis=-1, keepdims=True)
        return oo.astype(np.float32), (dd / np.maximum(dl, 1e-20)).astype(
            np.float32)

    oo, dn = to_obj(org, dirs)
    rr = freeze_rounds(dist16, occ64, block_row, oo, dn,
                       np.full(n, 0.1, np.float32),
                       np.full(n, 1e5, np.float32), 3)
    span_stats(rr, order, "primary (precise)")

    # Secondary populations from real hits.
    res = trace_scene(scene, jnp.asarray(org), jnp.asarray(dirs),
                      jnp.asarray(0.1), jnp.asarray(1e5), mode="precise")
    g = shade.resolve_hits(scene, res, jnp.asarray(org), jnp.asarray(dirs))
    hit = np.asarray(g["hit"])
    normal = np.asarray(g["normal"])
    hit_loc = np.asarray(g["world_pos"]) + normal * 0.01

    sun = np.float32([0.577, 0.577, 0.577])
    oo, dn = to_obj(hit_loc, np.broadcast_to(sun, (n, 3)))
    rr = freeze_rounds(dist16, occ64, block_row, oo, dn,
                       np.full(n, 0.1, np.float32),
                       np.where(hit, 1e4, -1.0).astype(np.float32), 3)
    span_stats(rr, order, "shadow (precise)")

    bn = load_blue_noise()
    page = np.asarray(bn.unitvec3_cosine[0])
    reps_y, reps_x = -(-H // 128), -(-W // 128)
    img = np.tile(page, (reps_y, reps_x, 1))[:H, :W].reshape(-1, 3)
    cos = img * 2.0 - 1.0
    gi = np.asarray(pk.rotate_vector_by_normal(jnp.asarray(normal),
                                               jnp.asarray(cos)))
    gi = np.where(hit[:, None], gi, np.float32([0, 1, 0]))
    oo, dn = to_obj(hit_loc, gi)
    rr = freeze_rounds(dist16, occ64, block_row, oo, dn,
                       np.full(n, 0.1, np.float32),
                       np.where(hit, 8.0, -1.0).astype(np.float32), 1)
    span_stats(rr, order, "ao (ao_threshold)")


if __name__ == "__main__":
    main()
