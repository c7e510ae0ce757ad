"""March-loop simulator: measure the Pallas kernel's iteration economy
without TPU time.

Mirrors ``ops/pallas_trace._traverse_core``'s march semantics (L1 16³
chebyshev skip field, cell-grouped L2 words, K in-cell block substeps
per iteration) in vectorised numpy over a real ray population from the
canonical scene, and reports:

1. **Iteration composition** — what fraction of march iterations are
   in-cell block steps vs chebyshev empty jumps (by distance class).
   Decides ARCHITECTURE roadmap item 1/VERDICT r3 item 3: a chebyshev
   MIP pyramid only pays if many iterations are *chained* empty jumps
   (d small, repeated); the d-field already jumps (2d-1)³ cells at once.
2. **Lockstep economy** — per-(8×128)-tile max vs mean iteration count
   for the FG ray population, with rays in pixel order vs octant-sorted
   order. Predicts the fg_octant_sort win (VERDICT r3 item 1a) before
   burning TPU time on it.

Usage:  python tools/march_sim.py [--width 512] [--height 288]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_fields(flat):
    """L1 chebyshev dist (16³) + L2 occupancy (64³ bool) from a FlatTree."""
    b = flat.leaf_origin >> 2          # (L,3) block coords in [0,64)
    occ64 = np.zeros((64, 64, 64), bool)
    occ64[b[:, 0], b[:, 1], b[:, 2]] = True
    cell = b >> 2
    occ16 = np.zeros((16, 16, 16), bool)
    occ16[cell[:, 0], cell[:, 1], cell[:, 2]] = True
    dist = np.full((16, 16, 16), 15, np.int32)
    dist[occ16] = 0
    frontier = occ16.copy()
    for dd in range(1, 15):
        if frontier.all():
            break
        p = np.pad(frontier, 1, constant_values=False)
        grown = np.zeros_like(frontier)
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    grown |= p[dx:dx + 16, dy:dy + 16, dz:dz + 16]
        dist[grown & ~frontier] = dd
        frontier = grown
    return dist, occ64


def march_counts(dist16, occ64, o, d, smin, smax, substeps):
    """Vectorised mirror of the march loop. Returns per-ray iteration
    counts and global per-category tallies. A ray 'freezes' at its first
    occupied block (candidate) like one round of the kernel."""
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
    frozen = np.zeros(n, bool)
    reg_cl = np.full(n, -1, np.int32)

    iters = np.zeros(n, np.int32)
    tall = dict(block=0, jump1=0, jump2=0, substep=0, refresh_iters=0)

    df = dist16.reshape(-1)
    of = occ64.reshape(-1)

    for it in range(400):
        stepping = active & ~frozen
        if not stepping.any():
            break
        iters[stepping] += 1
        se = s + STEP_EPS
        p = o + d * se[:, None]
        c1 = np.clip(np.floor(p / 16.0).astype(np.int32), 0, 15)
        cl = (c1[:, 0] * 16 + c1[:, 1]) * 16 + c1[:, 2]
        dd = df[cl]
        inb = se < s_end
        occ1 = (dd == 0) & inb & stepping

        need = occ1 & (cl != reg_cl)
        tall["refresh_iters"] += int(need[stepping].any())
        reg_cl = np.where(occ1, cl, reg_cl)

        bq = np.clip(np.floor(p / 4.0).astype(np.int32), 0, 63)
        lin = (bq[:, 0] * 64 + bq[:, 1]) * 64 + bq[:, 2]
        occ2 = of[lin] & occ1
        newly = occ2 & ~frozen
        frozen |= newly

        tall["block"] += int((stepping & occ1 & ~newly).sum())
        tall["jump1"] += int((stepping & ~occ1 & (dd <= 1)).sum())
        tall["jump2"] += int((stepping & ~occ1 & (dd >= 2)).sum())

        ddf = np.maximum(dd, 1).astype(np.float32)
        fx = np.where(occ1[:, None], bq * 4.0,
                      (c1.astype(np.float32) - (ddf[:, None] - 1.0)) * 16.0)
        wsize = np.where(occ1, 4.0, (2.0 * ddf - 1.0) * 16.0)
        ex = np.abs((fx + p01 * wsize[:, None] - o) * rcp).min(-1)
        adv = stepping & ~newly
        s = np.where(adv, np.maximum(ex, s + STEP_EPS), s)
        active &= ~(adv & (s >= s_end))

        for _ss in range(substeps):
            stepping2 = active & ~frozen
            se2 = s + STEP_EPS
            p2 = o + d * se2[:, None]
            bq2 = np.clip(np.floor(p2 / 4.0).astype(np.int32), 0, 63)
            cl2 = ((bq2[:, 0] >> 2) * 16 + (bq2[:, 1] >> 2)) * 16 + (bq2[:, 2] >> 2)
            ok2 = stepping2 & (cl2 == reg_cl) & (se2 < s_end)
            lin2 = (bq2[:, 0] * 64 + bq2[:, 1]) * 64 + bq2[:, 2]
            newly2 = of[lin2] & ok2
            frozen |= newly2
            adv2 = ok2 & ~newly2
            tall["substep"] += int(adv2.sum())
            ex2 = np.abs((bq2 * 4.0 + p01 * 4.0 - o) * rcp).min(-1)
            s = np.where(adv2, np.maximum(ex2, s + STEP_EPS), s)
            active &= ~(adv2 & (s >= s_end))
    return iters, tall


def tiles_order(H, W):
    """Flat pixel index -> kernel tile order (pipeline.to_tiles: 8-row x
    128-lane blocks, tile-column-major)."""
    idx = np.arange(H * W).reshape(H, W)
    x = idx.reshape(H // 8, 8, W // 128, 128)
    x = np.moveaxis(x, 2, 0)
    return x.reshape(-1)


def tile_economy(iters, order, tile=1024):
    """Lockstep waste: (mean over active, mean-of-tile-max, sum-of-max ~
    total lockstep iterations the kernel actually pays)."""
    it = iters[order]
    t = it.reshape(-1, tile)
    return float(it.mean()), float(t.max(axis=1).mean())


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
    from dust_tpu.ops.noise import load_blue_noise, octant_sort_regions
    from dust_tpu.ops.traverse import trace_scene
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    W, H = args.width, args.height
    vox = load_vox_scene(procgen.castle_scene_bytes())
    procgen.add_teapot(vox)
    scene = build_device_scene(vox)
    from dust_tpu.voxtree.tree import VoxTree  # noqa: F401 (import check)

    # Castle fields (instance 0; the teapot's 1-chunk walk is negligible).
    class Flat:
        leaf_origin = np.asarray(scene.leaf_origin[0])
    valid = (np.asarray(scene.mask_lo[0]) | np.asarray(scene.mask_hi[0])) != 0
    Flat.leaf_origin = Flat.leaf_origin[valid]
    dist16, occ64 = build_fields(Flat)
    print(f"castle: {valid.sum()} leaves, "
          f"occupied cells {int((dist16 == 0).sum())}/4096")

    cs = cameralib.camera_settings(
        cameralib.look_at((122.0, 300.61, 54.45), (0.0, 0.0, 0.0)),
        np.pi / 2, 0.1, 100000.0, W, H)
    dirs = np.asarray(cameralib.camera_ray_dirs(cs, W, H)).reshape(-1, 3)
    n = dirs.shape[0]
    org = np.broadcast_to(np.asarray(cs.position), (n, 3)).astype(np.float32)

    # Object space of instance 0 (castle) — identity-ish transform.
    w2o = np.asarray(scene.world_to_obj[0])
    oo = org @ w2o[:, :3].T + w2o[:, 3]
    dobj = dirs @ w2o[:, :3].T
    dl = np.linalg.norm(dobj, axis=-1, keepdims=True)
    dn = (dobj / np.maximum(dl, 1e-20)).astype(np.float32)

    smin = np.full(n, 0.1, np.float32)
    smax = np.full(n, 1e5, np.float32)

    order = tiles_order(H, W)

    print("\n== primary rays, first round (substeps=3) ==")
    it_p, tp = march_counts(dist16, occ64, oo.astype(np.float32), dn,
                            smin, smax, substeps=3)
    tot = tp["block"] + tp["jump1"] + tp["jump2"]
    print(f"main-iter composition: block {tp['block']/tot:.1%}, "
          f"jump(d<=1) {tp['jump1']/tot:.1%}, jump(d>=2) {tp['jump2']/tot:.1%}"
          f"  (+{tp['substep']} substeps taken)")
    mean_p, tmax_p = tile_economy(it_p, order)
    print(f"lockstep: mean {mean_p:.1f} iters/ray, tile-max mean {tmax_p:.1f}"
          f"  (waste {tmax_p/max(mean_p,1e-9):.2f}x)")

    # ---- FG ray population: cosine rays from primary hits --------------
    res = trace_scene(scene, jnp.asarray(org), jnp.asarray(dirs),
                      jnp.asarray(0.1), jnp.asarray(1e5), mode="precise")
    g = shade.resolve_hits(scene, res, jnp.asarray(org), jnp.asarray(dirs))
    hit = np.asarray(g["hit"])
    normal = np.asarray(g["normal"])
    hit_loc = np.asarray(g["world_pos"]) + normal * 0.01
    bn = load_blue_noise()

    def fg_iters(table, label):
        page = np.asarray(table[0])  # layer 0
        reps_y, reps_x = -(-H // 128), -(-W // 128)
        img = np.tile(page, (reps_y, reps_x, 1))[:H, :W].reshape(-1, 3)
        cos = img * 2.0 - 1.0
        gi = np.asarray(pk.rotate_vector_by_normal(jnp.asarray(normal),
                                                   jnp.asarray(cos)))
        gi = np.where(hit[:, None], gi, np.float32([0, 1, 0]))
        oo2 = hit_loc @ w2o[:, :3].T + w2o[:, 3]
        dd2 = gi @ w2o[:, :3].T
        dl2 = np.linalg.norm(dd2, axis=-1, keepdims=True)
        dn2 = (dd2 / np.maximum(dl2, 1e-20)).astype(np.float32)
        sx = np.where(hit, 1e5, -1.0).astype(np.float32)
        it_f, tf = march_counts(dist16, occ64, oo2.astype(np.float32), dn2,
                                np.full(n, 8.0, np.float32), sx, substeps=5)
        tot = tf["block"] + tf["jump1"] + tf["jump2"]
        mean_f, tmax_f = tile_economy(it_f, order)
        print(f"[{label}] block {tf['block']/tot:.1%} "
              f"jump<=1 {tf['jump1']/tot:.1%} jump>=2 {tf['jump2']/tot:.1%} | "
              f"mean {mean_f:.1f} tile-max {tmax_f:.1f} "
              f"(waste {tmax_f/max(mean_f,1e-9):.2f}x)")
        return it_f

    # NOTE on rough mode: one march round IS the full trace (a rough
    # freeze is final), so these numbers are exact kernel economics.
    print("\n== FG rays (rough mode population, substeps=5) ==")
    fg_iters(bn.unitvec3_cosine, "pixel-order STBN")
    fg_iters(octant_sort_regions(bn.unitvec3_cosine, rows=8, cols=128),
             "tile-region octant sort (within-tile only)")
    fg_iters(octant_sort_regions(bn.unitvec3_cosine, rows=128, cols=128),
             "page-level octant sort (tile = one octant band)")


if __name__ == "__main__":
    main()
