"""Shadow-pass economy: march_sim over the sun-NEE population (rays from
primary hits toward the sun, dead where N·L<=0 or no hit). The shadow
kernel is the most expensive isolated pass (9.31 vs primary 6.14 ms) —
this measures whether it is iteration-bound (long occluded-path marches)
or fixed-cost-bound like the others, and what image-space facing
coherence already buys.

Usage: python tools/shadow_sim.py [--width 512] [--height 288]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from march_sim import build_fields, march_counts, tiles_order, tile_economy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=288)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from dust_tpu.ops import camera as cameralib
    from dust_tpu.ops import shade
    from dust_tpu.ops.traverse import trace_scene
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    W, H = args.width, args.height
    vox = load_vox_scene(procgen.castle_scene_bytes())
    procgen.add_teapot(vox)
    scene = build_device_scene(vox)

    class Flat:
        leaf_origin = None
    valid = (np.asarray(scene.mask_lo[0]) | np.asarray(scene.mask_hi[0])) != 0
    Flat.leaf_origin = np.asarray(scene.leaf_origin[0])[valid]
    dist16, occ64 = build_fields(Flat)

    cs = cameralib.camera_settings(
        cameralib.look_at((122.0, 300.61, 54.45), (0.0, 0.0, 0.0)),
        np.pi / 2, 0.1, 100000.0, W, H)
    dirs = np.asarray(cameralib.camera_ray_dirs(cs, W, H)).reshape(-1, 3)
    n = dirs.shape[0]
    org = np.broadcast_to(np.asarray(cs.position), (n, 3)).astype(np.float32)

    res = trace_scene(scene, jnp.asarray(org), jnp.asarray(dirs),
                      jnp.asarray(0.1), jnp.asarray(1e5), mode="precise")
    g = shade.resolve_hits(scene, res, jnp.asarray(org), jnp.asarray(dirs))
    hit = np.asarray(g["hit"])
    normal = np.asarray(g["normal"])
    hit_loc = np.asarray(g["world_pos"]) + normal * 0.01

    sun = np.array([0.48, 0.7, 0.53], np.float32)
    sun /= np.linalg.norm(sun)
    facing = (normal @ sun) > 0
    alive = hit & facing
    print(f"hit {hit.mean():.1%}, facing|hit {facing[hit].mean():.1%}, "
          f"alive {alive.mean():.1%}")

    w2o = np.asarray(scene.world_to_obj[0])
    oo = (hit_loc @ w2o[:, :3].T + w2o[:, 3]).astype(np.float32)
    d = np.broadcast_to(sun, (n, 3)) @ w2o[:, :3].T
    dl = np.linalg.norm(d, axis=-1, keepdims=True)
    dn = (d / np.maximum(dl, 1e-20)).astype(np.float32)

    smin = np.full(n, 0.1, np.float32)
    smax = np.where(alive, 1e5, -1.0).astype(np.float32)
    order = tiles_order(H, W)

    it, tp = march_counts(dist16, occ64, oo, dn, smin, smax, substeps=5)
    tot = tp["block"] + tp["jump1"] + tp["jump2"]
    print(f"composition: block {tp['block']/tot:.1%} "
          f"jump<=1 {tp['jump1']/tot:.1%} jump>=2 {tp['jump2']/tot:.1%} "
          f"(+{tp['substep']} substeps)")
    mean, tmax = tile_economy(it, order)
    t = it[order].reshape(-1, 1024)
    dead = int((t.max(axis=1) == 0).sum())
    print(f"shadow: mean {mean:.2f} tile-max {tmax:.2f} "
          f"(waste {tmax/max(mean,1e-9):.2f}x) dead-tiles {dead}/{t.shape[0]}")

    # For scale: the same stats for the primary population (round 1).
    itp, _ = march_counts(dist16, occ64,
                          (org @ w2o[:, :3].T + w2o[:, 3]).astype(np.float32),
                          (dirs @ w2o[:, :3].T /
                           np.maximum(np.linalg.norm(
                               dirs @ w2o[:, :3].T, axis=-1, keepdims=True),
                               1e-20)).astype(np.float32),
                          smin, np.full(n, 1e5, np.float32), substeps=3)
    meanp, tmaxp = tile_economy(itp, order)
    print(f"primary(round1): mean {meanp:.2f} tile-max {tmaxp:.2f}")


if __name__ == "__main__":
    main()
