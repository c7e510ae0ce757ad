"""Kernel cost anatomy on real in-frame rays (round-5 diagnostics).

Splits the primary pass's cost into its phases by compiling variants:
``rounds=N`` caps the outer phase loop (an undercapped trace is WRONG but
its cost reveals the marginal cost of each extra round), and
``mode=rough`` runs the same march without the micro DDA / mask fetch
(different hit semantics, same descent) — the difference approximates
what the micro phase + mask/rank gathers cost.

Usage: python tools/kernel_diag.py [--reps 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--pass", dest="which", default="primary",
                    choices=["primary", "fg"])
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from functools import partial

    from dust_tpu.config import RenderSettings
    from dust_tpu.ops import camera as cameralib
    from dust_tpu.ops import packing as pk
    from dust_tpu.ops import shade
    from dust_tpu.ops.noise import load_blue_noise
    from dust_tpu.ops.pallas_trace import trace_scene_pallas
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    W, H = 1920, 1080
    n = W * H
    vs = load_vox_scene(procgen.castle_scene_bytes())
    procgen.add_teapot(vs)
    scene = build_device_scene(vs)
    settings = RenderSettings(width=W, height=H)
    c2w = cameralib.look_at((122.0, 300.61, 54.45), (0.0, 0.0, 0.0))
    cs = cameralib.camera_settings(c2w, settings.camera.fov, 0.1, 1e5, W, H)
    dirs2d = cameralib.camera_ray_dirs(cs, W, H)
    x = dirs2d.reshape(H // 8, 8, W // 128, 128, 3)
    dirs = jnp.moveaxis(x, 2, 0).reshape(n, 3)
    origins = jnp.broadcast_to(cs.position, (n, 3))

    if args.which == "primary":
        o, d, tn, tx = origins, dirs, 0.1, jnp.full(n, 1e5)
        base_mode = "precise"
    else:
        primary = trace_scene_pallas(scene, origins, dirs, 0.1, 1e5)
        g = shade.resolve_hits(scene, primary, origins, dirs)
        hit, normal = g["hit"], g["normal"]
        bn = load_blue_noise()
        page = bn.unitvec3_cosine[0]
        reps_y, reps_x = -(-H // 128), -(-W // 128)
        noise_img = jnp.tile(page, (reps_y, reps_x, 1))[:H, :W]
        xx = noise_img.reshape(H // 8, 8, W // 128, 128, 3)
        cosv = jnp.moveaxis(xx, 2, 0).reshape(n, 3) * 2.0 - 1.0
        gi = pk.rotate_vector_by_normal(normal, cosv)
        gi = jnp.where(hit[:, None], gi, jnp.asarray([0.0, 1.0, 0.0]))
        o = g["world_pos"] + normal * 0.01
        d, tn, tx = gi, 8.0, jnp.where(hit, 1e5, -1.0)
        base_mode = "rough"

    def sync(v):
        return float(jnp.sum(v))

    @partial(jax.jit, static_argnames=("k", "mode", "rounds"))
    def burst(scene, o, d, tx, k, mode, rounds):
        acc = jnp.float32(0.0)
        hits = jnp.int32(0)
        for j in range(k):
            r = trace_scene_pallas(scene, o, d, tn, tx - 1e-3 * j,
                                   mode=mode, rounds=rounds)
            acc = acc + jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0))
            hits = hits + jnp.sum((r.inst >= 0).astype(jnp.int32))
        return acc, hits

    variants = [(base_mode, r) for r in (1, 2, 3, 4, 6, 64)]
    if base_mode == "precise":
        variants += [("rough", 64)]
    for mode, rounds in variants:
        acc, hits = burst(scene, o, d, tx, args.reps, mode, rounds)
        sync(acc)
        t0 = time.perf_counter()
        sync(acc)
        rt = time.perf_counter() - t0
        best = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            acc, hits = burst(scene, o, d, tx, args.reps, mode, rounds)
            sync(acc)
            best = min(best, (time.perf_counter() - t0 - rt) / args.reps)
        hr = float(hits) / args.reps / n
        print(f"{mode:8s} rounds={rounds:3d}: {best*1e3:7.2f} ms  "
              f"hit-rate {hr:.4f}")


if __name__ == "__main__":
    main()
