"""Standalone trace-pass microbench with in-frame-realistic rays.

Builds the canonical castle+teapot scene, generates the REAL ray sets of
a frame (camera rays; sun shadow rays from hits; STBN cosine GI rays for
AO/FG), and times each trace pass in isolation with an amortized loop —
the harness for kernel A/B experiments (frame-level noise is +-40%
through the tunnel; this isolates the kernel).

Usage: python tools/bench_trace.py [--passes primary,shadow,ao,fg]
       [--reps 12] [--no-teapot]
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
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--no-teapot", action="store_true")
    ap.add_argument("--passes", default="primary,shadow,ao,fg,aofg")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from dust_tpu.config import RenderSettings
    from dust_tpu.ops import camera as cameralib
    from dust_tpu.ops import packing as pk
    from dust_tpu.ops import shade
    from dust_tpu.ops.noise import load_blue_noise
    from dust_tpu.ops.pallas_trace import trace_scene_pallas
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    W, H = args.width, args.height
    n = W * H
    vs = load_vox_scene(procgen.castle_scene_bytes())
    if not args.no_teapot:
        procgen.add_teapot(vs)
    scene = build_device_scene(vs)
    settings = RenderSettings(width=W, height=H)
    c2w = cameralib.look_at((122.0, 300.61, 54.45), (0.0, 0.0, 0.0))
    cs = cameralib.camera_settings(c2w, settings.camera.fov, 0.1, 1e5, W, H)

    # Tile order, like the pipeline's raygen.
    dirs2d = cameralib.camera_ray_dirs(cs, W, H)
    x = dirs2d.reshape(H // 8, 8, W // 128, 128, 3)
    dirs = jnp.moveaxis(x, 2, 0).reshape(n, 3)
    origins = jnp.broadcast_to(cs.position, (n, 3))

    primary = trace_scene_pallas(scene, origins, dirs, 0.1, 1e5)
    g = shade.resolve_hits(scene, primary, origins, dirs)
    hit = g["hit"]
    normal = g["normal"]
    hit_loc = g["world_pos"] + normal * 0.01
    bn = load_blue_noise()
    page = bn.unitvec3_cosine[0]
    reps_y, reps_x = -(-H // 128), -(-W // 128)
    noise_img = jnp.tile(page, (reps_y, reps_x, 1))[:H, :W]
    x = noise_img.reshape(H // 8, 8, W // 128, 128, 3)
    cos = jnp.moveaxis(x, 2, 0).reshape(n, 3) * 2.0 - 1.0
    gi_dir = pk.rotate_vector_by_normal(normal, cos)
    gi_dir = jnp.where(hit[:, None], gi_dir, jnp.asarray([0.0, 1.0, 0.0]))
    sun = jnp.asarray(settings.sunlight.direction)

    rays = {
        "primary": (origins, dirs, 0.1, jnp.full(n, 1e5), "precise"),
        "shadow": (hit_loc, jnp.broadcast_to(sun, (n, 3)), 0.1,
                   jnp.where(hit, 1e4, -1.0), "precise"),
        "ao": (hit_loc, gi_dir, 0.1, jnp.where(hit, 8.0, -1.0),
               "ao_threshold"),
        "fg": (hit_loc, gi_dir, 8.0, jnp.where(hit, 1e5, -1.0), "rough"),
        # The pipeline's actual sun-NEE walk (shadow_mode="reference"):
        # fused near-threshold DDA + far block-granular rough.
        "aofg": (hit_loc, jnp.broadcast_to(sun, (n, 3)), 0.1,
                 jnp.where(hit, 1e4, -1.0), "ao_fg"),
    }

    def sync(x):
        return float(jnp.sum(x))

    from functools import partial

    from dust_tpu.ops.pallas_trace import trace_scene_pallas_ao_fg

    for name in args.passes.split(","):
        o, d, tn, tx, mode = rays[name]

        @partial(jax.jit, static_argnames=("k",))
        def burst(scene, o, d, tx, k, _tn=tn, _mode=mode):
            acc = jnp.float32(0.0)
            hits = jnp.int32(0)
            for j in range(k):
                if _mode == "ao_fg":
                    near, far = trace_scene_pallas_ao_fg(
                        scene, o, d, _tn,
                        jnp.where(tx > 0, 8.0, -1.0), tx - 1e-3 * j)
                    acc = acc + jnp.sum(
                        jnp.where(jnp.isfinite(near.t), near.t, 0.0)
                        + jnp.where(jnp.isfinite(far.t), far.t, 0.0))
                    hits = hits + jnp.sum(
                        (near.hit | far.hit).astype(jnp.int32))
                    continue
                r = trace_scene_pallas(scene, o, d, _tn,
                                       tx - 1e-3 * j, mode=_mode)
                acc = acc + jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0))
                hits = hits + jnp.sum((r.inst >= 0).astype(jnp.int32))
            return acc, hits

        acc, hits = burst(scene, o, d, tx, args.reps)
        sync(acc)  # compile + warm
        t0 = time.perf_counter()
        sync(acc)
        rt = time.perf_counter() - t0
        best = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            acc, hits = burst(scene, o, d, tx, args.reps)
            s = sync(acc)
            best = min(best, (time.perf_counter() - t0 - rt) / args.reps)
        hr = float(hits) / args.reps / n
        print(f"{name:8s}: {best*1e3:7.2f} ms  ({n/best/1e6:6.0f} Mrays/s)"
              f"  hit-rate {hr:.3f}  checksum {s:.3e}")


if __name__ == "__main__":
    main()
