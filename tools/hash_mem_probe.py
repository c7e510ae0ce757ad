"""Quantify HBM headroom for the reference-scale spatial hash (VERDICT
r3 item 5): build the hash-reference frame at a given capacity, run two
frames, and print the device memory stats (peak bytes in use).

Usage:  python tools/hash_mem_probe.py [--capacity 33554432] [--small]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=1 << 25)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.small:
        args.width, args.height = 320, 180
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from dust_tpu.config import (RenderSettings, SpatialHashSettings,
                                 SurfelSettings)
    from dust_tpu.ops import camera as cameralib
    from dust_tpu.ops.noise import load_blue_noise
    from dust_tpu.ops.sky import bake_sky
    from dust_tpu.render.pipeline import make_frame_state, render_frame
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    settings = RenderSettings(
        width=args.width, height=args.height,
        spatial_hash=SpatialHashSettings(capacity=args.capacity),
        surfels=SurfelSettings(pool_size=720 * 480),
        traversal_backend="jnp" if args.cpu else "pallas",
        gi_cache="hash",
    )
    vox = load_vox_scene(procgen.castle_scene_bytes())
    procgen.add_teapot(vox)
    scene = build_device_scene(vox)
    state = make_frame_state(settings, scene)
    sky = bake_sky(settings.sunlight)
    bn = load_blue_noise()
    cs = cameralib.camera_settings(
        cameralib.look_at((122.0, 300.61, 54.45), (0.0, 0.0, 0.0)),
        settings.camera.fov, settings.camera.near, settings.camera.far,
        args.width, args.height)

    for _ in range(2):
        out, _aux, state = render_frame(
            scene, state, cs, sky, bn.unitvec3_cosine, bn.scalar, settings,
            return_aux=False)
    print("sync:", float(jnp.sum(out)))

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    table_mb = args.capacity * 16 / 2**20
    print(f"capacity {args.capacity} (table {table_mb:.0f} MB)")
    if stats:
        keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
                "largest_alloc_size")
        print(json.dumps({k: stats.get(k) for k in keys if k in stats}))
    else:
        print("memory_stats unavailable on this backend")


if __name__ == "__main__":
    main()
