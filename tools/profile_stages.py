"""Per-stage frame profile on the real chip.

Mirrors render_frame's stages, jitting each separately and timing with a
scalar-fetch sync (block_until_ready is a no-op through the tunnel).
Numbers are best-of-N; the tunnel adds ±40% noise, so only large deltas
matter. Usage:  python tools/profile_stages.py [--width W --height H]
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--pool", type=int, default=720 * 480)
    ap.add_argument("--cap", type=int, default=1 << 22)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--stages", type=str, default="")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from dust_tpu.config import (RenderSettings, SpatialHashSettings,
                                 SurfelSettings)
    from dust_tpu.ops import camera as cameralib
    from dust_tpu.ops import denoise as denoiselib
    from dust_tpu.ops import exposure as exposurelib
    from dust_tpu.ops import packing as pk
    from dust_tpu.ops import shade
    from dust_tpu.ops import sky as skylib
    from dust_tpu.ops import spatial_hash as sh
    from dust_tpu.ops import tonemap as tonemaplib
    from dust_tpu.ops.noise import load_blue_noise
    from dust_tpu.ops.pallas_trace import trace_scene_pallas
    from dust_tpu.render.pipeline import make_frame_state, render_frame, \
        _pool_enqueue_mod
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.utils import color as colorlib
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    W, H = args.width, args.height
    n = W * H
    settings = RenderSettings(
        width=W, height=H,
        spatial_hash=SpatialHashSettings(capacity=args.cap),
        surfels=SurfelSettings(pool_size=args.pool),
        traversal_backend="pallas" if not args.cpu else "jnp",
    )
    scene = build_device_scene(load_vox_scene(procgen.castle_scene_bytes()))
    state = make_frame_state(settings)
    sky = bake = skylib.bake_sky(settings.sunlight)
    bn = load_blue_noise()
    c2w = cameralib.look_at((122.0, 300.61, 54.45), (0.0, 0.0, 0.0))
    cs = cameralib.camera_settings(c2w, settings.camera.fov,
                                   settings.camera.near, settings.camera.far,
                                   W, H)

    def sync(*xs):
        return [float(jnp.sum(jnp.ravel(x)[:16])) for x in xs]

    # Round-trip latency (after a warm-up call that pays compile/connect).
    x0 = jnp.zeros(8)
    sync(x0)
    rt = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); sync(x0)
        rt = min(rt, time.perf_counter() - t0)
    print(f"{'sync round-trip':34s} {rt*1e3:8.2f} ms  (subtracted below)")

    def bench(name, fn, *a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        sync(leaves[0])
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            sync(leaves[0])
            best = min(best, time.perf_counter() - t0)
        best = max(best - rt, 0.0)
        print(f"{name:34s} {best*1e3:8.2f} ms")
        return out, best

    # ---- ray setup (mirrors pipeline) ----
    dirs2d = cameralib.camera_ray_dirs(cs, W, H)
    x = dirs2d.reshape(H // 8, 8, W // 128, 128, 3)
    dirs = jnp.moveaxis(x, 2, 0).reshape(n, 3)
    origins = jnp.broadcast_to(cs.position, (n, 3))

    only = set(filter(None, args.stages.split(",")))

    def want(s):
        return not only or s in only

    trace = jax.jit(lambda o, d, tn, tx, mode: trace_scene_pallas(
        scene, o, d, tn, tx, mode=mode), static_argnames=("mode",))

    if want("trace"):
        primary, _ = bench("primary trace (precise)", trace,
                           origins, dirs, cs.near, cs.far, "precise")
    else:
        primary = trace(origins, dirs, cs.near, cs.far, "precise")
    g = jax.jit(lambda r: shade.resolve_hits(scene, r, origins, dirs))(primary)
    hit = g["hit"]
    normal = g["normal"]
    hit_loc = g["world_pos"] + normal * 0.01
    sun = sky.direction
    rand = jnp.asarray(7, jnp.int32)

    # gi dirs
    pix_lin = jnp.arange(n, dtype=jnp.int32)
    pix_y, pix_x = jnp.divmod(pix_lin, W)
    cos = bn.unitvec3_cosine[0, pix_y % 128, pix_x % 128] * 2.0 - 1.0
    gi_dir = pk.rotate_vector_by_normal(normal, cos)
    gi_dir = jnp.where(hit[:, None], gi_dir, jnp.asarray([0.0, 1.0, 0.0]))

    if want("trace"):
        bench("resolve_hits", jax.jit(
            lambda r: shade.resolve_hits(scene, r, origins, dirs)), primary)
        bench("shadow trace (precise)", trace, hit_loc,
              jnp.broadcast_to(sun, (n, 3)), 0.1,
              jnp.where(hit, 10000.0, -1.0), "precise")
        ao, _ = bench("AO trace (ao_threshold)", trace, hit_loc, gi_dir, 0.1,
                      jnp.where(hit, 8.0, -1.0), "ao_threshold")
        fg, _ = bench("FG trace (rough)", trace, hit_loc, gi_dir, 8.0,
                      jnp.where(hit & ~ao.hit, cs.far, -1.0), "rough")
    else:
        ao = trace(hit_loc, gi_dir, 0.1, jnp.where(hit, 8.0, -1.0),
                   "ao_threshold")
        fg = trace(hit_loc, gi_dir, 8.0,
                   jnp.where(hit & ~ao.hit, cs.far, -1.0), "rough")

    if want("shade"):
        leaf, _ = bench("leaf_attributes (2M)", jax.jit(
            lambda r: shade.leaf_attributes(scene, r, hit_loc, gi_dir,
                                            settings.spatial_hash.cell_size)), fg)
        bench("hash_get (2M)", jax.jit(lambda q, f: sh.hash_get(
            state.gi, q, f)), leaf["qpos"], leaf["face"])
        bench("pool_enqueue_mod (2M->pool)", jax.jit(
            lambda v, m: _pool_enqueue_mod(state.surfels, m, v)),
            jnp.concatenate([leaf["center_world"],
                             leaf["face"].astype(jnp.float32)[:, None]], -1),
            fg.hit)

    # surfel pass pieces
    p = args.pool
    if want("surfel"):
        s_origin = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (p, 3))) * 50
        s_dir = jax.random.normal(jax.random.PRNGKey(1), (p, 3))
        bench(f"surfel trace (rough, {p})", trace, s_origin, s_dir, 0.1,
              jnp.full((p,), 10000.0), "rough")
        q = jnp.trunc(s_origin / 4.0).astype(jnp.int32)
        f = jnp.zeros((p,), jnp.int32)
        bench(f"hash_get ({p})", jax.jit(lambda q, f: sh.hash_get(
            state.gi, q, f)), q, f)
        bench(f"hash_insert ({p})", jax.jit(
            lambda q, f, v: sh.hash_insert(state.gi, q, f, v,
                                           jnp.asarray(0, jnp.int32),
                                           valid=jnp.ones((p,), bool))),
            q, f, jnp.ones((p, 3)))

    if want("post"):
        radiance = jnp.broadcast_to(
            jnp.where(hit[:, None], 0.5, 0.1), (n, 3)).reshape(H, W, 3) * 1.0
        hitdist = jnp.where(hit, 3.0, 1e5).reshape(H, W)
        bench("denoise", jax.jit(lambda r, hd: denoiselib.denoise(
            state.denoiser, r, hd, g["depth"].reshape(H, W),
            normal.reshape(H, W, 3), g["world_pos"].reshape(H, W, 3),
            g["motion"].reshape(H, W, 3), jnp.eye(4), settings.denoiser)),
            radiance, hitdist)
        hist, _ = bench("exposure histogram", jax.jit(
            lambda r: exposurelib.luminance_histogram(r, settings.exposure)),
            radiance)
        bench("tonemap", jax.jit(lambda r: tonemaplib.tonemap(
            r, radiance, jnp.asarray(1.0), transfer="srgb")), radiance)

    if want("frame"):
        def full(state):
            out, _aux, st = render_frame(scene, state, cs, sky,
                                         bn.unitvec3_cosine, bn.scalar,
                                         settings)
            return out, st

        out, st = full(state)
        sync(out)
        best = 1e9
        for _ in range(args.reps):
            st2 = jax.tree.map(jnp.copy, st)
            t0 = time.perf_counter()
            out, st3 = full(st2)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        best = max(best - rt, 1e-9)
        print(f"{'FULL FRAME':34s} {best*1e3:8.2f} ms"
              f"   ({(4*n + 2*p)/best/1e6:.1f} Mrays/s)")


if __name__ == "__main__":
    main()
