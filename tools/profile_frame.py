"""Whole-frame xplane profile + HLO dump for profile_attrib.py.

Renders the canonical castle+teapot frame (the bench's `gi` config) under
``jax.profiler.trace`` and dumps the compiled HLO so
``tools/profile_attrib.py`` can join device-op time to source lines.

Usage:  python tools/profile_frame.py [--frames 8] [--out /tmp/dustprof]
then:   python tools/profile_attrib.py /tmp/dustprof /tmp/dustprof/hlo.txt 40 8
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default="/tmp/dustprof")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gi-cache", choices=["dense", "hash"],
                    default="dense")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from dust_tpu.config import RenderSettings
    from dust_tpu.ops import camera as cameralib
    from dust_tpu.ops.noise import load_blue_noise
    from dust_tpu.ops.sky import bake_sky
    from dust_tpu.render.pipeline import make_frame_state, render_frame
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    settings = RenderSettings(
        width=args.width, height=args.height,
        traversal_backend="pallas" if not args.cpu else "jnp",
        gi_cache=args.gi_cache,
    )
    vox_scene = load_vox_scene(procgen.castle_scene_bytes())
    anim_idx = procgen.add_teapot(vox_scene)
    scene = build_device_scene(vox_scene)
    state = make_frame_state(settings, scene)
    sky = bake_sky(settings.sunlight)
    bn = load_blue_noise()
    base_o2w = np.array(scene.obj_to_world)
    c2w = cameralib.look_at((122.0, 300.61, 54.45), (0.0, 0.0, 0.0))
    cs = cameralib.camera_settings(
        c2w, settings.camera.fov, settings.camera.near,
        settings.camera.far, args.width, args.height)

    def step(state, f=0):
        sc = scene.with_transforms(
            jnp.asarray(procgen.teapot_motion(base_o2w, anim_idx, f)))
        out, _aux, state = render_frame(
            sc, state, cs, sky, bn.unitvec3_cosine, bn.scalar,
            settings, return_aux=False)
        return out, state

    def sync(x):
        return float(jnp.sum(x))

    t0 = time.time()
    out, state = step(state)
    sync(out)
    print(f"compile {time.time() - t0:.1f}s")

    # HLO dump for profile_attrib (same shapes/settings as the loop).
    os.makedirs(args.out, exist_ok=True)
    sc0 = scene.with_transforms(
        jnp.asarray(procgen.teapot_motion(base_o2w, anim_idx, 0)))
    lowered = render_frame.lower(
        sc0, state, cs, sky, bn.unitvec3_cosine, bn.scalar,
        settings, return_aux=False)
    with open(os.path.join(args.out, "hlo.txt"), "w") as f:
        f.write(lowered.compile().as_text())

    out, state = step(state, 1)
    sync(out)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        for k in range(args.frames):
            out, state = step(state, k)
        sync(out)
    dt = (time.perf_counter() - t0) / args.frames
    print(f"{dt * 1e3:.1f} ms/frame over {args.frames} frames "
          f"(incl. trace overhead)")


if __name__ == "__main__":
    main()
