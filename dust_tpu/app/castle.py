"""The castle demo: the engine's flagship scene as a CLI.

Reference: ``examples/castle.rs`` — castle.vox + an animated teapot.vox,
an FPS camera, and the full render loop. Here the camera flies a preset
orbit (or honours --eye/--target), the teapot bobs and spins like
``teapot_move_system``, and frames are written as PNGs.

Usage:
  python -m dust_tpu.app.castle --width 640 --height 360 --frames 8 \
      --out /tmp/castle.png [--scene castle.vox] [--cpu] [--teapot]
"""

from __future__ import annotations

import argparse
import math
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default="/tmp/castle.png",
                    help="output PNG (last frame); NNN inserted for --all-frames")
    ap.add_argument("--all-frames", action="store_true")
    ap.add_argument("--scene", default=None, help=".vox file (default: procgen castle)")
    ap.add_argument("--teapot", action="store_true", help="add the animated teapot")
    ap.add_argument("--eye", type=float, nargs=3, default=(150.0, 90.0, 180.0))
    ap.add_argument("--target", type=float, nargs=3, default=(0.0, 30.0, 0.0))
    ap.add_argument("--orbit", action="store_true", help="orbit the target")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tile", type=int, default=65536)
    ap.add_argument("--hash-capacity", type=int, default=1 << 20)
    ap.add_argument("--surfels", type=int, default=65536)
    ap.add_argument("--gi-cache", choices=["dense", "hash"], default="dense",
                    help="GI cache backend (dense = per-leaf-face rows, "
                    "scatter-free; hash = reference-style spatial hash)")
    ap.add_argument("--backend", choices=["jnp", "pallas"], default="jnp",
                    help="traversal kernel (pallas = the Mosaic fast path)")
    ap.add_argument("--frames-in-flight", type=int, default=3,
                    help="frame pacing: bound on dispatched-but-unsynced "
                    "frames (≙ rhyolite_bevy's 3-frames-in-flight, "
                    "queue.rs:222; 0 = unbounded host run-ahead)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from dust_tpu.config import (
        RenderSettings, SpatialHashSettings, SurfelSettings,
    )
    from dust_tpu.ops import camera as cameralib
    from dust_tpu.ops.noise import load_blue_noise
    from dust_tpu.ops.sky import bake_sky
    from dust_tpu.render.pipeline import make_frame_state, render_frame
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.utils import crashlog
    from dust_tpu.utils.image import write_png
    from dust_tpu.utils import profiling
    from dust_tpu.utils.profiling import FrameDiagnostics
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    settings = RenderSettings(
        width=args.width, height=args.height,
        spatial_hash=SpatialHashSettings(capacity=args.hash_capacity),
        surfels=SurfelSettings(pool_size=args.surfels),
        traversal_backend=args.backend,
        gi_cache=args.gi_cache,
    )

    if args.scene:
        data = open(args.scene, "rb").read()
    else:
        data = procgen.castle_scene_bytes()
    vox_scene = load_vox_scene(data)

    anim_idx = procgen.add_teapot(vox_scene) if args.teapot else None

    scene = build_device_scene(vox_scene)
    state = make_frame_state(settings, scene)
    sky = bake_sky(settings.sunlight)
    bn = load_blue_noise()

    base_o2w = np.array(scene.obj_to_world)

    # Crash reports + frame-time diagnostics, like the reference's
    # SentryPlugin + FrameTimeDiagnosticsPlugin (examples/castle.rs:67).
    crashlog.install({"scene": args.scene or "procgen-castle",
                      "resolution": f"{args.width}x{args.height}"})
    import logging
    logging.basicConfig(level=logging.INFO)
    diag = FrameDiagnostics(report_every=max(args.frames // 2, 2))

    # Frame pacing (≙ use_per_frame_state_blocking, rhyolite's 3 frames in
    # flight): dispatch runs ahead of the device, but block on the frame
    # K-back so host memory and queue depth stay bounded. Sync is a
    # scalar fetch — block_until_ready is a no-op through the tunnel.
    from collections import deque
    inflight: deque = deque()

    def pace(out):
        if args.frames_in_flight <= 0:
            return
        inflight.append(out)
        if len(inflight) > args.frames_in_flight:
            profiling.device_sync(inflight.popleft())

    t_start = time.time()
    for f in range(args.frames):
        if args.orbit:
            ang = f * 0.05
            r = math.dist(args.eye[::2], args.target[::2])
            eye = (args.target[0] + r * math.sin(ang), args.eye[1],
                   args.target[2] + r * math.cos(ang))
        else:
            eye = args.eye
        c2w = cameralib.look_at(eye, args.target)
        cs = cameralib.camera_settings(
            c2w, settings.camera.fov, settings.camera.near,
            settings.camera.far, args.width, args.height,
        )

        if anim_idx is not None:
            # teapot_move_system: bob + spin.
            o2w = procgen.teapot_motion(base_o2w, anim_idx, f)
            scene = scene.with_transforms(jnp.asarray(o2w))

        out, aux, state = render_frame(
            scene, state, cs, sky, bn.unitvec3_cosine, bn.scalar,
            settings, tile=args.tile, return_aux=False,
        )
        diag.frame()
        pace(out)
        if args.all_frames:
            path = args.out.replace(".png", f"_{f:03d}.png")
            write_png(path, np.array(out))
            print(f"frame {f}: {path}", file=sys.stderr)

    img = np.array(out)
    write_png(args.out, img)
    dt = time.time() - t_start
    print(
        f"rendered {args.frames} frames at {args.width}x{args.height} in "
        f"{dt:.1f}s -> {args.out} (mean {img.mean():.3f})",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
