"""Benchmark: castle scene, full GI pipeline, Mrays/s on one chip.

Prints ONE JSON line:
  {"metric": "Mrays/s/chip (castle 1080p, 1-bounce GI)", "value": N,
   "unit": "Mrays/s", "vs_baseline": N}

Baseline: the reference publishes no numbers (BASELINE.md); the pinned
target is the BASELINE.json north star of 500 Mrays/s/chip, so
``vs_baseline = value / 500``.

Ray accounting mirrors the reference's per-frame budget (BASELINE.md):
primary + sun-NEE + AO + final-gather at full res, plus 2 rays per
surfel-pool entry.

``--config`` selects the other BASELINE.md workloads: ``primary-shadow``
(direct lighting only), ``gi-4k`` (3840x2160), and ``hash-reference``
(the reference's own GI-cache scale: 32Mi-entry spatial hash + 720x480
surfel pool — the dense default instead patches EVERY (instance, leaf,
face) cell each frame, which strictly exceeds that coverage).
"""

import argparse
import json
import sys
import time

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def supervise():
    """Capture-proof wrapper: run the measurement in a child process with
    bounded retries + backoff, and ALWAYS print one parseable JSON line.

    Round 3's driver capture was lost to a single transient tunnel outage
    at backend-init time (BENCH_r03.json rc=1); the reference never loses
    its demo to a flaky cable, so neither should we. A child-process retry
    covers every failure point (backend init, device_put, compile, hang)
    without having to reset in-process JAX backend state.
    """
    import subprocess

    attempts = int(os.environ.get("DUST_BENCH_ATTEMPTS", "3"))
    backoff = float(os.environ.get("DUST_BENCH_BACKOFF", "60"))
    att_timeout = float(os.environ.get("DUST_BENCH_TIMEOUT", "2400"))
    argv = [sys.executable, os.path.abspath(__file__)] + sys.argv[1:]
    last_err = "no attempts ran"
    for i in range(attempts):
        if i:
            time.sleep(backoff)
        env = dict(os.environ, DUST_BENCH_CHILD="1",
                   DUST_BENCH_ATTEMPT=str(i))
        try:
            p = subprocess.run(argv, env=env, capture_output=True,
                               text=True, timeout=att_timeout)
        except subprocess.TimeoutExpired:
            last_err = f"attempt {i + 1}: timed out after {att_timeout:.0f}s"
            print(f"# {last_err}", file=sys.stderr)
            continue
        sys.stderr.write(p.stderr)
        line = next((ln for ln in p.stdout.splitlines()
                     if ln.startswith("{")), None)
        if p.returncode == 0 and line is not None:
            print(line)
            return
        tail = p.stderr.strip().splitlines()[-1] if p.stderr.strip() \
            else "no output"
        last_err = f"attempt {i + 1}: rc={p.returncode}: {tail}"
        print(f"# retrying: {last_err}", file=sys.stderr)
    print(json.dumps({
        "metric": "Mrays/s/chip (castle+teapot 1080p, 1-bounce GI)",
        "value": None, "unit": "Mrays/s", "vs_baseline": None,
        "error": last_err,
    }))


def main():
    # Test hook: simulate N failing attempts to exercise the retry path.
    fail_n = int(os.environ.get("DUST_BENCH_FAIL_ATTEMPTS", "0"))
    if int(os.environ.get("DUST_BENCH_ATTEMPT", "0")) < fail_n:
        raise RuntimeError("simulated backend-init failure (test hook)")
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="tiny smoke run")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--tile", type=int, default=65536)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--backend", choices=["pallas", "jnp"], default=None)
    ap.add_argument("--gi-cache", choices=["dense", "hash"], default="dense")
    ap.add_argument("--hash-capacity", type=int, default=None,
                    help="spatial-hash capacity for --gi-cache hash "
                    "(reference scale: 1<<25 = 32Mi entries)")
    ap.add_argument("--ws-slices", type=int, default=1,
                    help="hash mode: re-probe only a rotating 1/N of the "
                    "GI working set per frame (see SpatialHashSettings."
                    "ws_refresh_slices)")
    ap.add_argument("--pool-budget", type=int, default=0,
                    help="hash mode: trace only a rotating slice of this "
                    "many surfel-pool slots per frame (0 = whole pool)")
    ap.add_argument(
        "--config", default=None,
        choices=["gi", "primary-shadow", "gi-4k", "hash-reference",
                 "stress", "flythrough"],
        help="BASELINE.md workload presets: gi = the headline "
        "castle+teapot 1080p 1-bounce-GI run (default); primary-shadow "
        "= direct lighting only; gi-4k = 3840x2160; hash-reference = "
        "the reference's own GI-cache scale (32Mi-entry hash, 720x480 "
        "pool); stress = 3x3 castle grid + 2 teapots (11 instances, "
        "~6.5M instanced voxels); flythrough = gi-4k + the orbit camera "
        "path from app/castle.py (BASELINE config #5: moving camera, "
        "per-frame view updates)")
    ap.add_argument("--no-teapot", action="store_true",
                    help="drop the animated teapot (castle only — the "
                    "round-1/2 workload, for A/B against old numbers)")
    args = ap.parse_args()
    if args.config in ("gi-4k", "flythrough"):
        args.width, args.height = args.width or 3840, args.height or 2160
    elif args.config == "hash-reference":
        args.gi_cache = "hash"
        # The reference's hash is 1<<25 entries (640 MB at 20 B/entry,
        # spatial_hash.glsl:1). Our 16 B rows at 1<<25 are 512 MB; the
        # round-3 note that this "exceeds memory headroom" was stale —
        # tools/hash_mem_probe.py runs the full 1080p hash frame at
        # 1<<25 on the v5e (round 4), so the recorded config now
        # matches the reference capacity exactly.
        args.hash_capacity = args.hash_capacity or (1 << 25)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import numpy as np

    from dust_tpu.config import (
        RenderSettings, SpatialHashSettings, SurfelSettings,
    )
    from dust_tpu.ops import camera as cameralib
    from dust_tpu.ops.noise import load_blue_noise
    from dust_tpu.ops.sky import bake_sky
    from dust_tpu.render.pipeline import make_frame_state, render_frame
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    if args.small:
        width, height = args.width or 320, args.height or 180
        pool, cap, frames = 16384, 1 << 18, min(args.frames, 4)
    else:
        width, height = args.width or 1920, args.height or 1080
        pool, cap, frames = 720 * 480, 1 << 22, args.frames

    if args.hash_capacity:
        cap = args.hash_capacity
    direct_only = args.config == "primary-shadow"
    settings = RenderSettings(
        width=width, height=height,
        spatial_hash=SpatialHashSettings(capacity=cap,
                                         ws_refresh_slices=args.ws_slices),
        surfels=SurfelSettings(pool_size=pool,
                               pool_refresh_budget=args.pool_budget),
        traversal_backend=args.backend or ("pallas" if not args.cpu else "jnp"),
        gi_cache=args.gi_cache,
        contribution_secondary_spatial_hash=not direct_only,
        contribution_secondary_skylight=not direct_only,
        contribution_secondary_sunlight=not direct_only,
    )
    # The canonical frame is castle + ANIMATED teapot with a per-frame
    # transform update (examples/castle.rs:107-148); --no-teapot keeps
    # the old castle-only workload for A/B.
    if args.config == "stress":
        vox_scene, anim_idx = procgen.stress_scene()
    else:
        vox_scene = load_vox_scene(procgen.castle_scene_bytes())
        anim_idx = None if args.no_teapot else procgen.add_teapot(vox_scene)
    scene = build_device_scene(vox_scene)
    state = make_frame_state(settings, scene)
    sky = bake_sky(settings.sunlight)
    bn = load_blue_noise()
    base_o2w = np.array(scene.obj_to_world)
    bn_cos = bn.unitvec3_cosine
    # The reference's canonical camera pose (examples/castle.rs:126-128).
    eye = (260.0, 420.0, 180.0) if args.config == "stress" else \
        (122.0, 300.61, 54.45)
    target = (0.0, 0.0, 0.0)

    def cam_for(f):
        """Per-frame camera: fixed pose, or the orbit path from
        app/castle.py (flythrough — BASELINE config #5). Camera settings
        are traced arrays, so a moving camera costs zero recompiles."""
        e = eye
        if args.config == "flythrough":
            import math
            ang = f * 0.05
            r = math.dist((eye[0], eye[2]), (target[0], target[2]))
            e = (target[0] + r * math.sin(ang), eye[1],
                 target[2] + r * math.cos(ang))
        c2w = cameralib.look_at(e, target)
        return cameralib.camera_settings(
            c2w, settings.camera.fov, settings.camera.near,
            settings.camera.far, width, height,
        )

    cs = cam_for(0)

    import jax.numpy as jnp

    def step(state, f=0):
        sc = scene
        if anim_idx is not None:
            o2w = procgen.teapot_motion(base_o2w, anim_idx, f)
            sc = scene.with_transforms(jnp.asarray(o2w))
        out, _aux, state = render_frame(
            sc, state, cam_for(f) if args.config == "flythrough" else cs,
            sky, bn_cos, bn.scalar,
            settings, tile=args.tile, return_aux=False,
        )
        return out, state

    def sync(x):
        # On the experimental axon platform block_until_ready is a no-op
        # and bulk transfers crawl through the tunnel; fetching a scalar
        # reduction is the only reliable completion barrier.
        return float(jnp.sum(x))

    # Warm up (compile + cache fill). If the Pallas kernel cannot compile
    # on this runner, fall back to the XLA backend rather than failing
    # the benchmark outright.
    t0 = time.time()
    try:
        out, state = step(state)
        sync(out)
    except Exception as e:  # pragma: no cover - runner-specific
        print(f"# pallas backend failed ({type(e).__name__}); "
              "falling back to jnp", file=sys.stderr)
        import dataclasses
        settings = dataclasses.replace(settings, traversal_backend="jnp")
        state = make_frame_state(settings, scene)

        def step(state, f=0, _settings=settings):
            sc = scene
            if anim_idx is not None:
                o2w = procgen.teapot_motion(base_o2w, anim_idx, f)
                sc = scene.with_transforms(jnp.asarray(o2w))
            out, _aux, state = render_frame(
                sc, state,
                cam_for(f) if args.config == "flythrough" else cs,
                sky, bn_cos, bn.scalar,
                _settings, tile=args.tile, return_aux=False,
            )
            return out, state

        out, state = step(state)
        sync(out)
    compile_s = time.time() - t0
    out, state = step(state)
    sync(out)

    # Fixed sync/roundtrip latency to subtract (measured empty).
    t0 = time.perf_counter()
    sync(out)
    roundtrip = time.perf_counter() - t0

    # Auto-scale the measured loop until it dwarfs the sync round-trip
    # (small frames pipeline behind the dispatch otherwise).
    measured = frames
    while True:
        t0 = time.perf_counter()
        for k in range(measured):
            out, state = step(state, k)
        sync(out)
        elapsed = time.perf_counter() - t0
        if elapsed > max(12.0 * roundtrip, 0.25) or measured >= 64 * frames:
            break
        measured *= 4
    dt = max(elapsed - roundtrip, 1e-9) / measured

    # Per-frame ray budget: 4 full-res launches + 2 rays per GI-cache
    # patch (the reference's 2-per-surfel-pool-entry; dense mode patches
    # every VALID (instance, leaf, face) cell instead — count the actual
    # rays: padded leaf rows are masked inactive and trace nothing).
    if settings.gi_cache == "dense":
        valid_leaves = (np.asarray(scene.mask_lo)
                        | np.asarray(scene.mask_hi)) != 0
        patch_cells = int(valid_leaves.sum(axis=1)[
            np.asarray(scene.inst_model, np.int64)].sum()) * 6
        from dust_tpu.ops.gi_cache import dense_rows
        total_rows = dense_rows(scene)
        budget = settings.surfels.dense_refresh_budget
        if budget and total_rows > budget:
            # Budgeted refresh: the per-frame slice carries the valid
            # fraction of `budget` rows (padding lanes trace nothing).
            patch_cells = int(budget * patch_cells / total_rows)
    else:
        patch_cells = min(pool, args.pool_budget) if args.pool_budget \
            else pool
    # direct-only removes the AO/FG launches and the whole surfel pass
    # (CONTRIBUTION_* parity in render_frame).
    rays = (width * height * 2 if direct_only
            else width * height * 4 + patch_cells * 2)
    mrays = rays / dt / 1e6
    kind = "primary+shadow" if args.config == "primary-shadow" else \
        ("1-bounce GI, 32Mi hash" if args.config == "hash-reference"
         else "1-bounce GI, orbit flythrough"
         if args.config == "flythrough" else "1-bounce GI")
    workload = ("3x3 castle grid + 2 teapots" if args.config == "stress"
                else "castle" if args.no_teapot else "castle+teapot")
    result = {
        "metric": f"Mrays/s/chip ({workload} {width}x{height}, {kind})",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 500.0, 4),
    }
    print(json.dumps(result))
    print(
        f"# {width}x{height}, {measured} frames, {dt*1e3:.1f} ms/frame "
        f"({1.0/dt:.1f} fps), {rays/1e6:.2f} Mrays/frame, compile {compile_s:.1f}s, "
        f"device {jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    if os.environ.get("DUST_BENCH_CHILD"):
        main()
    else:
        supervise()
