"""Sweep the Pallas kernel's ROWS (sublane rows per program) on the real
chip and record per-mode trace times for the castle camera.

ROWS is read from the DUST_PALLAS_ROWS env var at import time, so each
configuration runs in a subprocess. Usage:
    python tools/sweep_rows.py            # orchestrates 8/16/32
    DUST_PALLAS_ROWS=16 python tools/sweep_rows.py --one
"""

import argparse
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def run_one():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from dust_tpu.ops import camera as cameralib
    from dust_tpu.ops.pallas_trace import ROWS, trace_scene_pallas
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    W, H = 1920, 1080
    n = W * H
    scene = build_device_scene(load_vox_scene(procgen.castle_scene_bytes()))
    c2w = cameralib.look_at((122.0, 300.61, 54.45), (0.0, 0.0, 0.0))
    cs = cameralib.camera_settings(c2w, 0.9, 0.1, 10000.0, W, H)
    dirs2d = cameralib.camera_ray_dirs(cs, W, H)
    x = dirs2d.reshape(H // 8, 8, W // 128, 128, 3)
    dirs = jnp.moveaxis(x, 2, 0).reshape(n, 3)
    origins = jnp.broadcast_to(cs.position, (n, 3))

    def sync(r):
        return float(jnp.sum(r.t.ravel()[:16]))

    x0 = jnp.zeros(8)
    float(jnp.sum(x0))
    rt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(x0))
        rt = min(rt, time.perf_counter() - t0)

    trace = jax.jit(lambda o, d, tn, tx, mode: trace_scene_pallas(
        scene, o, d, tn, tx, mode=mode), static_argnames=("mode",))

    total = 0.0
    K = 10  # dispatches per sync: amortises tunnel latency + noise
    for mode, tn, tx in [("precise", 0.1, 10000.0), ("rough", 0.1, 10000.0),
                         ("ao_threshold", 0.1, 8.0)]:
        r = trace(origins, dirs, tn, tx, mode)
        sync(r)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                r = trace(origins, dirs, tn, tx, mode)
            sync(r)
            best = min(best, (time.perf_counter() - t0 - rt) / K)
        best = max(best, 1e-9)
        total += best
        print(f"ROWS={ROWS:3d} {mode:13s} {best*1e3:7.2f} ms "
              f"({n/best/1e6:6.1f} Mrays/s)")
    print(f"ROWS={ROWS:3d} TOTAL          {total*1e3:7.2f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", action="store_true")
    ap.add_argument("--rows", type=str, default="8,16,32")
    args = ap.parse_args()
    if args.one:
        run_one()
        return
    for r in args.rows.split(","):
        env = dict(os.environ, DUST_PALLAS_ROWS=r)
        subprocess.run([sys.executable, __file__, "--one"], env=env,
                       check=False)


if __name__ == "__main__":
    main()
