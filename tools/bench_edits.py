"""Edit-loop timing (BASELINE config #4): per-frame 1-voxel edits.

Measures host rebuild + device upload for the incremental splice path vs
the full rebuild, on the castle scene. Usage:
    python tools/bench_edits.py [--cpu] [--edits N]
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--edits", type=int, default=10)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dust_tpu.render.edits import SceneEditor
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    vox = load_vox_scene(procgen.castle_scene_bytes())
    t0 = time.perf_counter()
    dev = build_device_scene(vox)
    float(jnp.sum(dev.cell_info[0, 0, 0]))  # sync upload
    t_build = time.perf_counter() - t0
    print(f"full build + upload: {t_build*1e3:8.1f} ms")

    ed = SceneEditor(vox, dev)
    # Edit loop: toggle single voxels; each refit must splice.
    times = []
    for k in range(args.edits):
        t0 = time.perf_counter()
        ed.set_voxel(0, (10 + k, 1, 10), palette_idx=5)
        dev = ed.refit()
        float(jnp.sum(dev.cell_info[0, 0, 0]))
        times.append(time.perf_counter() - t0)
        assert ed.last_refit_mode == "splice", ed.last_refit_mode
    times = np.array(times) * 1e3
    print(f"splice refit (1-voxel edit): best {times.min():6.1f} ms, "
          f"median {np.median(times):6.1f} ms over {args.edits} edits")


if __name__ == "__main__":
    main()
