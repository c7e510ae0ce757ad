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

    # Dispatch-RTT floor: the smallest possible device mutation + sync,
    # measured with the same loop discipline — the platform latency any
    # per-edit number is bounded below by.
    probe = dev.avg_albedo
    import jax

    @jax.jit
    def _tiny(a):
        return a.at[0, 0].add(0)

    floors = []
    for _ in range(args.edits):
        t0 = time.perf_counter()
        probe = _tiny(probe)
        float(jnp.sum(probe[0, 0]))
        floors.append(time.perf_counter() - t0)
    floors = np.array(floors) * 1e3

    ed = SceneEditor(vox, dev)
    # Leaf fast path: palette edits of EXISTING voxels (same leaf set).
    occ = vox.geometries[0].flat.leaf_origin
    times_leaf = []
    for k in range(args.edits):
        t0 = time.perf_counter()
        o = occ[k % len(occ)]
        # first voxel of leaf k (leaf origin voxel may be empty; use an
        # occupied one via the editor's coords)
        c = ed._coords[0][k % len(ed._coords[0])]
        ed.set_voxel(0, tuple(int(v) for v in c), palette_idx=5 + (k % 3))
        dev = ed.refit()
        ed.device = dev
        float(jnp.sum(dev.avg_albedo[0, 0]))
        times_leaf.append(time.perf_counter() - t0)
        assert ed.last_refit_mode == "leaf", ed.last_refit_mode
    times_leaf = np.array(times_leaf) * 1e3

    # Splice path: force a new leaf each time (row order changes).
    times = []
    have = {tuple(int(v) for v in o) for o in occ}
    fresh = [(x, y, z) for x in range(0, 256, 4) for y in range(200, 256, 4)
             for z in range(0, 256, 4) if (x, y, z) not in have]
    for k in range(args.edits):
        t0 = time.perf_counter()
        ed.set_voxel(0, fresh[k], palette_idx=5)
        dev = ed.refit()
        float(jnp.sum(dev.cell_info[0, 0, 0]))
        times.append(time.perf_counter() - t0)
        assert ed.last_refit_mode == "splice", ed.last_refit_mode
    times = np.array(times) * 1e3
    print(f"dispatch+sync floor:         best {floors.min():6.1f} ms, "
          f"median {np.median(floors):6.1f} ms")
    print(f"leaf refit (1-voxel edit):   best {times_leaf.min():6.1f} ms, "
          f"median {np.median(times_leaf):6.1f} ms over {args.edits} edits")
    print(f"splice refit (new-leaf edit): best {times.min():6.1f} ms, "
          f"median {np.median(times):6.1f} ms over {args.edits} edits")


if __name__ == "__main__":
    main()
