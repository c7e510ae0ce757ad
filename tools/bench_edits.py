"""Edit-loop timing (BASELINE config #4): per-frame 1-voxel edits.

Default mode measures host rebuild + device upload latency for the
refit tiers in isolation. ``--interleave`` measures what matters for an
interactive editor (VERDICT r4 item 4): ms/frame of the FULL 1080p
render loop while (a) leaf-patch edits land every frame and (b) a
splice rebuild is staged asynchronously (refit_async) — the added
latency per frame, not the isolated edit round-trip.

Usage:
    python tools/bench_edits.py [--cpu] [--edits N] [--interleave]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def interleave(args):
    """Edit-while-rendering: per-frame added latency of each edit tier."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dust_tpu.config import RenderSettings
    from dust_tpu.ops import camera as cameralib
    from dust_tpu.ops.noise import load_blue_noise
    from dust_tpu.ops.sky import bake_sky
    from dust_tpu.render.edits import SceneEditor
    from dust_tpu.render.pipeline import make_frame_state, render_frame
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    W, H = (320, 180) if args.cpu else (1920, 1080)
    settings = RenderSettings(
        width=W, height=H,
        traversal_backend="jnp" if args.cpu else "pallas",
        gi_cache="dense",
    )
    vox = load_vox_scene(procgen.castle_scene_bytes())
    procgen.add_teapot(vox)
    scene = build_device_scene(vox)
    ed = SceneEditor(vox, scene)
    state = make_frame_state(settings, scene)
    sky = bake_sky(settings.sunlight)
    bn = load_blue_noise()
    c2w = cameralib.look_at((122.0, 300.61, 54.45), (0.0, 0.0, 0.0))
    cs = cameralib.camera_settings(
        c2w, settings.camera.fov, settings.camera.near, settings.camera.far,
        W, H)

    def frame(scene, state):
        out, _aux, state = render_frame(
            scene, state, cs, sky, bn.unitvec3_cosine, bn.scalar, settings,
            return_aux=False)
        return out, state

    def sync(x):
        return float(jnp.sum(x))

    out, state = frame(scene, state)
    sync(out)

    def run(n, per_frame=None):
        nonlocal scene, state
        t0 = time.perf_counter()
        for f in range(n):
            if per_frame is not None:
                per_frame(f)
            out, state = frame(scene, state)
        sync(out)
        return (time.perf_counter() - t0) / n * 1e3

    N = args.edits
    base = min(run(N), run(N))

    # (a) A leaf-patch edit EVERY frame (palette recolor of an existing
    # voxel; the refit is one async device scatter + host bookkeeping).
    coords = ed._coords[0]

    def leaf_edit(f):
        nonlocal scene, state
        c = coords[f % len(coords)]
        ed.set_voxel(0, tuple(int(v) for v in c), palette_idx=5 + (f % 3))
        scene, state = ed.refit(state)
        assert ed.last_refit_mode == "leaf"

    t_leaf = min(run(N, leaf_edit), run(N, leaf_edit))

    # (b) A staged splice: new-leaf edit staged async; frames keep
    # rendering from the old scene until the swap lands.
    have = {tuple(int(v) for v in o)
            for o in vox.geometries[0].flat.leaf_origin}
    fresh = [(x, y, 200) for x in range(0, 256, 4) for y in range(0, 256, 4)
             if (x, y, 200) not in have]
    swap_frames = []

    state_box = {}

    def splice_edit(f):
        nonlocal scene, state
        if not ed.refit_in_flight and f % (N // 2) == 0 and fresh:
            ed.set_voxel(0, fresh.pop(), palette_idx=5)
            r = ed.refit_async(state)
            assert r is None, "expected the splice tier"
            state_box["start"] = f
        elif ed.refit_in_flight:
            r = ed.poll_refit(state)
            if r is not None:
                scene, state = r
                swap_frames.append(f - state_box["start"])

    t_splice = min(run(N, splice_edit), run(N, splice_edit))

    print(f"frame baseline (no edits):      {base:7.2f} ms/frame")
    print(f"leaf edit EVERY frame:          {t_leaf:7.2f} ms/frame "
          f"(+{t_leaf - base:.2f})")
    print(f"staged splice while rendering:  {t_splice:7.2f} ms/frame "
          f"(+{t_splice - base:.2f}; swap landed after "
          f"{swap_frames} frames)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--edits", type=int, default=10)
    ap.add_argument("--interleave", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    if args.interleave:
        return interleave(args)
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
