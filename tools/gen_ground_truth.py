"""Generate the converged ground-truth reference for the quality gates.

Renders N frames of the canonical (STATIC) castle+teapot scene with the
full pipeline and accumulates the RAW per-frame radiance composite
(``aux["radiance"]`` — direct + indirect where hit, sky elsewhere,
BEFORE any denoising), cycling the spatio-temporal blue-noise layers.
The mean over N>=512 frames is a converged estimate of the pipeline's
true signal: the denoiser, the half-res-indirect split and the
dense-vs-hash GI backends are all supposed to approximate it, so
``tests/test_quality.py`` gates their RMSE against it (the BASELINE.md
"<=1% RMSE" proxy — the reference itself is not runnable here).

Writes tests/golden/castle_gt_{W}x{H}.npz with:
  radiance  (H, W, 3) float32 — mean raw radiance (ACEScg-ish composite)
  albedo    (H, W, 3) float32 — deterministic albedo image
  output    (H, W, 3) float32 — tonemap(radiance, albedo, exposure)
  exposure  ()        float32 — converged auto-exposure value
  frames, width, height

plus tests/golden/castle_gt_{W}x{H}.png (the tonemapped GT — the
>=256x256 golden image).

Run on the TPU (a few minutes):  python tools/gen_ground_truth.py
CPU check (slow):                python tools/gen_ground_truth.py --cpu --frames 32
"""

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--warmup", type=int, default=64,
                    help="frames before accumulation starts (GI cache + "
                    "auto-exposure convergence)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    from dust_tpu.ops import camera as cameralib
    from dust_tpu.ops import tonemap as tonemaplib
    from dust_tpu.ops.noise import load_blue_noise
    from dust_tpu.ops.sky import bake_sky
    from dust_tpu.render.pipeline import make_frame_state, render_frame
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.utils.image import write_png
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene
    from tests.quality_setup import gt_settings, gt_camera

    W, H = args.width, args.height
    settings = gt_settings(W, H, backend="jnp" if args.cpu else "pallas")
    vox_scene = load_vox_scene(procgen.castle_scene_bytes())
    procgen.add_teapot(vox_scene)          # canonical scene, teapot AT REST
    scene = build_device_scene(vox_scene)
    state = make_frame_state(settings, scene)
    sky = bake_sky(settings.sunlight)
    bn = load_blue_noise()
    cs = gt_camera(settings, W, H)

    def step(state):
        out, aux, state = render_frame(
            scene, state, cs, sky, bn.unitvec3_cosine, bn.scalar, settings,
        )
        return out, aux, state

    acc = jnp.zeros((H, W, 3))
    albedo = None
    for f in range(args.warmup + args.frames):
        out, aux, state = step(state)
        if f >= args.warmup:
            acc = acc + aux["radiance"]
        if f == args.warmup:
            albedo = aux["albedo"]
        if f % 64 == 0:
            print(f"frame {f}: mean {float(jnp.mean(out)):.4f}")

    radiance = np.asarray(acc / args.frames, np.float32)
    exposure = float(np.asarray(state.exposure_avg))
    from dust_tpu.ops import exposure as exposurelib
    exp_value = float(np.asarray(exposurelib.exposure_value(
        jnp.asarray(exposure))))
    # Tonemap the derived output on CPU: tests recompute it on the CPU
    # backend and assert bit-consistency, and TPU pow/exp approximations
    # diverge from CPU by ~1e-3 (measured on the 512 GT).
    with jax.default_device(jax.devices("cpu")[0]):
        output = np.asarray(tonemaplib.tonemap(
            jnp.asarray(radiance), jnp.asarray(albedo),
            jnp.asarray(exp_value), transfer="srgb"), np.float32)

    out_path = args.out or f"tests/golden/castle_gt_{W}x{H}.npz"
    np.savez_compressed(
        out_path, radiance=radiance, albedo=np.asarray(albedo, np.float32),
        output=output, exposure=np.float32(exp_value),
        frames=args.frames, width=W, height=H)
    write_png(out_path.replace(".npz", ".png"), output)
    print(f"wrote {out_path} (exposure {exp_value:.4f}, "
          f"{args.frames} frames @ {W}x{H})")


if __name__ == "__main__":
    main()
