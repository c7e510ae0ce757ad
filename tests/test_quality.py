"""Converged-ground-truth quality gates (BASELINE.md "<=1% RMSE" proxy).

``tools/gen_ground_truth.py`` renders 512 accumulated raw-radiance
frames of the static canonical scene (castle + teapot at rest) and
checks the mean in as ``tests/golden/castle_gt_256x256.npz`` (+ the
tonemapped >=256x256 golden PNG). These tests re-render a handful of
frames on CPU and assert the pipeline's approximations stay within
recorded RMSE bounds of that converged signal:

* the denoised 1-frame output (temporal+a-trous REBLUR replacement),
* the half-res-indirect split vs the full-res denoiser path,
* the dense GI cache vs the reference-style spatial hash.

Every bound is ~1.5x the value measured when the ground truth was
recorded, so a quality regression (not just noise drift) fails.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from dust_tpu.ops import tonemap as tonemaplib
from dust_tpu.ops.noise import load_blue_noise
from dust_tpu.ops.sky import bake_sky
from dust_tpu.render.pipeline import make_frame_state, render_frame
from dust_tpu.render.scene import build_device_scene
from dust_tpu.vox import procgen
from dust_tpu.vox.loader import load_vox_scene
from tests.quality_setup import gt_camera, gt_settings

# Multi-frame converged-GT renders: minutes each on CPU — deselect with
# -m "not slow" for the quick iteration loop (run before big commits).
pytestmark = pytest.mark.slow

GT_PATH = os.path.join(os.path.dirname(__file__), "golden",
                       "castle_gt_256x256.npz")

# Recorded bounds = ~1.5x the values measured when the ground truth was
# generated. Re-recorded 2026-08-18 for the round-4 canonical scene
# (castle doubled to 29k leaves; GT 512 frames @256x256): half-res
# final-frame 0.0389 vs full-split 0.0278 (extra 0.0111), converged
# half-res bias 0.0409 — the denser geometry carries more spatial detail
# a half-resolution GI estimator cannot represent, so the half-res
# bounds widened; the absolute gates (denoised/dense/hash vs GT) held at
# their round-3 values.
RMSE_DENOISED = 0.045
HALF_RES_EXTRA = 0.017      # extra RMSE half-res may cost vs full-res
RMSE_HALF_CONVERGED = 0.055  # steady-state half-res low-pass bias bound
RMSE_DENSE = 0.045
RMSE_HASH = 0.045

FRAMES = 16
CONV_FRAMES = 32    # frames for the converged-mean comparisons
CONV_AVG = 16       # ... of which the last N are averaged


def _rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


@pytest.fixture(scope="module")
def gt():
    if not os.path.exists(GT_PATH):
        pytest.skip("ground truth not generated "
                    "(tools/gen_ground_truth.py)")
    return np.load(GT_PATH)


@pytest.fixture(scope="module")
def rig(gt):
    W, H = int(gt["width"]), int(gt["height"])
    vox_scene = load_vox_scene(procgen.castle_scene_bytes())
    procgen.add_teapot(vox_scene)
    scene = build_device_scene(vox_scene)
    sky = bake_sky(gt_settings(W, H).sunlight)
    bn = load_blue_noise()
    return W, H, scene, sky, bn


def _render(rig_t, gt, frames=FRAMES, avg_last=0, **overrides):
    """Render ``frames`` frames; return the final frame's denoised
    radiance tonemapped with the GT's converged exposure (so exposure
    adaptation transients don't pollute the comparison). With
    ``avg_last=N`` returns ``(final, mean-of-last-N)`` instead — the
    time-averaged output cancels per-frame stochastic noise, exposing
    only systematic estimator bias."""
    W, H, scene, sky, bn = rig_t
    settings = gt_settings(W, H, **overrides)
    state = make_frame_state(settings, scene)
    acc, cnt = 0.0, 0
    for f in range(frames):
        out, aux, state = render_frame(
            scene, state, gt_camera(settings, W, H), sky,
            bn.unitvec3_cosine, bn.scalar, settings,
        )
        if avg_last and f >= frames - avg_last:
            acc = acc + np.asarray(tonemaplib.tonemap(
                jnp.asarray(aux["denoised"]), jnp.asarray(aux["albedo"]),
                jnp.asarray(float(gt["exposure"])), transfer="srgb"))
            cnt += 1
    final = np.asarray(tonemaplib.tonemap(
        jnp.asarray(aux["denoised"]), jnp.asarray(aux["albedo"]),
        jnp.asarray(float(gt["exposure"])), transfer="srgb"))
    if avg_last:
        return final, acc / cnt
    return final


@pytest.fixture(scope="module")
def dense_run(rig, gt):
    """(final frame, converged mean) of the default half-res path."""
    return _render(rig, gt, frames=CONV_FRAMES, avg_last=CONV_AVG)


@pytest.fixture(scope="module")
def full_split_run(rig, gt):
    """(final, converged mean) of the full-res split-direct control."""
    from dust_tpu.config import DenoiserSettings
    return _render(rig, gt, frames=CONV_FRAMES, avg_last=CONV_AVG,
                   denoiser=DenoiserSettings(half_res_indirect=False,
                                             split_direct=True))


@pytest.fixture(scope="module")
def dense_out(dense_run):
    return dense_run[0]


def test_gt_artifacts_consistent(gt):
    """The checked-in tonemapped golden equals tonemap(radiance) at the
    recorded exposure — guards against a stale npz/png pair."""
    redo = np.asarray(tonemaplib.tonemap(
        jnp.asarray(gt["radiance"]), jnp.asarray(gt["albedo"]),
        jnp.asarray(float(gt["exposure"])), transfer="srgb"))
    assert _rmse(redo, gt["output"]) < 1e-5


def test_denoised_rmse_vs_ground_truth(dense_out, gt):
    """One denoised frame (after temporal warmup) must sit close to the
    512-frame converged signal — the NRD-replacement quality gate."""
    r = _rmse(dense_out, gt["output"])
    assert r < RMSE_DENOISED, f"denoised RMSE {r:.4f}"


def test_half_res_indirect_vs_full_res(rig, gt, dense_run,
                                       full_split_run):
    """Half-res indirect must not degrade quality at the real-time
    operating point: after warmup, a denoised frame from the half-res
    path must sit within ``HALF_RES_EXTRA`` *additional* RMSE of the
    converged ground truth compared to the full-res control (the SAME
    estimator — indirect-only temporal chain, ``split_direct=True`` —
    at full resolution). Measured at recording time: half 0.0308 vs
    full-split 0.026 ⇒ +0.005; the bound is ~1.5x that.

    Why not a direct half-vs-full RMSE gate: at any finite frame count
    the two paths carry *independent* stochastic noise, so their mutual
    distance floors at sqrt(sigma_h^2+sigma_f^2) ≈ 3.7% regardless of
    quality; and their 24-frame converged means still differ by ~3.2%,
    which is the irreducible low-pass of a half-resolution estimator
    (upsample(downsample(GI)) != GI), not a defect the denoiser can fix.
    ``test_half_res_converged_bias`` pins that steady-state bias as a
    regression bound instead."""
    from dust_tpu.config import DenoiserSettings
    rh = _rmse(dense_run[0], gt["output"])
    rf = _rmse(full_split_run[0], gt["output"])
    assert rh - rf < HALF_RES_EXTRA, \
        f"half-res costs {rh - rf:.4f} extra RMSE (half {rh:.4f} vs " \
        f"full {rf:.4f})"
    # The reference-lumped full-res path stays within the GT gate too.
    full = _render(rig, gt,
                   denoiser=DenoiserSettings(half_res_indirect=False))
    rlf = _rmse(full, gt["output"])
    assert rlf < RMSE_DENOISED, f"full-res RMSE {rlf:.4f}"


def test_half_res_converged_bias(dense_run, full_split_run):
    """Steady-state systematic bias of the half-res path: the 16-frame
    means of both paths (per-frame noise cancelled) must stay within the
    recorded low-pass bound. Measured at recording time: 0.032 — the
    spatial detail a half-resolution GI estimator cannot represent."""
    r = _rmse(dense_run[1], full_split_run[1])
    assert r < RMSE_HALF_CONVERGED, f"converged half-res bias {r:.4f}"


def test_dense_vs_hash_gi_bias(rig, gt, dense_out):
    """Both GI cache backends must converge toward the same signal: the
    dense re-key is a TPU-first reformulation, not a different
    estimator."""
    hash_out = _render(rig, gt, gi_cache="hash")
    rd = _rmse(dense_out, gt["output"])
    rh = _rmse(hash_out, gt["output"])
    assert rd < RMSE_DENSE, f"dense RMSE {rd:.4f}"
    assert rh < RMSE_HASH, f"hash RMSE {rh:.4f}"


# Staleness-budget gates (VERDICT r3 item 6): the perf knobs that slice
# the GI refresh work per frame (SpatialHashSettings.ws_refresh_slices,
# SurfelSettings.pool_refresh_budget / dense_refresh_budget) trade
# staleness for throughput; these tests pin the QUALITY cost of the
# bench-scale budgets against the converged GT so a knob that silently
# degrades the image fails. Bounds = ~1.5x the values measured when
# recorded (2026-08-18, 32-frame converged means @256x256, round-3
# scene): budgeted-hash-vs-GT 0.0382 (unbudgeted 0.0381),
# budgeted-dense-vs-GT 0.0382 (unbudgeted 0.0381) — the budgets'
# staleness cost ~1e-4 RMSE; both gates re-verified green against the
# round-4 scene's GT.
RMSE_BUDGETED_HASH = 0.057
RMSE_BUDGETED_DENSE = 0.057
BUDGET_EXTRA = 0.004  # extra converged-mean RMSE a budget may cost


def test_budgeted_hash_quality(rig, gt):
    """Hash GI with the bench-style budgets (rotating working-set probe
    slices + a pool refresh budget) must stay within bounds of the
    converged GT, and within BUDGET_EXTRA of the unbudgeted hash path."""
    from dust_tpu.config import SpatialHashSettings, SurfelSettings
    W, H, scene, sky, bn = rig
    base = gt_settings(W, H)
    _, mean_free = _render(rig, gt, frames=CONV_FRAMES, avg_last=CONV_AVG,
                           gi_cache="hash")
    _, mean_bud = _render(
        rig, gt, frames=CONV_FRAMES, avg_last=CONV_AVG, gi_cache="hash",
        spatial_hash=SpatialHashSettings(
            capacity=base.spatial_hash.capacity, ws_refresh_slices=4),
        surfels=SurfelSettings(
            pool_size=base.surfels.pool_size,
            pool_refresh_budget=base.surfels.pool_size // 4))
    r_bud = _rmse(mean_bud, gt["output"])
    r_free = _rmse(mean_free, gt["output"])
    assert r_bud < RMSE_BUDGETED_HASH, f"budgeted hash RMSE {r_bud:.4f}"
    assert r_bud - r_free < BUDGET_EXTRA, (
        f"budgets cost {r_bud - r_free:.4f} extra RMSE "
        f"(budgeted {r_bud:.4f} vs free {r_free:.4f})")


def test_budgeted_dense_quality(rig, gt, dense_run):
    """Dense GI with a refresh budget forcing a 3-way rotating slice must
    stay within bounds of the GT and of the every-cell-every-frame path."""
    from dust_tpu.config import SurfelSettings
    from dust_tpu.ops.gi_cache import dense_rows
    W, H, scene, sky, bn = rig
    base = gt_settings(W, H)
    budget = dense_rows(scene) // 3
    _, mean_bud = _render(
        rig, gt, frames=CONV_FRAMES, avg_last=CONV_AVG,
        surfels=SurfelSettings(pool_size=base.surfels.pool_size,
                               dense_refresh_budget=budget))
    r_bud = _rmse(mean_bud, gt["output"])
    r_free = _rmse(dense_run[1], gt["output"])
    assert r_bud < RMSE_BUDGETED_DENSE, f"budgeted dense RMSE {r_bud:.4f}"
    assert r_bud - r_free < BUDGET_EXTRA, (
        f"dense budget costs {r_bud - r_free:.4f} extra RMSE "
        f"(budgeted {r_bud:.4f} vs free {r_free:.4f})")


# ---------------------------------------------------------------------------
# 512x512 GT gate (VERDICT r4 item 6): the 256 GT under-resolves the 2x
# castle's detail, so the absolute gates' ~0.04 floor partly reflected GT
# resolution. tools/gen_ground_truth.py --width 512 --height 512 records
# a higher-resolution converged signal + golden PNG; this single gate
# renders a short warmed sequence at 512^2 (one render only — 4x the
# pixels of the other fixtures) and pins its RMSE. Bound = 1.5x the
# value measured at recording time (2026-08-19: 0.0253 — the same
# estimator measured 0.030 against the 256 GT, confirming the 256 gates
# carried ~20% resolution penalty).
RMSE_DENOISED_512 = 0.038

GT512_PATH = os.path.join(os.path.dirname(__file__), "golden",
                          "castle_gt_512x512.npz")


def test_denoised_rmse_vs_ground_truth_512():
    if not os.path.exists(GT512_PATH):
        pytest.skip("512 ground truth not generated "
                    "(tools/gen_ground_truth.py --width 512 --height 512)")
    gt = np.load(GT512_PATH)
    rig512 = None
    W, H = int(gt["width"]), int(gt["height"])
    vox_scene = load_vox_scene(procgen.castle_scene_bytes())
    procgen.add_teapot(vox_scene)
    scene = build_device_scene(vox_scene)
    sky = bake_sky(gt_settings(W, H).sunlight)
    bn = load_blue_noise()
    rig512 = (W, H, scene, sky, bn)
    out = _render(rig512, gt, frames=12)
    r = _rmse(out, gt["output"])
    assert r < RMSE_DENOISED_512, f"512 denoised RMSE {r:.4f}"
