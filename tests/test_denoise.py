"""Quantitative denoiser tests (REBLUR-behavior contract).

The reference ships NRD REBLUR as closed SPIR-V; these tests pin the
*behaviors* that made it production-grade — noise reduction, ghosting-free
response to lighting changes (history clamping), anti-lag acceleration,
and disocclusion handling via per-tap bilinear validity — on the open
reimplementation in ``dust_tpu.ops.denoise``. The lighting-change and
anti-lag tests fail on a plain exponential accumulator (the round-1
filter): with a 30-frame history it takes ~30 frames to reach a new
signal; with clamping + anti-lag it takes ≤2.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dust_tpu.config import DenoiserSettings
from dust_tpu.ops import camera as cam
from dust_tpu.ops import denoise as dn


H = W = 32


@pytest.fixture(scope="module")
def static_cam():
    c2w = cam.look_at((16, 16, 40), (16, 16, 0))
    cs = cam.camera_settings(c2w, np.pi / 3, 0.1, 1000.0, W, H)
    dirs = cam.camera_ray_dirs(cs, W, H)
    pos = cs.position + dirs * 20.0
    depth = jnp.full((H, W), 20.0)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 3))
    return cs, pos, depth, normal


def run_frames(frames, settings, static_cam, state=None):
    """Feed a list of (H,W,3) radiance frames; returns outputs + state."""
    cs, pos, depth, normal = static_cam
    state = state or dn.make_denoiser_state(H, W)
    outs = []
    for rad in frames:
        out, _hd, state = dn.denoise(
            state, jnp.asarray(rad, jnp.float32), jnp.full((H, W), 5.0),
            depth, normal, pos, jnp.zeros((H, W, 3)), cs.view_proj, settings)
        outs.append(np.array(out))
    return outs, state


class TestNoiseReduction:
    def test_snr_gain_under_accumulation(self, static_cam):
        """Static scene + zero-mean noise: output noise variance must drop
        by >=4x once history accumulates (temporal SNR gain)."""
        rng = np.random.default_rng(3)
        frames = [0.5 + rng.normal(0, 0.2, (H, W, 3)) for _ in range(10)]
        settings = DenoiserSettings(atrous_iterations=0)
        outs, _ = run_frames(frames, settings, static_cam)
        v_in = np.var(frames[-1] - 0.5)
        v_out = np.var(outs[-1] - 0.5)
        assert v_out < v_in / 4.0, (v_in, v_out)

    def test_temporal_stability(self, static_cam):
        """Frame-to-frame output flicker must be far below input flicker."""
        rng = np.random.default_rng(4)
        frames = [0.5 + rng.normal(0, 0.2, (H, W, 3)) for _ in range(10)]
        outs, _ = run_frames(frames, DenoiserSettings(), static_cam)
        in_flicker = np.abs(frames[-1] - frames[-2]).mean()
        out_flicker = np.abs(outs[-1] - outs[-2]).mean()
        assert out_flicker < in_flicker / 4.0, (in_flicker, out_flicker)


class TestLightingChange:
    def test_history_clamp_kills_ghosting(self, static_cam):
        """After a step change in lighting, the output must land within 15%
        of the new level in <=2 frames. A plain 30-frame exponential
        accumulator is still ~70% stale after 2 frames; REBLUR-style
        history clamping gets there immediately."""
        rng = np.random.default_rng(5)
        lo = [0.2 + rng.normal(0, 0.02, (H, W, 3)) for _ in range(8)]
        hi = [1.0 + rng.normal(0, 0.02, (H, W, 3)) for _ in range(2)]
        outs, _ = run_frames(lo + hi, DenoiserSettings(atrous_iterations=0),
                             static_cam)
        settled = outs[len(lo) + 1].mean()
        assert abs(settled - 1.0) < 0.15, settled
        # and the pre-change frames really were converged near 0.2
        assert abs(outs[len(lo) - 1].mean() - 0.2) < 0.05

    def test_antilag_cuts_history_length(self, static_cam):
        """The accumulated frame count must drop sharply when the signal
        jumps (fast/slow history divergence)."""
        rng = np.random.default_rng(6)
        settings = DenoiserSettings(atrous_iterations=0)
        lo = [0.2 + rng.normal(0, 0.02, (H, W, 3)) for _ in range(8)]
        _, state = run_frames(lo, settings, static_cam)
        len_before = float(np.median(np.array(state.history_len)))
        hi = [1.0 + rng.normal(0, 0.02, (H, W, 3))]
        _, state = run_frames(hi, settings, static_cam, state=state)
        len_after = float(np.median(np.array(state.history_len)))
        assert len_before >= 6.0
        assert len_after < len_before / 2.0, (len_before, len_after)

    def test_steady_state_not_destabilized_by_antilag(self, static_cam):
        """Anti-lag must NOT fire on plain noise: history keeps growing."""
        rng = np.random.default_rng(7)
        frames = [0.5 + rng.normal(0, 0.15, (H, W, 3)) for _ in range(12)]
        _, state = run_frames(frames, DenoiserSettings(atrous_iterations=0),
                              static_cam)
        assert float(np.median(np.array(state.history_len))) >= 6.0


class TestDisocclusion:
    def test_per_tap_depth_validity(self, static_cam):
        """History from a different surface (mismatched stored depth) must
        be rejected -> output equals the current frame there."""
        cs, pos, depth, normal = static_cam
        settings = DenoiserSettings(atrous_iterations=0)
        state = dn.make_denoiser_state(H, W)
        # Converge history at 0.9 ...
        frames = [np.full((H, W, 3), 0.9) for _ in range(5)]
        _, state = run_frames(frames, settings, static_cam, state=state)
        # ... then present geometry 2x closer on the left half: those
        # pixels reproject into history whose stored view depth disagrees.
        half = jnp.arange(W)[None, :] < W // 2
        near_pos = cs.position + (pos - cs.position) * 0.5
        pos2 = jnp.where(half[..., None], near_pos, pos)
        depth2 = jnp.broadcast_to(jnp.where(half, 10.0, 20.0), (H, W))
        # Radiance: disoccluded half sees a new value, static half the
        # converged one (so neither clamping nor anti-lag react there).
        rad = jnp.broadcast_to(
            jnp.where(half[..., None], 0.1, 0.9), (H, W, 3))
        out, _hd, st2 = dn.denoise(
            state, rad, jnp.full((H, W), 5.0),
            depth2, normal, pos2, jnp.zeros((H, W, 3)), cs.view_proj,
            settings)
        o = np.array(out)
        # Disoccluded half restarts at the current value ...
        assert abs(o[:, : W // 2 - 2].mean() - 0.1) < 0.02
        # ... and its history length resets to 1, while the static half
        # keeps accumulating (geometric validity, not color clamping,
        # decides: clamping never touches the length channel).
        hlen = np.array(st2.history_len)
        assert hlen[:, : W // 2 - 2].mean() < 1.5
        assert hlen[:, W // 2 + 2 :].mean() > 4.0
