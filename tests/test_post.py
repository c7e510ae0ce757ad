"""Post-processing stack tests: exposure, tonemap, denoise, colorspace."""

import numpy as np
import jax.numpy as jnp

from dust_tpu.config import DenoiserSettings, ExposureSettings
from dust_tpu.ops import denoise as dn
from dust_tpu.ops import exposure as ex
from dust_tpu.ops import tonemap as tm
from dust_tpu.ops.reservoir import (
    Reservoir, make_reservoirs, pack_reservoir, reservoir_update, unpack_reservoir,
)
from dust_tpu.utils import colorspace as cs


class TestExposure:
    def test_histogram_binning(self):
        s = ExposureSettings()
        img = jnp.zeros((8, 8, 3))
        hist = ex.luminance_histogram(img, s)
        assert int(hist[0]) == 64  # black pixels -> bin 0 (colorToBin epsilon)
        bright = jnp.ones((4, 4, 3)) * 100.0
        hist = ex.luminance_histogram(bright, s)
        assert int(hist.sum()) == 16
        assert int(hist[0]) == 0
        assert int(jnp.argmax(hist)) > 128  # high-luminance bin

    def test_adaptation_moves_toward_scene(self):
        s = ExposureSettings(time_coefficient=0.5)
        img = jnp.ones((16, 16, 3))
        hist = ex.luminance_histogram(img, s)
        avg0 = jnp.asarray(0.001)
        avg1 = ex.adapt_average_luminance(hist, avg0, 256, s)
        avg2 = ex.adapt_average_luminance(hist, avg1, 256, s)
        assert float(avg1) > float(avg0)
        assert float(avg2) > float(avg1)

    def test_exposure_value(self):
        np.testing.assert_allclose(float(ex.exposure_value(jnp.asarray(0.5))), 2.0)


class TestTonemap:
    def test_aces_range(self):
        x = jnp.asarray(np.random.default_rng(0).uniform(0, 20, (64, 3)), jnp.float32)
        y = np.array(tm.aces_fitted(x))
        assert y.max() < 1.2 and np.isfinite(y).all()
        # ACES is monotone-ish in overall luminance
        lo = np.array(tm.aces_fitted(jnp.full((1, 3), 0.01)))
        hi = np.array(tm.aces_fitted(jnp.full((1, 3), 5.0)))
        assert hi.sum() > lo.sum()

    def test_oetf_srgb_roundtrippish(self):
        c = jnp.linspace(0, 1, 64)
        enc = tm.oetf(c, "srgb")
        assert float(enc[0]) == 0.0
        assert abs(float(enc[-1]) - 1.0) < 1e-5
        assert (np.diff(np.array(enc)) > 0).all()

    def test_all_transfer_functions_finite(self):
        c = jnp.linspace(0.0, 1.0, 32)
        for tf in tm.TRANSFER_FUNCTIONS:
            out = np.array(tm.oetf(c, tf))
            assert np.isfinite(out).all(), tf

    def test_tonemap_full(self):
        rad = jnp.ones((4, 4, 3)) * 2.0
        alb = jnp.full((4, 4, 3), 0.5)
        out = np.array(tm.tonemap(rad, alb, jnp.asarray(1.0)))
        assert out.shape == (4, 4, 3)
        assert 0.0 <= out.min() and out.max() <= 1.0


class TestColorspace:
    def test_srgb_matrix_matches_standard(self):
        m = cs.SRGB.primaries.to_xyz_matrix()
        want = np.array([
            [0.4124, 0.3576, 0.1805],
            [0.2126, 0.7152, 0.0722],
            [0.0193, 0.1192, 0.9505],
        ])
        np.testing.assert_allclose(m, want, atol=2e-4)

    def test_conversion_identity(self):
        m = cs.conversion_matrix(cs.SRGB, cs.SRGB)
        np.testing.assert_allclose(m, np.eye(3), atol=1e-12)

    def test_srgb_to_p3_preserves_white(self):
        m = cs.conversion_matrix(cs.SRGB, cs.DISPLAY_P3)
        np.testing.assert_allclose(m @ np.ones(3), np.ones(3), atol=1e-6)


class TestDenoiser:
    def _inputs(self, h=32, w=32, seed=0):
        rng = np.random.default_rng(seed)
        depth = jnp.full((h, w), 10.0)
        normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (h, w, 3))
        pos = jnp.stack(
            jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                         jnp.arange(h, dtype=jnp.float32), indexing="xy")
            + [jnp.zeros((h, w))], axis=-1)
        radiance = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
        return depth, normal, pos, radiance

    def test_temporal_accumulation_reduces_noise(self):
        h = w = 32
        settings = DenoiserSettings(atrous_iterations=0)
        state = dn.make_denoiser_state(h, w)
        # World positions must be consistent with the reprojection camera:
        # unproject each pixel to a fixed view depth.
        from dust_tpu.ops import camera as cam
        c2w = cam.look_at((16, 16, 40), (16, 16, 0))
        cs_ = cam.camera_settings(c2w, np.pi / 3, 0.1, 1000.0, w, h)
        dirs = cam.camera_ray_dirs(cs_, w, h)
        pos = cs_.position + dirs * 20.0
        depth = jnp.full((h, w), 20.0)
        normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 3))
        rng = np.random.default_rng(1)
        outs = []
        for f in range(6):
            noisy = jnp.asarray(0.5 + rng.normal(0, 0.2, (h, w, 3)), jnp.float32)
            out, hd, state = dn.denoise(
                state, noisy, jnp.zeros((h, w)), depth, normal, pos,
                jnp.zeros((h, w, 3)), cs_.view_proj, settings)
            outs.append(np.array(out))
        # noise std shrinks as history accumulates
        assert outs[-1].std() < outs[0].std() * 0.7

    def test_atrous_smooths_but_keeps_edges(self):
        h = w = 32
        settings = DenoiserSettings(atrous_iterations=3)
        state = dn.make_denoiser_state(h, w)
        depth = jnp.where(jnp.arange(w)[None, :] < 16, 10.0, 50.0)
        depth = jnp.broadcast_to(depth, (h, w))
        normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 3))
        pos = jnp.zeros((h, w, 3))
        rng = np.random.default_rng(2)
        rad = jnp.asarray(np.where(np.arange(w)[None, :, None] < 16,
                                   1.0, 0.1) + rng.normal(0, 0.05, (h, w, 3)),
                          jnp.float32)
        out, _, _ = dn.denoise(state, rad, jnp.full((h, w), 5.0), depth, normal,
                               pos, jnp.zeros((h, w, 3)), jnp.eye(4), settings)
        o = np.array(out)
        left, right = o[:, :12].mean(), o[:, 20:].mean()
        assert left > 0.8 and right < 0.3  # edge preserved
        assert o[:, :12].std() < np.array(rad)[:, :12].std()  # smoothed


class TestReservoir:
    def test_update_and_pack_roundtrip(self):
        r = make_reservoirs(64)
        rng = np.random.default_rng(0)
        d = rng.normal(size=(64, 3)); d /= np.linalg.norm(d, axis=1, keepdims=True)
        r = reservoir_update(r, jnp.asarray(d, jnp.float32),
                             jnp.ones((64, 3)) * 2.0,
                             jnp.ones(64), jnp.full(64, 0.3))
        assert (np.array(r.sample_count) == 1).all()
        packed = pack_reservoir(r)
        back = unpack_reservoir(*packed)
        dots = np.sum(np.array(back.direction) * d, axis=1)
        assert dots.min() > 0.99
