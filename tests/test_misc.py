"""Checkpointing, crashlog, image IO, debug modes."""

import dataclasses
import json
import os

import numpy as np
import jax.numpy as jnp

from dust_tpu.config import RenderSettings, SpatialHashSettings, SurfelSettings
from dust_tpu.render.pipeline import FrameState, make_frame_state
from dust_tpu.utils import crashlog
from dust_tpu.utils.checkpoint import load_state, save_state
from dust_tpu.utils.image import read_png, write_png


class TestCheckpoint:
    def test_frame_state_roundtrip(self, tmp_path):
        settings = RenderSettings(
            width=16, height=16,
            spatial_hash=SpatialHashSettings(capacity=256),
            surfels=SurfelSettings(pool_size=64),
        )
        state = make_frame_state(settings)
        state = state._replace(
            frame_index=jnp.asarray(42, jnp.int32),
            exposure_avg=jnp.asarray(0.25, jnp.float32),
        )
        path = str(tmp_path / "state.npz")
        save_state(path, state)
        fresh = make_frame_state(settings)
        loaded = load_state(path, fresh)
        assert int(loaded.frame_index) == 42
        assert float(loaded.exposure_avg) == 0.25
        np.testing.assert_array_equal(
            np.array(loaded.spatial_hash.table), np.array(state.spatial_hash.table)
        )

    def test_shape_mismatch_rejected(self, tmp_path):
        s1 = make_frame_state(RenderSettings(width=8, height=8,
            spatial_hash=SpatialHashSettings(capacity=64),
            surfels=SurfelSettings(pool_size=16)))
        s2 = make_frame_state(RenderSettings(width=16, height=16,
            spatial_hash=SpatialHashSettings(capacity=64),
            surfels=SurfelSettings(pool_size=16)))
        path = str(tmp_path / "s.npz")
        save_state(path, s1)
        try:
            load_state(path, s2)
            assert False
        except ValueError as e:
            assert "shape" in str(e)


class TestCrashlog:
    def test_capture_writes_report(self, tmp_path):
        try:
            raise RuntimeError("boom")
        except RuntimeError:
            import sys
            path = crashlog.capture(*sys.exc_info(), extra={"scene": "castle"},
                                    directory=str(tmp_path))
        data = json.load(open(path))
        assert "boom" in data["exception"]
        assert data["context"]["scene"] == "castle"
        assert "devices" in data["device"] or "error" in data["device"]


class TestImageIO:
    def test_png_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (16, 24, 3)).astype(np.float32)
        p = str(tmp_path / "x.png")
        write_png(p, img)
        back = read_png(p).astype(np.float32) / 255.0
        assert back.shape == (16, 24, 3)
        assert np.abs(back - img).max() < 1.0 / 255.0 + 1e-6

    def test_nan_inf_clamped(self, tmp_path):
        img = np.array([[[np.nan, np.inf, -1.0]]], np.float32)
        p = str(tmp_path / "y.png")
        write_png(p, img)
        assert (read_png(p)[0, 0] == [0, 255, 0]).all()
