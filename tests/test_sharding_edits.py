"""Edits under the mesh (VERDICT r4 item 7).

``render/edits.py`` documents the hazard: a refit shifts the edited
model's leaf-row order while the dense GI cache is ROW-SHARDED across
the mesh (``shard_frame_state``), and ``apply_leaf_patch`` scatters
albedo words straight into that sharded table. Nothing gated that
interaction — these tests run the full edit-while-rendering sequence
(frame, leaf-patch edit, frame, out-of-leaf splice edit, frame) on the
8-device CPU mesh and require the images AND the refit tiers to match
the unsharded sequence exactly.
"""

import dataclasses

import numpy as np
import jax
import pytest

from dust_tpu.config import RenderSettings, SpatialHashSettings, SurfelSettings
from dust_tpu.ops import camera as cam
from dust_tpu.ops.noise import load_blue_noise
from dust_tpu.ops.sky import bake_sky
from dust_tpu.parallel.mesh import (make_mesh, ray_sharding, replicate_scene,
                                    shard_frame_state)
from dust_tpu.render.edits import SceneEditor
from dust_tpu.render.pipeline import make_frame_state, render_frame
from dust_tpu.render.scene import build_device_scene
from dust_tpu.vox import procgen
from dust_tpu.vox.loader import load_vox_scene


def _settings(**overrides):
    base = dict(
        width=64, height=64,
        spatial_hash=SpatialHashSettings(capacity=1 << 12),
        surfels=SurfelSettings(pool_size=2048),
        gi_cache="dense",
    )
    base.update(overrides)
    return RenderSettings(**base)


def _camera(settings):
    c2w = cam.look_at((90, 60, 90), (0, 0, 0))
    return cam.camera_settings(c2w, np.pi / 3, 0.1, 10000.0,
                               settings.width, settings.height)


def _run_sequence(settings, mesh=None):
    """frame -> leaf-patch edit -> frame -> splice edit -> frame.

    Returns (frames, refit_modes, final gi table). With a mesh the scene
    is replicated, the state sharded, and every render_frame call runs
    ray-sharded; after the splice tier's host rebuild the fresh arrays
    are re-broadcast (the SURVEY §5.8 all-gather-after-edits step).
    """
    vs = load_vox_scene(procgen.teapot_scene_bytes())
    scene = build_device_scene(vs)
    editor = SceneEditor(vs, scene)
    mid = sorted(vs.geometries)[0]

    rs = None
    if mesh is not None:
        scene = replicate_scene(scene, mesh)
        editor.device = scene
        rs = ray_sharding(mesh)
    state = make_frame_state(settings, scene)
    if mesh is not None:
        state = shard_frame_state(state, mesh)
    sky = bake_sky(settings.sunlight)
    bn = load_blue_noise()
    cs = _camera(settings)

    def frame(scene, state):
        out, _aux, state = render_frame(
            scene, state, cs, sky, bn.unitvec3_cosine, bn.scalar,
            settings, tile=1024, ray_sharding=rs)
        return np.asarray(out), state

    frames, modes = [], []
    f, state = frame(scene, state)
    frames.append(f)

    # 1. In-leaf edit: recolor an existing voxel (leaf set unchanged ->
    # the leaf-patch tier, scattering into the sharded GI table).
    c0 = editor._coords[mid][0]
    editor.set_voxel(mid, tuple(int(v) for v in c0), 7)
    scene, state = editor.refit(state)
    modes.append(editor.last_refit_mode)
    f, state = frame(scene, state)
    frames.append(f)

    # 2. Out-of-leaf edit: a voxel in an empty region -> new leaf ->
    # splice tier (host rebuild + row splice + dense albedo refresh).
    editor.set_voxel(mid, (2, 2, 2), 11)
    scene, state = editor.refit(state)
    modes.append(editor.last_refit_mode)
    if mesh is not None:
        scene = replicate_scene(scene, mesh)
        editor.device = scene
    f, state = frame(scene, state)
    frames.append(f)
    return frames, modes, np.asarray(state.gi.table)


@pytest.mark.slow
def test_edit_sequence_sharded_matches_unsharded():
    assert jax.device_count() >= 8
    settings = _settings()
    ref_frames, ref_modes, ref_gi = _run_sequence(settings)
    mesh = make_mesh(8)
    sh_frames, sh_modes, sh_gi = _run_sequence(settings, mesh=mesh)

    assert ref_modes == ["leaf", "splice"], ref_modes
    assert sh_modes == ref_modes, sh_modes
    for i, (a, b) in enumerate(zip(ref_frames, sh_frames)):
        assert np.isfinite(b).all()
        close = np.isclose(a, b, rtol=1e-3, atol=1e-3)
        assert close.mean() > 0.999, f"frame {i}: {close.mean():.4f}"
    # The GI cache (incl. the leaf-patched albedo words) must agree too.
    assert ref_gi.shape == sh_gi.shape
    assert (ref_gi == sh_gi).mean() > 0.999


@pytest.mark.slow
def test_edit_sequence_sharded_pallas():
    """Same sequence on the Pallas backend (sharded kernels around the
    refit dispatches)."""
    assert jax.device_count() >= 8
    settings = _settings(traversal_backend="pallas")
    ref_frames, ref_modes, _ = _run_sequence(settings)
    mesh = make_mesh(8)
    sh_frames, sh_modes, _ = _run_sequence(settings, mesh=mesh)
    assert sh_modes == ref_modes == ["leaf", "splice"]
    for i, (a, b) in enumerate(zip(ref_frames, sh_frames)):
        close = np.isclose(a, b, rtol=1e-3, atol=1e-3)
        assert close.mean() > 0.999, f"frame {i}: {close.mean():.4f}"
