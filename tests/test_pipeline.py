"""End-to-end pipeline tests (small frames, CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dust_tpu.config import (
    RenderSettings, SpatialHashSettings, SurfelSettings,
)
from dust_tpu.ops import camera as cam
from dust_tpu.ops.noise import load_blue_noise
from dust_tpu.ops.sky import bake_sky
from dust_tpu.render.pipeline import make_frame_state, render_frame
from dust_tpu.render.scene import build_device_scene
from dust_tpu.vox import procgen
from dust_tpu.vox.loader import load_vox_scene


@pytest.fixture(scope="module")
def setup():
    settings = RenderSettings(
        width=96, height=54,
        spatial_hash=SpatialHashSettings(capacity=1 << 14),
        surfels=SurfelSettings(pool_size=1024),
    )
    scene = build_device_scene(load_vox_scene(procgen.castle_scene_bytes()))
    sky = bake_sky(settings.sunlight)
    bn = load_blue_noise()
    c2w = cam.look_at((150, 90, 180), (0, 30, 0))
    cs = cam.camera_settings(
        c2w, settings.camera.fov, settings.camera.near,
        settings.camera.far, settings.width, settings.height,
    )
    return settings, scene, sky, bn, cs


def _frame(setup_t, state):
    settings, scene, sky, bn, cs = setup_t
    return render_frame(
        scene, state, cs, sky, bn.unitvec3_cosine, bn.scalar, settings, tile=2048
    )


class TestRenderFrame:
    def test_three_frames(self, setup):
        settings, scene, sky, bn, cs = setup
        state = make_frame_state(settings)
        occupancy = []
        for i in range(3):
            out, aux, state = _frame(setup, state)
            occupancy.append(int((np.array(state.gi.fingerprint) != 0).sum()))

        o = np.array(out)
        assert o.shape == (settings.height, settings.width, 3)
        assert np.isfinite(o).all()
        assert 0.0 <= o.min() and o.max() <= 1.0
        assert o.std() > 0.05  # not a flat image

        # Frame counter advances; GI cache fills monotonically.
        assert int(state.frame_index) == 3
        assert occupancy[-1] >= occupancy[0] > 0
        # Surfels got scheduled.
        assert int((np.array(state.surfels[:, 3]) < 6).sum()) > 0

    def test_gbuffer_contents(self, setup):
        settings, scene, sky, bn, cs = setup
        state = make_frame_state(settings)
        out, aux, state = _frame(setup, state)
        depth = np.array(aux["depth"])
        hits = np.isfinite(depth)
        assert 0.05 < hits.mean() < 0.95
        # Normals unit-length on hits.
        nrm = np.array(aux["normal"])[hits]
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-4)
        # Static scene: zero motion everywhere.
        assert np.abs(np.array(aux["motion"])).max() < 1e-3
        # Albedo is palette-driven on hits, 1.0 on sky.
        alb = np.array(aux["albedo"])
        assert (alb[~hits] == 1.0).all()
        assert alb[hits].std() > 0.01

    def test_temporal_accumulation_static_camera(self, setup):
        settings, scene, sky, bn, cs = setup
        state = make_frame_state(settings)
        for _ in range(3):
            out, aux, state = _frame(setup, state)
        hist = np.array(state.denoiser.history_len)
        hits = np.isfinite(np.array(aux["depth"]))
        if hist.shape != hits.shape:  # half-res indirect history
            hits = hits[0::2, 0::2]
        # Static camera: history accumulates on surfaces.
        assert hist[hits].mean() > 1.5

    def test_sunlit_brighter_than_shadowed(self, setup):
        settings, scene, sky, bn, cs = setup
        state = make_frame_state(settings)
        out, aux, state = _frame(setup, state)
        rad = np.array(aux["radiance"])
        nrm = np.array(aux["normal"])
        hits = np.isfinite(np.array(aux["depth"]))
        sun = np.array(sky.direction)
        facing = (nrm @ sun > 0.3) & hits
        away = (nrm @ sun < -0.3) & hits
        if facing.sum() > 10 and away.sum() > 10:
            assert rad[facing].mean() > rad[away].mean()


class TestDenseGICache:
    """gi_cache="dense": one cache row per (instance, leaf_row, face),
    scatter-free inserts (ops/gi_cache.py)."""

    @pytest.fixture(scope="class")
    def dense_setup(self, setup):
        import dataclasses
        settings, scene, sky, bn, cs = setup
        return (dataclasses.replace(settings, gi_cache="dense"),
                scene, sky, bn, cs)

    def test_dense_frames_and_cache_fill(self, dense_setup):
        settings, scene, sky, bn, cs = dense_setup
        state = make_frame_state(settings, scene)
        filled = []
        for _ in range(3):
            out, aux, state = _frame(dense_setup, state)
            filled.append(int((np.array(state.gi.count) > 0).sum()))
        o = np.array(out)
        assert o.shape == (settings.height, settings.width, 3)
        assert np.isfinite(o).all()
        assert o.std() > 0.05
        # Every exposed valid cell is patched every frame -> the fill is
        # large immediately and non-decreasing.
        assert filled[0] > 1000
        assert filled[-1] >= filled[0]

    def test_dense_refresh_budget_rotates_slices(self, dense_setup):
        """With a refresh budget smaller than the cell count, each frame
        patches one rotating slice; after ceil(rows/budget) frames every
        exposed valid cell has been visited, and the output stays close
        to the unbudgeted render."""
        import dataclasses
        from dust_tpu.config import SurfelSettings
        from dust_tpu.ops.gi_cache import dense_rows
        settings, scene, sky, bn, cs = dense_setup
        rows = dense_rows(scene)
        budget = -(-rows // 3)  # force 3 slices
        bset = dataclasses.replace(
            settings, surfels=SurfelSettings(dense_refresh_budget=budget))
        bsetup = (bset, scene, sky, bn, cs)

        st_b = make_frame_state(bset, scene)
        st_f = make_frame_state(settings, scene)
        for _ in range(3):
            out_b, _aux, st_b = _frame(bsetup, st_b)
            out_f, _aux2, st_f = _frame(dense_setup, st_f)
        cb = np.array(st_b.gi.count)
        # One full rotation visited every slice: filled rows appear in
        # each of the 3 windows (insert gating on `found` means coverage
        # converges over rotations rather than matching the full path
        # frame-for-frame).
        for k in range(3):
            lo = min(k * budget, rows - budget)
            assert (cb[lo:lo + budget] > 0).sum() > 0, f"slice {k} untouched"
        # Coverage is monotone over further rotations.
        n1 = (cb > 0).sum()
        for _ in range(3):
            out_b, _aux, st_b = _frame(bsetup, st_b)
        assert (np.array(st_b.gi.count) > 0).sum() >= n1
        # And the image is the same scene, slightly different GI ages
        # (sanity bound, not a quality gate — budgeted frame 6 vs full
        # frame 3).
        d = np.abs(np.array(out_b) - np.array(out_f))
        assert d.mean() < 0.1

    def test_dense_matches_hash_visually(self, dense_setup, setup):
        """Same scene/rays, two GI cache backends: images must agree on
        direct lighting and broadly on GI (different cell scheduling ->
        loose tolerance)."""
        settings_d, scene, sky, bn, cs = dense_setup
        settings_h = setup[0]
        st_d = make_frame_state(settings_d, scene)
        st_h = make_frame_state(settings_h)
        for _ in range(3):
            out_d, _, st_d = _frame(dense_setup, st_d)
            out_h, _, st_h = _frame(setup, st_h)
        a, b = np.array(out_d), np.array(out_h)
        assert np.abs(a - b).mean() < 0.08, np.abs(a - b).mean()

    def test_dense_checkpoint_resume_bit_exact(self, dense_setup, tmp_path):
        from dust_tpu.utils.checkpoint import save_state, load_state
        settings, scene, sky, bn, cs = dense_setup
        state = make_frame_state(settings, scene)
        for _ in range(2):
            _, _, state = _frame(dense_setup, state)
        path = tmp_path / "dense.npz"
        save_state(str(path), state)
        resumed = load_state(str(path), make_frame_state(settings, scene))
        _, _, a = _frame(dense_setup, state)
        _, _, b = _frame(dense_setup, resumed)
        np.testing.assert_array_equal(np.array(a.gi.table),
                                      np.array(b.gi.table))


class TestHalfResIndirect:
    """The half-res indirect denoise path (DenoiserSettings.
    half_res_indirect): the stochastic GI channel filters at half
    resolution and composes with the full-res deterministic sun term."""

    def _render(self, half):
        import dataclasses
        settings = RenderSettings(
            width=96, height=54, gi_cache="dense",
            spatial_hash=SpatialHashSettings(capacity=1 << 14),
        )
        settings = dataclasses.replace(
            settings,
            denoiser=dataclasses.replace(settings.denoiser,
                                         half_res_indirect=half))
        scene = build_device_scene(load_vox_scene(procgen.castle_scene_bytes()))
        sky = bake_sky(settings.sunlight)
        bn = load_blue_noise()
        c2w = cam.look_at((150, 90, 180), (0, 30, 0))
        cs = cam.camera_settings(
            c2w, settings.camera.fov, settings.camera.near,
            settings.camera.far, settings.width, settings.height)
        state = make_frame_state(settings, scene)
        for _ in range(3):
            out, _aux, state = render_frame(
                scene, state, cs, sky, bn.unitvec3_cosine, bn.scalar,
                settings, tile=2048)
        return np.array(out)

    def test_close_to_full_res(self):
        """Half-res GI must stay near the full-res result: the indirect
        field is low-frequency, the direct term is identical by
        construction, and the upsample is geometry-guided."""
        full = self._render(half=False)
        halfr = self._render(half=True)
        assert np.isfinite(halfr).all()
        rmse = float(np.sqrt(np.mean((full - halfr) ** 2)))
        assert rmse < 0.08, rmse
        # Means agree tightly (no energy gained/lost by the split).
        assert abs(full.mean() - halfr.mean()) < 0.02

    def test_history_is_half_sized(self):
        import dataclasses
        s = RenderSettings(width=96, height=54, gi_cache="dense")
        st = make_frame_state(s, build_device_scene(
            load_vox_scene(procgen.teapot_scene_bytes())))
        assert st.denoiser.history.shape[:2] == (27, 48)
        s2 = dataclasses.replace(
            s, denoiser=dataclasses.replace(s.denoiser,
                                            half_res_indirect=False))
        st2 = make_frame_state(s2, build_device_scene(
            load_vox_scene(procgen.teapot_scene_bytes())))
        assert st2.denoiser.history.shape[:2] == (54, 96)


def test_entry_face_matches_leaf_attributes():
    """The analytic entry face (shade.entry_face — no leaf-row gather)
    must agree with the gather-based leaf_attributes face for rough hits
    (both reduce to cubed_normalize(hit - leaf_center); ties at box
    edges are measure-zero)."""
    from dust_tpu.ops import shade
    from dust_tpu.ops.traverse import trace_scene

    scene = build_device_scene(load_vox_scene(procgen.castle_scene_bytes()))
    c2w = cam.look_at((150, 90, 180), (0, 30, 0))
    cs = cam.camera_settings(c2w, 1.0, 0.1, 10000.0, 64, 36)
    import jax.numpy as jnp
    dirs = jnp.asarray(np.array(cam.camera_ray_dirs(cs, 64, 36)).reshape(-1, 3))
    n = dirs.shape[0]
    o = jnp.broadcast_to(jnp.asarray(np.array(cs.position)), (n, 3))
    res = trace_scene(scene, o, dirs, 0.1, 10000.0, mode="rough")
    hit = np.array(res.hit)
    assert hit.sum() > 200
    fa = np.array(shade.entry_face(scene, res, o, dirs))
    leaf = shade.leaf_attributes(scene, res, o, dirs)
    fb = np.array(leaf["face"])
    agree = (fa[hit] == fb[hit]).mean()
    assert agree > 0.999, agree


def test_dense_cache_packed_roundtrip():
    """Packed dense-GI rows: radiance f16 round-trips, counts are exact
    integers, the albedo word survives updates."""
    from dust_tpu.ops import gi_cache as gi
    import jax.numpy as jnp

    scene = build_device_scene(load_vox_scene(procgen.teapot_scene_bytes()))
    c = gi.make_dense_gi_cache(scene)
    rows = c.table.shape[0]
    alb0 = np.array(c.table[:, 2])
    assert (np.array(c.count) == 0).all()
    val = jnp.ones((rows, 3)) * jnp.asarray([0.25, 1.5, 3.0])
    valid = jnp.arange(rows) % 2 == 0
    c2 = gi.dense_update(c, val, valid)
    np.testing.assert_array_equal(np.array(c2.table[:, 2]), alb0)
    cnt = np.array(c2.count)
    assert (cnt[::2] == 1).all() and (cnt[1::2] == 0).all()
    found, rad, cnt2, alb = gi.dense_get(
        c2, jnp.arange(rows), jnp.ones(rows, bool))
    np.testing.assert_allclose(np.array(rad)[::2], np.array(val)[::2],
                               rtol=1e-3)
    assert not np.array(found)[1::2].any()
    np.testing.assert_array_equal(
        np.array(alb), alb0.astype(np.uint32).view(np.uint32))


class TestMaterialSeam:
    """Registered-material dispatch (render/materials.py ≙ the reference's
    per-material-subset pipeline specialization, manager.rs:277-315)."""

    def test_palette_only_is_identity(self):
        from dust_tpu.render import materials as M
        g = {"hit": jnp.ones(8, bool), "inst": jnp.zeros(8, jnp.int32),
             "albedo": jnp.ones((8, 4))}
        g2, em = M.apply_materials(g, (0,))
        assert g2 is g  # zero traced ops
        assert float(np.array(em).sum()) == 0.0

    def test_emissive_instance_lights_up(self):
        """Marking the teapot instance emissive adds deterministic
        radiance on its pixels and leaves the castle untouched."""
        import dataclasses
        from dust_tpu.render import materials as M

        M.register_material(1, M.EmissiveMaterial(strength=6.0))
        vox = load_vox_scene(procgen.castle_scene_bytes())
        tp = load_vox_scene(procgen.teapot_scene_bytes())
        mid = max(vox.geometries) + 1
        vox.geometries[mid] = tp.geometries[0]
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = (60.0, 70.0, 60.0)
        from dust_tpu.vox.loader import VoxInstance
        vox.instances.append(VoxInstance(model_id=mid, transform=t))
        dev = build_device_scene(vox)

        settings = RenderSettings(width=96, height=54, gi_cache="dense")
        sky = bake_sky(settings.sunlight)
        bn = load_blue_noise()
        cs = cam.camera_settings(cam.look_at((150, 90, 180), (0, 30, 0)),
                                 settings.camera.fov, settings.camera.near,
                                 settings.camera.far, 96, 54)

        def render(stg):
            state = make_frame_state(stg, dev)
            out, aux, _ = render_frame(dev, state, cs, sky,
                                       bn.unitvec3_cosine, bn.scalar,
                                       stg, tile=2048)
            return np.array(out), np.array(aux["voxel_id"])

        plain, vid = render(settings)
        lit, _ = render(dataclasses.replace(
            settings, instance_materials=(0, 1)))
        tp_px = (vid & 0xFFFF) == 1  # instance 1 pixels
        assert tp_px.sum() > 20
        # Emissive pixels brighten; the rest of the frame is unchanged up
        # to GI noise.
        assert lit[tp_px].mean() > plain[tp_px].mean() + 0.02
        np.testing.assert_allclose(lit[~tp_px], plain[~tp_px], atol=0.06)


class TestStressScene:
    def test_many_instance_frame_with_refresh_budget(self):
        """The stress preset's shape at test scale: a 2×2 castle grid + 1
        teapot (5 instances, 2 models) renders a sane frame end-to-end
        with a dense-GI refresh budget SMALLER than the cell count, so
        the rotating-slice path (`bench.py --config stress`'s regime) is
        exercised on CPU."""
        vox_scene, anim = procgen.stress_scene(grid=2, teapots=1)
        scene = build_device_scene(vox_scene)
        assert scene.num_instances == 5 and scene.num_models == 2
        from dust_tpu.ops.gi_cache import dense_rows
        budget = dense_rows(scene) // 3
        settings = RenderSettings(
            width=96, height=54,
            spatial_hash=SpatialHashSettings(capacity=1 << 14),
            surfels=SurfelSettings(pool_size=1024,
                                   dense_refresh_budget=budget),
        )
        sky = bake_sky(settings.sunlight)
        bn = load_blue_noise()
        cs = cam.camera_settings(
            cam.look_at((260, 420, 180), (0, 0, 0)), settings.camera.fov,
            settings.camera.near, settings.camera.far,
            settings.width, settings.height)
        state = make_frame_state(settings, scene)
        for f in range(2):
            o2w = procgen.teapot_motion(
                np.array(scene.obj_to_world), anim, f)
            sc = scene.with_transforms(jnp.asarray(o2w))
            out, aux, state = render_frame(
                sc, state, cs, sky, bn.unitvec3_cosine, bn.scalar,
                settings, tile=2048)
        o = np.array(out)
        assert np.isfinite(o).all() and o.std() > 0.05
        # Multiple castle instances are actually visible.
        inst = np.array(aux["voxel_id"]).reshape(-1) & 0xFFFF
        hits = inst[inst != 0xFFFF]
        assert len(set(hits.tolist())) >= 3


class TestHashRotation:
    """Hash-mode cost rotations: working-set probe slices
    (SpatialHashSettings.ws_refresh_slices) and the surfel-pool refresh
    budget (SurfelSettings.pool_refresh_budget)."""

    def test_ws_rotation_and_pool_budget_converge(self, setup):
        import dataclasses
        settings, scene, sky, bn, cs = setup
        rot = dataclasses.replace(
            settings,
            spatial_hash=dataclasses.replace(
                settings.spatial_hash, ws_refresh_slices=3),
            surfels=dataclasses.replace(
                settings.surfels, pool_refresh_budget=512),
        )
        rsetup = (rot, scene, sky, bn, cs)
        s0 = make_frame_state(settings)
        s1 = make_frame_state(rot, scene)
        assert s1.gi_ws is not None and s0.gi_ws is None
        for _ in range(6):
            out0, _a0, s0 = _frame(setup, s0)
            out1, _a1, s1 = _frame(rsetup, s1)
        a, b = np.array(out0), np.array(out1)
        assert np.isfinite(b).all()
        # After two full ws rotations the stale-read lag (<=2 frames of
        # GI age on 2/3 of cells) is far inside the temporal filter's
        # own smoothing; the image must match the unrotated hash run
        # closely (same scene, same noise, same camera).
        rmse = float(np.sqrt(np.mean((a - b) ** 2)))
        assert rmse < 0.05, rmse
        # The persistent working set actually filled: its count column
        # is nonzero somewhere in every third of the table.
        cnt = np.array(s1.gi_ws.count)
        rows = cnt.shape[0]
        S = -(-rows // 3)
        for k in range(3):
            lo = min(k * S, rows - S)
            assert (cnt[lo:lo + S] > 0).sum() > 0, f"ws slice {k} never probed"

    def test_pack_working_set_rows_matches_full(self, setup):
        from dust_tpu.ops import gi_cache as gilib
        settings, scene, sky, bn, cs = setup
        rng = np.random.default_rng(7)
        n = gilib.dense_rows(scene)
        rad = jnp.asarray(rng.uniform(0, 3, (n, 3)), jnp.float32)
        cntv = jnp.asarray(rng.integers(0, 500, n), jnp.float32)
        full = gilib.pack_working_set(rad, cntv, scene)
        alb = full.table[:, 2:3]
        rows = gilib.pack_working_set_rows(rad, cntv, alb)
        assert np.array_equal(np.array(rows), np.array(full.table))
