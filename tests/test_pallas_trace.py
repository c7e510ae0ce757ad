"""Pallas HDDA kernel vs the XLA wavefront tracer (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dust_tpu.ops import camera as cam
from dust_tpu.ops.pallas_trace import build_pallas_tables, trace_instance_pallas
from dust_tpu.ops.traverse import trace_instance
from dust_tpu.render.scene import build_device_scene, cell_info_grid
from dust_tpu.vox import procgen
from dust_tpu.vox.loader import load_vox_scene


@pytest.fixture(scope="module")
def setup():
    scene = load_vox_scene(procgen.teapot_scene_bytes())
    geo = scene.geometries[0]
    tables = build_pallas_tables(geo.flat)
    cell = jnp.asarray(cell_info_grid(geo.flat.leaf_grid))
    mask_lo = jnp.asarray(geo.flat.mask_lo)
    mask_hi = jnp.asarray(geo.flat.mask_hi)
    inst = scene.instances[0]
    w2o = np.linalg.inv(np.asarray(inst.transform, np.float64)).astype(np.float32)
    return tables, cell, mask_lo, mask_hi, w2o


def _rays(w2o, w=48, h=48, eye=(90, 60, 90)):
    c2w = cam.look_at(eye, (0, 0, 0))
    cs = cam.camera_settings(c2w, np.pi / 3, 0.1, 1000.0, w, h)
    dirs = np.array(cam.camera_ray_dirs(cs, w, h).reshape(-1, 3))
    origins = np.broadcast_to(np.array(cs.position), dirs.shape)
    o = origins @ w2o[:3, :3].T + w2o[:3, 3]
    d = dirs @ w2o[:3, :3].T
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("mode", ["precise", "rough", "ao_threshold"])
def test_pallas_matches_xla(setup, mode):
    tables, cell, mask_lo, mask_hi, w2o = setup
    if mode == "ao_threshold":
        # AO rays start near surfaces; random interior origins make the
        # 8-unit threshold meaningful.
        rng = np.random.default_rng(11)
        n = 2048
        o_w = rng.uniform(-30, 30, size=(n, 3)).astype(np.float32)
        d_w = rng.normal(size=(n, 3)).astype(np.float32)
        o = jnp.asarray(o_w @ w2o[:3, :3].T + w2o[:3, 3])
        d = jnp.asarray(d_w @ w2o[:3, :3].T)
    else:
        o, d = _rays(w2o)
        n = o.shape[0]
    tmin = jnp.full(n, 0.1)
    tmax = jnp.full(n, 8.0 if mode == "ao_threshold" else 1000.0)

    t_x, row_x, bit_x = trace_instance(cell, mask_lo, mask_hi, o, d, tmin, tmax,
                                       mode=mode)
    t_p, row_p, bit_p = trace_instance_pallas(tables, o, d, tmin, tmax,
                                              mode=mode, interpret=True)

    hx = np.isfinite(np.array(t_x))
    hp = np.isfinite(np.array(t_p))
    agree = (hx == hp).mean()
    assert agree >= 0.995, (mode, hx.sum(), hp.sum(), agree)
    both = hx & hp
    if mode == "ao_threshold":
        assert both.sum() > 50  # the test must exercise real hits
    tx, tp = np.array(t_x)[both], np.array(t_p)[both]
    close = np.isclose(tx, tp, rtol=2e-3, atol=2e-3)
    assert both.sum() == 0 or close.mean() >= 0.99, (mode, close.mean())
    if mode == "precise":
        assert (np.array(row_x)[both][close] == np.array(row_p)[both][close]).mean() >= 0.99
        assert (np.array(bit_x)[both][close] == np.array(bit_p)[both][close]).mean() >= 0.99


def test_pallas_interior_rays(setup):
    tables, cell, mask_lo, mask_hi, w2o = setup
    rng = np.random.default_rng(5)
    n = 1024
    o_w = rng.uniform(-40, 40, size=(n, 3)).astype(np.float32)
    d_w = rng.normal(size=(n, 3)).astype(np.float32)
    o = jnp.asarray(o_w @ w2o[:3, :3].T + w2o[:3, 3])
    d = jnp.asarray(d_w @ w2o[:3, :3].T)
    tmin = jnp.full(n, 0.1)
    tmax = jnp.full(n, 500.0)

    t_x, _, _ = trace_instance(cell, mask_lo, mask_hi, o, d, tmin, tmax)
    t_p, _, _ = trace_instance_pallas(tables, o, d, tmin, tmax, interpret=True)
    hx = np.isfinite(np.array(t_x))
    hp = np.isfinite(np.array(t_p))
    assert (hx == hp).mean() >= 0.99
    both = hx & hp
    assert np.isclose(np.array(t_x)[both], np.array(t_p)[both],
                      rtol=2e-3, atol=2e-3).mean() >= 0.99


def test_rank_table_row_identity(setup):
    # leaf_row derived from rank+popcount must match the dense grid rows.
    scene = load_vox_scene(procgen.teapot_scene_bytes())
    flat = scene.geometries[0].flat
    tables = build_pallas_tables(flat)
    from dust_tpu.voxtree.tree import hierarchy_key

    w0 = np.array(tables.l2_w0).reshape(-1).view(np.uint32)
    w1 = np.array(tables.l2_w1).reshape(-1).view(np.uint32)
    r0 = np.array(tables.l2_r0).reshape(-1)
    r1 = np.array(tables.l2_r1).reshape(-1)
    b = flat.leaf_origin >> 2
    keys = hierarchy_key(b)
    for i in range(0, flat.num_leaves, max(flat.num_leaves // 50, 1)):
        key = int(keys[i])
        cl, local = key >> 6, key & 63
        word = w0[cl] if local < 32 else w1[cl]
        rank = r0[cl] if local < 32 else r1[cl]
        bit = local & 31
        row = rank + int(word & ((1 << bit) - 1)).bit_count()
        assert row == i
        assert flat.leaf_grid[b[i, 0], b[i, 1], b[i, 2]] == i


def test_pallas_castle_multichunk():
    """Castle: 15 mask chunks + 4-chunk cell tables — exercises the
    multi-chunk gather paths the teapot (1 chunk) cannot."""
    scene = load_vox_scene(procgen.castle_scene_bytes())
    geo = scene.geometries[0]
    tables = build_pallas_tables(geo.flat)
    assert tables.mask_chunks > 8
    cell = jnp.asarray(cell_info_grid(geo.flat.leaf_grid))
    mask_lo = jnp.asarray(geo.flat.mask_lo)
    mask_hi = jnp.asarray(geo.flat.mask_hi)
    inst = scene.instances[0]
    w2o = np.linalg.inv(np.asarray(inst.transform, np.float64)).astype(np.float32)

    c2w = cam.look_at((122.0, 300.61, 54.45), (0.0, 0.0, 0.0))
    cs = cam.camera_settings(c2w, 0.6, 0.1, 10000.0, 64, 36)  # framed tight
    dirs = np.array(cam.camera_ray_dirs(cs, 64, 36).reshape(-1, 3))
    origins = np.broadcast_to(np.array(cs.position), dirs.shape)
    o = jnp.asarray(origins @ w2o[:3, :3].T + w2o[:3, 3])
    d = jnp.asarray(dirs @ w2o[:3, :3].T)
    n = o.shape[0]
    tmin, tmax = jnp.full(n, 0.1), jnp.full(n, 10000.0)

    t_x, row_x, bit_x = trace_instance(cell, mask_lo, mask_hi, o, d, tmin, tmax)
    t_p, row_p, bit_p = trace_instance_pallas(tables, o, d, tmin, tmax,
                                              interpret=True)
    hx, hp = np.isfinite(np.array(t_x)), np.isfinite(np.array(t_p))
    assert hx.mean() > 0.3  # the castle footprint fills much of the frame
    assert (hx == hp).mean() >= 0.995
    both = hx & hp
    close = np.isclose(np.array(t_p)[both], np.array(t_x)[both], rtol=2e-3, atol=2e-3)
    assert close.mean() >= 0.995
    assert (np.array(row_x)[both][close] == np.array(row_p)[both][close]).mean() >= 0.99


def test_fused_ao_fg_matches_split():
    """The fused ao_fg kernel must reproduce the split AO(ao_threshold) +
    FG(rough) pass pair exactly — same candidate blocks, same entry-report
    quirk, same straddling-block rejection (pipeline GI chain fusion)."""
    from dust_tpu.ops.pallas_trace import (trace_scene_pallas,
                                           trace_scene_pallas_ao_fg)
    from dust_tpu.render.scene import build_device_scene

    dev = build_device_scene(load_vox_scene(procgen.castle_scene_bytes()))
    rng = np.random.default_rng(9)
    # AO-style rays: start at real primary-hit surface points (exactly how
    # the pipeline launches the GI chain), random hemisphere-ish dirs.
    c2w = cam.look_at((122.0, 300.61, 54.45), (0.0, 0.0, 0.0))
    cs = cam.camera_settings(c2w, 0.9, 0.1, 10000.0, 96, 54)
    dirs0 = jnp.asarray(np.array(cam.camera_ray_dirs(cs, 96, 54)
                                 ).reshape(-1, 3))
    n = dirs0.shape[0]
    o0 = jnp.broadcast_to(jnp.asarray(np.array(cs.position)), (n, 3))
    from dust_tpu.ops.pallas_trace import trace_scene_pallas as _tsp
    prim = _tsp(dev, o0, dirs0, 0.1, 10000.0, mode="precise",
                interpret=True)
    t0 = jnp.where(prim.hit, prim.t, 0.0)
    o = o0 + dirs0 * t0[:, None] * 0.999  # just off the surface
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    active = prim.hit & jnp.asarray(rng.uniform(size=n) < 0.9)

    thr, far = 8.0, 10000.0
    t_ao = jnp.where(active, thr, -1.0)
    t_fg = jnp.where(active, far, -1.0)

    ao_s = trace_scene_pallas(dev, o, d, 0.1, t_ao, mode="ao_threshold",
                              interpret=True)
    fg_active = active & ~ao_s.hit
    fg_s = trace_scene_pallas(dev, o, d, thr,
                              jnp.where(fg_active, far, -1.0), mode="rough",
                              interpret=True)

    ao_f, fg_f = trace_scene_pallas_ao_fg(dev, o, d, 0.1, t_ao, t_fg,
                                          interpret=True)

    ao_hit_s, ao_hit_f = np.array(ao_s.hit), np.array(ao_f.hit)
    assert (ao_hit_s == ao_hit_f).mean() >= 0.999, (
        ao_hit_s.sum(), ao_hit_f.sum())
    both = ao_hit_s & ao_hit_f
    assert both.sum() > 100
    assert np.isclose(np.array(ao_s.t)[both], np.array(ao_f.t)[both],
                      rtol=1e-4, atol=1e-4).mean() >= 0.999

    # FG comparison only where AO agreed to miss (the fused kernel never
    # traces FG for its own AO hits, matching fg_active gating).
    fga = np.array(fg_active)
    fg_hit_s = np.array(fg_s.hit) & fga
    fg_hit_f = np.array(fg_f.hit) & fga
    assert (fg_hit_s == fg_hit_f).mean() >= 0.999
    b = fg_hit_s & fg_hit_f
    assert b.sum() > 100
    assert np.isclose(np.array(fg_s.t)[b], np.array(fg_f.t)[b],
                      rtol=1e-4, atol=1e-4).mean() >= 0.999
    assert (np.array(fg_s.row)[b] == np.array(fg_f.row)[b]).mean() >= 0.999
    assert (np.array(fg_s.inst)[b] == np.array(fg_f.inst)[b]).mean() >= 0.999


