"""Full-frame ABSOLUTE oracle for the deterministic light channel.

VERDICT r4 item 5: the per-component parity tests (DDA oracle, sky bit
parity, color math, camera projection) each gate a link of the chain;
this test gates the chain itself. A primary + sun-NEE frame is fully
deterministic (no stochastic GI), so the whole pipeline image is
computable EXACTLY by an independent derivation:

  pipeline side:  render_frame(contribution_secondary_*=False,
                  shadow_mode="precise") -> aux["radiance"]
  oracle side:    ops/trace_ref.trace_rays_ref (the scalar f64
                  transcription of primary/hit.rint) for primary AND
                  shadow visibility, plus scalar numpy shading: box-face
                  normal from (row, bit), palette albedo via the
                  material_ptr popcount chain (hit.rchit:59-71), sun NEE
                  strength x N.L, Hosek sky on miss (sky itself is
                  bit-parity-tested separately; here it gates the
                  composition).

The two derivations share NO traversal or shading code — the pipeline
walks device tables (leaf_grid / pallas ranks / voxel_attr), the oracle
walks the FlatTree per ray in f64.

Gates: >=99.7% of pixels agree to |d| <= 1e-3 per channel; the agreeing
pixels' RMSE <= 1e-3; the disagreeing ones (epsilon-boundary rays where
an f32 DDA legitimately resolves hit/miss differently than f64 — the
same tie class test_traverse allows) stay <= 0.3%.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dust_tpu.config import RenderSettings
from dust_tpu.ops import camera as cameralib
from dust_tpu.ops import trace_ref
from dust_tpu.ops import packing as pk
from dust_tpu.ops import sky as skylib
from dust_tpu.ops.noise import load_blue_noise
from dust_tpu.render.pipeline import make_frame_state, render_frame
from dust_tpu.render.scene import build_device_scene
from dust_tpu.vox import procgen
from dust_tpu.vox.loader import load_vox_scene

W = H = 128


@pytest.fixture(scope="module")
def rig():
    vox_scene = load_vox_scene(procgen.teapot_scene_bytes())
    procgen.add_teapot(vox_scene, offset=(-20.0, 10.0, 35.0))
    scene = build_device_scene(vox_scene)
    flats = [vox_scene.geometries[m].flat for m in sorted(vox_scene.geometries)]
    geos = [vox_scene.geometries[m] for m in sorted(vox_scene.geometries)]
    palette = vox_scene.palette.astype(np.float64)
    mids = {m: i for i, m in enumerate(sorted(vox_scene.geometries))}
    insts = [
        (mids[i.model_id],
         np.linalg.inv(np.asarray(i.transform, np.float64)))
        for i in vox_scene.instances
    ]
    settings = RenderSettings(
        width=W, height=H,
        traversal_backend="jnp",
        shadow_mode="precise",
        contribution_secondary_skylight=False,
        contribution_secondary_spatial_hash=False,
        contribution_secondary_sunlight=False,
        gi_cache="dense",
    )
    c2w = cameralib.look_at((26.0, 26.0, 58.0), (-8.0, 0.0, 12.0))
    cam = cameralib.camera_settings(
        c2w, settings.camera.fov, settings.camera.near, settings.camera.far,
        W, H)
    return scene, flats, geos, insts, palette, settings, cam


def _oracle_radiance(flats, geos, insts, palette, settings, cam, sky_state):
    """The independent f64 derivation of the primary+NEE frame."""
    n = W * H
    dirs = np.asarray(cameralib.camera_ray_dirs(cam, W, H),
                      np.float64).reshape(-1, 3)
    orig = np.broadcast_to(np.asarray(cam.position, np.float64), dirs.shape)

    res = trace_ref.trace_rays_ref(flats, insts, orig, dirs,
                                   float(cam.near), float(cam.far))
    hit = res["inst"] >= 0
    inst = np.maximum(res["inst"], 0)
    row = np.maximum(res["row"], 0)
    bit = np.maximum(res["bit"], 0)

    # Scalar shading: normal + albedo from (inst, row, bit).
    o2w = np.stack([np.linalg.inv(w2o) for _, w2o in insts])
    w2o = np.stack([w for _, w in insts])
    model_of = np.asarray([m for m, _ in insts])

    t = np.where(hit, res["t"], 0.0)
    hit_w = orig + dirs * t[:, None]

    normal_w = np.zeros((n, 3))
    albedo = np.ones((n, 4))
    for r in np.flatnonzero(hit):
        ii = inst[r]
        m = model_of[ii]
        flat, geo = flats[m], geos[m]
        o = w2o[ii, :3, :3] @ orig[r] + w2o[ii, :3, 3]
        d = w2o[ii, :3, :3] @ dirs[r]
        p_obj = o + d * t[r]
        b = int(bit[r])
        off = np.array([(b >> 4) & 3, (b >> 2) & 3, b & 3])
        center = flat.leaf_origin[row[r]].astype(np.float64) + off + 0.5
        v = p_obj - center
        # CubedNormalize (headers/normal.glsl:40-43).
        a = np.abs(v)
        ax = int(np.argmax(a))
        n_obj = np.zeros(3)
        n_obj[ax] = np.sign(v[ax])
        nw = o2w[ii, :3, :3] @ n_obj
        normal_w[r] = nw / np.linalg.norm(nw)
        # Palette chain (hit.rchit:59-71): material_ptr + popcount below.
        m64 = (int(flat.mask_hi[row[r]]) << 32) | int(flat.mask_lo[row[r]])
        below = bin(m64 & ((1 << b) - 1)).count("1")
        mat_idx = int(flat.material_ptr[row[r]]) + below
        pal_idx = int(geo.materials[mat_idx])
        albedo[r, :3] = palette[pal_idx, :3] / 255.0

    # Sun NEE: shadow visibility via the same scalar tracer.
    sun = np.asarray(sky_state.direction, np.float64)
    ndotl = np.maximum(np.sum(normal_w * sun, axis=-1), 0.0)
    facing = (np.sum(normal_w * sun, axis=-1) > 0.0) & hit
    occluded = np.zeros(n, bool)
    sel = np.flatnonzero(facing)
    if sel.size:
        s_orig = hit_w[sel] + normal_w[sel] * 0.01
        s_dirs = np.broadcast_to(sun, (sel.size, 3))
        s_res = trace_ref.trace_rays_ref(flats, insts, s_orig, s_dirs,
                                         0.1, 10000.0)
        occluded[sel] = s_res["inst"] >= 0
    unocc = facing & ~occluded

    # Strength/sky mirror the pipeline's exact f32 expressions — and run
    # them through jit, because XLA's jitted lowering of the
    # transcendentals differs from eager evaluation by up to ~0.9%
    # relative (measured on CPU). Sky has its own bit-parity tests; this
    # test gates the COMPOSITION, so the shared sub-evals must not
    # inject lowering noise of their own.
    import jax

    @jax.jit
    def _shared(dirs32, sun32):
        dn = dirs32 / jnp.linalg.norm(dirs32, axis=-1, keepdims=True)
        sky_rad = (skylib.sky_radiance(sky_state, dn)
                   + skylib.sun_radiance(sky_state, dn))
        strength = skylib.sun_radiance(sky_state, sun32[None])[0] * (
            1.0 - jnp.cos(sky_state.solar_radius))
        return sky_rad, strength

    sky_rad, strength = _shared(jnp.asarray(dirs, jnp.float32),
                                jnp.asarray(sun, jnp.float32))
    sky_rad = np.asarray(sky_rad, np.float64)
    strength = np.asarray(strength, np.float64)
    direct = np.where(unocc[:, None], strength * ndotl[:, None], 0.0)
    radiance = np.where(hit[:, None], direct, sky_rad / 3.14)
    return radiance.reshape(H, W, 3), hit.reshape(H, W), \
        albedo.reshape(H, W, 4), normal_w.reshape(H, W, 3)


def test_full_frame_matches_scalar_derivation(rig):
    scene, flats, geos, insts, palette, settings, cam = rig
    sky_state = skylib.bake_sky(settings.sunlight)
    bn = load_blue_noise()
    state = make_frame_state(settings, scene)
    out, aux, state = render_frame(
        scene, state, cam, sky_state, bn.unitvec3_cosine, bn.scalar,
        settings)
    got = np.asarray(aux["radiance"], np.float64)
    got_alb = np.asarray(aux["albedo"], np.float64)
    got_n = np.asarray(aux["normal"], np.float64)

    want, hit, alb, normal = _oracle_radiance(
        flats, geos, insts, palette, settings, cam, sky_state)

    # Sanity: the frame must actually exercise geometry + shadowing.
    assert 0.1 < hit.mean() < 0.95, hit.mean()

    # Relative per-channel deviation (radiance spans ~0..25; a
    # compositional bug shifts whole terms, i.e. O(1) relative error).
    d = (np.abs(got - want) / (1.0 + np.abs(want))).max(axis=-1)
    agree = d <= 1e-3
    assert agree.mean() >= 0.997, (
        f"{(~agree).sum()} pixels ({(~agree).mean():.2%}) disagree "
        f"with the scalar derivation")
    rel = (got[agree] - want[agree]) / (1.0 + np.abs(want[agree]))
    rmse = float(np.sqrt(np.mean(rel ** 2)))
    assert rmse <= 1e-3, f"agreeing-pixel relative RMSE {rmse:.2e}"

    # Albedo + normal agree wherever the radiance path agreed and hit.
    m = agree & hit
    assert np.abs(got_alb[m][:, :3] - alb[m][:, :3]).max() <= 2e-3
    assert np.abs(got_n[m] - normal[m]).max() <= 2e-3
