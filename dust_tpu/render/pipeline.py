"""The per-frame render pipeline: one jit-compiled function.

Reference: ``StandardPipeline::render`` (``standard.rs:228-790``) — four
``trace_rays`` passes (primary / AO+sun-NEE / final-gather / surfel) over
the shared G-buffer and GI caches — followed by NRD denoising, histogram
auto-exposure and ACES tone mapping (``examples/castle.rs:180-218``).
Where the reference hand-declares barriers between passes, the data flow
below *is* the dependency graph and XLA schedules it.

Pass structure per frame (ray budget identical to the reference,
BASELINE.md: ≈9 M rays/frame at 1080p):

1. **primary** — precise trace from the camera; writes the G-buffer
   (albedo/depth/normal/motion/voxel-id); misses write sky radiance
   directly to the denoised output (``primary/miss.rmiss``).
2. **AO + sun NEE** — per hit pixel: one cosine-hemisphere ray traced to
   the 8-unit threshold (``ambient_occlusion.*``), one shadow ray to the
   sun adding ``sun_radiance·(1-cosΘ)·N·L`` on miss
   (``final_gather/nee.rmiss``). Deviation: shadow rays use the precise
   intersector rather than the reference's threshold variant (which
   hard-codes the 8.0 constant even for 10000-unit shadow rays).
3. **final gather** — pixels whose AO ray escaped continue the *same*
   cosine ray beyond the threshold with the rough intersector
   (``final_gather/*``): spatial-hash radiance at the hit leaf × leaf
   albedo, sky on miss, stochastic surfel enqueue.
4. **surfel** — every valid pool entry shoots one cosine + one sun-NEE
   ray from its patch (``surfel/*``) and inserts the result into the
   spatial hash at its own cell → multi-bounce GI accumulates across
   frames (SURVEY §3.5).
5. **post** — temporal+à-trous denoise (NRD replacement), histogram
   auto-exposure, ACES tonemap.
"""

from __future__ import annotations

import dataclasses

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dust_tpu.config import RenderSettings
from dust_tpu.ops import camera as cameralib
from dust_tpu.ops import denoise as denoiselib
from dust_tpu.ops import exposure as exposurelib
from dust_tpu.ops import gi_cache as gilib
from dust_tpu.ops import packing as pk
from dust_tpu.ops import shade
from dust_tpu.ops import sky as skylib
from dust_tpu.ops import spatial_hash as sh
from dust_tpu.ops import tonemap as tonemaplib
from dust_tpu.ops.traverse import trace_scene_tiled
from dust_tpu.utils import color as colorlib

__all__ = ["FrameState", "make_frame_state", "render_frame"]

INVALID_SURFEL = 7  # direction >= 6 marks an invalid pool entry (surfel.rgen:14)


class FrameState(NamedTuple):
    """Everything carried frame to frame (the reference's shared device
    state: GI cache + surfel pool buffers standard.rs:334-358, NRD
    history, auto-exposure average, frame counter, flip-flop camera)."""

    # GI radiance cache: sh.SpatialHash (gi_cache="hash") or
    # gilib.DenseGICache (gi_cache="dense").
    gi: object
    # Surfel pool packed as (P,4) float32 rows [x, y, z, face_id] — one
    # row scatter per enqueue pass (face ids 0-7 are exact in f32). In
    # dense mode the cell list replaces the pool and this is (0, 4).
    surfels: jnp.ndarray
    denoiser: denoiselib.DenoiserState
    exposure_avg: jnp.ndarray   # () float32
    frame_index: jnp.ndarray    # () int32
    prev_view_proj: jnp.ndarray  # (4,4) float32
    # Hash mode with ws_refresh_slices > 1: the persistent working set
    # (a gilib.DenseGICache over the scene's (instance, leaf, face)
    # cells) whose rotating slice re-probes each frame. None otherwise.
    gi_ws: object = None


def make_frame_state(settings: RenderSettings, scene=None) -> FrameState:
    if settings.gi_cache == "dense":
        if scene is None:
            raise ValueError("gi_cache='dense' sizes the cache from the "
                             "scene; pass make_frame_state(settings, scene)")
        gi = gilib.make_dense_gi_cache(scene)
        surfels = jnp.zeros((0, 4), jnp.float32)
    else:
        gi = sh.make_spatial_hash(settings.spatial_hash.capacity)
        p = settings.surfels.pool_size
        surfels = jnp.zeros((p, 4), jnp.float32).at[:, 3].set(
            float(INVALID_SURFEL))
    gi_ws = None
    if settings.gi_cache == "hash" and settings.spatial_hash.ws_refresh_slices > 1:
        if scene is None:
            raise ValueError("ws_refresh_slices > 1 keeps a persistent "
                             "working set sized from the scene; pass "
                             "make_frame_state(settings, scene)")
        gi_ws = gilib.make_dense_gi_cache(scene)
    half = (settings.denoiser.half_res_indirect
            and settings.height % 2 == 0 and settings.width % 2 == 0)
    div = 2 if half else 1
    return FrameState(
        gi=gi,
        surfels=surfels,
        denoiser=denoiselib.make_denoiser_state(settings.height // div,
                                                settings.width // div),
        exposure_avg=jnp.asarray(1.0, jnp.float32),
        frame_index=jnp.asarray(0, jnp.int32),
        prev_view_proj=jnp.eye(4, dtype=jnp.float32),
        gi_ws=gi_ws,
    )


def _pool_enqueue_mod(dest, mask, values):
    """Deterministic pool enqueue for the fixed mapping ``slot = i % size``
    (the reference's racy last-writer replaced by lowest-index-wins).

    Because the index pattern is static, the scatter collapses to a
    reshape + first-true reduction over ``ceil(n/size)`` rows — pure
    vector work, no sort/scatter (a 2M-candidate argsort costs ~180 ms on
    a v5e; this costs ~1 ms)."""
    size = dest.shape[0]
    n = mask.shape[0]
    k = -(-n // size)
    pad = k * size - n
    if pad:
        mask = jnp.concatenate([mask, jnp.zeros(pad, bool)])
        values = jnp.concatenate(
            [values, jnp.zeros((pad,) + values.shape[1:], values.dtype)])
    m = mask.reshape(k, size)
    v = values.reshape((k, size) + values.shape[1:])
    winner = jnp.argmax(m, axis=0)  # first True row (lowest pixel index)
    any_hit = jnp.any(m, axis=0)
    # Static select chain over the k rows (k is tiny; XLA keeps it all on
    # the VPU — take_along_axis would lower to a real gather).
    picked = v[0]
    for j in range(1, k):
        picked = jnp.where((winner == j)[:, None], v[j], picked)
    return jnp.where(any_hit[:, None], picked, dest)


def _cell_enumeration(scene):
    """World-space leaf centers + validity for every (instance, leaf)
    cell — the (instance, leaf_row, face) cell basis BOTH GI caches key
    by (leaf centers transform per instance; tiny static loop). Uses
    the cache's per-instance segment layout (gi_cache.cell_layout) and
    pads to dense_cells so the ×6-face expansion lines up row-for-row
    with the (sharded) cache table."""
    _, ccaps, _ = gilib.cell_layout(scene)
    centers, vleafs = [], []
    for i, m in enumerate(scene.inst_model):
        cc = ccaps[i]
        co = scene.leaf_origin[m, :cc].astype(jnp.float32) + 2.0  # (cc,3)
        o2w = scene.obj_to_world[i]
        cw = jnp.einsum("ij,nj->ni", o2w[:, :3], co,
                        precision="highest") + o2w[:, 3]
        centers.append(cw)
        vleafs.append((scene.mask_lo[m, :cc] | scene.mask_hi[m, :cc]) != 0)
    centers = jnp.concatenate(centers)
    vleafs = jnp.concatenate(vleafs)
    pad = gilib.dense_cells(scene) - centers.shape[0]
    if pad:
        centers = jnp.concatenate(
            [centers, jnp.zeros((pad, 3), centers.dtype)])
        vleafs = jnp.concatenate([vleafs, jnp.zeros(pad, bool)])
    return centers, vleafs


def _pcg_scalar(v):
    v = v.astype(jnp.uint32)
    state = v * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> 28) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return ((word >> 22) ^ word).astype(jnp.int32) & 0x7FFF


@partial(jax.jit,
         static_argnames=("settings", "tile", "ray_sharding", "return_aux"),
         donate_argnames=("state",))
def render_frame(
    scene,
    state: FrameState,
    cam: cameralib.CameraSettings,
    sky_state: skylib.SkyModelState,
    bn_cosine: jnp.ndarray,   # (64,128,128,3) unitvec3_cosine table
    bn_scalar: jnp.ndarray,   # (64,128,128,1) scalar table
    settings: RenderSettings,
    tile: int = 16384,
    ray_sharding=None,
    return_aux: bool = True,
):
    """Render one frame. Returns (output_srgb (H,W,3), aux dict, new state).

    ``ray_sharding``: optional ``jax.sharding.NamedSharding`` over the flat
    ray axis — the multi-chip path (SURVEY §2.9): rays tile-sharded across
    the mesh, scene pools replicated, GI-cache updates resolved by XLA's
    SPMD partitioner (GSPMD inserts the all-gathers for the replicated
    hash scatter and the halo exchanges for the à-trous shifts). When
    sharded, tracing is untiled — the mesh is the tiling.
    """
    H, W = settings.height, settings.width
    n = H * W
    frame_index = state.frame_index
    rand = _pcg_scalar(frame_index)

    def shard(x):
        if ray_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, ray_sharding)

    use_pallas = settings.traversal_backend == "pallas"

    def trace(scene_, o, d, tn, tx, mode):
        if use_pallas:
            from dust_tpu.ops.pallas_trace import trace_scene_pallas
            if ray_sharding is None:
                return trace_scene_pallas(scene_, o, d, tn, tx, mode=mode)
            # Multi-chip fast path (SURVEY §2.9): the mesh IS the outer
            # tiling — shard_map runs the Pallas kernel per device on its
            # local ray shard with the scene tables replicated, so tracing
            # needs zero collectives and scales linearly over ICI.
            from jax.sharding import PartitionSpec as P
            shard_map = jax.shard_map
            n_ = o.shape[0]
            nd = ray_sharding.mesh.size
            pad = (-n_) % nd
            tn_ = jnp.broadcast_to(jnp.asarray(tn, jnp.float32), (n_,))
            tx_ = jnp.broadcast_to(jnp.asarray(tx, jnp.float32), (n_,))
            if pad:  # ray counts must split evenly over the mesh
                o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
                d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
                tn_ = jnp.concatenate([tn_, jnp.zeros((pad,), jnp.float32)])
                tx_ = jnp.concatenate(
                    [tx_, jnp.full((pad,), -1.0, jnp.float32)])  # inactive
            spec = ray_sharding.spec
            scene_specs = jax.tree.map(lambda _: P(), scene_)
            local = partial(trace_scene_pallas, mode=mode)
            res = shard_map(
                local, mesh=ray_sharding.mesh,
                in_specs=(scene_specs, spec, spec, spec, spec),
                out_specs=spec, check_vma=False,
            )(scene_, o, d, tn_, tx_)
            if pad:
                res = jax.tree.map(lambda x: x[:n_], res)
            return res
        if ray_sharding is None:
            return trace_scene_tiled(scene_, o, d, tn, tx, mode=mode, tile=tile)
        from dust_tpu.ops.traverse import trace_scene
        return trace_scene(scene_, o, d, tn, tx, mode=mode)

    # -------------------------------------------------- raygen
    # With the Pallas backend, rays are processed in 32x128-pixel tiles so
    # each kernel program sees a spatially coherent bundle (2x faster than
    # raster order, measured). ``to_tiles``/``from_tiles`` are pure
    # reshapes/transposes - no gathers.
    tiled = use_pallas and H % 8 == 0 and W % 128 == 0

    def to_tiles(img2d):
        if not tiled:
            return img2d.reshape((n,) + img2d.shape[2:])
        x = img2d.reshape((H // 8, 8, W // 128, 128) + img2d.shape[2:])
        x = jnp.moveaxis(x, 2, 0)
        return x.reshape((n,) + img2d.shape[2:])

    def from_tiles(flat):
        if not tiled:
            return flat.reshape((H, W) + flat.shape[1:])
        x = flat.reshape((W // 128, H // 8, 8, 128) + flat.shape[1:])
        x = jnp.moveaxis(x, 0, 2)
        return x.reshape((H, W) + flat.shape[1:])

    dirs = to_tiles(cameralib.camera_ray_dirs(cam, W, H))
    origins = jnp.broadcast_to(cam.position, (n, 3))
    layer = frame_index % bn_cosine.shape[0]

    def bn_fetch(table, offset):
        """Noise value per pixel: ``table[layer, (py+oy+rand)%S, (px+ox+
        rand)%S]``. The pattern is the layer tiled periodically with a
        shift, so instead of a 2M-element gather (+ a whole-table VMEM
        prefetch, ~30 ms/frame measured) it is a dynamic-slice + roll +
        tile — pure data movement."""
        th, tw = table.shape[1], table.shape[2]
        page = jax.lax.dynamic_index_in_dim(table, layer, axis=0,
                                            keepdims=False)
        sy = (offset[1] + rand) % th
        page = jnp.roll(page, shift=(-sy, -(offset[0] + rand) % tw),
                        axis=(0, 1))
        reps_y, reps_x = -(-H // th), -(-W // tw)
        img = jnp.tile(page, (reps_y, reps_x, 1))[:H, :W]
        return to_tiles(img)

    # -------------------------------------------------- 1. primary
    dirs = shard(dirs)
    origins = shard(origins)
    primary = trace(scene, origins, dirs, cam.near, cam.far, "precise")
    g = shade.resolve_hits(scene, primary, origins, dirs)
    # Registered-material dispatch (render/materials.py): identity (zero
    # traced ops) unless the scene carries non-palette instances.
    from dust_tpu.render import materials as matlib
    g, mat_emissive = matlib.apply_materials(
        g, settings.instance_materials)
    hit = g["hit"]

    dirs_n = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    # (A quarter-res sky eval + bilinear upsample was measured: the
    # upsample's conv/relayout chain costs MORE than the saved eval —
    # the Hosek eval itself is already mostly cheap VPU math.)
    sky_primary = skylib.sky_radiance(sky_state, dirs_n) + skylib.sun_radiance(
        sky_state, dirs_n
    )
    # miss.rmiss: sky / 3.14 straight into the denoised output.
    sky_out = sky_primary / 3.14

    # -------------------------------------------------- 2. AO + sun NEE
    normal = g["normal"]
    hit_loc = g["world_pos"] + normal * 0.01
    illum = jnp.zeros((n, 3))

    sun_dir = sky_state.direction
    direct = mat_emissive  # deterministic emission joins the direct channel
    if settings.contribution_direct:
        facing = (jnp.sum(normal * sun_dir, axis=-1) > 0.0) & hit
        sun_rays = shard(jnp.broadcast_to(sun_dir, (n, 3)))
        s_tmax = jnp.where(facing, 10000.0, -1.0)
        sthr = settings.ambient_occlusion_threshold
        if settings.shadow_mode == "reference":
            # The reference shoots its sun-NEE rays through the AO
            # pipeline (standard.rs:557-617 + ambient_occlusion.rint):
            # precise voxel DDA within the 8-unit threshold, any
            # occupied LEAF reports at entry beyond it. Block-granular
            # distant occlusion, and no leaf-mask fetches past the
            # threshold (~2x cheaper than the precise 10000-unit walk).
            if use_pallas and ray_sharding is None:
                from dust_tpu.ops.pallas_trace import (
                    trace_scene_pallas_ao_fg)
                s_ao, s_fg = trace_scene_pallas_ao_fg(
                    scene, hit_loc, sun_rays, 0.1,
                    jnp.where(facing, sthr, -1.0), s_tmax)
                occluded = s_ao.hit | s_fg.hit
            else:
                s_near = trace(scene, hit_loc, sun_rays, 0.1,
                               jnp.where(facing, sthr, -1.0),
                               "ao_threshold")
                s_far = trace(scene, hit_loc, sun_rays, sthr, s_tmax,
                              "rough")
                occluded = s_near.hit | s_far.hit
        else:  # "precise": pixel-exact occlusion at any distance
            occluded = trace(scene, hit_loc, sun_rays, 0.1, s_tmax,
                             "precise").hit
        unoccluded = facing & ~occluded
        strength = skylib.sun_radiance(sky_state, sun_dir[None])[0] * (
            1.0 - jnp.cos(sky_state.solar_radius)
        )
        ndotl = jnp.maximum(jnp.sum(normal * sun_dir, axis=-1), 0.0)
        direct = direct + jnp.where(
            unoccluded[:, None], strength * ndotl[:, None], 0.0
        )

    # Cosine GI direction, shared by AO and final gather (both passes fetch
    # blue_noise[5] with offset (7,183): ambient_occlusion.rgen:27,
    # final_gather.rgen:31).
    cos_sample = bn_fetch(bn_cosine, (7, 183)) * 2.0 - 1.0
    gi_dir = pk.rotate_vector_by_normal(normal, cos_sample)
    gi_dir = jnp.where(hit[:, None], gi_dir, jnp.asarray([0.0, 1.0, 0.0]))

    thr = settings.ambient_occlusion_threshold
    dense = settings.gi_cache == "dense"
    new_gi_ws = state.gi_ws
    # Reference parity: the CONTRIBUTION_* defines are compile-time — with
    # every secondary contribution off, the AO/FG/surfel dispatches do not
    # exist in the reference's pipeline either, so the whole GI chain is
    # statically removed here too (the "primary+shadow" BASELINE config).
    gi_enabled = (settings.contribution_secondary_spatial_hash
                  or settings.contribution_secondary_skylight
                  or settings.debug_visualize_spatial_hash)
    # (A fused AO+FG cosine walk — trace_scene_pallas_ao_fg on the GI
    # ray — was selectable through round 4; measured 2.5 ms SLOWER than
    # the split passes at 1080p and pruned. The kernel mode survives for
    # the reference sun-shadow path above. Record: ARCHITECTURE.md.)
    if not gi_enabled:
        # Primary+shadow configuration: no AO/FG/surfel dispatches exist
        # (CONTRIBUTION_* parity, see above).
        ao_hit = jnp.zeros(n, bool)
        fg_hit = jnp.zeros(n, bool)
        hitdist = jnp.where(hit, 0.0, 100000.0)
        radiance_img = jnp.where(hit[:, None], direct + illum, sky_out)
        surfels = state.surfels
        new_gi = state.gi
    else:
        ao = trace(scene, hit_loc, gi_dir, 0.1, jnp.where(hit, thr, -1.0),
                   "ao_threshold")
        ao_hit = ao.hit

        # ---------------------------------------------- 3. final gather
        fg_active = hit & ~ao_hit
        fg = trace(scene, hit_loc, gi_dir, thr,
                   jnp.where(fg_active, cam.far, -1.0), "rough")
        fg_hit = fg_active & fg.hit
    if gi_enabled:
        if dense:
            gi_reads = state.gi
            if ray_sharding is not None:
                # Multi-chip: the table lives row-sharded (insert is
                # shard-local, see shard_frame_state), but ray-side GETs
                # index it randomly — without a constraint GSPMD lowers
                # each gather as partial-gathers + an all-reduce over the
                # (2M, 3) OUTPUT (~25 MB/frame at 1080p). Replicating the
                # read view instead costs one table all-gather (~MBs).
                from jax.sharding import NamedSharding, PartitionSpec
                rep = NamedSharding(ray_sharding.mesh, PartitionSpec())
                gi_reads = gilib.DenseGICache(
                    table=jax.lax.with_sharding_constraint(
                        state.gi.table, rep))
        else:
            # Per-frame WORKING SET of the hash (TPU-first): ONE
            # hash_get per (instance, leaf, face) cell of the loaded
            # scene, packed into dense-cache rows, so every ray-side GI
            # read below is the same small-table row gather as dense
            # mode. Semantically identical to per-ray hash_get — reads
            # see the PRE-insert table in both designs (inserts land at
            # frame end) — but the ~200k-cell build replaces ~2.4M
            # random probes of the 256+ MB table (measured ~80 ms/frame
            # at 2²⁴ capacity; the build costs ~3 ms).
            centers_w, vleaf = _cell_enumeration(scene)
            cellq = jnp.trunc(
                centers_w / settings.spatial_hash.cell_size).astype(jnp.int32)
            # Face-major, row-aligned with the gi_cache layout (the
            # packed working set is read through dense_index).
            Cw = centers_w.shape[0]
            qpos6 = jnp.tile(cellq, (6, 1))
            face6 = jnp.broadcast_to(
                jnp.arange(6, dtype=jnp.int32)[:, None], (6, Cw)).reshape(-1)
            valid6 = jnp.tile(vleaf, 6)
            nslices = settings.spatial_hash.ws_refresh_slices
            if nslices > 1 and state.gi_ws is not None:
                # Rotating re-probe: only 1/N of the working set pays the
                # big-table probe this frame (the probe is row-count
                # bound, ~30 ms for 1.3M cells at 2^24+ capacity); the
                # rest serves its last-probed value from state.gi_ws.
                # See SpatialHashSettings.ws_refresh_slices for why this
                # is the reference's own staleness class.
                rows_total = qpos6.shape[0]
                S = -(-rows_total // nslices)
                start = jnp.minimum(
                    (frame_index % nslices) * S, rows_total - S
                ).astype(jnp.int32)
                q_s = jax.lax.dynamic_slice(qpos6, (start, 0), (S, 3))
                f_s = jax.lax.dynamic_slice(face6, (start,), (S,))
                v_s = jax.lax.dynamic_slice(valid6, (start,), (S,))
                w_found, w_rad, w_cnt = sh.hash_get(state.gi, q_s, f_s)
                w_cnt = jnp.where(w_found & v_s, w_cnt, 0)
                tab = state.gi_ws.table
                alb_s = jax.lax.dynamic_slice(
                    tab, (start, jnp.int32(2)), (S, 1))
                slice_rows = gilib.pack_working_set_rows(w_rad, w_cnt, alb_s)
                tab = jax.lax.dynamic_update_slice(
                    tab, slice_rows, (start, jnp.int32(0)))
                gi_reads = gilib.DenseGICache(table=tab)
                new_gi_ws = gi_reads
            else:
                w_found, w_rad, w_cnt = sh.hash_get(state.gi, qpos6, face6)
                w_cnt = jnp.where(w_found & valid6, w_cnt, 0)
                gi_reads = gilib.pack_working_set(w_rad, w_cnt, scene)

        # Face computed analytically from the entry geometry and albedo
        # riding in the cache row — no leaf-row gather at all
        # (shade.entry_face + gi_cache layout docs).
        face = shade.entry_face(scene, fg, hit_loc, gi_dir)
        found, cached, cnt, alb_u32 = gilib.dense_get(
            gi_reads, gilib.dense_index(scene, fg.inst, fg.row, face),
            fg_hit)
        from dust_tpu.vox.geometry import unpack_r10g10b10a2
        fg_albedo = unpack_r10g10b10a2(alb_u32, xp=jnp)
        albedo_lin = colorlib.srgb_eotf(fg_albedo[:, :3], xp=jnp)
        indirect = colorlib.srgb_to_acescg(
            colorlib.acescg_to_srgb(cached, xp=jnp) * albedo_lin, xp=jnp
        )
        if settings.contribution_secondary_spatial_hash:
            illum = illum + jnp.where(fg_hit[:, None], indirect, 0.0)
        if settings.contribution_secondary_skylight:
            gi_sky = skylib.sky_radiance(sky_state, gi_dir)
            illum = illum + jnp.where((fg_active & ~fg.hit)[:, None], gi_sky, 0.0)

        if dense:
            # Dense mode refreshes EVERY cell each frame — no scarce pool to
            # schedule, so the stochastic enqueue disappears entirely.
            surfels = state.surfels
        else:
            # Stochastic surfel enqueue (final_gather.rchit:56-67); the
            # enqueued cell center reconstructs analytically from the
            # hit geometry (entry_leaf_center) instead of a leaf-row
            # gather.
            p_sched = 1.0 / (cnt.astype(jnp.float32) + 2.0)
            noise0 = bn_fetch(bn_scalar, (34, 21))[:, 0]
            enqueue = fg_hit & (noise0 > p_sched)
            center_fg = shade.entry_leaf_center(scene, fg, hit_loc, gi_dir)
            enq_rows = jnp.concatenate(
                [center_fg, face.astype(jnp.float32)[:, None]], axis=-1)
            # Pool slot = pixel % pool_size (surfel.rgen flat launch id mapping).
            surfels = _pool_enqueue_mod(state.surfels, enqueue, enq_rows)
        if settings.debug_visualize_spatial_hash:
            # hit.rchit DEBUG path: look the primary hit's cell up in the GI
            # cache and display the cached radiance with the leaf avg albedo.
            dbg_leaf = shade.leaf_attributes(scene, primary, origins, dirs,
                                             settings.spatial_hash.cell_size)
            if dense:
                _, dbg_rad, _, _dbg_alb = gilib.dense_get(
                    gi_reads,
                    gilib.dense_index(scene, primary.inst, primary.row,
                                      dbg_leaf["face"]), hit)
            else:
                _, dbg_rad, _ = sh.hash_get(state.gi, dbg_leaf["qpos"],
                                            dbg_leaf["face"])
            illum = jnp.where(hit[:, None], dbg_rad, illum)

        # Radiance + hit distance image (REBLUR packing semantics).
        # ao.rchit stores gl_HitTEXT for any hit (the 0xFF report-at-entry mode
        # only changes *where* the intersector reports, already folded into ao.t).
        # ``illum`` holds the stochastic INDIRECT signal; ``direct`` (sun NEE)
        # is deterministic and composed after denoising on the half-res path.
        hitdist = jnp.where(ao_hit, ao.t, 0.0)
        hitdist = jnp.where(fg_hit, fg.t, hitdist)
        radiance_img = jnp.where(hit[:, None], direct + illum, sky_out)
        hitdist = jnp.where(hit, hitdist, 100000.0)

        # -------------------------------------------------- 4. surfel pass
        if dense:
            # Dense mode: the "pool" is the static cell list (instance,
            # leaf_row, face) — every cell patches itself every frame;
            # normals are world-space cube faces, exactly surfel.rgen's
            # geometry.
            centers_w, vleaf = _cell_enumeration(scene)
            # Face-major pool (row = face*cells + cell, the gi_cache row
            # layout): each 1024-ray tile is ~one face over consecutive
            # hierarchy-order cells — coherent cosine hemisphere, and
            # sun-NEE dead tiles skip the march whole (surfel_sim.py:
            # 83/171 canonical NEE tiles dead vs 0 cell-major). tile/
            # broadcast also avoids jnp.repeat's scalar relayout path.
            C = centers_w.shape[0]
            surfel_pos = jnp.tile(centers_w, (6, 1))
            surfel_dir = jnp.broadcast_to(
                jnp.arange(6, dtype=jnp.int32)[:, None], (6, C)).reshape(-1)
            s_valid = jnp.tile(vleaf, 6)
            # Refresh-budget cap (SurfelSettings.dense_refresh_budget):
            # big scenes patch a rotating contiguous slice per frame so
            # the surfel-pass ray count stays fixed like the reference's
            # 720x480 pool instead of scaling with instances x leaves.
            rows_total = surfel_pos.shape[0]
            budget = settings.surfels.dense_refresh_budget
            if budget and rows_total > budget:
                nslices = -(-rows_total // budget)
                slice_start = jnp.minimum(
                    (frame_index % nslices) * budget,
                    rows_total - budget).astype(jnp.int32)
                surfel_pos = jax.lax.dynamic_slice(
                    surfel_pos, (slice_start, 0), (budget, 3))
                surfel_dir = jax.lax.dynamic_slice(
                    surfel_dir, (slice_start,), (budget,))
                s_valid = jax.lax.dynamic_slice(
                    s_valid, (slice_start,), (budget,))
            else:
                slice_start = None
                # Multi-chip: the cell list is row-aligned with the
                # (row-sharded) cache table, so pinning the surfel rays
                # to the same shards makes the whole refresh — trace,
                # shade, running-mean insert — collective-free (each
                # device owns 1/N of the rows end to end).
                surfel_pos = shard(surfel_pos)
                surfel_dir = shard(surfel_dir)
                s_valid = shard(s_valid)
            p = surfel_pos.shape[0]
            s_normal = pk.face_id_to_normal(surfel_dir)
        else:
            pool_total = surfels.shape[0]
            pbudget = settings.surfels.pool_refresh_budget
            if pbudget and pool_total > pbudget:
                # Rotating pool slice (SurfelSettings.pool_refresh_budget):
                # only `pbudget` slots trace refresh rays this frame. The
                # reference's own per-slot refresh is stochastic-every-
                # few-frames (p = 1/(count+2) re-enqueue), so the rotation
                # changes scheduling determinism, not the staleness class.
                pn = -(-pool_total // pbudget)
                pool_start = jnp.minimum(
                    (frame_index % pn) * pbudget,
                    pool_total - pbudget).astype(jnp.int32)
                pool_rows = jax.lax.dynamic_slice(
                    surfels, (pool_start, 0), (pbudget, 4))
            else:
                pool_start = None
                pool_rows = surfels
            p = pool_rows.shape[0]
            surfel_pos = pool_rows[:, :3]
            surfel_dir = pool_rows[:, 3].astype(jnp.int32)
            s_valid = surfel_dir < 6
            s_normal = pk.face_id_to_normal(jnp.minimum(surfel_dir, 5))
        s_origin = surfel_pos + 2.01 * s_normal

        def bn_fetch_pool(table, offset):
            """Noise per pool slot (slot i <-> texel (i%W, i//W % H), the
            surfel.rgen flat-launch mapping): like bn_fetch, the pattern
            is the rolled layer tiled periodically — roll + tile + slice
            replaces a pool-sized gather (~2 ms/frame at 345k slots)."""
            th, tw = table.shape[1], table.shape[2]
            page = jax.lax.dynamic_index_in_dim(table, layer, axis=0,
                                                keepdims=False)
            sy = (offset[1] + rand) % th
            page = jnp.roll(page, shift=(-sy, -(offset[0] + rand) % tw),
                            axis=(0, 1))
            reps = -(-p // (th * tw))
            return jnp.tile(page.reshape(th * tw, -1), (reps, 1))[:p]

        s_cos = bn_fetch_pool(bn_cosine, (16, 47)) * 2.0 - 1.0
        s_dir = pk.rotate_vector_by_normal(s_normal, s_cos)

        s_payload = jnp.zeros((p, 3))
        if settings.contribution_secondary_sunlight:
            s_facing = (jnp.sum(s_normal * sun_dir, axis=-1) > 0.0) & s_valid
            s_shadow = trace(
                scene, s_origin, jnp.broadcast_to(sun_dir, (p, 3)),
                0.1, jnp.where(s_facing, 10000.0, -1.0), "rough",
            )
            s_unocc = s_facing & ~s_shadow.hit
            strength = skylib.sun_radiance(sky_state, sun_dir[None])[0] * (
                1.0 - jnp.cos(sky_state.solar_radius)
            )
            s_ndotl = jnp.maximum(jnp.sum(s_normal * sun_dir, axis=-1), 0.0)
            s_payload = s_payload + jnp.where(
                s_unocc[:, None], strength * s_ndotl[:, None], 0.0
            )

        s_res = trace(scene, s_origin, s_dir, 0.1,
                      jnp.where(s_valid, 10000.0, -1.0), "rough")
        s_hit = s_valid & s_res.hit
        s_face = shade.entry_face(scene, s_res, s_origin, s_dir)
        s_found, s_cached, s_cnt, s_alb_u32 = gilib.dense_get(
            gi_reads,
            gilib.dense_index(scene, s_res.inst, s_res.row, s_face),
            s_hit)
        s_albedo = unpack_r10g10b10a2(s_alb_u32, xp=jnp)
        s_albedo_lin = colorlib.srgb_eotf(s_albedo[:, :3], xp=jnp)
        s_bounce = colorlib.srgb_to_acescg(
            colorlib.acescg_to_srgb(s_cached, xp=jnp) * s_albedo_lin, xp=jnp
        )
        s_sky = skylib.sky_radiance(sky_state, s_dir / jnp.maximum(
            jnp.linalg.norm(s_dir, axis=-1, keepdims=True), 1e-8))

        # Insert at the *surfel's own* cell: hit+found -> bounced radiance;
        # miss -> sky (surfel.rchit:80-90, surfel.rmiss:15-24).
        insert_val = jnp.where(
            s_hit[:, None], s_bounce + s_payload, s_sky + s_payload
        )
        insert_ok = s_valid & (~s_hit | s_found)
        if dense:
            # Elementwise running-mean update — pool row i IS cache row i
            # (or the budgeted slice of it).
            if slice_start is not None:
                new_gi = gilib.dense_update_slice(
                    state.gi, slice_start, insert_val, insert_ok)
            else:
                new_gi = gilib.dense_update(state.gi, insert_val, insert_ok)
        else:
            s_qpos = jnp.trunc(
                surfel_pos / settings.spatial_hash.cell_size).astype(jnp.int32)
            new_gi = sh.hash_insert(
                state.gi, s_qpos, jnp.minimum(surfel_dir, 5), insert_val,
                frame_index, valid=insert_ok,
                max_updates=settings.spatial_hash.insert_cap or None,
            )

            # Hit-but-not-found: stochastically enqueue the hit cell
            # (surfel.rchit:95-105). Dense mode needs no requeue — the hit
            # cell is already in the cell list and refreshes every frame.
            s_noise = bn_fetch_pool(bn_scalar, (114, 40))[:, 0]
            s_p = 1.0 / (s_cnt.astype(jnp.float32) + 2.0)
            s_requeue = s_hit & ~s_found & (s_noise > s_p)
            s_center = shade.entry_leaf_center(scene, s_res, s_origin, s_dir)
            rq_rows = jnp.concatenate(
                [s_center, s_face.astype(jnp.float32)[:, None]], axis=-1)
            # Slot i requeues into itself: the scatter is an elementwise select.
            if pool_start is not None:
                upd = jnp.where(s_requeue[:, None], rq_rows, pool_rows)
                surfels = jax.lax.dynamic_update_slice(
                    surfels, upd, (pool_start, jnp.int32(0)))
            else:
                surfels = jnp.where(s_requeue[:, None], rq_rows, surfels)

    # -------------------------------------------------- 5. post
    half = settings.denoiser.half_res_indirect and H % 2 == 0 and W % 2 == 0
    dep2 = from_tiles(g["depth"])
    nor2 = from_tiles(normal)
    if not gi_enabled:
        # Direct lighting is deterministic — nothing to denoise.
        denoised = from_tiles(radiance_img)
        acc_hd = from_tiles(hitdist)
        new_den = state.denoiser
    elif not half:
        if settings.denoiser.split_direct:
            # Full-res split: only the stochastic indirect rides the
            # temporal chain; deterministic direct composes after — the
            # same estimator as the half-res path at full resolution
            # (the resolution-error control in tests/test_quality.py).
            ind2 = from_tiles(jnp.where(hit[:, None], illum, 0.0))
            den_i, acc_hd, new_den = denoiselib.denoise(
                state.denoiser, ind2, from_tiles(hitdist), dep2, nor2,
                from_tiles(g["world_pos"]), from_tiles(g["motion"]),
                state.prev_view_proj, settings.denoiser,
            )
            valid2 = jnp.isfinite(dep2)
            denoised = jnp.where(valid2[..., None], den_i, 0.0) + from_tiles(
                jnp.where(hit[:, None], direct, sky_out))
        else:
            # Reference-lumped path: direct + indirect through the
            # denoiser together (what NRD REBLUR receives in standard.rs).
            denoised, acc_hd, new_den = denoiselib.denoise(
                state.denoiser,
                from_tiles(radiance_img),
                from_tiles(hitdist),
                dep2, nor2,
                from_tiles(g["world_pos"]),
                from_tiles(g["motion"]),
                state.prev_view_proj,
                settings.denoiser,
            )
    else:
        # Half-res indirect: only the stochastic channel pays for the
        # temporal chain; the zero-variance sun NEE composes at full res
        # (see DenoiserSettings.half_res_indirect).
        ind2 = from_tiles(jnp.where(hit[:, None], illum, 0.0))
        rh, hh, dh, nh, wh, mh = denoiselib.downsample_inputs(
            ind2, from_tiles(hitdist), dep2, nor2,
            from_tiles(g["world_pos"]), from_tiles(g["motion"]))
        # One fewer a-trous iteration at half res: N iterations span
        # 2^N half-pixels = 2^(N+1) FULL pixels, so running the full-res
        # count doubles the blur footprint in world terms (measured as a
        # ~2x interior RMSE penalty vs the full-res path).
        den_settings = dataclasses.replace(
            settings.denoiser,
            atrous_iterations=max(settings.denoiser.atrous_iterations - 1, 1))
        den_h, hd_h, new_den = denoiselib.denoise(
            state.denoiser, rh, hh, dh, nh, wh, mh,
            state.prev_view_proj, den_settings,
        )
        ind_full, acc_hd = denoiselib.upsample_bilateral(
            den_h, hd_h, dh, nh, dep2, nor2)
        valid2 = jnp.isfinite(dep2)
        denoised = jnp.where(valid2[..., None], ind_full, 0.0) + from_tiles(
            jnp.where(hit[:, None], direct, sky_out))

    weighted = exposurelib.mean_bin(denoised, settings.exposure)
    new_avg = exposurelib.adapt_average_luminance(
        None, state.exposure_avg, n, settings.exposure, weighted=weighted
    )
    exposure = exposurelib.exposure_value(new_avg)

    albedo_img = from_tiles(g["albedo"][:, :3])
    output = tonemaplib.tonemap(denoised, albedo_img, exposure, transfer="srgb")

    # G-buffer channels are jit OUTPUTS: returning them forces XLA to
    # materialise every image in HBM in output layout even if the caller
    # drops them. Benchmarks/headless loops pass return_aux=False.
    aux = dict(
        depth=from_tiles(g["depth"]),
        albedo=albedo_img,
        normal=from_tiles(normal),
        motion=from_tiles(g["motion"]),
        voxel_id=from_tiles(g["voxel_id"]),
        radiance=from_tiles(radiance_img),
        hitdist=from_tiles(hitdist),
        denoised=denoised,
        exposure=exposure,
    ) if return_aux else {}

    new_state = FrameState(
        gi=new_gi,
        surfels=surfels,
        denoiser=new_den,
        exposure_avg=new_avg,
        frame_index=frame_index + 1,
        prev_view_proj=cam.view_proj,
        gi_ws=new_gi_ws,
    )
    return output, aux, new_state
