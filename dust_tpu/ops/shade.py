"""Hit-attribute resolution: everything ``hit.rchit`` computes per pixel.

Reference: ``assets/shaders/primary/hit.rchit`` (popcount-compacted
material lookup, cube-face normal, voxel-id pack, previous-frame motion
reprojection) and the leaf-level attribute reads shared by
``final_gather.rchit`` / ``surfel.rchit`` (avg-albedo unpack, spatial-hash
keys from leaf centres).

All functions are batched over rays and gather from the
:class:`~dust_tpu.render.scene.DeviceScene` pools.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dust_tpu.ops import packing as pk
from dust_tpu.vox.geometry import unpack_r10g10b10a2

__all__ = ["resolve_hits", "leaf_attributes", "entry_face",
           "entry_leaf_center", "HitAttributes"]


def _popcount32(x):
    return jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.int32)


def _inst_xform(arrs, inst, p, with_translation):
    """Apply per-ray instance affines by static select over the (tiny)
    instance list — elementwise selects beat a (N,3,4) gather + batched
    einsum by an order of magnitude on TPU. The 3x3 apply itself is
    written as scalar-broadcast mul/adds (VPU): an einsum lowers to the
    MXU where a (N,3)@(3,3) pads 3->128 lanes both ways — measured
    ~0.4 ms/einsum at 2M rays vs ~0.05 ms for the 15 vector ops."""
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]

    def apply(i):
        m = arrs[i]
        o = [m[0, 0] * px + m[0, 1] * py + m[0, 2] * pz,
             m[1, 0] * px + m[1, 1] * py + m[1, 2] * pz,
             m[2, 0] * px + m[2, 1] * py + m[2, 2] * pz]
        if with_translation:
            o = [o[k] + m[k, 3] for k in range(3)]
        return o

    out = apply(0)
    for i in range(1, arrs.shape[0]):
        cand = apply(i)
        sel = inst == i
        out = [jnp.where(sel, cand[k], out[k]) for k in range(3)]
    return jnp.stack(out, axis=-1)


def resolve_hits(scene, res, origin_w, dir_w):
    """Per-pixel primary-hit attributes (hit.rchit:16-95).

    Args:
      res: TraceResult from a precise trace.
      origin_w/dir_w: (N,3) the world rays that produced it.

    Returns a dict of (N,...) arrays; miss lanes carry the reference miss
    values (albedo 1, depth inf, motion 0 — miss.rmiss:10-16).
    """
    n = res.t.shape[0]
    hit = res.inst >= 0
    inst = jnp.maximum(res.inst, 0)
    # Flat leaf-table row: per-model segment base + leaf row (the
    # per-instance base tuple is static; one tiny-table gather).
    flat_row = jnp.asarray(scene.inst_leaf_base, jnp.int32)[inst] \
        + jnp.maximum(res.row, 0)

    # ONE row gather for everything primary shading needs: the
    # denormalised voxel_attr table (16 voxels per 64 B row) replaces
    # the reference's two-step leaf_attr -> popcount -> material_rgba
    # chain (hit.rchit:59-71); the popcount compaction is pre-applied
    # host-side. 64 B rows are free (gather cost is per row) and the
    # word select below fuses into the gather's consumer.
    bit = jnp.maximum(res.bit, 0)
    vid = flat_row * 64 + bit
    prow = jnp.take(scene.voxel_attr, vid >> 4, axis=0, mode="clip")
    # Exactly-one-hot select expressed as a masked minor-axis sum: a
    # where-chain over prow[:, c] column slices makes XLA transpose the
    # (N,16) gather output to channel-planar first (~3 ms of relayout);
    # the masked reduce fuses into the gather consumer in row-major.
    w16 = vid & 15
    rgba = jnp.sum(
        jnp.where(w16[:, None] == jnp.arange(16, dtype=jnp.int32), prow, 0),
        axis=1).astype(jnp.uint32)

    # Object-space hit point: transform the world ray per instance.
    o_obj = _inst_xform(scene.world_to_obj, inst, origin_w, True)
    d_obj = _inst_xform(scene.world_to_obj, inst, dir_w, False)
    t = jnp.where(hit, res.t, 0.0)
    hit_obj = o_obj + d_obj * t[:, None]

    # Voxel bit -> offset in box (hit.rchit:21).
    off = jnp.stack([(bit >> 4) & 3, (bit >> 2) & 3, bit & 3], axis=-1)
    # Leaf origin reconstructed from the hit point instead of a table
    # column: step 0.05 voxels INTO the hit voxel, floor, subtract the
    # exact in-leaf offset, and snap to the leaf lattice. The hit point
    # sits on the voxel's entry face with ≲1e-4 fp error, so the floored
    # estimate is off by at most ±1 per component — and the true value
    # is a multiple of 4, so round-to-nearest-multiple-of-4 recovers it
    # exactly.
    dlen = jnp.linalg.norm(d_obj, axis=-1, keepdims=True)
    p_in = hit_obj + d_obj / jnp.maximum(dlen, 1e-20) * 0.05
    vhat = jnp.floor(p_in).astype(jnp.int32)
    leaf_origin = ((vhat - off + 2) >> 2) << 2
    box_center = leaf_origin.astype(jnp.float32) + off.astype(jnp.float32) + 0.5

    normal_obj = pk.cubed_normalize(hit_obj - box_center)
    normal_w = _inst_xform(scene.obj_to_world, inst, normal_obj, False)
    nlen = jnp.linalg.norm(normal_w, axis=-1, keepdims=True)
    normal_w = normal_w / jnp.maximum(nlen, 1e-8)

    # rgba = R|G<<8|B<<16|palette_idx<<24 (already popcount-compacted
    # into the voxel_attr row above).
    palette_idx = ((rgba >> 24) & 0xFF).astype(jnp.int32)
    albedo = jnp.stack(
        [rgba & 0xFF, (rgba >> 8) & 0xFF, (rgba >> 16) & 0xFF,
         jnp.full_like(rgba, 255)], axis=-1).astype(jnp.float32) / 255.0
    albedo = jnp.where(hit[:, None], albedo, 1.0)

    # World hit point + previous-frame reprojection (hit.rchit:90-94).
    hit_w = origin_w + dir_w * t[:, None]
    hit_model = o_obj + d_obj * t[:, None]  # object == model space here
    prev_w = _inst_xform(scene.prev_obj_to_world, inst, hit_model, True)
    motion = jnp.where(hit[:, None], prev_w - hit_w, 0.0)

    # | 8 bit voxel id | 8 bit palette | 16 bit instance | (hit.rchit:87)
    voxel_id = jnp.where(
        hit,
        (bit.astype(jnp.uint32) << 24)
        | (palette_idx.astype(jnp.uint32) << 16)
        | (inst.astype(jnp.uint32) & 0xFFFF),
        jnp.uint32(0),
    )

    depth = jnp.where(hit, res.t, jnp.inf)
    return dict(
        hit=hit,
        inst=inst,
        depth=depth,
        albedo=albedo,
        normal=jnp.where(hit[:, None], normal_w, 0.0),
        motion=motion,
        voxel_id=voxel_id,
        world_pos=jnp.where(hit[:, None], hit_w, 0.0),
        palette_idx=palette_idx,
    )


def leaf_attributes(scene, res, origin_w, dir_w, cell_size: float = 4.0):
    """Leaf-level attributes for rough hits (final_gather.rchit:38-55,
    surfel.rchit:36-50): spatial-hash key (quantised leaf centre world +
    face id from the leaf-AABB normal) and the leaf's average albedo."""
    hit = res.inst >= 0
    inst = jnp.maximum(res.inst, 0)
    flat_row = jnp.asarray(scene.inst_leaf_base, jnp.int32)[inst] \
        + jnp.maximum(res.row, 0)

    attr = jnp.take(scene.leaf_attr_fg, flat_row, axis=0)
    po = attr[:, 0].astype(jnp.uint32)
    leaf_origin = jnp.stack(
        [po & 0xFF, (po >> 8) & 0xFF, (po >> 16) & 0xFF], axis=-1
    ).astype(jnp.float32)
    avg_albedo = attr[:, 1].astype(jnp.uint32)

    o_obj = _inst_xform(scene.world_to_obj, inst, origin_w, True)
    d_obj = _inst_xform(scene.world_to_obj, inst, dir_w, False)
    t = jnp.where(hit, res.t, 0.0)
    hit_obj = o_obj + d_obj * t[:, None]

    center_obj = leaf_origin + 2.0
    n_obj = hit_obj - center_obj
    n_world_raw = _inst_xform(scene.obj_to_world, inst, n_obj, False)
    aabb_normal_w = pk.cubed_normalize(n_world_raw)
    center_w = _inst_xform(scene.obj_to_world, inst, center_obj, True)

    qpos = jnp.trunc(center_w / cell_size).astype(jnp.int32)
    face = pk.normal_to_face_id(aabb_normal_w)
    albedo_rgba = unpack_r10g10b10a2(avg_albedo, xp=jnp)  # sRGB-encoded
    return dict(
        hit=hit,
        qpos=qpos,
        face=face,
        center_world=center_w,
        aabb_normal=aabb_normal_w,
        avg_albedo=albedo_rgba,
    )


def entry_leaf_center(scene, res, origin_w, dir_w):
    """World-space center of a rough hit's leaf WITHOUT the leaf-row
    gather: a rough hit's t is the leaf-AABB entry, so stepping 0.05
    voxels INTO the leaf and flooring to the 4-voxel lattice recovers
    the leaf origin (same reconstruction as resolve_hits' snap; the
    entry axis is 0.05 clear of the boundary by construction, while a
    grazing ray's off-axes can sit within fp-eps of a leaf edge — a
    ~1e-6 fraction of rays keys a neighbouring cell, bounded by the
    hash-vs-GT quality gate). Feeds the hash-mode surfel enqueue
    (final_gather.rchit:42-44 computes the same center from the gathered
    leaf origin)."""
    hit = res.inst >= 0
    inst = jnp.maximum(res.inst, 0)
    o_obj = _inst_xform(scene.world_to_obj, inst, origin_w, True)
    d_obj = _inst_xform(scene.world_to_obj, inst, dir_w, False)
    t = jnp.where(hit, res.t, 0.0)
    hit_obj = o_obj + d_obj * t[:, None]
    dlen = jnp.linalg.norm(d_obj, axis=-1, keepdims=True)
    p_in = hit_obj + d_obj / jnp.maximum(dlen, 1e-20) * 0.05
    center_obj = jnp.floor(p_in * 0.25) * 4.0 + 2.0
    return _inst_xform(scene.obj_to_world, inst, center_obj, True)


def entry_face(scene, res, origin_w, dir_w):
    """World-space cube-face id of a rough hit WITHOUT the leaf-row
    gather (dense-GI fast path).

    A rough hit's t is the leaf-AABB entry (``rough.rint``), so the hit
    point lies on a plane ``coord = 4k`` of the object-space block grid;
    the entry axis is the axis whose coordinate is nearest that grid,
    and the face normal is the axis flipped against the ray — exactly
    ``cubed_normalize(hit - leaf_center)`` evaluated analytically
    (final_gather.rchit:38-46), since the entry point's offset from the
    leaf center is ±2 on the entry axis and <2 elsewhere. Ties at box
    edges resolve by fixed axis order, as the arithmetic in the gather
    path already did."""
    hit = res.inst >= 0
    inst = jnp.maximum(res.inst, 0)
    o_obj = _inst_xform(scene.world_to_obj, inst, origin_w, True)
    d_obj = _inst_xform(scene.world_to_obj, inst, dir_w, False)
    t = jnp.where(hit, res.t, 0.0)
    hit_obj = o_obj + d_obj * t[:, None]

    v = hit_obj * 0.25
    fr = jnp.abs(v - jnp.round(v))           # distance to the block grid
    ax_y = (fr[:, 1] <= fr[:, 0]) & (fr[:, 1] <= fr[:, 2])
    ax_z = ~ax_y & (fr[:, 2] <= fr[:, 0]) & (fr[:, 2] <= fr[:, 1])
    ax_x = ~ax_y & ~ax_z
    axes = jnp.stack([ax_x, ax_y, ax_z], axis=-1).astype(jnp.float32)
    n_obj = -jnp.sign(d_obj) * axes          # face normal opposes the ray
    n_world = _inst_xform(scene.obj_to_world, inst, n_obj, False)
    return pk.normal_to_face_id(pk.cubed_normalize(n_world))
