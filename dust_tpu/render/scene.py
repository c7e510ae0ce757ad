"""Device scene assembly: flat arrays + instance table.

This is the TPU analog of the reference's acceleration-structure layer
(``crates/render/src/accel_struct/``): per-model BLAS ≙ a dense 64³
``cell_info`` grid fused with a chebyshev empty-space-skip field, and the
TLAS instance buffer ≙ a small table of object↔world affines + model ids
(``tlas.rs:29-79``). Hardware ray tracing is replaced by the wavefront
HDDA in :mod:`dust_tpu.ops.traverse`.

``cell_info`` encoding per 4³ block cell:

* ``v >= 0``  — occupied block; ``v`` is the leaf row in the model's flat
  leaf arrays.
* ``v <  0``  — empty; ``-v`` is a conservative chebyshev distance (in
  blocks) to the nearest occupied block, so a ray at this cell may skip
  ``-v`` blocks in one step. This replaces the empty-space skipping the
  reference got from hardware TLAS traversal.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dust_tpu.vox.loader import VoxScene

__all__ = ["DeviceScene", "build_device_scene", "chebyshev_distance_field", "cell_info_grid"]

MAX_SKIP = 63  # distances are clamped; any value >= 1 is a valid skip


def chebyshev_distance_field(occupied: np.ndarray, max_dist: int = MAX_SKIP) -> np.ndarray:
    """Chebyshev (L∞) distance to the nearest occupied cell, clamped.

    Occupied cells get 0. Computed by iterative 3³ dilation — at 64³ this
    is a few milliseconds on the host and fully vectorised.
    """
    occ = occupied.astype(bool)
    from dust_tpu import native
    if occ.shape == (64, 64, 64) and native.available():
        nat = native.chebyshev(occ, max_dist)
        if nat is not None:
            return nat
    dist = np.full(occ.shape, max_dist, dtype=np.int32)
    dist[occ] = 0
    frontier = occ
    for d in range(1, max_dist):
        if frontier.all():
            break
        # dilate by one chebyshev step
        p = np.pad(frontier, 1, constant_values=False)
        grown = np.zeros_like(frontier)
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                for dz in (0, 1, 2):
                    grown |= p[dx:dx + 64, dy:dy + 64, dz:dz + 64]
        new = grown & ~frontier
        dist[new] = d
        frontier = grown
    return dist


def cell_info_grid(leaf_grid: np.ndarray, max_dist: int = MAX_SKIP) -> np.ndarray:
    """Fuse leaf rows and skip distances into one int32 lookup table."""
    occ = leaf_grid >= 0
    dist = chebyshev_distance_field(occ, max_dist)
    return np.where(occ, leaf_grid, -np.maximum(dist, 1)).astype(np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceScene:
    """All scene state on device. A pytree of jnp arrays; every field with
    a leading M axis is stacked over models (padded to the max leaf
    count), every field with a leading I axis is per instance.

    ``inst_model`` and ``pl_chunks`` are STATIC pytree metadata (python
    ints), not traced leaves: the batched trace kernel groups instances
    by model and bakes each model's real mask-chunk count into the
    kernel at trace time (a small model must not pay the padded common
    chunk count on every in-kernel mask gather)."""

    # Per-model traversal tables.
    cell_info: jnp.ndarray      # (M, 64, 64, 64) int32
    mask_lo: jnp.ndarray        # (M, Lmax) uint32
    mask_hi: jnp.ndarray        # (M, Lmax) uint32
    leaf_origin: jnp.ndarray    # (M, Lmax, 3) int32
    material_ptr: jnp.ndarray   # (M, Lmax) int32 (pre-offset into materials)
    avg_albedo: jnp.ndarray     # (M, Lmax) uint32 R10G10B10A2
    # Shared material/palette pools.
    materials: jnp.ndarray      # (Mtot,) int32 palette indices
    palette: jnp.ndarray        # (256, 4) float32, 0..1 sRGB-encoded RGBA
    # R | G<<8 | B<<16 | palette_idx<<24, one word per voxel — rows kept
    # as narrow as possible on purpose: TPU gather cost scales with row
    # bytes and this table eats a 2M-ray gather per frame. The alpha
    # byte is free to hold the index because hit.rchit forces A=1 on
    # hits; full RGBA remains available via palette[palette_idx].
    material_rgba: jnp.ndarray  # (ceil(Mtot/4), 4) int32 (flat index = ptr)
    # Tight per-model AABBs in object space (sky rays skip most of the
    # 256^3 grid; hardware TLAS gave the reference this for free).
    model_aabb_min: jnp.ndarray  # (M, 3) float32
    model_aabb_max: jnp.ndarray  # (M, 3) float32
    # Packed per-leaf attribute rows for one-gather shading, laid out in
    # per-model capacity segments (``leaf_base``/``leaf_cap`` — a flat
    # row is ``leaf_base[model] + leaf_row``; see :func:`leaf_layout`):
    # [ox|oy<<8|oz<<16, mask_lo, mask_hi, material_ptr] (hit.rchit needs).
    leaf_attr: jnp.ndarray      # (F, 4) int32, F = sum(leaf_cap)
    # [ox|oy<<8|oz<<16, avg_albedo] (final_gather/surfel.rchit needs).
    leaf_attr_fg: jnp.ndarray   # (F, 2) int32
    # UNCOMPACTED per-voxel shading rows, 16 voxels per 64 B row
    # (row = (flat_row*64+bit) >> 4, word = bit & 15). Denormalises
    # material_rgba through the popcount compaction so primary shading
    # pays ONE row gather instead of leaf_attr + material_rgba (two 2M
    # gathers + a popcount chain). Row geometry is deliberate: 64 B is
    # the widest free row (gather cost is per ROW), and the per-model
    # segment layout keeps castle-scale scenes under the ~220k-row
    # fast-emitter ceiling (see the dead-zone note at leaf_layout). ~3x
    # the compacted bytes, traded against abundant HBM; the compacted
    # tables stay for the hash-GI path (hit.rchit:59-71 is the
    # compaction spec this denormalises).
    voxel_attr: jnp.ndarray     # (>=F*4, 16) int32
    # Pallas traversal tables (stacked over models; see ops/pallas_trace).
    pl_l1: jnp.ndarray          # (M, 8, 128) int32 packed L1 skip nibbles
    pl_l2w0: jnp.ndarray        # (M, 4, 8, 128) int32
    pl_l2w1: jnp.ndarray        # (M, 4, 8, 128) int32
    pl_l2r0: jnp.ndarray        # (M, 4, 8, 128) int32
    pl_l2r1: jnp.ndarray        # (M, 4, 8, 128) int32
    pl_mlo: jnp.ndarray         # (M, CL, 8, 128) int32
    pl_mhi: jnp.ndarray         # (M, CL, 8, 128) int32
    # Instances.
    obj_to_world: jnp.ndarray   # (I, 3, 4) float32
    world_to_obj: jnp.ndarray   # (I, 3, 4) float32
    prev_obj_to_world: jnp.ndarray  # (I, 3, 4) float32 (last frame, motion)
    # STATIC metadata (pytree aux data, see class docstring).
    inst_model: tuple = dataclasses.field(         # per-instance model slot
        default=(), metadata=dict(static=True))
    pl_chunks: tuple = dataclasses.field(          # per-model REAL chunks
        default=(), metadata=dict(static=True))
    # Flat leaf-table segment layout (leaf_layout); pinned at build time
    # so splices keep other models' flat rows in place.
    leaf_base: tuple = dataclasses.field(          # per-model row base
        default=(), metadata=dict(static=True))
    leaf_cap: tuple = dataclasses.field(           # per-model row capacity
        default=(), metadata=dict(static=True))
    # Dense-GI cell capacity per model (ops/gi_cache layout): TIGHT
    # 64-aligned leaf counts, pinned at build. Leaves a splice adds past
    # this cap simply have no cache cell (they shade as uncached — no
    # aliasing) until the next full rebuild re-pins it.
    gi_cell_cap: tuple = dataclasses.field(
        default=(), metadata=dict(static=True))

    @property
    def num_instances(self) -> int:
        return len(self.inst_model)

    @property
    def inst_leaf_base(self) -> tuple:
        """Per-INSTANCE flat leaf-table row base (= leaf_base of the
        instance's model) — shading resolves a hit's flat row with one
        tiny gather by instance id."""
        return tuple(self.leaf_base[m] for m in self.inst_model)

    @property
    def num_models(self) -> int:
        return self.cell_info.shape[0]

    @property
    def _fields(self) -> tuple:
        return tuple(f.name for f in dataclasses.fields(self))

    def _replace(self, **kw) -> "DeviceScene":
        return dataclasses.replace(self, **kw)

    def with_transforms(self, obj_to_world: jnp.ndarray) -> "DeviceScene":
        """Move instances: new transforms; previous become prev (the
        InstanceVec<PreviousFrameGlobalTransform> flow, instance_vec.rs)."""
        o2w = jnp.asarray(obj_to_world, jnp.float32)
        w2o = _invert_affines(o2w)
        return self._replace(
            obj_to_world=o2w, world_to_obj=w2o, prev_obj_to_world=self.obj_to_world
        )


def _invert_affines(a34: jnp.ndarray) -> jnp.ndarray:
    lin = a34[..., :3, :3]
    t = a34[..., :3, 3]
    inv = jnp.linalg.inv(lin)
    it = -jnp.einsum("...ij,...j->...i", inv, t, precision="highest")
    return jnp.concatenate([inv, it[..., :, None]], axis=-1)


def material_layout(geos) -> tuple[list[int], list[int]]:
    """Per-model (base, capacity) segments of the shared material pool.

    Capacities are 256-aligned with ~12.5% headroom so an edited model's
    compacted material list can grow in place — the incremental refit
    (:mod:`dust_tpu.render.edits`) splices one model's rows without
    relocating any other model's pointers (≙ the reference's BLAS refit
    keeping SBT records stable, ``accel_struct/blas.rs:125``). The
    headroom is deliberately modest: the per-frame material_rgba gather
    falls off an XLA emitter cliff past ~3.5 MB of table (see
    ``_material_rgba_rows``), and a castle-scale scene with 25% headroom
    sat just past it (measured 4.2 -> 35.5 ms/frame for the same
    gather)."""
    bases, caps = [], []
    base = 0
    for g in geos:
        n = len(g.materials)
        cap = max(256, -(-(n + n // 8) // 256) * 256)
        bases.append(base)
        caps.append(cap)
        base += cap
    return bases, caps


# XLA's 2M-index row gather has a measured dead zone in table ROW COUNT
# on the v5e (tools/gather_cliff_probe.py, re-measured round 4 for 16 B
# and 64 B rows): tables up to ~220k rows use a locality-friendly
# emitter (+0-3 ms over the dispatch floor for the 2M-ray fetch), rows
# in ~[234k, 262k] fall onto a catastrophic path (+17 ms isolated,
# 35 ms/frame in-context for the round-4 voxel_attr), and larger tables
# pick a third emitter at +4 ms (16 B rows) / +8-10 ms (64 B rows).
# Hot tables therefore (a) lay out per-model capacity SEGMENTS instead
# of max-padded strides to stay under the fast-emitter ceiling, and
# (b) when a scene is genuinely too big, pad PAST the catastrophic
# window (HBM is free compared to 17 ms/frame).
_GATHER_SMALL_MAX_ROWS = 220_000
_GATHER_BIG_MIN_ROWS = 524_288


def pad_rows_past_dead_zone(rows: int) -> int:
    """Bump a gather-hot table's row count past the slow-emitter window
    (no-op for tables already under the fast-emitter ceiling)."""
    if _GATHER_SMALL_MAX_ROWS < rows < _GATHER_BIG_MIN_ROWS:
        return _GATHER_BIG_MIN_ROWS
    return rows


def _material_rgba_rows(n_entries: int) -> int:
    return pad_rows_past_dead_zone(max(-(-n_entries // 4), 1))


def leaf_layout(geos) -> tuple[list[int], list[int]]:
    """Per-model (base, capacity) row segments of the FLAT leaf tables
    (leaf_attr / leaf_attr_fg / voxel_attr).

    Round 3 laid these out as ``model * lmax`` strides; padding every
    model to the largest one doubled the row count on the round-4
    castle+teapot and pushed voxel_attr into the gather emitter's
    catastrophic window (35 ms/frame for the primary shading gather —
    see the dead-zone note above). Capacities are 64-aligned with ~25%
    headroom so the splice refit can grow a model in place (same policy
    as material_layout)."""
    bases, caps = [], []
    base = 0
    for g in geos:
        L = g.num_blocks
        cap = max(64, -(-(L + L // 4) // 64) * 64)
        bases.append(base)
        caps.append(cap)
        base += cap
    return bases, caps


def _build_voxel_attr(mask_lo, mask_hi, matptr, mat_words):
    """Denormalised per-voxel shading rows (see DeviceScene.voxel_attr).

    ``mask_lo/hi/matptr``: flat (R,) per-leaf-row arrays; ``mat_words``:
    the flat packed material_rgba words the pointers index. Returns
    (R*4, 16) int32 — 16 voxels per row in bit order.
    """
    R = mask_lo.shape[0]
    m64 = (mask_hi.astype(np.uint64) << np.uint64(32)) | mask_lo.astype(
        np.uint64)
    occ = ((m64[:, None] >> np.arange(64, dtype=np.uint64)) &
           np.uint64(1)).astype(np.int32)
    below = np.cumsum(occ, axis=1, dtype=np.int32) - occ
    midx = np.minimum(matptr[:, None].astype(np.int64) + below,
                      len(mat_words) - 1)
    rgba = np.where(occ.astype(bool), mat_words[midx], np.int32(0))
    return np.ascontiguousarray(rgba.reshape(R * 4, 16))


def build_device_scene(scene: VoxScene) -> DeviceScene:
    """Assemble a :class:`DeviceScene` from a loaded ``.vox`` scene."""
    from dust_tpu.ops.pallas_trace import build_pallas_tables, stack_tables

    model_ids = sorted(scene.geometries)
    geos = [scene.geometries[m] for m in model_ids]
    id_to_slot = {m: i for i, m in enumerate(model_ids)}

    lmax = max(max((g.num_blocks for g in geos), default=1), 1)
    # ~25% leaf-row headroom (64-aligned) so edits can grow a model in
    # place — without it any new leaf in the largest model forces the
    # refit's full-rebuild fallback (see material_layout for the same
    # policy on the material pool).
    lmax = -(-(lmax + lmax // 4) // 64) * 64
    M = len(geos)

    cell = np.full((M, 64, 64, 64), -MAX_SKIP, dtype=np.int32)
    mask_lo = np.zeros((M, lmax), dtype=np.uint32)
    mask_hi = np.zeros((M, lmax), dtype=np.uint32)
    origin = np.zeros((M, lmax, 3), dtype=np.int32)
    matptr = np.zeros((M, lmax), dtype=np.int32)
    albedo = np.zeros((M, lmax), dtype=np.uint32)

    bases, caps = material_layout(geos)
    materials = []
    for i, g in enumerate(geos):
        L = g.num_blocks
        cell[i] = cell_info_grid(g.flat.leaf_grid)
        mask_lo[i, :L] = g.flat.mask_lo
        mask_hi[i, :L] = g.flat.mask_hi
        origin[i, :L] = g.flat.leaf_origin
        matptr[i, :L] = g.flat.material_ptr.astype(np.int64) + bases[i]
        albedo[i, :L] = g.avg_albedo
        seg = np.zeros(caps[i], dtype=np.int32)
        seg[: len(g.materials)] = g.materials.astype(np.int32)
        materials.append(seg)
    materials = (
        np.concatenate(materials) if materials else np.zeros(4, dtype=np.int32)
    )

    # NOTE: mask chunks deliberately get NO headroom — every in-kernel
    # chunked gather walks all of a model's chunks unconditionally, so
    # padding them would tax every trace. A model growing past a
    # 1024-leaf chunk boundary takes the refit's full-rebuild fallback
    # instead (rare). pl_chunks records each model's REAL count so the
    # batched scene kernel only walks that many (small models would
    # otherwise pay the stacked common padding per gather).
    per_model = [build_pallas_tables(g.flat) for g in geos]
    pl_chunks = tuple(t.mask_chunks for t in per_model)
    tables = stack_tables(per_model)

    ab_min = np.zeros((M, 3), dtype=np.float32)
    ab_max = np.full((M, 3), 256.0, dtype=np.float32)
    for i, g in enumerate(geos):
        if g.num_blocks:
            ab_min[i] = g.flat.leaf_origin.min(axis=0)
            ab_max[i] = g.flat.leaf_origin.max(axis=0) + 4.0

    # Padded to a multiple of 4 and stored as (Mtot/4, 4) rows: 1-column
    # TPU gathers lower to the slow scalar path (~15 ms / 2M lookups),
    # multi-column row gathers run ~1.6x faster (~9 ms); shade.resolve_hits
    # gathers the 4-word row at ptr>>2 and selects word ptr&3. Row count
    # sized around the XLA gather dead zone (_material_rgba_rows).
    m4 = _material_rgba_rows(len(materials))
    mat_rgba = np.zeros(m4 * 4, dtype=np.int32)
    rgba8 = scene.palette[materials].astype(np.uint32)
    mat_rgba[: len(materials)] = (
        rgba8[:, 0] | (rgba8[:, 1] << 8) | (rgba8[:, 2] << 16)
        | (materials.astype(np.uint32) << 24)
    ).view(np.int32)
    mat_rgba = mat_rgba.reshape(m4, 4)

    # Flat per-leaf shading tables in per-model capacity segments (see
    # leaf_layout for why NOT model*lmax strides).
    lbase, lcap = leaf_layout(geos)
    F = (lbase[-1] + lcap[-1]) if geos else 64
    Fp = pad_rows_past_dead_zone(F)
    flat_lo = np.zeros(F, dtype=np.uint32)
    flat_hi = np.zeros(F, dtype=np.uint32)
    flat_mp = np.zeros(F, dtype=np.int32)
    leaf_attr = np.zeros((Fp, 4), dtype=np.int32)
    leaf_attr_fg = np.zeros((Fp, 2), dtype=np.int32)
    for i, g in enumerate(geos):
        L = g.num_blocks
        b = lbase[i]
        flat_lo[b:b + L] = g.flat.mask_lo
        flat_hi[b:b + L] = g.flat.mask_hi
        flat_mp[b:b + L] = g.flat.material_ptr.astype(np.int64) + bases[i]
        o = g.flat.leaf_origin.astype(np.uint32)
        po = (o[:, 0] | (o[:, 1] << 8) | (o[:, 2] << 16)).view(np.int32)
        leaf_attr[b:b + L, 0] = po
        leaf_attr[b:b + L, 1] = g.flat.mask_lo.view(np.int32)
        leaf_attr[b:b + L, 2] = g.flat.mask_hi.view(np.int32)
        leaf_attr[b:b + L, 3] = flat_mp[b:b + L]
        leaf_attr_fg[b:b + L, 0] = po
        leaf_attr_fg[b:b + L, 1] = g.avg_albedo.view(np.int32)
    voxel_attr = _build_voxel_attr(flat_lo, flat_hi, flat_mp,
                                   mat_rgba.reshape(-1))
    va_rows = pad_rows_past_dead_zone(voxel_attr.shape[0])
    if va_rows > voxel_attr.shape[0]:
        voxel_attr = np.concatenate(
            [voxel_attr,
             np.zeros((va_rows - voxel_attr.shape[0], 16), np.int32)])

    inst_model = tuple(id_to_slot[inst.model_id] for inst in scene.instances)
    o2w = np.stack([inst.transform[:3, :4] for inst in scene.instances]).astype(
        np.float32
    ) if scene.instances else np.zeros((0, 3, 4), np.float32)

    o2w_j = jnp.asarray(o2w)
    return DeviceScene(
        cell_info=jnp.asarray(cell),
        mask_lo=jnp.asarray(mask_lo),
        mask_hi=jnp.asarray(mask_hi),
        leaf_origin=jnp.asarray(origin),
        material_ptr=jnp.asarray(matptr),
        avg_albedo=jnp.asarray(albedo),
        materials=jnp.asarray(materials),
        palette=jnp.asarray(scene.palette.astype(np.float32) / 255.0),
        material_rgba=jnp.asarray(mat_rgba),
        model_aabb_min=jnp.asarray(ab_min),
        model_aabb_max=jnp.asarray(ab_max),
        leaf_attr=jnp.asarray(leaf_attr),
        leaf_attr_fg=jnp.asarray(leaf_attr_fg),
        voxel_attr=jnp.asarray(voxel_attr),
        pl_l1=jnp.asarray(tables[0]),
        pl_l2w0=jnp.asarray(tables[1]),
        pl_l2w1=jnp.asarray(tables[2]),
        pl_l2r0=jnp.asarray(tables[3]),
        pl_l2r1=jnp.asarray(tables[4]),
        pl_mlo=jnp.asarray(tables[5]),
        pl_mhi=jnp.asarray(tables[6]),
        inst_model=inst_model,
        pl_chunks=pl_chunks,
        leaf_base=tuple(lbase),
        leaf_cap=tuple(lcap),
        gi_cell_cap=tuple(max(64, -(-g.num_blocks // 64) * 64)
                          for g in geos),
        obj_to_world=o2w_j,
        world_to_obj=_invert_affines(o2w_j) if len(inst_model) else jnp.zeros((0, 3, 4)),
        prev_obj_to_world=o2w_j,
    )


def splice_model(device: DeviceScene, slot: int, geo,
                 mat_base: int, mat_cap: int) -> DeviceScene | None:
    """Incremental refit: replace ONE model's rows in every per-model pool
    on device, leaving all other models' data untouched (≙ BLAS refit,
    ``accel_struct/blas.rs:125`` + ``VoxGeometry::set``,
    ``vox/src/geometry.rs:180-186``).

    Host work and upload are O(model); the device-side ``.at[].set``
    splices are dynamic-update-slices (no re-upload of other models).
    Returns None when the rebuilt model no longer fits the scene's
    padding (leaf rows, mask chunks, or material capacity) — the caller
    then falls back to a full :func:`build_device_scene`.
    """
    from dust_tpu.ops.pallas_trace import build_pallas_tables

    lmax = device.mask_lo.shape[1]
    lcap = device.leaf_cap[slot]
    CL = device.pl_mlo.shape[1]
    L = geo.num_blocks
    n_mats = len(geo.materials)
    if L > lmax or L > lcap or n_mats > mat_cap:
        return None
    tables = build_pallas_tables(geo.flat)
    # The batched scene kernel bakes each model's REAL chunk count in at
    # trace time (pl_chunks is static), so a model crossing a 1024-leaf
    # chunk boundary cannot be spliced — rows in the new chunk would be
    # invisible to the baked gather loop. Full rebuild instead.
    if tables.mask_chunks > min(CL, device.pl_chunks[slot]):
        return None

    cell = cell_info_grid(geo.flat.leaf_grid)
    ml = np.zeros(lmax, dtype=np.uint32)
    mh = np.zeros(lmax, dtype=np.uint32)
    org = np.zeros((lmax, 3), dtype=np.int32)
    mp = np.zeros(lmax, dtype=np.int32)
    alb = np.zeros(lmax, dtype=np.uint32)
    ml[:L] = geo.flat.mask_lo
    mh[:L] = geo.flat.mask_hi
    org[:L] = geo.flat.leaf_origin
    mp[:L] = geo.flat.material_ptr.astype(np.int64) + mat_base
    alb[:L] = geo.avg_albedo

    seg = np.zeros(mat_cap, dtype=np.int32)
    seg[:n_mats] = geo.materials.astype(np.int32)
    palette_u8 = np.asarray(np.round(np.array(device.palette) * 255.0),
                            np.uint32)
    rgba8 = palette_u8[seg]
    seg_rgba = (rgba8[:, 0] | (rgba8[:, 1] << 8) | (rgba8[:, 2] << 16)
                | (seg.astype(np.uint32) << 24)).view(np.int32)

    # Flat-table segment rows (lcap of them — the model's slice of the
    # per-model segment layout, see leaf_layout).
    o = org[:lcap].astype(np.uint32)
    packed_origin = (o[:, 0] | (o[:, 1] << 8) | (o[:, 2] << 16)).view(np.int32)
    la = np.zeros((lcap, 4), dtype=np.int32)
    la[:, 0] = packed_origin
    la[:, 1] = ml[:lcap].view(np.int32)
    la[:, 2] = mh[:lcap].view(np.int32)
    la[:, 3] = mp[:lcap]
    lafg = np.zeros((lcap, 2), dtype=np.int32)
    lafg[:, 0] = packed_origin
    lafg[:, 1] = alb[:lcap].view(np.int32)
    # Voxel rows index the model-LOCAL material words (mp carries the
    # global base; the local table is the same words at local offsets).
    va = _build_voxel_attr(ml[:lcap], mh[:lcap],
                           np.where((ml | mh)[:lcap], mp[:lcap] - mat_base, 0),
                           seg_rgba)

    if L:
        abmin = geo.flat.leaf_origin.min(axis=0).astype(np.float32)
        abmax = (geo.flat.leaf_origin.max(axis=0) + 4.0).astype(np.float32)
    else:
        abmin = np.zeros(3, np.float32)
        abmax = np.full(3, 256.0, np.float32)

    mlo_pad = np.zeros((CL, 8, 128), np.int32)
    mhi_pad = np.zeros((CL, 8, 128), np.int32)
    mlo_pad[: tables.mask_chunks] = tables.mask_lo
    mhi_pad[: tables.mask_chunks] = tables.mask_hi

    updates = dict(
        cell_info=cell, mask_lo=ml, mask_hi=mh, leaf_origin=org,
        material_ptr=mp, avg_albedo=alb, materials=seg,
        material_rgba=seg_rgba.reshape(-1, 4),
        model_aabb_min=abmin, model_aabb_max=abmax,
        leaf_attr=la, leaf_attr_fg=lafg, voxel_attr=va,
        pl_l1=tables.l1, pl_l2w0=tables.l2_w0, pl_l2w1=tables.l2_w1,
        pl_l2r0=tables.l2_r0, pl_l2r1=tables.l2_r1,
        pl_mlo=mlo_pad, pl_mhi=mhi_pad,
    )
    # One jit-compiled dispatch for all 19 row updates (19 separate
    # .at[].set calls each pay their own compile + tunnel dispatch).
    return _apply_splice(device, updates, slot, mat_base, mat_cap,
                         device.leaf_base[slot], lcap)


from functools import partial as _partial
import jax as _jax


@_partial(_jax.jit,
          static_argnames=("slot", "mat_base", "mat_cap", "r0", "lcap"))
def _apply_splice(device, updates, slot, mat_base, mat_cap, r0, lcap):
    r1 = r0 + lcap
    u = {k: jnp.asarray(v) for k, v in updates.items()}
    repl = {}
    for name in ("cell_info", "mask_lo", "mask_hi", "leaf_origin",
                 "material_ptr", "avg_albedo", "model_aabb_min",
                 "model_aabb_max", "pl_l1", "pl_l2w0", "pl_l2w1",
                 "pl_l2r0", "pl_l2r1", "pl_mlo", "pl_mhi"):
        repl[name] = getattr(device, name).at[slot].set(
            u[name].astype(getattr(device, name).dtype))
    repl["materials"] = device.materials.at[
        mat_base:mat_base + mat_cap].set(u["materials"])
    repl["material_rgba"] = device.material_rgba.at[
        mat_base // 4:(mat_base + mat_cap) // 4].set(u["material_rgba"])
    repl["leaf_attr"] = device.leaf_attr.at[r0:r1].set(u["leaf_attr"])
    repl["leaf_attr_fg"] = device.leaf_attr_fg.at[r0:r1].set(
        u["leaf_attr_fg"])
    repl["voxel_attr"] = device.voxel_attr.at[r0 * 4:r1 * 4].set(
        u["voxel_attr"])
    return device._replace(**repl)


@_jax.jit
def _apply_leaf_patch(device, model, row, flat, mask_lo, mask_hi, alb,
                      attr, fg, vox, gi_table, gi_rows, gi_alb):
    """Leaf-granular device patch (SceneEditor fast path): scatter K
    edited leaves' rows into every per-leaf pool in ONE dispatch.
    Padded lanes carry index -1 (OOB) and drop. The compacted
    materials/material_rgba pools are NOT touched — they are build-time
    inputs only (shading reads the denormalised voxel_attr rows); the
    next slice/rebuild refit recompacts them from the editor's coords.

    ``gi_table``: optional dense-GI (R,3) table whose per-row albedo
    word refreshes for the edited leaves' (instance, row, face) cells
    (``gi_rows``/``gi_alb``, -1-padded) — keeps edit+dense-GI shading
    consistent without a second dispatch."""
    repl = dict(
        mask_lo=device.mask_lo.at[model, row].set(
            mask_lo.astype(device.mask_lo.dtype), mode="drop"),
        mask_hi=device.mask_hi.at[model, row].set(
            mask_hi.astype(device.mask_hi.dtype), mode="drop"),
        avg_albedo=device.avg_albedo.at[model, row].set(
            alb.astype(device.avg_albedo.dtype), mode="drop"),
        leaf_attr=device.leaf_attr.at[flat].set(attr, mode="drop"),
        leaf_attr_fg=device.leaf_attr_fg.at[flat].set(fg, mode="drop"),
        voxel_attr=device.voxel_attr.at[
            (flat[:, None] * 4 + jnp.arange(4)).reshape(-1)].set(
            vox.reshape(-1, 16), mode="drop"),
        # Pallas mask-chunk tables: leaf row r's words live at
        # (chunk r>>10, sublane (r>>7)&7, lane r&127) of the (CL,8,128)
        # per-model block (build_pallas_tables packs rows flat).
        pl_mlo=device.pl_mlo.at[
            model, row >> 10, (row >> 7) & 7, row & 127].set(
            mask_lo.astype(jnp.int32), mode="drop"),
        pl_mhi=device.pl_mhi.at[
            model, row >> 10, (row >> 7) & 7, row & 127].set(
            mask_hi.astype(jnp.int32), mode="drop"),
    )
    new_gi = gi_table.at[gi_rows, 2].set(gi_alb, mode="drop")
    return device._replace(**repl), new_gi


def apply_leaf_patch(device, model, row, mask_lo, mask_hi, alb, attr, fg,
                     vox, gi_table=None, gi_rows=None, gi_alb=None):
    """Host wrapper for :func:`_apply_leaf_patch`: pads the K edited
    leaves to a power-of-two batch (stable jit cache) and fills the
    derived flat indices. Returns ``(device, gi_table-or-None)``."""
    k = len(row)
    kp = max(8, 1 << (k - 1).bit_length())

    def pad(a, fill):
        a = np.asarray(a)
        out = np.full((kp,) + a.shape[1:], fill, dtype=a.dtype)
        out[:k] = a
        return out

    model_p = pad(np.asarray(model, np.int32), 0)
    row_p = pad(np.asarray(row, np.int32), -1)
    lbase = np.asarray(device.leaf_base, np.int64)
    flat = np.where(row_p >= 0, lbase[model_p] + row_p, -1).astype(np.int32)
    if gi_table is None:
        gi_in = jnp.zeros((1, 3), jnp.int32)
        rows_in = np.full((kp, 1), -1, np.int32)
        alb_in = np.zeros((kp, 1), np.int32)
    else:
        gi_in = gi_table
        rows_in = pad(np.asarray(gi_rows, np.int32), -1)
        alb_in = pad(np.asarray(gi_alb, np.int32), 0)
    dev, gi_out = _apply_leaf_patch(
        device, jnp.asarray(model_p), jnp.asarray(row_p), jnp.asarray(flat),
        jnp.asarray(pad(np.asarray(mask_lo, np.uint32), 0)),
        jnp.asarray(pad(np.asarray(mask_hi, np.uint32), 0)),
        jnp.asarray(pad(np.asarray(alb, np.uint32), 0)),
        jnp.asarray(pad(np.asarray(attr, np.int32), 0)),
        jnp.asarray(pad(np.asarray(fg, np.int32), 0)),
        jnp.asarray(pad(np.asarray(vox, np.int32), 0)),
        gi_in, jnp.asarray(rows_in), jnp.asarray(alb_in))
    return dev, (gi_out if gi_table is not None else None)
