"""Flat per-model geometry: the device-side analog of ``VoxGeometry``.

Reference: ``crates/vox/src/geometry.rs`` — per occupied leaf, one AABB
(BLAS input) and one 24-byte ``GPUVoxNode{pos u16x4, mask u64,
material_ptr, avg_albedo}``. Here the "AABB buffer" is replaced by the
dense 64³ ``leaf_grid`` (block → leaf row) from :class:`FlatTree`, which is
what the wavefront HDDA traverses instead of a hardware BLAS, and the
GPUVoxNode fields become columnar arrays (structure-of-arrays — the
TPU-friendly layout).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from dust_tpu.utils import color as colorlib
from dust_tpu.voxtree.tree import FlatTree, VoxTree

__all__ = ["VoxGeometry", "build_geometry", "pack_avg_albedo", "unpack_r10g10b10a2"]


def pack_avg_albedo(rgba: np.ndarray) -> np.ndarray:
    """Pack float RGBA (sRGB-encoded, 0..1) into R10G10B10A2 as
    ``(r<<22)|(g<<12)|(b<<2)|a`` (geometry.rs:111-117)."""
    rgba = np.asarray(rgba, dtype=np.float64)
    r = (rgba[..., 0] * 1023.0).astype(np.uint32)
    g = (rgba[..., 1] * 1023.0).astype(np.uint32)
    b = (rgba[..., 2] * 1023.0).astype(np.uint32)
    a = (rgba[..., 3] * 3.0).astype(np.uint32)
    return (r << 22) | (g << 12) | (b << 2) | a


def unpack_r10g10b10a2(packed: np.ndarray, xp=np):
    """Unpack to float RGBA (hit.rchit:46-52)."""
    packed = xp.asarray(packed)
    r = ((packed >> 22) & 1023).astype(xp.float32) / 1023.0
    g = ((packed >> 12) & 1023).astype(xp.float32) / 1023.0
    b = ((packed >> 2) & 1023).astype(xp.float32) / 1023.0
    a = (packed & 3).astype(xp.float32) / 3.0
    return xp.stack([r, g, b, a], axis=-1)


@dataclasses.dataclass
class VoxGeometry:
    """One model's flat geometry + material arrays (all host numpy; the
    scene assembler moves them to device)."""

    flat: FlatTree
    avg_albedo: np.ndarray  # (L,) uint32 R10G10B10A2 per leaf
    materials: np.ndarray  # (M,) uint8 compacted palette indices
    size: tuple[int, int, int]  # model extent in engine orientation
    unit_size: float = 1.0

    @property
    def num_blocks(self) -> int:
        return self.flat.num_leaves


def build_geometry(
    tree: VoxTree,
    materials: np.ndarray,
    block_ptr: np.ndarray,
    palette: np.ndarray,
    size: tuple[int, int, int],
    unit_size: float = 1.0,
) -> VoxGeometry:
    """Assemble flat geometry from a built tree + collector output
    (python path; the native loader uses :func:`build_geometry_from_flat`).
    """
    tree.set_material_ptrs(block_ptr)
    return build_geometry_from_flat(tree.flatten(), materials, palette, size, unit_size)


def build_geometry_from_flat(
    flat,
    materials: np.ndarray,
    palette: np.ndarray,
    size: tuple[int, int, int],
    unit_size: float = 1.0,
) -> VoxGeometry:
    """Per-leaf attribute pass of ``VoxGeometry::from_tree``
    (geometry.rs:66-127) vectorised over a FlatTree: the average-albedo
    pack — palette u8 RGBA summed over the leaf's voxels, divided by
    255·n, sRGB-OETF'd, packed R10G10B10A2."""
    L = flat.num_leaves

    avg = np.zeros((L, 4), dtype=np.float64)
    if L:
        occ = flat.occupancy_u64()
        # Vectorised popcount: u64 -> 8 bytes -> unpackbits (np.add.at and
        # per-leaf Python bit_count cost ~0.3 s on a 712k-voxel model;
        # this path is a few ms — it runs per EDIT in the refit loop).
        counts = np.unpackbits(
            occ.view(np.uint8).reshape(L, 8), axis=1).sum(
            axis=1).astype(np.int64)
        # Segment-sum palette colors per leaf over the compacted materials.
        starts = flat.material_ptr.astype(np.int64)
        seg_id = np.repeat(np.arange(L), counts)
        # Positions within the materials array: starts[i] .. starts[i]+counts[i]
        offsets = np.arange(len(seg_id)) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        mat_idx = np.repeat(starts, counts) + offsets
        cols = palette[materials[mat_idx].astype(np.int64)].astype(np.float64)
        sums = np.stack(
            [np.bincount(seg_id, weights=cols[:, c], minlength=L)
             for c in range(4)], axis=1)
        avg = sums / (counts[:, None] * 255.0)
        # linear2srgb on rgb only (geometry.rs:103-110)
        avg[:, :3] = colorlib.srgb_oetf(avg[:, :3], xp=np)

    return VoxGeometry(
        flat=flat,
        avg_albedo=pack_avg_albedo(avg),
        materials=np.asarray(materials, dtype=np.uint8),
        size=size,
        unit_size=unit_size,
    )
