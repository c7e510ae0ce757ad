"""Dynamic scene edits + acceleration-structure refit.

Reference: ``VoxGeometry::set`` (``crates/vox/src/geometry.rs:180-186``)
mutates tree voxels; the BLAS/TLAS then rebuilds (BASELINE config #4:
"per-frame voxel leaf edits + tree/acceleration refit with GI re-render").
The reference never implemented node clearing (``internal.rs:126`` is
``todo!()``), so parity requires set/insert refit; clears are supported
here too.

The editor owns the host-side voxel state per model. A refit rebuilds the
edited models' geometry and reassembles the device scene (every derived
structure — cell grids, Pallas tables, packed attribute rows, material
pools, AABBs — stays consistent by construction). Incremental per-model
splicing is a planned optimisation.
"""

from __future__ import annotations

import numpy as np

from dust_tpu.render.scene import DeviceScene, build_device_scene
from dust_tpu.vox.collector import collect_material_indices
from dust_tpu.vox.geometry import build_geometry
from dust_tpu.vox.loader import VoxScene
from dust_tpu.voxtree import VoxTree

__all__ = ["SceneEditor"]


class SceneEditor:
    """Holds editable host state for a loaded scene and refits the device
    scene after voxel mutations."""

    def __init__(self, vox_scene: VoxScene, device_scene: DeviceScene):
        self.vox_scene = vox_scene
        self.device = device_scene
        self._model_ids = sorted(vox_scene.geometries)
        # Editable voxel state per model: dense coords+palette from the
        # current geometry (rebuilt trees own the edit state).
        self._voxels: dict[int, dict[tuple[int, int, int], int]] = {}
        for mid in self._model_ids:
            self._voxels[mid] = {}
            geo = vox_scene.geometries[mid]
            flat = geo.flat
            occ = flat.occupancy_u64()
            mats = geo.materials
            for row in range(flat.num_leaves):
                base = flat.leaf_origin[row]
                mask = int(occ[row])
                ptr = int(flat.material_ptr[row])
                k = 0
                while mask:
                    bit = (mask & -mask).bit_length() - 1
                    mask &= mask - 1
                    x = int(base[0]) + (bit >> 4)
                    y = int(base[1]) + ((bit >> 2) & 3)
                    z = int(base[2]) + (bit & 3)
                    self._voxels[mid][(x, y, z)] = int(mats[ptr + k])
                    k += 1
        self._dirty: set[int] = set()

    def set_voxel(self, model_id: int, coords, palette_idx: int | None) -> None:
        """Set (palette index) or clear (None) one voxel."""
        key = tuple(int(c) for c in coords)
        if palette_idx is None:
            self._voxels[model_id].pop(key, None)
        else:
            self._voxels[model_id][key] = int(palette_idx)
        self._dirty.add(model_id)

    def set_voxels(self, model_id: int, coords: np.ndarray, palette_idx) -> None:
        """Bulk set; ``palette_idx`` scalar or per-voxel; None clears."""
        coords = np.asarray(coords, dtype=np.int64)
        if palette_idx is None:
            for c in coords:
                self._voxels[model_id].pop(tuple(int(v) for v in c), None)
        else:
            pis = np.broadcast_to(np.asarray(palette_idx), (len(coords),))
            for c, pi in zip(coords, pis):
                self._voxels[model_id][tuple(int(v) for v in c)] = int(pi)
        self._dirty.add(model_id)

    def refit(self) -> DeviceScene:
        """Rebuild dirty models' geometry + reassemble the device scene."""
        if not self._dirty:
            return self.device

        for mid in sorted(self._dirty):
            vox = self._voxels[mid]
            if vox:
                coords = np.array(list(vox.keys()), dtype=np.int64)
                idx = np.array(list(vox.values()), dtype=np.uint8)
            else:
                coords = np.zeros((0, 3), np.int64)
                idx = np.zeros((0,), np.uint8)
            tree = VoxTree.from_voxels(coords)
            mats, block_ptr = collect_material_indices(coords, idx)
            geo_old = self.vox_scene.geometries[mid]
            self.vox_scene.geometries[mid] = build_geometry(
                tree, mats, block_ptr, self.vox_scene.palette,
                geo_old.size, geo_old.unit_size,
            )

        # Rebuild the device scene wholesale. An incremental splice must
        # refresh every derived structure (cell grids, Pallas bitmap/rank/
        # mask tables, packed leaf_attr rows, material pools, AABBs) in
        # lockstep — a stale subset renders wrongly — so round 1 keeps the
        # single consistent path; per-model incremental refit is a later
        # optimisation.
        new = build_device_scene(self.vox_scene)
        new = new._replace(
            obj_to_world=self.device.obj_to_world,
            world_to_obj=self.device.world_to_obj,
            prev_obj_to_world=self.device.prev_obj_to_world,
        )
        self.device = new
        self._dirty.clear()
        return self.device
