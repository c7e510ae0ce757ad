"""Dynamic scene edits + acceleration-structure refit.

Reference: ``VoxGeometry::set`` (``crates/vox/src/geometry.rs:180-186``)
mutates tree voxels; the BLAS/TLAS then rebuilds (BASELINE config #4:
"per-frame voxel leaf edits + tree/acceleration refit with GI re-render").
The reference never implemented node clearing (``internal.rs:126`` is
``todo!()``), so parity requires set/insert refit; clears are supported
here too.

The editor owns the host-side voxel state per model. A refit rebuilds the
edited models' geometry host-side and then SPLICES just those models'
rows into the device scene (:func:`dust_tpu.render.scene.splice_model`) —
O(model) host work + upload, with every derived structure (cell grid,
Pallas tables, packed attribute rows, material segment, AABB) refreshed
in lockstep. When an edit outgrows the scene's padding (leaf rows, mask
chunks, or the model's 25%-headroom material capacity) the refit falls
back to a full consistent rebuild.

Dense-GI note: the dense cache keys rows by (instance, leaf_row, face)
and carries per-row albedo; an edit shifts the edited model's leaf-row
order, so dense-mode callers should refresh their FrameState's cache
albedo after a refit (``gi_cache.refresh_dense_albedo``) — radiance
re-converges via the running mean, like the reference's hash going
transiently stale on edits. A rebuild fallback changes the row count:
rebuild the FrameState then.
"""

from __future__ import annotations

import numpy as np

from dust_tpu.render.scene import (DeviceScene, build_device_scene,
                                   material_layout, splice_model)
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
        # Material-pool layout pinned at build time (splices must keep
        # other models' absolute pointers valid).
        geos = [vox_scene.geometries[m] for m in self._model_ids]
        self._mat_base, self._mat_cap = material_layout(geos)
        # Diagnostics: how the last refit was applied ("splice"/"rebuild").
        self.last_refit_mode: str | None = None

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

        # Incremental path: splice each dirty model's rows in place.
        # splice_model refreshes every derived structure for that model
        # (cell grid, Pallas bitmap/rank/mask tables, packed leaf_attr
        # rows, material segment, AABB) in lockstep; any model that no
        # longer fits the scene's padding forces a full rebuild.
        device = self.device
        for mid in sorted(self._dirty):
            slot = self._model_ids.index(mid)
            spliced = splice_model(
                device, slot, self.vox_scene.geometries[mid],
                self._mat_base[slot], self._mat_cap[slot],
            )
            if spliced is None:
                device = None
                break
            device = spliced

        if device is not None:
            self.last_refit_mode = "splice"
            self.device = device
            self._dirty.clear()
            return self.device

        self.last_refit_mode = "rebuild"
        new = build_device_scene(self.vox_scene)
        new = new._replace(
            obj_to_world=self.device.obj_to_world,
            world_to_obj=self.device.world_to_obj,
            prev_obj_to_world=self.device.prev_obj_to_world,
        )
        # Re-pin the material layout to the rebuilt pool.
        geos = [self.vox_scene.geometries[m] for m in self._model_ids]
        self._mat_base, self._mat_cap = material_layout(geos)
        self.device = new
        self._dirty.clear()
        return self.device
