"""Mesh construction + sharding helpers for the multi-chip render path."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "ray_sharding", "replicate_scene", "shard_frame_state"]

RAY_AXIS = "rays"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D device mesh over the ray-tile axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for flat (N, ...) per-ray arrays: split the ray axis."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicate_scene(scene, mesh: Mesh):
    """Replicate every scene pool on all devices (scene is read-only per
    frame; traversal then needs zero communication — SURVEY §5.8)."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, scene
    )


def shard_frame_state(state, mesh: Mesh):
    """Place frame state for the multi-chip step: per-pixel denoiser
    history sharded by image rows; the DENSE GI cache sharded by row
    range (its rows are CELL_PAD×6-aligned with the surfel cell list, so
    each device refreshes its own slice with zero insert collectives —
    readers pay one small table all-gather); everything else (spatial
    hash, scalars) replicated — hash updates are applied identically on
    every device by the partitioner."""
    from dust_tpu.ops.gi_cache import DenseGICache

    rep = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(RAY_AXIS))

    def place(path, x):
        if not hasattr(x, "shape"):
            return x
        names = [getattr(p, "name", "") for p in path]
        # Denoiser per-pixel history: shard over image rows (leading dim).
        if "denoiser" in names and x.ndim >= 2:
            return jax.device_put(x, rows)
        return jax.device_put(x, rep)

    state = jax.tree_util.tree_map_with_path(place, state)
    if isinstance(getattr(state, "gi", None), DenseGICache):
        state = state._replace(
            gi=DenseGICache(table=jax.device_put(state.gi.table, rows)))
    return state
