"""Checkpoint / resume for frame state and scenes.

The reference has no checkpointing (SURVEY §5.4 — only the bevy asset
cache); the rebuild makes GI-cache + history persistence first-class so a
long accumulation (the cross-frame "training loop", SURVEY §3.5) can be
suspended and resumed. Plain ``.npz`` — no orbax dependency needed for
pytrees of flat arrays.
"""

from __future__ import annotations

import numpy as np
import jax

__all__ = ["save_state", "load_state"]


def _flatten_with_paths(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_state(path: str, state) -> None:
    """Save any pytree of arrays (FrameState, DeviceScene, ...) to .npz."""
    leaves, treedef = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_state(path: str, like):
    """Load a state saved by :func:`save_state`; ``like`` provides the
    pytree structure (and device placement via jnp.asarray)."""
    import jax.numpy as jnp

    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves)
    loaded = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        want = leaves[i]
        if hasattr(want, "shape") and tuple(arr.shape) != tuple(want.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected {want.shape}"
            )
        loaded.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, loaded)
