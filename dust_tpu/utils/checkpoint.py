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


FORMAT_VERSION = 1


def save_state(path: str, state) -> None:
    """Save any pytree of arrays (FrameState, DeviceScene, ...) to .npz."""
    leaves, treedef = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    arrays["__version__"] = np.asarray([FORMAT_VERSION], np.int32)
    np.savez_compressed(path, **arrays)


def load_state(path: str, like):
    """Load a state saved by :func:`save_state`; ``like`` provides the
    pytree structure (and device placement via jnp.asarray).

    A checkpoint from a different config must fail loudly, not load into
    the wrong slots: the stored treedef string, every leaf's shape AND
    dtype, and the format version are all validated before any device
    transfer happens.
    """
    import jax.numpy as jnp

    data = np.load(path)
    if "__version__" in data:
        ver = int(data["__version__"][0])
        if ver != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format version {ver} != supported "
                f"{FORMAT_VERSION}")
    leaves, treedef = jax.tree_util.tree_flatten(like)
    if "__treedef__" in data:
        stored = bytes(data["__treedef__"]).decode()
        if stored != str(treedef):
            raise ValueError(
                "checkpoint structure mismatch:\n"
                f"  stored:   {stored[:200]}\n"
                f"  expected: {str(treedef)[:200]}")
    n = len(leaves)
    loaded = []
    for i in range(n):
        key = f"leaf_{i}"
        if key not in data:
            raise ValueError(f"checkpoint is missing leaf {i} of {n}")
        arr = data[key]
        want = leaves[i]
        if hasattr(want, "shape") and tuple(arr.shape) != tuple(want.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected {want.shape}"
            )
        if hasattr(want, "dtype") and arr.dtype != np.dtype(want.dtype):
            raise ValueError(
                f"checkpoint leaf {i} dtype {arr.dtype} != expected "
                f"{np.dtype(want.dtype)}")
        loaded.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, loaded)
