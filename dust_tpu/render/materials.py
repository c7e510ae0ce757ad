"""Material registry + per-instance shading dispatch.

Reference: the ``Material`` trait (``crates/render/src/material.rs``) and
the RT pipeline manager's per-material-subset pipeline specialization
(``crates/render/src/pipeline/manager.rs:277-315``) — the reference
builds a pipeline permutation per set of materials in the scene and an
SBT hitgroup record per (geometry, material).

TPU-first translation of the same two mechanisms:

* **pipeline permutation ≙ jit specialization**: the per-instance
  material-type ids (``RenderSettings.instance_materials``) are STATIC
  jit arguments, so XLA traces
  exactly the registered materials' shading code — a scene with only
  palette materials compiles zero extra ops, exactly like the reference
  omitting unused hitgroups from the pipeline.
* **SBT hitgroup dispatch ≙ masked lane select**: per-ray dispatch over a
  handful of material types is a short ``where`` chain over the instance
  id — the TPU-correct form of the GPU's per-ray shader table indirection
  (instances are few; rays are the wide axis).

``PaletteMaterial`` (type id 0, the default) IS the baseline shading that
:func:`dust_tpu.ops.shade.resolve_hits` computes (popcount palette
lookup, ``hit.rchit`` parity); other materials refine its result for
their lanes. :class:`EmissiveMaterial` demonstrates the seam end-to-end:
its lanes add a deterministic emission term that the pipeline composes
into the direct channel.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

__all__ = ["Material", "PaletteMaterial", "EmissiveMaterial",
           "register_material", "material_registry", "apply_materials"]


@dataclass(frozen=True)
class Material:
    """Base material: contributes nothing beyond the palette baseline."""

    name: str = "base"

    def shade(self, g: dict, lanes: jnp.ndarray) -> dict:
        """Refine shading for rays in ``lanes`` (bool (N,)).

        ``g`` is resolve_hits' G-buffer dict. Returns a dict of updates:
        ``albedo`` (N,4) replaces the baseline for those lanes;
        ``emissive`` (N,3) adds deterministic radiance (composed into the
        direct channel). Missing keys = no change."""
        return {}


@dataclass(frozen=True)
class PaletteMaterial(Material):
    """Type id 0: the vox palette material (``crates/vox``'s
    ``PaletteMaterial``). Baseline — resolve_hits already computed it."""

    name: str = "palette"


@dataclass(frozen=True)
class EmissiveMaterial(Material):
    """Palette color re-emitted as light: albedo × strength joins the
    direct (zero-variance) channel."""

    name: str = "emissive"
    strength: float = 4.0

    def shade(self, g: dict, lanes: jnp.ndarray) -> dict:
        em = g["albedo"][:, :3] * self.strength
        return {"emissive": jnp.where(lanes[:, None], em, 0.0)}


_REGISTRY: dict[int, Material] = {0: PaletteMaterial()}


def material_registry() -> dict[int, Material]:
    return dict(_REGISTRY)


def register_material(type_id: int, material: Material) -> None:
    """Register a material type (id > 0; 0 is the palette baseline)."""
    if type_id == 0:
        raise ValueError("type 0 is the palette baseline")
    _REGISTRY[int(type_id)] = material


def apply_materials(g: dict, ids: tuple,
                    registry: dict[int, Material] | None = None):
    """Dispatch non-palette materials over their instances' rays.

    ``ids`` is the STATIC per-instance material-type tuple
    (``RenderSettings.instance_materials`` — static so the set of
    materials specializes the trace, the manager.rs permutation
    property). Returns ``(g, emissive)``; with no non-palette instances
    this is the identity and traces zero extra ops.

    The registry is read at TRACE time while jit caches key only on
    ``ids``: re-registering a type with different parameters after a
    frame has compiled keeps rendering the old material until jit caches
    are cleared (``jax.clear_caches()``) — register materials before the
    first frame."""
    n = g["hit"].shape[0]
    emissive = jnp.zeros((n, 3))
    if not ids or all(t == 0 for t in ids):
        return g, emissive
    if registry is None:
        registry = _REGISTRY

    inst = g.get("inst")
    for type_id in sorted(set(ids) - {0}):
        mat = registry.get(type_id)
        if mat is None:
            raise KeyError(f"material type {type_id} not registered")
        lanes = jnp.zeros(n, bool)
        for i, t in enumerate(ids):
            if t == type_id:
                lanes = lanes | (inst == i)
        lanes = lanes & g["hit"]
        out = mat.shade(g, lanes)
        if "albedo" in out:
            g = dict(g)
            g["albedo"] = jnp.where(lanes[:, None], out["albedo"],
                                    g["albedo"])
        if "emissive" in out:
            emissive = emissive + out["emissive"]
    return g, emissive
