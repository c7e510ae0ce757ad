"""dust_tpu — a TPU-native sparse-voxel ray-tracing engine.

A from-scratch rebuild of the capabilities of dust-engine/dust (a Rust/Vulkan
hardware-ray-tracing voxel renderer) as an idiomatic JAX/XLA/Pallas framework:

* ``dust_tpu.voxtree``  — flattened OpenVDB-style sparse voxel tree
  (reference: ``crates/vdb``), HBM-resident pooled arrays.
* ``dust_tpu.vox``      — MagicaVoxel ``.vox`` import + scene graph
  (reference: ``crates/vox``).
* ``dust_tpu.ops``      — the compute path: wavefront HDDA traversal,
  Hošek-Wilkie sky, spatial-hash GI cache, STBN sampling, packing,
  denoising, auto-exposure, tone mapping (reference: ``assets/shaders``).
* ``dust_tpu.render``   — the jit-compiled per-frame render step
  (reference: ``crates/render`` + the rhyolite future/barrier runtime,
  which XLA's dataflow dependency tracking subsumes).
* ``dust_tpu.parallel`` — multi-chip ray-tile sharding over a
  ``jax.sharding.Mesh`` (new; the reference is single-GPU).

The Vulkan queue/semaphore/barrier machinery of the reference
(``crates/rhyolite``) does not exist here by design: everything inside
``jax.jit`` is a single dataflow graph and XLA derives all synchronisation.
"""

__version__ = "0.1.0"

from dust_tpu.config import (  # noqa: F401
    RenderSettings,
    ExposureSettings,
    DenoiserSettings,
    SpatialHashSettings,
    SunlightSettings,
)
