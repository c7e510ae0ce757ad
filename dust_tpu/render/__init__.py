"""The per-frame render pipeline (reference: ``crates/render``).

The rhyolite GPU-future runtime, barrier engine, queue compiler, SBT
managers and descriptor machinery (SURVEY §2.1-2.4) have no counterpart
here: a frame is one ``jax.jit``-compiled function over scene/cache arrays
and XLA derives every dependency the reference declared by hand.
"""

from dust_tpu.render.scene import DeviceScene, build_device_scene  # noqa: F401
