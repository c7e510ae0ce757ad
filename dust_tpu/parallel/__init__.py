"""Multi-chip scaling (new capability; the reference is single-GPU).

SURVEY §2.9 / §5.8: rays are tile-sharded over a 1-D ``jax.sharding.Mesh``
(the renderer's data-parallel axis), scene pools are replicated so
traversal needs no per-frame communication, and GI-cache updates ride ICI
collectives inserted by the SPMD partitioner.
"""

from dust_tpu.parallel.mesh import make_mesh, ray_sharding, replicate_scene  # noqa: F401
