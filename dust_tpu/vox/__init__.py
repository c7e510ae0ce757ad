"""MagicaVoxel ``.vox`` import (reference: ``crates/vox``).

* :mod:`dust_tpu.vox.parser` — chunk-level ``.vox`` reader/writer
  (the role the ``dot_vox`` crate played).
* :mod:`dust_tpu.vox.collector` — per-leaf material compaction
  (``crates/vox/src/collector.rs``), vectorised.
* :mod:`dust_tpu.vox.loader` — scene-graph traversal, coordinate fix-up,
  tree build (``crates/vox/src/loader.rs``).
* :mod:`dust_tpu.vox.geometry` — flat leaf/material/palette device arrays
  (``crates/vox/src/geometry.rs``).
* :mod:`dust_tpu.vox.procgen` — procedural castle/teapot stand-ins (the
  reference's LFS assets are not present in the snapshot; SURVEY §7).
"""

from dust_tpu.vox.parser import VoxFile, parse_vox, write_vox  # noqa: F401
from dust_tpu.vox.loader import load_vox_scene, VoxScene, VoxInstance  # noqa: F401
from dust_tpu.vox.geometry import VoxGeometry, build_geometry  # noqa: F401
