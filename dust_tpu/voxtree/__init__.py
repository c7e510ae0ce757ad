"""Sparse voxel tree (host build side + flattened device representation).

Reference: ``crates/vdb`` — an OpenVDB-inspired tree of const-generic nodes
backed by u32-indexed object pools. That representation is already
pointer-free and therefore maps directly onto HBM-resident arrays; the
device-side "tree" here is just those pooled arrays plus a dense 64³
leaf-index grid that plays the acceleration-structure role the Vulkan
BLAS/TLAS played in the reference (SURVEY §2.5, §7.1).
"""

from dust_tpu.voxtree.bitmask import BitMask  # noqa: F401
from dust_tpu.voxtree.pool import Pool  # noqa: F401
from dust_tpu.voxtree.tree import VoxTree, FlatTree  # noqa: F401
from dust_tpu.voxtree.accessor import Accessor  # noqa: F401
