"""Color-space math shared by host (numpy) and device (jax.numpy) code.

Reference: ``assets/shaders/headers/color.glsl`` and
``crates/rhyolite/src/utils/format.rs`` (primaries → matrix conversion,
unit-tested at format.rs:702). The matrices below are the standard
sRGB/ACEScg/XYZ relations (AP1 primaries, D60/D65 adaptation) — the same
public constants the GLSL hard-codes.

Every function takes ``xp`` (numpy or jax.numpy) so the importer can run
vectorised on the host while kernels use the identical math on device.
"""

from __future__ import annotations

import numpy as np

# color.glsl sRGB2AECScg / AECScg2sRGB (column-major in GLSL; rows here).
SRGB_TO_ACESCG = np.array(
    [
        [0.6031065, 0.32633433, 0.047995567],
        [0.07011794, 0.9199162, 0.012763573],
        [0.022178888, 0.11607823, 0.94101846],
    ],
    dtype=np.float32,
)
ACESCG_TO_SRGB = np.array(
    [
        [1.7312546, -0.6040432, -0.08010775],
        [-0.131619, 1.1348418, -0.008679431],
        [-0.024568284, -0.12575036, 1.0656371],
    ],
    dtype=np.float32,
)
XYZ_TO_ACESCG = np.array(
    [
        [1.6410228, -0.32480323, -0.23642465],
        [-0.66366285, 1.6153315, 0.016756356],
        [0.011721907, -0.0082844375, 0.9883947],
    ],
    dtype=np.float32,
)
ACESCG_TO_XYZ = np.array(
    [
        [0.66245437, 0.13400422, 0.15618773],
        [0.2722288, 0.6740818, 0.05368953],
        [-0.0055746622, 0.00406073, 1.0103393],
    ],
    dtype=np.float32,
)


def _mat(v, m, xp):
    """Apply a 3x3 matrix to the last axis of ``v``."""
    if xp is np:
        return xp.einsum("ij,...j->...i", xp.asarray(m), v)
    # Default (bf16-multiplicand) precision: these matrices act on HDR
    # radiance whose downstream consumers are a denoiser with an RGB9E5
    # (9-bit-mantissa) history and an 8-bit tonemapped output — bf16's
    # ~0.4% matmul error is far below both. Measured ~2x on the (2M,3)
    # full-frame conversions vs precision="highest" (CPU ignores the
    # hint, so host/CPU-test numerics are unchanged).
    return xp.einsum("ij,...j->...i", xp.asarray(m), v)


def srgb_to_acescg(v, xp=np):
    return _mat(v, SRGB_TO_ACESCG, xp)


def acescg_to_srgb(v, xp=np):
    return _mat(v, ACESCG_TO_SRGB, xp)


def xyz_to_acescg(v, xp=np):
    return _mat(v, XYZ_TO_ACESCG, xp)


def acescg_to_xyz(v, xp=np):
    return _mat(v, ACESCG_TO_XYZ, xp)


def srgb_eotf(c, xp=np):
    """sRGB-encoded → linear (normal.glsl SRGBToLinear)."""
    c = xp.asarray(c)
    return xp.where(c < 0.04045, c / 12.92, ((xp.abs(c) + 0.055) / 1.055) ** 2.4)


def srgb_oetf(c, xp=np):
    """Linear → sRGB-encoded (tone_map.comp LinearToSRGB / the importer's
    linear2srgb in crates/vox/src/geometry.rs:103-110)."""
    c = xp.asarray(c)
    return xp.where(
        c <= 0.0031308,
        12.92 * c,
        1.055 * xp.maximum(c, 1e-12) ** (1.0 / 2.4) - 0.055,
    )


def luminance_rec601(rgb, xp=np):
    """Histogram luminance weight used by auto_exposure.comp (colorToBin)."""
    w = xp.asarray(np.array([0.299, 0.587, 0.114], dtype=np.float32))
    return xp.sum(rgb * w, axis=-1)
