"""Bit-exact packing / geometric helper functions from the shader headers.

* LogLuv HDR radiance pack (``headers/spatial_hash.glsl:22-93``) — the
  spatial-hash cache stores radiance as one u32 (14-bit log-luminance +
  2×9-bit chroma).
* REBLUR YCoCg radiance+hit-distance pack (``headers/nrd.glsl``).
* Octahedral unit-vector encode (``nrd.glsl _NRD_EncodeUnitVector``).
* Cube-face normals + face ids (``headers/normal.glsl``).
* ``rotateVectorByNormal`` — quaternion rotate of a z-up sample to a
  normal frame (normal.glsl, used by every cosine-sampled ray).

uint32 arithmetic notes: TPUs have no u64; everything here is u32/i32,
like the GLSL fallback paths.
"""

from __future__ import annotations

import jax.numpy as jnp

from dust_tpu.utils import color as colorlib

__all__ = [
    "encode_logluv", "decode_logluv",
    "pack_radiance_hitdist", "unpack_radiance_hitdist",
    "linear_to_ycocg", "ycocg_to_linear",
    "encode_oct_normal", "decode_oct_normal",
    "pack_normal_roughness", "unpack_normal_roughness",
    "cubed_normalize", "normal_to_face_id", "face_id_to_normal",
    "rotate_vector_by_normal",
]

NRD_FP16_MIN = 1e-7


def _u32(x):
    return jnp.asarray(x).astype(jnp.uint32)


def encode_logluv(color: jnp.ndarray) -> jnp.ndarray:
    """ACEScg RGB -> 32-bit LogLuv (spatial_hash.glsl:28-60)."""
    xyz = colorlib.acescg_to_xyz(color, xp=jnp)
    y = xyz[..., 1]
    log_y = 409.6 * (jnp.log2(jnp.maximum(y, 1e-30)) + 20.0)
    le = jnp.clip(log_y, 0.0, 16383.0).astype(jnp.uint32)

    inv_denom = 1.0 / jnp.maximum(
        -2.0 * xyz[..., 0] + 12.0 * xyz[..., 1] + 3.0 * jnp.sum(xyz, axis=-1), 1e-30
    )
    u = 4.0 * xyz[..., 0] * inv_denom
    v = 9.0 * xyz[..., 1] * inv_denom
    ue = jnp.clip(820.0 * u, 0.0, 511.0).astype(jnp.uint32)
    ve = jnp.clip(820.0 * v, 0.0, 511.0).astype(jnp.uint32)

    packed = (le << 18) | (ue << 9) | ve
    return jnp.where(le == 0, jnp.uint32(0), packed)


def decode_logluv(packed: jnp.ndarray) -> jnp.ndarray:
    """32-bit LogLuv -> ACEScg RGB (spatial_hash.glsl:64-93)."""
    packed = _u32(packed)
    le = packed >> 18
    log_y = (le.astype(jnp.float32) + 0.5) / 409.6 - 20.0
    y = jnp.exp2(log_y)

    ue = ((packed >> 9) & 0x1FF).astype(jnp.float32)
    ve = (packed & 0x1FF).astype(jnp.float32)
    u = (ue + 0.5) / 820.0
    v = (ve + 0.5) / 820.0
    inv_denom = 1.0 / (6.0 * u - 16.0 * v + 12.0)
    x_c = 9.0 * u * inv_denom
    y_c = 4.0 * v * inv_denom
    s = y / jnp.maximum(y_c, 1e-9)
    xyz = jnp.stack([s * x_c, y, s * (1.0 - x_c - y_c)], axis=-1)
    rgb = jnp.maximum(colorlib.xyz_to_acescg(xyz, xp=jnp), 0.0)
    return jnp.where((le == 0)[..., None], 0.0, rgb)


def linear_to_ycocg(color: jnp.ndarray) -> jnp.ndarray:
    y = color[..., 0] * 0.25 + color[..., 1] * 0.5 + color[..., 2] * 0.25
    co = color[..., 0] * 0.5 - color[..., 2] * 0.5
    cg = -0.25 * color[..., 0] + 0.5 * color[..., 1] - 0.25 * color[..., 2]
    return jnp.stack([y, co, cg], axis=-1)


def ycocg_to_linear(color: jnp.ndarray) -> jnp.ndarray:
    t = color[..., 0] - color[..., 2]
    g = color[..., 0] + color[..., 2]
    r = t + color[..., 1]
    b = t - color[..., 1]
    return jnp.maximum(jnp.stack([r, g, b], axis=-1), 0.0)


def pack_radiance_hitdist(radiance: jnp.ndarray, norm_hit_dist: jnp.ndarray) -> jnp.ndarray:
    """REBLUR_FrontEnd_PackRadianceAndNormHitDist (nrd.glsl). 0 hitdist is
    the "no data" sentinel, so nonzero values are floored at FP16_MIN."""
    hd = jnp.where(norm_hit_dist != 0.0,
                   jnp.maximum(norm_hit_dist, NRD_FP16_MIN), norm_hit_dist)
    return jnp.concatenate([linear_to_ycocg(radiance), hd[..., None]], axis=-1)


def unpack_radiance_hitdist(data: jnp.ndarray):
    """REBLUR_BackEnd_UnpackRadianceAndNormHitDist."""
    return ycocg_to_linear(data[..., :3]), data[..., 3]


def encode_oct_normal(n: jnp.ndarray, signed: bool = False) -> jnp.ndarray:
    """_NRD_EncodeUnitVector: octahedral map to 2 components."""
    n = n / jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    wrap = (1.0 - jnp.abs(n[..., [1, 0]])) * (jnp.where(n[..., :2] >= 0.0, 1.0, -1.0))
    xy = jnp.where((n[..., 2] >= 0.0)[..., None], n[..., :2], wrap)
    return xy if signed else xy * 0.5 + 0.5


def decode_oct_normal(p: jnp.ndarray, signed: bool = False,
                      normalize: bool = True) -> jnp.ndarray:
    p = p if signed else p * 2.0 - 1.0
    z = 1.0 - jnp.abs(p[..., 0]) - jnp.abs(p[..., 1])
    t = jnp.clip(-z, 0.0, 1.0)
    xy = p - t[..., None] * jnp.where(p >= 0.0, 1.0, -1.0)
    n = jnp.concatenate([xy, z[..., None]], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True) if normalize else n


def pack_normal_roughness(normal: jnp.ndarray, roughness, material_id) -> jnp.ndarray:
    """NRD_FrontEnd_PackNormalAndRoughness, R10G10B10A2 flavour: vec4 of
    (oct.x, oct.y, roughness, materialID/3)."""
    oct = encode_oct_normal(normal)
    r = jnp.broadcast_to(jnp.asarray(roughness, jnp.float32), oct.shape[:-1])
    m = jnp.clip(jnp.asarray(material_id, jnp.float32) / 3.0, 0.0, 1.0)
    m = jnp.broadcast_to(m, oct.shape[:-1])
    return jnp.concatenate([oct, r[..., None], m[..., None]], axis=-1)


def unpack_normal_roughness(p: jnp.ndarray):
    n = decode_oct_normal(p[..., :2])
    return n, p[..., 2], p[..., 3]


def cubed_normalize(d: jnp.ndarray) -> jnp.ndarray:
    """CubedNormalize (normal.glsl:40-43): dominant-axis cube-face normal."""
    a = jnp.abs(d)
    m = jnp.max(a, axis=-1, keepdims=True)
    return jnp.sign(d) * (a >= m).astype(d.dtype)


def normal_to_face_id(n: jnp.ndarray) -> jnp.ndarray:
    """normal2FaceID (normal.glsl:8-21): axis-aligned unit normal -> [0,6).
    Encoding: bit0 = sign positive, bits1-2 = axis (0=x,1=y,2=z)."""
    s = jnp.clip(jnp.sum(n, axis=-1), 0.0, 1.0)
    face = jnp.round(s).astype(jnp.int32)
    face = face + jnp.round(jnp.abs(n[..., 2])).astype(jnp.int32) * 4
    face = face + jnp.round(jnp.abs(n[..., 1])).astype(jnp.int32) * 2
    return face


def face_id_to_normal(face: jnp.ndarray) -> jnp.ndarray:
    """faceId2Normal (normal.glsl:23-30)."""
    s = (face & 1).astype(jnp.float32) * 2.0 - 1.0
    axis = face >> 1
    return s[..., None] * jnp.stack(
        [(axis == 0), (axis == 1), (axis == 2)], axis=-1
    ).astype(jnp.float32)


def rotate_vector_by_normal(normal: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """rotateVectorByNormal (normal.glsl:33-38): rotate ``target`` from the
    +z frame into the ``normal`` frame via the shortest-arc quaternion."""
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    q = jnp.stack([-ny, nx, jnp.zeros_like(nx), 1.0 + nz], axis=-1)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    degenerate = (nz < -0.99999)[..., None]
    q = jnp.where(degenerate, jnp.asarray([-1.0, 0.0, 0.0, 0.0]), q)
    qv, qw = q[..., :3], q[..., 3]
    dot_qt = jnp.sum(qv * target, axis=-1, keepdims=True)
    cross = jnp.cross(qv, target)
    return (
        2.0 * dot_qt * qv
        + (qw * qw - jnp.sum(qv * qv, axis=-1))[..., None] * target
        + 2.0 * qw[..., None] * cross
    )
