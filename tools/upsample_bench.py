"""Microbench the half->full-res upsample conv variants on the TPU.

Current shape: (540,960,9) -> transposed conv -> (1080,1920,18) NCHW.
Variants:
  a. current: block-diag kernel, 18 out channels, NCHW out
  b. 13 out channels (nearest block only carries img3+hd — the only
     channels the edge fallback reads)
  c. separable two-pass (4x1 then 1x4), 13 ch
  d. 13 ch + bf16 conv output (consumer compares/selects; tolerant)

Timing per CLAUDE.md: scalar-fetch sync, best-of-N.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
import numpy as np

H2, W2, C = 540, 960, 9
HF, WF = 1080, 1920
K_BILIN = (0.25, 0.75, 0.75, 0.25)
K_NEAREST = (0.0, 1.0, 1.0, 0.0)


def kern(c_b, c_n, dtype=jnp.float32):
    kb = jnp.asarray(K_BILIN, dtype)
    kn = jnp.asarray(K_NEAREST, dtype)
    k2b = kb[:, None] * kb[None, :]
    k2n = kn[:, None] * kn[None, :]
    eye_b = jnp.eye(C, c_b, dtype=dtype)
    eye_n = jnp.eye(C, c_n, dtype=dtype)
    return jnp.concatenate(
        [k2b[:, :, None, None] * eye_b, k2n[:, :, None, None] * eye_n],
        axis=-1)


def v_current(x):
    k = kern(C, C)
    out = jax.lax.conv_general_dilated(
        x[None], k, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NCHW"))[0]
    return jnp.moveaxis(out, 0, -1)[:HF, :WF]


def v_13(x):
    k = kern(C, 4)
    out = jax.lax.conv_general_dilated(
        x[None], k, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NCHW"))[0]
    return jnp.moveaxis(out, 0, -1)[:HF, :WF]


def v_sep(x):
    kb = jnp.asarray(K_BILIN, x.dtype)
    kn = jnp.asarray(K_NEAREST, x.dtype)
    eye_b = jnp.eye(C, C, dtype=x.dtype)
    eye_n = jnp.eye(C, 4, dtype=x.dtype)
    k1 = jnp.concatenate([kb[:, None, None, None] * eye_b,
                          kn[:, None, None, None] * eye_n], axis=-1)
    y = jax.lax.conv_general_dilated(
        x[None], k1, (1, 1), ((2, 2), (0, 0)), lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    # second pass: horizontal, block-diag (bilin on first C, nearest on 4)
    z = jnp.zeros((13, 13), x.dtype)
    blk = z.at[jnp.arange(C), jnp.arange(C)].set(1.0)
    blk2 = z.at[C + jnp.arange(4), C + jnp.arange(4)].set(1.0)
    k2 = (kb[None, :, None, None] * blk + kn[None, :, None, None] * blk2)
    out = jax.lax.conv_general_dilated(
        y[None], k2, (1, 1), ((0, 0), (2, 2)), lhs_dilation=(1, 2),
        dimension_numbers=("NHWC", "HWIO", "NCHW"))[0]
    return jnp.moveaxis(out, 0, -1)[:HF, :WF]


def v_13_bf16(x):
    k = kern(C, 4, jnp.bfloat16)
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16)[None], k, (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NCHW"))[0]
    return jnp.moveaxis(out, 0, -1)[:HF, :WF].astype(jnp.float32)


def bench(name, fn, x):
    f = jax.jit(fn)
    r = f(x)
    float(jnp.sum(r[..., 0]))  # sync
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        r = f(x)
        s = float(jnp.sum(r[..., 0]))
        ts.append(time.perf_counter() - t0)
    best = min(ts) * 1e3 - 23.0  # subtract tunnel RTT
    print(f"{name:12s} {best:7.2f} ms  (out {r.shape} {r.dtype})")


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((H2, W2, C), np.float32))
    bench("current18", v_current, x)
    bench("ch13", v_13, x)
    bench("sep13", v_sep, x)
    bench("ch13-bf16", v_13_bf16, x)


if __name__ == "__main__":
    main()
