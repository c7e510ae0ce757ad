"""Probe the history quad-gather's emitter regime (denoise._fetch_history).

The half-res history quad table is (540*960=518400, 12) int32 (48 B
rows) gathered by 518400 indices — the row count sits inside the
measured slow-emitter window (220k, 524288). This measures whether
padding the table past 524288 rows (or other splits) moves it to a
faster emitter, with the REAL index pattern (near-identity reprojection,
not uniform random — emitters may specialise).

Usage: python tools/history_gather_probe.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

H2, W2 = 540, 960
N = H2 * W2


def probe(rows, idx, reps=5, cols=12):
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    table = jnp.asarray(
        np.random.randint(0, 100, size=(rows, cols), dtype=np.int32))

    @jax.jit
    def f(t, i):
        return jnp.sum(jnp.take(t, i, axis=0), dtype=jnp.int64)

    float(f(table, idx))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(table, idx))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    # Near-identity reprojection: each pixel reads a row within a few
    # pixels of itself (orbit camera, ~1 px/frame motion).
    base = np.arange(N, dtype=np.int32)
    jitter = rng.integers(-2, 3, size=N).astype(np.int32) \
        + W2 * rng.integers(-2, 3, size=N).astype(np.int32)
    idx_near = np.clip(base + jitter, 0, N - 1)
    idx_rand = rng.integers(0, N, size=N, dtype=np.int32)

    rt = probe(1024, jnp.asarray(idx_rand % 1024))
    print(f"baseline 1k-row: {rt*1e3:.2f} ms (incl RTT)")
    for rows in (518400, 524288, 589824, 655360):
        for label, idx in (("near", idx_near), ("rand", idx_rand)):
            dt = probe(rows, jnp.asarray(idx))
            print(f"  {rows:>7} rows 48B ({rows*48/1e6:5.1f} MB) {label}: "
                  f"{dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
