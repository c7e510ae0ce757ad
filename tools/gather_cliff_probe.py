"""Map the XLA row-gather emitter cliff vs table row count / row bytes.

The v5e lowers a 2M-index row gather through one of (at least) three
emitters depending on table geometry; round 2 measured a ~3.5-8 MB dead
zone for 16 B rows (render/scene.py:_material_rgba_rows). The round-4
castle doubled the leaf count and pushed voxel_attr (64 B rows) and the
dense GI cache (12 B rows) into a slow regime (35 ms / 11 ms per frame,
tools/profile_attrib.py). This probes the actual thresholds for those
row widths so the tables can be sized around them.

Usage: python tools/gather_cliff_probe.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def probe(rows, cols, n=2_073_600, reps=5):
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    table = jnp.asarray(
        np.random.randint(0, 100, size=(rows, cols), dtype=np.int32))
    idx = jnp.asarray(np.random.randint(0, rows, size=n, dtype=np.int32))

    @jax.jit
    def f(t, i):
        return jnp.sum(jnp.take(t, i, axis=0), dtype=jnp.int64)

    float(f(table, idx))  # compile + warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(table, idx))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rt = probe(1024, 4)  # small-table baseline ~ roundtrip floor
    print(f"baseline 1k-row: {rt * 1e3:.2f} ms (incl ~23 ms RTT)")
    for cols, label, rowlist in [
        (16, "64B rows (voxel_attr)",
         [117_000, 131_072, 160_000, 200_000, 220_000, 234_000, 262_144,
          300_000, 400_000, 524_288, 600_000, 700_000]),
        (4, "16B rows (dense GI/material)",
         [188_000, 220_000, 262_144, 300_000, 352_000, 400_000, 524_288,
          600_000, 700_000]),
    ]:
        print(f"--- {label}")
        for rows in rowlist:
            dt = probe(rows, cols)
            print(f"  {rows:>8} rows ({rows * cols * 4 / 1e6:7.1f} MB): "
                  f"{dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
