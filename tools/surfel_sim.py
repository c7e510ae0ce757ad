"""Surfel-pass ordering experiment: cell-major (cell*6+face, current)
vs face-major (face*C+cell) pool layout, measured with the march_sim
machinery on the real canonical scene.

The dense-GI surfel pass traces 2 rays per (cell, face) row: a cosine
ray rotated into the face hemisphere and a sun-NEE shadow ray (dead when
the face points away from the sun). Pallas tiles are 1024 consecutive
pool rows, so the layout decides what a lockstep tile shares:

* cell-major: 6 faces interleave — every tile mixes 6 hemispheres of
  cosine directions and ~half-dead NEE lanes *scattered inside* the tile
  (dead lanes still pay the tile max).
* face-major: a tile is ~1024 consecutive cells of ONE face — coherent
  hemisphere, and NEE-dead tiles become *entirely* dead (the kernel's
  per-program early-exit skips them outright). The cost: per-tile origin
  spread grows from ~171 to ~1024 consecutive hierarchy-order leaves.

Usage: python tools/surfel_sim.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from march_sim import build_fields, march_counts


def pool_tile_economy(iters, tile=1024):
    n = (len(iters) // tile) * tile
    t = iters[:n].reshape(-1, tile)
    tmax = t.max(axis=1)
    return float(iters.mean()), float(tmax.mean()), float(tmax.sum()), \
        int((tmax == 0).sum()), t.shape[0]


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from dust_tpu.ops import packing as pk
    from dust_tpu.ops.noise import load_blue_noise
    from dust_tpu.render.scene import build_device_scene
    from dust_tpu.vox import procgen
    from dust_tpu.vox.loader import load_vox_scene

    vox = load_vox_scene(procgen.castle_scene_bytes())
    procgen.add_teapot(vox)
    scene = build_device_scene(vox)

    class Flat:
        leaf_origin = None
    valid = (np.asarray(scene.mask_lo[0]) | np.asarray(scene.mask_hi[0])) != 0
    Flat.leaf_origin = np.asarray(scene.leaf_origin[0])[valid]
    dist16, occ64 = build_fields(Flat)
    C = int(valid.sum())
    print(f"castle: {C} leaves")

    # Surfel geometry for instance 0 (castle), object space == world
    # space up to the rigid transform; we march in object space as the
    # kernel does.
    centers = Flat.leaf_origin.astype(np.float32) + 2.0  # (C,3)
    normals = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                        [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)

    bn = load_blue_noise()
    page = np.asarray(bn.unitvec3_cosine[0]).reshape(-1, 3)  # (128*128,3)

    def rays(order):
        """order: (R,2) array of (cell, face) per pool row."""
        cell, face = order[:, 0], order[:, 1]
        nrm = normals[face]
        org = centers[cell] + 2.01 * nrm
        R = len(order)
        reps = -(-R // page.shape[0])
        cos = np.tile(page, (reps, 1))[:R] * 2.0 - 1.0
        d = np.asarray(pk.rotate_vector_by_normal(
            jnp.asarray(nrm), jnp.asarray(cos)))
        dl = np.linalg.norm(d, axis=-1, keepdims=True)
        return org, (d / np.maximum(dl, 1e-20)).astype(np.float32), nrm

    # cell-major: rows [(c,0..5) for c in cells]; face-major: [(f, all c)]
    cm = np.stack([np.repeat(np.arange(C), 6),
                   np.tile(np.arange(6), C)], axis=1)
    fm = np.stack([np.tile(np.arange(C), 6),
                   np.repeat(np.arange(6), C)], axis=1)

    sun = np.array([0.48, 0.7, 0.53], np.float32)
    sun /= np.linalg.norm(sun)

    for label, order in (("cell-major", cm), ("face-major", fm)):
        org, d, nrm = rays(order)
        R = len(order)
        smin = np.full(R, 0.1, np.float32)
        smax = np.full(R, 1e5, np.float32)
        it, _ = march_counts(dist16, occ64, org, d, smin, smax, substeps=5)
        mean, tmax, tsum, dead, ntiles = pool_tile_economy(it)
        print(f"[{label}] cosine: mean {mean:.2f} tile-max {tmax:.2f} "
              f"(waste {tmax/max(mean,1e-9):.2f}x) total-lockstep {tsum:.0f}")
        # sun-NEE: dead when face points away from sun.
        facing = (nrm @ sun) > 0
        sx = np.where(facing, 1e5, -1.0).astype(np.float32)
        itn, _ = march_counts(dist16, occ64, org,
                              np.broadcast_to(sun, (R, 3)).astype(np.float32),
                              smin, sx, substeps=5)
        mean, tmax, tsum, dead, ntiles = pool_tile_economy(itn)
        print(f"[{label}] sun-NEE: mean {mean:.2f} tile-max {tmax:.2f} "
              f"total-lockstep {tsum:.0f} dead-tiles {dead}/{ntiles}")


if __name__ == "__main__":
    main()
