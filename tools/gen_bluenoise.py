"""Generate a 128×128 blue-noise rank texture by void-and-cluster.

One-time tool; output is vendored at ``dust_tpu/assets/bluenoise128.npy``
(uint16 ranks 0..16383). The runtime derives the 6 spatio-temporal
variants of the reference's STBN textures (``assets/stbn/*.png``, git-LFS,
absent from the snapshot) from this rank texture — see
``dust_tpu/ops/noise.py``.

Algorithm: Ulichney's void-and-cluster with a toroidal gaussian energy
(sigma 1.9), all convolutions via FFT.
"""

import numpy as np

N = 128
SIGMA = 1.9
RNG = np.random.default_rng(0x5717B9)


def _energy_kernel():
    ax = np.arange(N)
    d = np.minimum(ax, N - ax).astype(np.float64)
    dx, dy = np.meshgrid(d, d, indexing="ij")
    r2 = dx * dx + dy * dy
    return np.exp(-r2 / (2.0 * SIGMA * SIGMA))


def _filtered(binary, kf):
    return np.real(np.fft.ifft2(np.fft.fft2(binary) * kf))


def main(out_path="dust_tpu/assets/bluenoise128.npy"):
    kf = np.fft.fft2(_energy_kernel())
    total = N * N
    ones_target = total // 10

    # Initial binary pattern: random, then swap tightest cluster <-> largest
    # void until stable.
    binary = np.zeros((N, N), dtype=np.float64)
    idx = RNG.choice(total, ones_target, replace=False)
    binary.flat[idx] = 1.0
    for _ in range(total):
        e = _filtered(binary, kf)
        cluster = np.unravel_index(np.argmax(np.where(binary > 0, e, -np.inf)), e.shape)
        binary[cluster] = 0.0
        e = _filtered(binary, kf)
        void = np.unravel_index(np.argmin(np.where(binary > 0, np.inf, e)), e.shape)
        binary[void] = 1.0
        if void == cluster:
            break

    rank = np.zeros((N, N), dtype=np.int64)
    # Phase 1: remove ones, ranking them down from ones_target-1.
    work = binary.copy()
    for r in range(ones_target - 1, -1, -1):
        e = _filtered(work, kf)
        c = np.unravel_index(np.argmax(np.where(work > 0, e, -np.inf)), e.shape)
        work[c] = 0.0
        rank[c] = r
    # Phase 2: fill voids upward.
    work = binary.copy()
    for r in range(ones_target, total):
        e = _filtered(work, kf)
        c = np.unravel_index(np.argmin(np.where(work > 0, np.inf, e)), e.shape)
        work[c] = 1.0
        rank[c] = r

    np.save(out_path, rank.astype(np.uint16))
    print(f"wrote {out_path}; rank uniques={len(np.unique(rank))}")


if __name__ == "__main__":
    main()
