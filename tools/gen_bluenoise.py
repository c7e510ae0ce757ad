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




# ---------------------------------------------------------------------------
# Spatio-temporal blue noise (reference: assets/stbn/*.png, 128x128x64;
# crates/render/src/noise.rs). Greedy stratified void-filling over a
# toroidal (T, N, N) volume with a separable gaussian energy — spatial
# sigma 1.9 within each slice, temporal sigma 1.1 across slices — so each
# frame-slice is an exact stratified uniform set that is spatially blue,
# while per-pixel value sequences decorrelate frame-to-frame (the
# property the reference's true STBN textures provide and golden-ratio
# rotation does not: the frame-difference field is itself noise, not a
# constant).
# ---------------------------------------------------------------------------

def gen_stbn(T=64, N=128, sigma_s=1.9, sigma_t=1.1, seed=0x57B1,
             out_path="dust_tpu/assets/stbn128x64.npy"):
    """Per-slice ranks 0..N*N-1 as (T, N, N) uint16."""
    import time
    rng = np.random.default_rng(seed)
    Rs = max(3, int(np.ceil(4.0 * sigma_s)))
    Rt = min(max(2, int(np.ceil(4.0 * sigma_t))), T // 2)
    ds = np.arange(-Rs, Rs + 1)
    dt = np.arange(-Rt, Rt + 1)
    ks = np.exp(-(ds ** 2) / (2 * sigma_s ** 2))
    kt = np.exp(-(dt ** 2) / (2 * sigma_t ** 2))
    K = kt[:, None, None] * ks[None, :, None] * ks[None, None, :]
    E = rng.random((T, N, N)) * 1e-6  # tie-break jitter
    occ = np.zeros((T, N, N), bool)
    rank = np.zeros((T, N, N), np.int32)
    t0 = time.time()
    order = np.arange(T)
    for r in range(N * N):
        rng.shuffle(order)  # vary slice visit order: no fixed t precedence
        for t in order:
            sl = np.where(occ[t], np.inf, E[t])
            i = int(np.argmin(sl))
            y, x = divmod(i, N)
            occ[t, y, x] = True
            rank[t, y, x] = r
            E[np.ix_((t + dt) % T, (y + ds) % N, (x + ds) % N)] += K
        if r % 2048 == 0:
            print(f"  rank {r}/{N*N}  ({time.time()-t0:.0f}s)", flush=True)
    np.save(out_path, rank.astype(np.uint16))
    print(f"wrote {out_path} in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    import sys
    if "stbn" in sys.argv:
        gen_stbn()
    else:
        main()
