"""Image comparison: RMSE / PSNR between two renders.

BASELINE.json's quality gate is "<=1% RMSE vs the reference renderer";
the Vulkan reference cannot run in this environment, so this tool serves
(a) backend-vs-backend parity (pallas vs XLA wavefront), (b) regression
tracking between rounds via checked-in goldens.

Usage: python tools/rmse.py a.png b.png
"""

import sys

import numpy as np


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    return float(np.sqrt(np.mean((a - b) ** 2)))


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    e = rmse(a, b)
    return float("inf") if e == 0 else 20.0 * np.log10(peak / e)


def main():
    from dust_tpu.utils.image import read_png

    a = read_png(sys.argv[1]).astype(np.float64) / 255.0
    b = read_png(sys.argv[2]).astype(np.float64) / 255.0
    e = rmse(a, b)
    print(f"rmse {e:.5f} ({e*100:.2f}%), psnr {psnr(a, b):.2f} dB")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
