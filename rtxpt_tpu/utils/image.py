"""Image I/O and comparison metrics (host code).

Replaces the reference's screenshot path + ImageMagick golden comparison
(reference: Support/tests/_2_compare.ps1:26-47 `compare -metric AE|PSNR`,
Sample screenshot saves) with numpy/PIL equivalents used by the pytest
golden harness (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def save_png(path: str, img: np.ndarray) -> None:
    """Save a [H,W,3] float image in [0,1] (display-ready) as PNG."""
    from PIL import Image

    Image.fromarray(to_uint8(img), mode="RGB").save(path)


def load_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0


def save_npy(path: str, img: np.ndarray) -> None:
    np.save(path, np.asarray(img, dtype=np.float32))


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    e = rmse(a, b)
    if e == 0:
        return float("inf")
    return float(20.0 * np.log10(peak / e))


def absolute_error_count(a: np.ndarray, b: np.ndarray, tol: float = 0.0) -> int:
    """ImageMagick `compare -metric AE` analog: count of differing pixels."""
    diff = np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)),
                  axis=-1)
    return int(np.sum(diff > tol))
