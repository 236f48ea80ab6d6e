"""Image quantization and PNG I/O.

Quantization matches the reference writer exactly
(``/root/reference/ray_tracer/infrastructure/numpy/base.py:143-151``):
clip to [0, 1], scale by 255, truncate to uint8 (``astype`` truncates —
no rounding), per channel.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def to_uint8(image: np.ndarray | object) -> np.ndarray:
    """(H, W, 3) float image -> uint8, reference-exact truncation."""
    arr = np.asarray(image, dtype=np.float64)
    return (255.0 * np.clip(arr, 0.0, 1.0)).astype(np.uint8)


def save_png(image: np.ndarray | object, path: str | Path) -> None:
    from PIL import Image

    Image.fromarray(to_uint8(image), "RGB").save(str(path))


def load_png(path: str | Path) -> np.ndarray:
    """uint8 (H, W, 3) array from disk."""
    from PIL import Image

    return np.asarray(Image.open(str(path)).convert("RGB"))
