"""Visualization helpers (depth/alpha colormaps, triptych grids).

Parity: /root/reference/utils/__init__.py:107-159 — GT | prediction | jet
depth panels.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def colorize_depth(depth: np.ndarray) -> np.ndarray:
    """(H, W) depth -> (H, W, 3) uint8 jet colormap, normalized like the
    reference (min clipped to max-2)."""
    x = np.nan_to_num(np.asarray(depth, np.float32))
    ma = float(x.max())
    mi = min(float(x.min()), ma - 2.0)
    x = (x - mi) / (ma - mi + 1e-8)
    x = (255 * np.clip(x, 0, 1)).astype(np.uint8)
    bgr = cv2.applyColorMap(x, cv2.COLORMAP_JET)
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)


def colorize_alpha(alpha: np.ndarray) -> np.ndarray:
    x = (255 * np.clip(np.asarray(alpha, np.float32), 0, 1)).astype(np.uint8)
    bgr = cv2.applyColorMap(x, cv2.COLORMAP_JET)
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (255 * np.clip(np.asarray(img, np.float32), 0, 1)).astype(np.uint8)


def triptych(img_gt: np.ndarray, img_pred: np.ndarray,
             depth: np.ndarray) -> np.ndarray:
    """GT | pred | depth side-by-side, uint8 (H, 3W, 3)."""
    return np.concatenate(
        [to_uint8(img_gt), to_uint8(img_pred), colorize_depth(depth)], axis=1)


def save_image(path: str, img: np.ndarray) -> None:
    """img float [0,1] or uint8, RGB."""
    if img.dtype != np.uint8:
        img = to_uint8(img)
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))


def save_triptych(path: str, img_gt, img_pred, depth) -> None:
    save_image(path, triptych(img_gt, img_pred, depth))
