"""Image-quality metrics: PSNR, SSIM, LPIPS.

Parity target /root/reference/models/evaluator.py:9-27 (torchmetrics PSNR
with data_range=1.0, SSIM, and LPIPS-AlexNet invoked on [0,1] images
*without* the [-1,1] normalize flag — replicated deliberately).

PSNR/SSIM are pure numpy/jnp. LPIPS needs the pretrained AlexNet weights;
when the `lpips` pip package (or torch hub weights) is unavailable —
offline TPU pods — the evaluator degrades gracefully and reports
psnr/ssim only.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def psnr(pred: np.ndarray, target: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(pred, np.float64)
                         - np.asarray(target, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range**2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def ssim(pred: np.ndarray, target: np.ndarray, data_range: float = 1.0,
         k1: float = 0.01, k2: float = 0.03) -> float:
    """Mean SSIM with the standard 11x11 gaussian window (Wang et al. 2004,
    the same definition torchmetrics uses). Inputs (H, W, C) in [0, 1]."""
    from scipy.signal import convolve2d  # scipy is baked in

    p = np.asarray(pred, np.float64)
    t = np.asarray(target, np.float64)
    if p.ndim == 2:
        p, t = p[..., None], t[..., None]
    kern = _gaussian_kernel()
    window = np.outer(kern, kern)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    vals = []
    for c in range(p.shape[-1]):
        x, y = p[..., c], t[..., c]
        mu_x = convolve2d(x, window, mode="valid")
        mu_y = convolve2d(y, window, mode="valid")
        xx = convolve2d(x * x, window, mode="valid") - mu_x**2
        yy = convolve2d(y * y, window, mode="valid") - mu_y**2
        xy = convolve2d(x * y, window, mode="valid") - mu_x * mu_y
        s = ((2 * mu_x * mu_y + c1) * (2 * xy + c2)) / (
            (mu_x**2 + mu_y**2 + c1) * (xx + yy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))


class LPIPSTorch:
    """LPIPS-AlexNet via the CPU torch package; weights must be available
    locally (offline environments skip it)."""

    def __init__(self):
        import lpips  # noqa — optional dependency
        import torch

        self._torch = torch
        self._net = lpips.LPIPS(net="alex")
        self._net.eval()

    def __call__(self, pred: np.ndarray, target: np.ndarray) -> float:
        torch = self._torch
        # NOTE: the reference feeds [0,1] images without normalize=True
        # (evaluator.py:20-27) — keep that convention for metric parity.
        def prep(x):
            t = torch.from_numpy(np.asarray(x, np.float32))
            if t.ndim == 3:
                t = t.permute(2, 0, 1)[None]
            return t

        with torch.no_grad():
            return float(self._net(prep(pred), prep(target)).item())


class Evaluator:
    """Bundles the three metrics; mirrors reference Evaluator.__call__."""

    def __init__(self, use_lpips: bool = True,
                 lpips_weights: "str | None" = None):
        self.lpips = None
        if use_lpips:
            # priority: explicit/converted JAX weights (offline-friendly),
            # then the torch lpips package
            import os

            weights = lpips_weights or os.environ.get(
                "ANIMNERF_LPIPS_WEIGHTS", "assets/lpips_alex.npz")
            if os.path.exists(weights):
                from animnerf_tpu.models.lpips_jax import LPIPSJax

                self.lpips = LPIPSJax(weights)
            else:
                try:
                    self.lpips = LPIPSTorch()
                except Exception:
                    self.lpips = None  # offline / lpips not installed

    def __call__(self, img_pred: np.ndarray, img_gt: np.ndarray) -> dict:
        out = {
            "psnr": psnr(img_pred, img_gt),
            "ssim": ssim(img_pred, img_gt),
        }
        if self.lpips is not None:
            out["lpips"] = self.lpips(img_pred, img_gt)
        return out
