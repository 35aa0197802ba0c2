"""LPIPS (AlexNet) perceptual metric in JAX/flax.

The reference evaluates LPIPS via the `lpips` pip package's pretrained
AlexNet (models/evaluator.py:5,14,20-27 — note it feeds [0,1] images
without the normalize flag; we replicate that convention). The pretrained
weights are license-gated downloads, so this module provides:

  * the exact LPIPS-alex architecture in flax (5 conv stages, unit-normalised
    channel differences, 1x1 linear heads, spatial mean, stage sum);
  * `convert_torch_lpips(path)` — one-time conversion of the torch `lpips`
    package's weights (or a torch checkpoint of them) into an npz this
    module loads anywhere, torch-free (utils/torch_pickle.py).

Without a weights file, Evaluator simply omits the lpips score.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# AlexNet feature config: (out_channels, kernel, stride, padding)
_ALEX_LAYERS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# maxpool after stages 0, 1 (and before stages 2); relu after each conv
_POOL_AFTER = {0, 1}
_STAGE_CHANNELS = [64, 192, 384, 256, 256]

# ImageNet scaling baked into lpips.LPIPS (scaling_layer shift/scale)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    import jax

    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def _features(params: dict, x):
    """x (N,H,W,3) already shift/scaled -> list of 5 stage activations."""
    import jax.numpy as jnp

    feats = []
    h = x
    for i, (_, _, stride, pad) in enumerate(_ALEX_LAYERS):
        h = _conv(h, params[f"conv{i}_w"], params[f"conv{i}_b"], stride, pad)
        h = jnp.maximum(h, 0.0)
        feats.append(h)
        if i in _POOL_AFTER:
            import jax

            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                "VALID")
    return feats


def lpips_distance(params: dict, img0, img1) -> float:
    """LPIPS-alex distance between (H,W,3) images in [0,1].

    NB: reproduces the reference convention of NOT mapping to [-1,1]
    (evaluator.py:20-27)."""
    import jax.numpy as jnp

    def prep(im):
        x = jnp.asarray(im, jnp.float32)[None]  # (1,H,W,3)
        return (x - _SHIFT) / _SCALE

    f0 = _features(params, prep(img0))
    f1 = _features(params, prep(img1))
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        diff = (a - b) ** 2
        lin = params[f"lin{i}_w"]  # (C,) nonneg 1x1 conv weights
        total = total + jnp.mean(jnp.sum(diff * lin, axis=-1))
    return total


def load_weights(path: str) -> dict:
    import jax.numpy as jnp

    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def convert_torch_lpips(alexnet_ckpt: str, lpips_lin_ckpt: str,
                        out_path: str) -> str:
    """Convert torch AlexNet features + lpips linear heads to our npz.

    Accepts every layout the lpips ecosystem ships (all read torch-free):
      * alexnet_ckpt: torchvision alexnet state_dict (.pth) —
        features.{0,3,6,8,10}.{weight,bias} — OR a full lpips.LPIPS module
        state_dict, whose alexnet wrapper preserves the torchvision layer
        indices inside slice modules: net.slice{1..5}.{0,3,6,8,10}.*;
      * lpips_lin_ckpt: the package's weights/v0.1/alex.pth (linear heads
        only, lin{0..4}.model.1.weight) or the same full-module dict
        (lins.{0..4}.model.1.weight). Pass one file as both arguments when
        everything lives in a single full-module checkpoint.
    Reference consumer: /root/reference/models/evaluator.py:14."""
    from animnerf_tpu.utils.torch_pickle import load_torch_checkpoint

    alex = load_torch_checkpoint(alexnet_ckpt)
    alex = alex.get("state_dict", alex)
    lin = (alex if lpips_lin_ckpt == alexnet_ckpt
           else load_torch_checkpoint(lpips_lin_ckpt))
    lin = lin.get("state_dict", lin)

    out = {}
    torch_idx = [0, 3, 6, 8, 10]
    for i, ti in enumerate(torch_idx):
        for key in (f"features.{ti}", f"net.slice{i + 1}.{ti}"):
            if f"{key}.weight" in alex:
                break
        else:
            raise KeyError(
                f"conv{i} weights (features.{ti} / net.slice{i + 1}.{ti}) "
                f"not found in {alexnet_ckpt}")
        w = np.asarray(alex[f"{key}.weight"])          # (O,I,kh,kw)
        out[f"conv{i}_w"] = w.transpose(2, 3, 1, 0)    # HWIO
        out[f"conv{i}_b"] = np.asarray(alex[f"{key}.bias"])
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lin:
                out[f"lin{i}_w"] = np.asarray(lin[key]).reshape(-1)
                break
        else:
            raise KeyError(f"lin{i} weights not found in {lpips_lin_ckpt}")
    np.savez(out_path, **out)
    return out_path


def random_params(seed: int = 0) -> dict:
    """Random weights with the right shapes (tests / smoke only)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    out = {}
    cin = 3
    for i, (cout, kk, _, _) in enumerate(_ALEX_LAYERS):
        out[f"conv{i}_w"] = jnp.asarray(
            rng.normal(scale=0.05, size=(kk, kk, cin, cout)).astype(np.float32))
        out[f"conv{i}_b"] = jnp.zeros(cout)
        out[f"lin{i}_w"] = jnp.asarray(
            rng.uniform(0, 0.1, size=cout).astype(np.float32))
        cin = cout
    return out


class LPIPSJax:
    """Evaluator plug-in: LPIPS from an npz weights file."""

    def __init__(self, weights_path: str):
        import jax

        self.params = load_weights(weights_path)
        self._fn = jax.jit(lpips_distance)

    def __call__(self, pred: np.ndarray, target: np.ndarray) -> float:
        return float(self._fn(self.params, pred, target))
