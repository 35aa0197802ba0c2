"""RobustVideoMatting driver: frames -> RGBA (alpha = matte).

Parity: reference tools/rvm.py:19-63. RVM is an external torch model
(git submodule + CUDA in the reference); this driver owns everything
around it — frame ordering, the recurrent-state warm-up, alpha merge,
RGBA png output — and takes the model itself as an injected callable
with RVM's recurrent signature

    model(src, r1, r2, r3, r4, downsample_ratio)
        -> (fgr, pha, r1, r2, r3, r4)

so the pipeline is testable end to end without the external checkpoint
(tests/test_tools.py fabricates a recurrent model). The warm-up trick is
preserved: the first `warmup` frames are re-fed in REVERSE order so the
recurrent state converges before the first real output (reference :31),
and those warm-up outputs are discarded.

When no model is injected, the CLI loads a torchscript checkpoint or the
torch-hub resnet50 (network required) exactly like the reference's
submodule path. On hermetic pods masks can instead come from any external
matting tool as long as they land in the png alpha channel.
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, Optional


def _load_torch_model(checkpoint: str):
    import torch

    if checkpoint and checkpoint.endswith(".torchscript"):
        model = torch.jit.load(checkpoint)
    else:
        from torch import hub

        model = hub.load("PeterL1n/RobustVideoMatting", "resnet50",
                         pretrained=True)  # requires network / cache
    model = model.eval()

    def call(src, *rec_and_ratio):
        with torch.no_grad():
            return model(src, *rec_and_ratio)

    return call


def run_rvm(images_dir: str, out_dir: str,
            model: Optional[Callable] = None, checkpoint: str = "",
            warmup: int = 4, downsample_ratio: float = 0.25) -> int:
    """Matte every png/jpg in images_dir into RGBA pngs in out_dir.

    model: injected RVM-signature callable; when None, loaded from
    `checkpoint` (torchscript) or torch hub (reference submodule path).
    Returns the number of frames written.
    """
    import cv2
    import numpy as np
    import torch

    if model is None:
        model = _load_torch_model(checkpoint)

    os.makedirs(out_dir, exist_ok=True)
    frames = sorted(f for f in os.listdir(images_dir)
                    if f.endswith((".png", ".jpg")))
    # warm-up: prepend the first frames reversed (reference tools/rvm.py:31)
    # clip the skip to the prefix actually prepended — with fewer frames
    # than `warmup`, skipping a fixed `warmup` would drop real frames
    n_warm = len(frames[:warmup])
    order = frames[:warmup][::-1] + frames
    rec = [None] * 4
    n_out = 0
    for i, name in enumerate(order):
        img = cv2.imread(os.path.join(images_dir, name))
        rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        src = torch.from_numpy(rgb).float().permute(2, 0, 1)[None] / 255.0
        fgr, pha, *rec = model(src, *rec, downsample_ratio)
        if i < n_warm:
            continue  # warm-up output discarded; only its rec state is kept
        alpha = (np.asarray(pha[0, 0]) * 255).astype(np.uint8)
        rgba = np.dstack([img, alpha])  # BGR + A: cv2.imwrite expects BGRA
        out_name = os.path.splitext(name)[0] + ".png"
        cv2.imwrite(os.path.join(out_dir, out_name), rgba)
        n_out += 1
    return n_out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--images_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default="",
                        help="RVM torchscript/hub checkpoint")
    parser.add_argument("--warmup", type=int, default=4)
    parser.add_argument("--downsample_ratio", type=float, default=0.25)
    args = parser.parse_args(argv)
    n = run_rvm(args.images_dir, args.out_dir, checkpoint=args.checkpoint,
                warmup=args.warmup, downsample_ratio=args.downsample_ratio)
    print(f"matted {n} frames")


if __name__ == "__main__":
    main()
