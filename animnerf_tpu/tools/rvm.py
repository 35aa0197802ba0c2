"""RobustVideoMatting wrapper: frames -> RGBA (alpha = matte).

Parity: reference tools/rvm.py:19-63. RVM is an external torch model
(git submodule + CUDA in the reference); here it runs on CPU torch when the
checkpoint is available. The warm-up trick is preserved: the first frames
are re-fed in reverse so the recurrent state converges before real output
(reference :31). On TPU pods without the RVM checkpoint this tool degrades
to a documented error — masks can instead be produced by any external
matting tool as long as they land in the png alpha channel.
"""

from __future__ import annotations

import argparse
import os


def run_rvm(images_dir: str, out_dir: str, checkpoint: str,
            warmup: int = 4) -> int:
    import cv2
    import numpy as np
    import torch

    model = torch.jit.load(checkpoint) if checkpoint.endswith(".torchscript") \
        else None
    if model is None:
        from torch import hub

        model = hub.load("PeterL1n/RobustVideoMatting", "resnet50",
                         pretrained=True)  # requires network / cache
    model = model.eval()

    os.makedirs(out_dir, exist_ok=True)
    frames = sorted(f for f in os.listdir(images_dir) if f.endswith((".png", ".jpg")))
    # warm-up: prepend the first frames reversed (reference tools/rvm.py:31)
    order = frames[:warmup][::-1] + frames
    rec = [None] * 4
    n_out = 0
    with torch.no_grad():
        for i, name in enumerate(order):
            img = cv2.imread(os.path.join(images_dir, name))
            rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            src = torch.from_numpy(rgb).float().permute(2, 0, 1)[None] / 255.0
            fgr, pha, *rec = model(src, *rec, 0.25)
            if i < warmup:
                continue
            alpha = (pha[0, 0].numpy() * 255).astype(np.uint8)
            rgba = np.dstack([img, alpha])
            cv2.imwrite(os.path.join(out_dir, name), rgba)
            n_out += 1
    return n_out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--images_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default="",
                        help="RVM torchscript/hub checkpoint")
    args = parser.parse_args(argv)
    n = run_rvm(args.images_dir, args.out_dir, args.checkpoint)
    print(f"matted {n} frames")


if __name__ == "__main__":
    main()
