"""Evaluation CLI (parity: reference test.py:25-93): full-frame rendering of
the test split, prints mean PSNR/SSIM/LPIPS; --vis saves triptych pngs."""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--cfg_file", type=str, default=None,
                        help="config; defaults to the one stored in the ckpt")
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--vis", action="store_true")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    from animnerf_tpu.cli.common import resolve_cfg
    from animnerf_tpu.training.loop import evaluate

    cfg = resolve_cfg(args.ckpt_path, args.cfg_file, args.opts)
    out_dir = os.path.join(cfg.outputs_dir, cfg.exp_name)
    means = evaluate(cfg, args.ckpt_path, split=args.split,
                     save_vis=args.vis, out_dir=out_dir)
    for k, v in means.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
