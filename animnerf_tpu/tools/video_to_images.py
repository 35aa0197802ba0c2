"""Video -> frames CLI with optional center-crop.

Parity: reference tools/video_to_images.py:7-81 (ffmpeg extraction +
center-crop with x/y offsets).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--video_path", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--fps", type=int, default=None)
    parser.add_argument("--crop_w", type=int, default=0)
    parser.add_argument("--crop_h", type=int, default=0)
    parser.add_argument("--offset_x", type=int, default=0)
    parser.add_argument("--offset_y", type=int, default=0)
    args = parser.parse_args(argv)

    from animnerf_tpu.utils.video import center_crop, video_to_images

    n = video_to_images(args.video_path, args.out_dir, fps=args.fps)
    print(f"extracted {n} frames")

    if args.crop_w and args.crop_h:
        import cv2

        for f in sorted(os.listdir(args.out_dir)):
            if not f.endswith(".png"):
                continue
            p = os.path.join(args.out_dir, f)
            img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
            img = center_crop(img, (args.crop_w, args.crop_h),
                              (args.offset_x, args.offset_y))
            cv2.imwrite(p, img)
        print(f"cropped to {args.crop_w}x{args.crop_h}")


if __name__ == "__main__":
    main()
