"""People-Snapshot dataset preparation.

Parity: reference tools/people_snapshot.py:16-93 — converts the raw
People-Snapshot release (video mp4, masks.hdf5, reconstructed_poses.hdf5,
consensus.pkl, camera.pkl) into the framework's on-disk layout:
cam000/camera.pkl, cam000/images/*.png (RGBA with the mask in alpha),
smpls/*.pkl per frame.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from animnerf_tpu.smpl.loader import load_pickle
from animnerf_tpu.utils.io import write_pickle_file


def rodrigues_np(r: np.ndarray) -> np.ndarray:
    import cv2

    return cv2.Rodrigues(np.asarray(r, np.float64))[0]


def prepare(people_dir: str, out_dir: str, gender_hint: str = "") -> None:
    import cv2
    import h5py

    os.makedirs(out_dir, exist_ok=True)
    img_dir = os.path.join(out_dir, "cam000", "images")
    smpl_dir = os.path.join(out_dir, "smpls")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(smpl_dir, exist_ok=True)

    name = os.path.basename(os.path.normpath(people_dir))

    # camera: the release's camera.pkl holds rodrigues rt + t + intrinsics
    cam_raw = load_pickle(os.path.join(people_dir, "camera.pkl"))
    video = os.path.join(people_dir, f"{name}.mp4")
    cap = cv2.VideoCapture(video)
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))

    camera = {
        "R": rodrigues_np(cam_raw["camera_rt"]),
        "t": np.asarray(cam_raw["camera_t"], np.float64),
        "camera_f": np.asarray(cam_raw["camera_f"], np.float64),
        "camera_c": np.asarray(cam_raw["camera_c"], np.float64),
        "camera_k": np.asarray(cam_raw["camera_k"], np.float64),
        "height": height,
        "width": width,
    }
    write_pickle_file(os.path.join(out_dir, "cam000", "camera.pkl"), camera)

    # poses: reconstructed_poses.hdf5 has pose (F, 72), trans (F, 3), betas
    with h5py.File(os.path.join(people_dir, "reconstructed_poses.hdf5"),
                   "r") as f:
        poses = np.asarray(f["pose"], np.float32)
        trans = np.asarray(f["trans"], np.float32)
        betas = np.asarray(f["betas"], np.float32)[:10]

    with h5py.File(os.path.join(people_dir, "masks.hdf5"), "r") as f:
        masks = f["masks"]
        n_frames = min(len(masks), int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
                       len(poses))
        for i in range(n_frames):
            ok, frame = cap.read()
            if not ok:
                break
            mask = (np.asarray(masks[i]) > 0).astype(np.uint8) * 255
            if mask.shape[:2] != frame.shape[:2]:
                mask = cv2.resize(mask, (frame.shape[1], frame.shape[0]),
                                  interpolation=cv2.INTER_NEAREST)
            rgba = np.dstack([frame, mask])  # BGR + alpha
            cv2.imwrite(os.path.join(img_dir, f"{i + 1:06d}.png"), rgba)

            params = {
                "betas": betas[None].astype(np.float32),
                "global_orient": poses[i, :3][None].astype(np.float32),
                "body_pose": poses[i, 3:][None].astype(np.float32),
                "transl": trans[i][None].astype(np.float32),
            }
            write_pickle_file(os.path.join(smpl_dir, f"{i + 1:06d}.pkl"),
                              params)
    cap.release()
    print(f"prepared {n_frames} frames into {out_dir}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--people_dir", type=str, required=True,
                        help="raw People-Snapshot subject directory")
    parser.add_argument("--out_dir", type=str, required=True)
    args = parser.parse_args(argv)
    prepare(args.people_dir, args.out_dir)


if __name__ == "__main__":
    main()
