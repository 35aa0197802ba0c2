"""Convert VIBE output to per-frame SMPL pkls + a fabricated camera.

Parity: reference tools/convert_vibe.py:22-75 — fixed focal length f=2000,
principal point at the image center, identity extrinsics, and per-frame
translation derived from VIBE's weak-perspective cam as
[cam_x, cam_y, 2f / (cam_s * H)].

VIBE's vibe_output.pkl is joblib-pickled; loaded with plain pickle-compat
loading (joblib pickles load with the std unpickler for plain dict/ndarray
payloads).
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np

from animnerf_tpu.utils.io import write_pickle_file


def _load_vibe_output(path: str):
    try:
        import joblib  # optional

        return joblib.load(path)
    except ImportError:
        from animnerf_tpu.smpl.loader import load_pickle

        return load_pickle(path)


def convert(data_root: str, people_ID: str, gender: str = "neutral",
            focal: float = 2000.0, track_id: int = 1) -> None:
    import cv2

    images_dir = os.path.join(data_root, people_ID, "cam000", "images")
    smpls_dir = os.path.join(data_root, people_ID, "smpls")
    if os.path.exists(smpls_dir):
        shutil.rmtree(smpls_dir)
    os.makedirs(smpls_dir, exist_ok=True)

    img = cv2.imread(os.path.join(images_dir, "000001.png"))
    H, W = img.shape[:2]

    camera = {
        "R": np.eye(3),
        "t": np.zeros(3),
        "camera_f": np.array([focal, focal], np.float64),
        "camera_c": np.array([H // 2, W // 2], np.float64),
        "camera_k": np.zeros(5),
        "height": H,
        "width": W,
    }
    write_pickle_file(os.path.join(data_root, people_ID, "cam000",
                                   "camera.pkl"), camera)

    vibe = _load_vibe_output(os.path.join(data_root, people_ID,
                                          "vibe_output.pkl"))
    track = vibe[track_id]
    cams = np.asarray(track["orig_cam"], np.float32)
    betas = np.asarray(track["betas"], np.float32)
    poses = np.asarray(track["pose"], np.float32)
    frame_ids = np.asarray(track["frame_ids"], np.int64)

    for frame_id in frame_ids:
        cam = cams[frame_id]
        pose = poses[frame_id]
        transl = np.array([cam[2], cam[3], 2 * focal / (cam[0] * H)],
                          np.float32)
        params = {
            "betas": betas[frame_id],
            "global_orient": pose[:3],
            "body_pose": pose[3:],
            "transl": transl,
            "model_type": "smpl",
            "gender": gender,
        }
        write_pickle_file(os.path.join(smpls_dir,
                                       f"{int(frame_id) + 1:06d}.pkl"), params)
    print(f"converted {len(frame_ids)} frames into {smpls_dir}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default="data/iper")
    parser.add_argument("--people_ID", type=str, default="iper_023_1_1")
    parser.add_argument("--gender", type=str, default="neutral")
    args = parser.parse_args(argv)
    convert(args.data_root, args.people_ID, args.gender)


if __name__ == "__main__":
    main()
