"""In-process VIBE driver tests (reference tools/vibe.py:48-257).

Two synthetic "people" (moving bright squares) walk through 30 fabricated
frames; person B exists for only 10 frames and must be dropped by the
MIN_NUM_FRAMES filter. The detector and the SMPL regressor are fake
callables honouring the documented contracts; the end-to-end test feeds
the driver's vibe_output.pkl straight into tools/convert_vibe.convert.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest

from animnerf_tpu.tools.vibe_driver import (
    box_iou,
    convert_crop_cam_to_orig_img,
    crop_square,
    run_vibe_driver,
    track_people,
)

H, W = 96, 128
N_FRAMES = 30


def _gt_box_a(f):  # 30-frame person drifting right
    x = 10 + f
    return np.array([x, 20, x + 30, 70], np.float32)


def _gt_box_b(f):  # 10-frame person
    x = 80 - f
    return np.array([x, 30, x + 20, 60], np.float32)


def _make_frames(tmp_path):
    d = tmp_path / "images"
    d.mkdir()
    import cv2

    for f in range(N_FRAMES):
        img = np.zeros((H, W, 3), np.uint8)
        a = _gt_box_a(f).astype(int)
        img[a[1]:a[3], a[0]:a[2]] = (200, 60 + f, 40)
        if f < 10:
            b = _gt_box_b(f).astype(int)
            img[b[1]:b[3], b[0]:b[2]] = (30, 40, 220)
        cv2.imwrite(str(d / f"{f:06d}.png"), img)
    return str(d)


def _detector(img):
    """Fake YOLO: find the two coloured squares by channel dominance."""
    boxes = []
    red = (img[..., 0] > 150)
    blue = (img[..., 2] > 150) & (img[..., 0] < 100)
    for mask in (red, blue):
        ys, xs = np.nonzero(mask)
        if len(xs) > 50:
            boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
    return np.asarray(boxes, np.float32).reshape(-1, 4)


def _model(crops):
    """Fake VIBE: deterministic params derived from crop statistics."""
    T = crops.shape[0]
    mean = crops.mean(axis=(1, 2, 3))
    return {
        "cam": np.stack([np.full(T, 0.9), mean, -mean], axis=1),
        "pose": np.tile(np.linspace(0, 0.1, 72, dtype=np.float32), (T, 1)),
        "betas": np.tile(np.arange(10, dtype=np.float32) * 0.01, (T, 1)),
        "joints3d": np.zeros((T, 49, 3), np.float32),
    }


def test_box_iou_basics():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                 np.float32)
    iou = box_iou(a, b)[0]
    assert iou[0] == pytest.approx(1.0)
    assert iou[1] == pytest.approx(25.0 / 175.0)
    assert iou[2] == 0.0


def test_tracker_separates_people_and_survives_gaps():
    dets = []
    for f in range(N_FRAMES):
        frame = [_gt_box_a(f)]
        if f < 10:
            frame.append(_gt_box_b(f))
        if f == 15:  # missed detection: tracker must bridge the gap
            frame = [_gt_box_b(0)] if False else []
        dets.append(np.asarray(frame, np.float32).reshape(-1, 4))
    tracks = track_people(dets, max_gap=2)
    lens = sorted(len(t["frames"]) for t in tracks.values())
    assert lens == [10, 29]  # A misses frame 15 only; B is 10 frames
    long = max(tracks.values(), key=lambda t: len(t["frames"]))
    assert 15 not in long["frames"].tolist()
    # bbox format is [cx, cy, w, h] (MPT dict output convention)
    cx, cy, w, h = long["bbox"][0]
    a = _gt_box_a(int(long["frames"][0]))
    assert cx == pytest.approx((a[0] + a[2]) / 2)
    assert w == pytest.approx(a[2] - a[0])


def test_crop_square_shapes_and_border_padding():
    img = np.full((H, W, 3), 255, np.uint8)
    c = crop_square(img, 5.0, 5.0, 40, 40, scale=1.0, out=32)
    assert c.shape == (32, 32, 3) and c.dtype == np.float32
    assert c.max() <= 1.0 and c.min() == 0.0  # zero border padding visible
    c2 = crop_square(img, W / 2, H / 2, 20, 20, scale=1.0, out=32)
    assert c2.min() == pytest.approx(1.0)  # fully interior crop


def test_convert_crop_cam_formula():
    cam = np.array([[0.8, 0.1, -0.2]], np.float32)
    bbox = np.array([[60.0, 40.0, 30.0, 50.0]], np.float32)  # cx cy w h
    sx, sy, tx, ty = convert_crop_cam_to_orig_img(cam, bbox, W, H)[0]
    h = 50.0
    assert sx == pytest.approx(0.8 * h / W)
    assert sy == pytest.approx(0.8 * h / H)
    assert tx == pytest.approx((60 - W / 2) / (W / 2) / sx + 0.1)
    assert ty == pytest.approx((40 - H / 2) / (H / 2) / sy + (-0.2))


def test_driver_end_to_end_and_convert_vibe(tmp_path):
    images = _make_frames(tmp_path)
    out_dir = tmp_path / "vibe"
    results = run_vibe_driver(images, str(out_dir), _detector, _model,
                              batch_size=8)

    # short tracklet dropped, long one kept with the reference's keys
    assert len(results) == 1
    track = next(iter(results.values()))
    for key in ("pred_cam", "orig_cam", "verts", "pose", "betas",
                "joints3d", "joints2d", "bboxes", "frame_ids"):
        assert key in track
    F = len(track["frame_ids"])
    assert F == N_FRAMES
    assert track["pose"].shape == (F, 72)
    assert track["betas"].shape == (F, 10)
    assert track["orig_cam"].shape == (F, 4)
    assert np.isfinite(track["orig_cam"]).all()

    with open(out_dir / "vibe_output.pkl", "rb") as f:
        on_disk = pickle.load(f)
    assert set(on_disk) == set(results)

    # convert_vibe consumes the pickle (expects iper-style layout)
    import shutil

    from animnerf_tpu.tools.convert_vibe import convert

    root = tmp_path / "data"
    pid = "iper_test_1_1"
    cam_dir = root / pid / "cam000"
    cam_dir.mkdir(parents=True)
    shutil.copytree(images, cam_dir / "images")
    # convert_vibe reads 1-indexed 000001.png (reverse order: the rename
    # target of frame k is the source name of frame k+1)
    for f in sorted(os.listdir(cam_dir / "images"), reverse=True):
        idx = int(os.path.splitext(f)[0])
        os.rename(cam_dir / "images" / f,
                  cam_dir / "images" / f"{idx + 1:06d}.png")
    shutil.copy(out_dir / "vibe_output.pkl", root / pid / "vibe_output.pkl")

    tid = next(iter(results))
    convert(str(root), pid, track_id=tid)
    smpls = sorted(os.listdir(root / pid / "smpls"))
    assert len(smpls) == N_FRAMES
    from animnerf_tpu.smpl.loader import load_pickle

    p = load_pickle(str(root / pid / "smpls" / smpls[0]))
    assert p["body_pose"].shape == (69,)
    assert np.isfinite(p["transl"]).all()
