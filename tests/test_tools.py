"""Tests for the data-prep tools (prepare_template, convert_vibe,
people_snapshot, video utils) and the novel-pose CLI pipeline."""

import os
import pickle

import numpy as np
import pytest


def test_mesh_signed_distance_sphere():
    """Signed distance against an icosphere-ish mesh: inside < 0."""
    from animnerf_tpu.ops.mesh_distance import signed_distance

    # build a coarse UV sphere
    th = np.linspace(0, np.pi, 9)[1:-1]
    ph = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    pts = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                    np.cos(tt)], -1).reshape(-1, 3)
    verts = np.concatenate([pts, [[0, 0, 1.0]], [[0, 0, -1.0]]])
    # triangulate the grid
    faces = []
    R, C = tt.shape
    for i in range(R - 1):
        for j in range(C):
            a = i * C + j
            b = i * C + (j + 1) % C
            c = (i + 1) * C + j
            d = (i + 1) * C + (j + 1) % C
            faces += [[a, b, c], [b, d, c]]
    top, bot = len(verts) - 2, len(verts) - 1
    for j in range(C):
        faces.append([top, (j + 1) % C, j])
        faces.append([bot, (R - 1) * C + j, (R - 1) * C + (j + 1) % C])
    faces = np.asarray(faces)
    # orient all faces outward (normal pointing away from the origin)
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(b - a, c - a)
    centroid = (a + b + c) / 3
    flip = (n * centroid).sum(-1) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]

    q = np.array([[0, 0, 0], [0.5, 0, 0], [2.0, 0, 0], [0, 1.5, 0]],
                 np.float64)
    d = signed_distance(q, verts, faces)
    assert d[0] < -0.8          # center well inside
    assert d[1] < 0             # inside
    assert 0.8 < d[2] < 1.2     # ~1 outside
    assert 0.3 < d[3] < 0.7


def test_prepare_template_end_to_end(tmp_path):
    from animnerf_tpu.data.synthetic import write_synthetic_dataset
    from animnerf_tpu.smpl.loader import load_pickle
    from animnerf_tpu.tools.prepare_template import prepare_template
    from animnerf_tpu.utils.io import write_pickle_file

    root = str(tmp_path / "data" / "subj")
    write_synthetic_dataset(root, num_frames=2, img_wh=(16, 16),
                            num_verts=200, num_joints=10, seed=3)
    # X-pose asset analogue
    xpose = {
        "betas": np.zeros((1, 10), np.float32),
        "global_orient": np.zeros(3, np.float32),
        "body_pose": np.zeros(27, np.float32),
        "transl": np.zeros(3, np.float32),
    }
    xp = str(tmp_path / "X_pose.pkl")
    write_pickle_file(xp, xpose)

    out = prepare_template(str(tmp_path / "data"), "subj", gender="neutral",
                           model_path=os.path.join(root, "models"),
                           template_path=xp, num_points=2000, chunk=256)
    tmpl = load_pickle(out)
    assert tmpl["points"].shape == (2000, 3)
    d = tmpl["distances"]
    assert (d < -0.02).sum() > 10, "no inside points found"
    assert (d > 0.10).sum() > 100, "no outside points found"
    assert tmpl["betas"].shape[-1] == 10


def test_convert_vibe(tmp_path):
    import cv2

    from animnerf_tpu.smpl.loader import load_pickle
    from animnerf_tpu.tools.convert_vibe import convert

    root = tmp_path / "iper" / "subj"
    img_dir = root / "cam000" / "images"
    img_dir.mkdir(parents=True)
    cv2.imwrite(str(img_dir / "000001.png"),
                np.zeros((64, 48, 3), np.uint8))

    F = 5
    rng = np.random.default_rng(0)
    vibe = {1: {
        "orig_cam": rng.uniform(0.5, 1.5, size=(F, 4)).astype(np.float32),
        "betas": rng.normal(size=(F, 10)).astype(np.float32),
        "pose": rng.normal(scale=0.2, size=(F, 72)).astype(np.float32),
        "frame_ids": np.arange(F),
    }}
    with open(root / "vibe_output.pkl", "wb") as f:
        pickle.dump(vibe, f)

    convert(str(tmp_path / "iper"), "subj", "neutral")
    cam = load_pickle(str(root / "cam000" / "camera.pkl"))
    assert cam["camera_f"][0] == 2000
    p = load_pickle(str(root / "smpls" / "000001.pkl"))
    assert p["body_pose"].shape == (69,)
    # transl z = 2f/(cam_s * H)
    np.testing.assert_allclose(
        p["transl"][2], 2 * 2000 / (vibe[1]["orig_cam"][0, 0] * 64), rtol=1e-5)


def test_people_snapshot_prepare(tmp_path):
    import cv2
    import h5py

    from animnerf_tpu.smpl.loader import load_pickle
    from animnerf_tpu.tools.people_snapshot import prepare

    raw = tmp_path / "male-9-test"
    raw.mkdir()
    H, W, F = 32, 24, 3

    # tiny mp4
    vw = cv2.VideoWriter(str(raw / "male-9-test.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 5, (W, H))
    rng = np.random.default_rng(0)
    for _ in range(F):
        vw.write(rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8))
    vw.release()

    with h5py.File(raw / "masks.hdf5", "w") as f:
        m = np.zeros((F, H, W), np.uint8)
        m[:, 8:24, 6:18] = 1
        f.create_dataset("masks", data=m)
    with h5py.File(raw / "reconstructed_poses.hdf5", "w") as f:
        f.create_dataset("pose", data=rng.normal(size=(F, 72)).astype(np.float32))
        f.create_dataset("trans", data=rng.normal(size=(F, 3)).astype(np.float32))
        f.create_dataset("betas", data=rng.normal(size=10).astype(np.float32))
    with open(raw / "camera.pkl", "wb") as f:
        pickle.dump({
            "camera_rt": np.zeros(3),
            "camera_t": np.zeros(3),
            "camera_f": np.array([500.0, 500.0]),
            "camera_c": np.array([W / 2, H / 2]),
            "camera_k": np.zeros(5),
        }, f)

    out = str(tmp_path / "prepared")
    prepare(str(raw), out)

    cam = load_pickle(os.path.join(out, "cam000", "camera.pkl"))
    assert cam["width"] == W and cam["height"] == H
    img = cv2.imread(os.path.join(out, "cam000", "images", "000001.png"),
                     cv2.IMREAD_UNCHANGED)
    assert img.shape == (H, W, 4)
    assert (img[..., 3] > 0).sum() > 0  # mask in alpha
    p = load_pickle(os.path.join(out, "smpls", "000002.pkl"))
    assert p["body_pose"].shape == (1, 69)


def test_mixamo_loader(tmp_path):
    from animnerf_tpu.cli.novel_pose import load_mixamo_smpl

    F = 6
    rng = np.random.default_rng(1)
    action = tmp_path / "0007"
    action.mkdir()
    with open(action / "result.pkl", "wb") as f:
        pickle.dump({
            "anim_len": F,
            "smpl_array": rng.normal(scale=0.2, size=(F, 72)).astype(np.float32),
            "cam_array": rng.normal(size=(F, 4)).astype(np.float32),
        }, f)
    mocap = load_mixamo_smpl(str(tmp_path), "0007", skip=2)
    assert len(mocap) == 3
    assert mocap[0]["body_pose"].shape == (69,)
    assert mocap[0]["transl"][2] == 0.0


def test_video_grid_and_crop():
    from animnerf_tpu.utils.video import center_crop, fuse_grid

    img = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    c = center_crop(img, (4, 2), (1, 0))
    assert c.shape == (2, 4, 3)
    grid = fuse_grid([img, img, img], ncols=2)
    assert grid.shape == (12, 16, 3)


def test_rvm_driver_end_to_end(tmp_path):
    """RVM matting driver with an injected recurrent model: warm-up frames
    are re-fed in reverse and discarded, recurrent state threads through
    every call, BGR pixels are preserved and the matte lands in the png
    alpha channel (reference tools/rvm.py:19-63)."""
    torch = pytest.importorskip("torch")
    import cv2

    from animnerf_tpu.tools.rvm import run_rvm

    imgs_dir, out_dir = tmp_path / "imgs", tmp_path / "out"
    imgs_dir.mkdir()
    vals = [10, 60, 110, 160, 210, 250]
    for i, v in enumerate(vals):
        img = np.full((8, 6, 3), v, np.uint8)
        img[..., 0] = v // 2  # distinct B channel: checks BGR preservation
        cv2.imwrite(str(imgs_dir / f"{i:06d}.png"), img)

    seen_means = []  # order in which the model saw frames (by brightness)
    warmup = 4

    def fake_model(src, r1, r2, r3, r4, ratio):
        assert ratio == 0.25
        assert src.shape == (1, 3, 8, 6)
        c = (torch.zeros(()) if r1 is None else r1) + 1.0
        m = src.mean()
        seen_means.append(float(m))
        # matte depends on the frame AND the frames-seen count, so a wrong
        # warm-up order or dropped recurrent state changes the output
        pha = torch.full((1, 1, 8, 6), float(torch.clamp(m + 0.001 * c, 0, 1)))
        return src, pha, c, r2, r3, r4

    n = run_rvm(str(imgs_dir), str(out_dir), model=fake_model, warmup=warmup)
    assert n == len(vals)

    def mean01(v):
        return (v // 2 + v + v) / (3.0 * 255.0)

    # fed order: first `warmup` frames reversed, then all frames
    expected_order = [mean01(v) for v in vals[:warmup][::-1] + vals]
    assert np.allclose(seen_means, expected_order, atol=1e-6)

    for i, v in enumerate(vals):
        out = cv2.imread(str(out_dir / f"{i:06d}.png"), cv2.IMREAD_UNCHANGED)
        assert out.shape == (8, 6, 4)
        assert np.all(out[..., 0] == v // 2) and np.all(out[..., 1] == v)
        count = warmup + 1 + i  # warm-up calls advanced the state first
        expect_a = np.uint8(min(mean01(v) + 0.001 * count, 1.0) * 255)
        assert np.all(out[..., 3] == expect_a)


def test_rvm_driver_fewer_frames_than_warmup(tmp_path):
    """With fewer frames than the warm-up length the prepended reversed
    prefix is shorter than `warmup`; the skip must clip to the prefix
    actually prepended or real frames get silently dropped."""
    torch = pytest.importorskip("torch")
    import cv2

    from animnerf_tpu.tools.rvm import run_rvm

    imgs_dir, out_dir = tmp_path / "imgs", tmp_path / "out"
    imgs_dir.mkdir()
    vals = [40, 200]  # 2 frames < warmup=4
    for i, v in enumerate(vals):
        cv2.imwrite(str(imgs_dir / f"{i:06d}.png"),
                    np.full((8, 6, 3), v, np.uint8))

    def fake_model(src, r1, r2, r3, r4, ratio):
        pha = torch.full((1, 1, 8, 6), float(src.mean()))
        return src, pha, r1, r2, r3, r4

    n = run_rvm(str(imgs_dir), str(out_dir), model=fake_model, warmup=4)
    assert n == len(vals)
    for i, v in enumerate(vals):
        out = cv2.imread(str(out_dir / f"{i:06d}.png"), cv2.IMREAD_UNCHANGED)
        assert out is not None and out.shape == (8, 6, 4)
        assert np.all(out[..., 0] == v)
