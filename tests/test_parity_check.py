"""One-command parity dress rehearsal (tools/parity_check.py) end-to-end on
fabricated assets.

Chain under test — the exact sequence the real-asset day needs (reference
test.py:37-93): synthetic People-Snapshot raw release -> tools/people_snapshot
prepare -> tools/prepare_template -> fabricated reference PL .ckpt (reference
state-dict naming incl. decoy SMPL-buffer/evaluator keys + hyper_parameters)
-> torch-free convert -> test.py-equivalent evaluate -> PSNR/SSIM means +
delta report vs the reference's printed numbers.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _fabricate_raw_snapshot(raw, H, W, F, rng):
    """Raw People-Snapshot release dir: mp4 + masks.hdf5 +
    reconstructed_poses.hdf5 + camera.pkl (reference tools/people_snapshot.py
    input contract)."""
    import cv2
    import h5py

    raw.mkdir(parents=True)
    name = os.path.basename(str(raw))
    vw = cv2.VideoWriter(str(raw / f"{name}.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 5, (W, H))
    for _ in range(F):
        vw.write(rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8))
    vw.release()

    with h5py.File(raw / "masks.hdf5", "w") as f:
        m = np.zeros((F, H, W), np.uint8)
        m[:, H // 4: 3 * H // 4, W // 4: 3 * W // 4] = 1
        f.create_dataset("masks", data=m)
    with h5py.File(raw / "reconstructed_poses.hdf5", "w") as f:
        pose = 0.1 * rng.normal(size=(F, 72)).astype(np.float32)
        trans = np.tile(np.array([0.0, 0.0, 2.5], np.float32), (F, 1))
        trans += 0.01 * rng.normal(size=(F, 3)).astype(np.float32)
        f.create_dataset("pose", data=pose)
        f.create_dataset("trans", data=trans)
        f.create_dataset("betas", data=0.1 * rng.normal(size=10).astype(
            np.float32))
    with open(raw / "camera.pkl", "wb") as f:
        pickle.dump({
            "camera_rt": np.zeros(3),
            "camera_t": np.zeros(3),
            "camera_f": np.array([40.0, 40.0]),
            "camera_c": np.array([W / 2, H / 2]),
            "camera_k": np.zeros(5),
        }, f)


def _torch_layer_name(layer: str) -> str:
    """Flax layer slug -> reference nn.Module attribute path
    (reference models/nerf.py:89-123 naming, as consumed by
    tools/convert_checkpoint._map_mlp_key)."""
    if layer == "xyz_final":
        return "xyz_encoding_final"
    if layer == "dir_0":
        return "dir_encoding.0"
    if layer == "sigma":
        return "sigma"
    if layer == "rgb":
        return "rgb.0"
    assert layer.startswith("xyz_")
    return f"xyz_encoding_{int(layer[4:]) + 1}.0"


def test_parity_check_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")

    import jax

    from animnerf_tpu.config import finalize, get_default_config
    from animnerf_tpu.data.synthetic import make_rig
    from animnerf_tpu.models.body_params import load_body_params_from_dataset
    from animnerf_tpu.smpl.loader import save_model_data
    from animnerf_tpu.tools.parity_check import run_parity_check
    from animnerf_tpu.tools.people_snapshot import prepare
    from animnerf_tpu.tools.prepare_template import prepare_template
    from animnerf_tpu.training.checkpoints import load_params
    from animnerf_tpu.training.loop import build_system
    from animnerf_tpu.utils.io import write_pickle_file

    rng = np.random.default_rng(11)
    H, W, F = 32, 24, 6

    # --- assets: SMPL pkl + raw release -> prepared dir -> template pkl
    rig = make_rig(num_verts=240, num_joints=24, seed=7)
    smpl_pkl = str(tmp_path / "models" / "smpl" / "SMPL_MALE.pkl")
    os.makedirs(os.path.dirname(smpl_pkl))
    save_model_data(smpl_pkl, rig)

    raw = tmp_path / "raw" / "male-9-parity"
    _fabricate_raw_snapshot(raw, H, W, F, rng)
    data_root = tmp_path / "data"
    data_dir = str(data_root / "male-9-parity")
    prepare(str(raw), data_dir)

    xpose = str(tmp_path / "X_pose.pkl")
    write_pickle_file(xpose, {
        "betas": np.zeros((1, 10), np.float32),
        "global_orient": np.zeros(3, np.float32),
        "body_pose": np.zeros(69, np.float32),
        "transl": np.zeros(3, np.float32),
    })
    prepare_template(str(data_root), "male-9-parity", gender="male",
                     model_path=str(tmp_path / "models"), template_path=xpose,
                     num_points=1500, chunk=256)

    # --- the cfg the "reference run" would have trained with
    cfg = get_default_config()
    cfg.merge_from_dict({
        "exp_name": "male-9-parity", "root_dir": data_dir,
        "model_path": str(tmp_path / "models"), "gender": "male",
        "img_wh": (W, H), "n_samples": 8, "n_importance": 4,
        "train": {"frame_start_ID": 1, "frame_end_ID": 4, "frame_skip": 1},
        "test": {"frame_start_ID": 5, "frame_end_ID": 6, "frame_skip": 1},
    })
    cfg = finalize(cfg)

    # --- fabricate the trained reference PL .ckpt: our init params written
    # under the reference's state-dict names (+ decoy keys convert must drop)
    system = build_system(cfg)
    body = load_body_params_from_dataset(cfg.frame_IDs, data_dir, "smpl")
    params = system.init_params(jax.random.PRNGKey(3), body)

    sd = {}
    for module in ("nerf", "nerf_fine"):
        for layer, lv in params["anim_nerf"][module]["params"].items():
            tn = _torch_layer_name(layer)
            sd[f"anim_nerf.{module}.{tn}.weight"] = torch.tensor(
                np.asarray(lv["kernel"]).T)
            sd[f"anim_nerf.{module}.{tn}.bias"] = torch.tensor(
                np.asarray(lv["bias"]))
    for p, v in params["body_params"].items():
        # betas row count is 1 in the reference too (Embedding(1, 10),
        # reference body_model_params.py:40-45)
        sd[f"body_model_params.{p}.weight"] = torch.tensor(np.asarray(v))
    # decoys the converter must drop (SMPL buffers / evaluator / lpips)
    sd["anim_nerf.body_model.v_template"] = torch.zeros(240, 3)
    sd["evaluator.lpips.net.slice1.0.weight"] = torch.zeros(4, 3, 3, 3)

    ckpt = str(tmp_path / "last.ckpt")
    torch.save({"state_dict": sd, "epoch": 3, "global_step": 99,
                "hyper_parameters": json.loads(json.dumps(cfg))}, ckpt)

    # --- the one command
    out_dir = str(tmp_path / "parity_out")
    report = run_parity_check(data_dir, smpl_pkl, ckpt, ref_psnr=12.0,
                              ref_ssim=0.5, out_dir=out_dir)

    assert np.isfinite(report["psnr"]) and np.isfinite(report["ssim"])
    assert report["psnr_delta"] == pytest.approx(report["psnr"] - 12.0)
    assert report["ssim_delta"] == pytest.approx(report["ssim"] - 0.5)
    assert isinstance(report["psnr_within_0.1dB"], bool)

    # the converted checkpoint dir round-trips the fabricated weights
    conv = os.path.join(out_dir, "converted_ckpt")
    loaded = load_params(conv, params)
    np.testing.assert_allclose(
        np.asarray(loaded["anim_nerf"]["nerf"]["params"]["xyz_0"]["kernel"]),
        np.asarray(params["anim_nerf"]["nerf"]["params"]["xyz_0"]["kernel"]),
        rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(loaded["body_params"]["betas"])[0],
                               np.asarray(params["body_params"]["betas"])[0],
                               rtol=0, atol=1e-6)
