"""End-to-end smoke tests: config, dataset, training system."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animnerf_tpu.config import get_default_config, finalize, load_cfg_file
from animnerf_tpu.data.dataset import AnimNeRFDataset, Loader
from animnerf_tpu.data.synthetic import write_synthetic_dataset
import animnerf_tpu.smpl.body_model as bm
from animnerf_tpu.models.body_params import load_body_params_from_dataset
from animnerf_tpu.training.system import AnimNeRFSystem


# --------------------------------------------------------------- config


def test_config_defaults_and_merge(tmp_path):
    cfg = get_default_config()
    assert cfg.train.lr == 5e-4 and cfg.n_samples == 64
    y = tmp_path / "c.yaml"
    y.write_text(
        "exp_name: test\nimg_wh: (64, 64)\nn_importance: 32\n"
        "train:\n  frame_end_ID: 9\n  frame_skip: 2\n  lr: 0.001\n")
    cfg = load_cfg_file(str(y))
    assert cfg.exp_name == "test"
    assert tuple(cfg.img_wh) == (64, 64)
    assert cfg.train.lr == 0.001
    assert cfg.frame_IDs == [1, 3, 5, 7, 9] and cfg.num_frames == 5


def test_config_reference_yaml_loads():
    path = "/root/reference/configs/people_snapshot/male-3-casual.yaml"
    if not os.path.exists(path):
        pytest.skip("reference configs unavailable")
    cfg = load_cfg_file(path)
    assert cfg.n_importance == 32
    assert tuple(cfg.img_wh) == (512, 512)
    assert cfg.train.frame_end_ID == 456
    assert cfg.num_frames == len(range(1, 457, 4))


def test_config_opts_merge():
    cfg = get_default_config()
    cfg.merge_from_list(["train.lr", "0.01", "exp_name", "foo",
                         "use_view", "True"])
    assert cfg.train.lr == 0.01 and cfg.exp_name == "foo" and cfg.use_view


# --------------------------------------------------------------- dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    write_synthetic_dataset(root, num_frames=3, img_wh=(32, 32),
                            num_verts=256, num_joints=12, seed=0)
    return root


def _tiny_cfg(root):
    cfg = get_default_config()
    cfg.root_dir = root
    cfg.model_path = os.path.join(root, "models")
    cfg.gender = "neutral"
    cfg.img_wh = (32, 32)
    cfg.n_samples = 8
    cfg.n_importance = 4
    cfg.train.subsamplesize = 8
    cfg.train.batch_size = 2
    cfg.train.frame_start_ID = 1
    cfg.train.frame_end_ID = 3
    cfg.train.frame_skip = 1
    cfg.val.frame_start_ID = 1
    cfg.val.frame_end_ID = 3
    cfg.val.frame_skip = 1
    return finalize(cfg)


def test_dataset_train_samples(synth_root):
    ds = AnimNeRFDataset(synth_root, mode="train", img_wh=(32, 32),
                         frame_start_ID=1, frame_end_ID=3, frame_skip=1,
                         subsamplesize=8)
    assert len(ds) == 3 * (32 * 32 // 64)
    s = ds[0]
    assert s["rays"].shape == (64, 8)
    assert s["rgbs"].shape == (64, 3)
    assert s["alphas"].shape == (64, 1)
    assert s["fg_points"].shape == (128, 3)
    assert s["betas"].shape == (10,)
    assert s["body_pose_template"].shape == (33,)
    # ray directions are unit-norm
    np.testing.assert_allclose(np.linalg.norm(s["rays"][:, 3:6], axis=-1),
                               1.0, atol=1e-5)
    # foreground sampling: most rays should hit near the mask
    assert s["alphas"].mean() > 0.3


def test_dataset_val_full_grid(synth_root):
    ds = AnimNeRFDataset(synth_root, mode="val", img_wh=(32, 32),
                         frame_start_ID=1, frame_end_ID=1, frame_skip=1)
    s = ds[0]
    assert s["rays"].shape == (32 * 32, 8)
    assert s["rgbs"].shape == (32 * 32, 3)


def test_loader_batches(synth_root):
    ds = AnimNeRFDataset(synth_root, mode="train", img_wh=(32, 32),
                         frame_start_ID=1, frame_end_ID=3, frame_skip=1,
                         subsamplesize=8)
    loader = Loader(ds, batch_size=2, seed=0)
    batch = next(loader.epoch(0))
    assert batch["rays"].shape == (2, 64, 8)
    assert batch["frame_idx"].shape == (2,)


def test_loader_propagates_producer_errors(synth_root):
    """A failure inside dataset.get (bad decode, cache bug) must raise in
    the consuming loop — not silently truncate the epoch."""
    ds = AnimNeRFDataset(synth_root, mode="train", img_wh=(32, 32),
                         frame_start_ID=1, frame_end_ID=3, frame_skip=1,
                         subsamplesize=8)
    boom = RuntimeError("decode failed")
    calls = {"n": 0}
    orig_get = ds.get

    def flaky_get(idx, rng):
        calls["n"] += 1
        if calls["n"] > 2:
            raise boom
        return orig_get(idx, rng)

    ds.get = flaky_get
    loader = Loader(ds, batch_size=2, seed=0)
    with pytest.raises(RuntimeError, match="decode failed"):
        for _ in loader.epoch(0):
            pass


def test_frame_cache_shares_full_grid(synth_root):
    """subsampletype='pixel' pools are one shared read-only grid — cached
    entries must not each carry their own H*W int64 coordinate copy."""
    from animnerf_tpu.ops.ray_utils import pixel_pools
    p1 = pixel_pools(32, 32, None, "pixel")
    p2 = pixel_pools(32, 32, None, "pixel")
    assert p1["all"][0] is p2["all"][0]
    ds = AnimNeRFDataset(synth_root, mode="train", img_wh=(32, 32),
                         frame_start_ID=1, frame_end_ID=3, frame_skip=1,
                         subsamplesize=8, subsampletype="pixel")
    ds.get(0, np.random.default_rng(0))
    (_, _, pools, nbytes), = ds._frame_cache.values()
    assert pools["all"][0] is p1["all"][0]
    img_mask_bytes = 32 * 32 * 3 + 32 * 32  # uint8 img + mask
    assert nbytes == img_mask_bytes  # shared pools charge nothing


# --------------------------------------------------------------- training


def test_train_steps_reduce_loss(synth_root):
    cfg = _tiny_cfg(synth_root)
    model = bm.create(cfg.model_path, "smpl", "neutral")
    system = AnimNeRFSystem(cfg, model)

    body_params = load_body_params_from_dataset(cfg.frame_IDs, cfg.root_dir)
    state = system.init_state(jax.random.PRNGKey(0), body_params,
                              steps_per_epoch=10)
    tx = system.make_optimizer(steps_per_epoch=10)
    train_step = jax.jit(system.make_train_step(tx))

    ds = AnimNeRFDataset(synth_root, mode="train", img_wh=(32, 32),
                         frame_start_ID=1, frame_end_ID=3, frame_skip=1,
                         subsamplesize=8)
    loader = Loader(ds, batch_size=2, seed=0)
    key = jax.random.PRNGKey(1)

    losses = []
    it = loader.epoch(0)
    for i in range(5):
        batch = next(it)
        state, details = train_step(state, batch, key)
        losses.append(float(details["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(state.step) == 5


def test_eval_step_shapes(synth_root):
    cfg = _tiny_cfg(synth_root)
    model = bm.create(cfg.model_path, "smpl", "neutral")
    system = AnimNeRFSystem(cfg, model)
    body_params = load_body_params_from_dataset(cfg.frame_IDs, cfg.root_dir)
    state = system.init_state(jax.random.PRNGKey(0), body_params,
                              steps_per_epoch=10)
    eval_step = jax.jit(system.make_eval_step())

    ds = AnimNeRFDataset(synth_root, mode="val", img_wh=(32, 32),
                         frame_start_ID=1, frame_end_ID=1, frame_skip=1)
    loader = Loader(ds, batch_size=1, shuffle=False)
    batch = next(loader.epoch(0))
    out = eval_step(state.params, batch)
    assert out["rgbs_fine"].shape == (1, 32 * 32, 3)
    assert np.isfinite(np.asarray(out["rgbs_fine"])).all()
    assert out["alphas"].shape == (1, 32 * 32, 1)


@pytest.mark.parametrize("subsampletype", ["foreground_pixel", "pixel",
                                           "patch", "foreground_patch"])
def test_dataset_frame_cache_bit_identical(synth_root, subsampletype,
                                           monkeypatch):
    """The frame cache (uint8 image + pixel pools, photometric ops on just
    the sampled pixels) must produce BIT-identical samples to the dense
    per-draw path, for every subsampletype and under identical rng
    streams (same _draw call sequence)."""
    kw = dict(mode="train", img_wh=(32, 32), frame_start_ID=1,
              frame_end_ID=3, frame_skip=1, subsamplesize=8,
              subsampletype=subsampletype)
    ds_cached = AnimNeRFDataset(synth_root, **kw)
    assert ds_cached._frame_cache_budget > 0
    monkeypatch.setenv("ANIMNERF_FRAME_CACHE_MB", "0")
    ds_dense = AnimNeRFDataset(synth_root, **kw)
    assert ds_dense._frame_cache_budget == 0

    for idx in (0, 1, 5, 17):
        r1 = np.random.default_rng(123 + idx)
        r2 = np.random.default_rng(123 + idx)
        a = ds_cached.get(idx, r1)
        b = ds_dense.get(idx, r2)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=k)
    assert ds_cached._frame_cache  # the cache actually engaged
