"""The training loop: epochs, logging, checkpointing, validation.

Replaces PyTorch-Lightning's Trainer orchestration
(/root/reference/train.py:426-461) with a plain loop over the sharded train
step. Auxiliary subsystems (SURVEY.md §5):

  * metrics logging — scalar metrics to stdout + JSONL (TensorBoard-style
    tags: train/loss, train/psnr, lr, ...); optional TB event files when
    tensorboard is importable
  * profiling — per-step wall-clock + rays/sec counters; optional
    jax.profiler trace dump for the first steps
  * checkpoint/resume — CheckpointManager (top-k on train/psnr + last),
    full-state resume
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import numpy as np

from animnerf_tpu.config import CfgNode
from animnerf_tpu.data.dataset import AnimNeRFDataset, Loader
from animnerf_tpu.models.body_params import load_body_params_from_dataset
from animnerf_tpu.parallel.mesh import make_mesh, mesh_for_batch
from animnerf_tpu.parallel.train_pjit import (
    make_sharded_eval_step,
    make_sharded_trainer,
)
from animnerf_tpu.training.checkpoints import (
    CheckpointManager,
    load_metadata,
    load_params,
    load_train_state,
    save_train_state,
)
from animnerf_tpu.training.system import AnimNeRFSystem


class MetricLogger:
    """stdout + JSONL + TensorBoard-event scalar/image logger (replaces the
    reference's TensorBoardLogger, train.py:446-449, without the tensorboard
    package — see utils/tb_events.py)."""

    def __init__(self, log_dir: str, exp_name: str):
        from animnerf_tpu.utils.tb_events import EventWriter

        self.dir = os.path.join(log_dir, exp_name)
        os.makedirs(self.dir, exist_ok=True)
        self._f = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._tb = EventWriter(self.dir)

    def log(self, step: int, scalars: dict, prefix: str = "train") -> None:
        tagged = {f"{prefix}/{k}": float(v) for k, v in scalars.items()}
        self._f.write(json.dumps({"step": step, **tagged}) + "\n")
        self._f.flush()
        self._tb.add_scalars(tagged, step)

    def log_image(self, step: int, tag: str, img) -> None:
        """img: uint8 (H, W, 3) — e.g. the GT|pred|depth validation triptych
        (reference train.py:377-383)."""
        self._tb.add_image(tag, img, step)

    def close(self):
        self._f.close()
        self._tb.close()


def build_system(cfg: CfgNode) -> AnimNeRFSystem:
    import animnerf_tpu.smpl.body_model as bm

    body_model = bm.create(cfg.model_path, cfg.model_type, cfg.gender)
    return AnimNeRFSystem(cfg, body_model)


def fit(cfg: CfgNode, profile: bool = False) -> str:
    """Train per the config; returns the checkpoint directory."""
    system = build_system(cfg)
    mesh = mesh_for_batch(cfg.train.batch_size)

    train_ds = AnimNeRFDataset(
        cfg.root_dir, mode="train", img_wh=tuple(cfg.img_wh),
        frame_start_ID=cfg.train.frame_start_ID,
        frame_end_ID=cfg.train.frame_end_ID,
        frame_skip=cfg.train.frame_skip, cam_IDs=cfg.train.cam_IDs,
        subsampletype=cfg.train.subsampletype,
        subsamplesize=cfg.train.subsamplesize,
        model_type=cfg.model_type, fore_rate=cfg.train.fore_rate,
        fore_erode=cfg.train.fore_erode, white_bkgd=cfg.white_bkgd,
        frame_ids_index={fid: i for i, fid in enumerate(cfg.frame_IDs)},
        seed=cfg.seed,
    )
    loader = Loader(train_ds, cfg.train.batch_size, shuffle=True, seed=cfg.seed)
    steps_per_epoch = max(len(loader), 1)

    body_params = load_body_params_from_dataset(
        cfg.frame_IDs, cfg.root_dir, cfg.model_type)

    rng = jax.random.PRNGKey(cfg.seed)
    train_field = True
    state = system.init_state(rng, body_params, steps_per_epoch)

    # Refinement / transfer: load selected groups from a pretrained ckpt;
    # loaded groups freeze unless pretrained_model_requires_grad (reference
    # train.py:433-437 — e.g. *_refine.yaml loads+freezes 'anim_nerf' and
    # optimises only the per-frame body params on the test frames).
    start_step = 0
    if cfg.train.ckpt_path:
        groups = cfg.train.model_names_to_load
        state = state.replace(params=load_params(cfg.train.ckpt_path,
                                                 state.params, groups))
        if (groups and "anim_nerf" in groups
                and not cfg.train.pretrained_model_requires_grad):
            train_field = False

    tx = system.make_optimizer(steps_per_epoch, train_field=train_field)
    state = state.replace(opt_state=tx.init(state.params))

    # Full-state resume (params + optimizer + step), the analogue of PL's
    # trainer.fit(ckpt_path=...) (reference train.py:460).
    if cfg.train.resume and cfg.train.ckpt_path:
        state = load_train_state(cfg.train.ckpt_path, state)
        start_step = int(state.step)

    # the fastest EXACT engine this config supports (rows-compacted on
    # TPU flagship configs, dense otherwise; ANIMNERF_TRAINER overrides)
    train_step, place_state, place_batch = make_sharded_trainer(
        system, tx, mesh)
    state = place_state(state)

    ckpt_dir = os.path.join(cfg.checkpoints_dir, cfg.exp_name)
    manager = CheckpointManager(ckpt_dir, monitor="psnr", mode="max",
                                save_top_k=cfg.train.save_top_k,
                                save_last=cfg.train.save_last)
    logger = MetricLogger(cfg.logs_dir, cfg.exp_name)
    key = jax.random.PRNGKey(cfg.seed + 1)

    # validation dataset: one full frame rendered per epoch, like the
    # reference's per-epoch PL validation (train.py:350-385)
    val_ds = AnimNeRFDataset(
        cfg.root_dir, mode="val", img_wh=tuple(cfg.img_wh),
        frame_start_ID=cfg.val.frame_start_ID,
        frame_end_ID=cfg.val.frame_end_ID, frame_skip=cfg.val.frame_skip,
        cam_IDs=cfg.val.cam_IDs, model_type=cfg.model_type,
        white_bkgd=cfg.white_bkgd,
        frame_ids_index={fid: i for i, fid in enumerate(cfg.frame_IDs)},
    )
    eval_step = make_sharded_eval_step(system, mesh)

    val_slab = 32768 * max(int(mesh.devices.size), 1)

    def run_validation(epoch: int, params):
        from animnerf_tpu.models.evaluator import psnr as psnr_np, ssim

        batch = {k: np.asarray(v)[None] for k, v in val_ds[0].items()}
        n = batch["rays"].shape[1]
        if n <= val_slab:
            out = eval_step(params, batch)
        else:  # HBM ceiling: slab the ray axis (512^2 frames)
            outs = []
            for i in range(0, n, val_slab):
                sub = dict(batch)
                for k in ("rays", "rgbs", "alphas"):
                    sub[k] = batch[k][:, i:i + val_slab]
                outs.append(jax.device_get(eval_step(params, sub)))
            out = {k: np.concatenate([o[k] for o in outs], axis=1)
                   for k in outs[0]}
        rgb_key = "rgbs_fine" if "rgbs_fine" in out else "rgbs"
        d_key = "depths_fine" if "depths_fine" in out else "depths"
        W, H = cfg.img_wh
        pred = np.asarray(out[rgb_key]).reshape(H, W, 3)
        gt = batch["rgbs"].reshape(H, W, 3)
        metrics = {"psnr": psnr_np(pred, gt), "ssim": ssim(pred, gt)}
        logger.log(step, metrics, prefix="val")
        if epoch % max(cfg.val.vis_freq, 1) == 0:
            from animnerf_tpu.utils.vis import save_image, triptych

            depth = np.asarray(out[d_key]).reshape(H, W)
            panel = triptych(gt, pred, depth)
            save_image(os.path.join(
                logger.dir, f"val_epoch{epoch:04d}.png"), panel)
            logger.log_image(step, "val/gt_pred_depth", panel)
        return metrics

    max_steps = cfg.train.max_steps
    log_every = cfg.train.get("log_every", 50)
    step = start_step
    t_start = time.time()
    rays_per_step = cfg.train.batch_size * cfg.train.subsamplesize**2
    _last_log_step, _last_log_time = 0, t_start
    metrics = {"loss": float("nan"), "psnr": float("nan")}

    for epoch in range(cfg.train.max_epochs):
        for batch in loader.epoch(epoch):
            if profile and step == 2:
                jax.profiler.start_trace(os.path.join(logger.dir, "profile"))
            batch = place_batch(batch)
            state, metrics = train_step(state, batch, key)
            if profile and step == 4:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
            step += 1
            if step % log_every == 0 or step == 1:
                m = {k: float(v) for k, v in metrics.items()}
                # windowed rate (since the last log), not a cumulative
                # average — the first window absorbs the compile
                now = time.time()
                m["rays_per_sec"] = (rays_per_step * (step - _last_log_step)
                                     / max(now - _last_log_time, 1e-9))
                _last_log_step, _last_log_time = step, now
                lr_fn = getattr(system, "_lr_schedule", None)
                if lr_fn is not None:
                    m["lr"] = float(lr_fn(step))
                logger.log(step, m)
                print(f"epoch {epoch} step {step} "
                      f"loss {m['loss']:.4f} psnr {m['psnr']:.2f} "
                      f"({m['rays_per_sec']:.0f} rays/s)", flush=True)
            if step >= max_steps:
                break
        # end of epoch: checkpoint on train psnr (reference monitors
        # train/psnr, train.py:441-442)
        m = {k: float(v) for k, v in metrics.items()}
        host_state = jax.device_get(state)
        try:
            val_m = run_validation(epoch, host_state.params)
            print(f"epoch {epoch} val psnr {val_m['psnr']:.2f} "
                  f"ssim {val_m['ssim']:.4f}", flush=True)
        except (FileNotFoundError, IndexError, KeyError) as e:
            # val data genuinely optional (missing frames/dirs); any other
            # exception (OOM, shape bug, ...) must surface, not be masked
            print(f"epoch {epoch} validation skipped: {e}", flush=True)
        manager.save(host_state.params, step, m,
                     extra_meta={"epoch": epoch, "cfg": dict_flat(cfg)})
        # 'last' carries the full train state for resume
        save_train_state(os.path.join(ckpt_dir, "last"), host_state,
                         {"epoch": epoch, "cfg": dict_flat(cfg),
                          "metrics": m})
        if step >= max_steps:
            break

    logger.close()
    return ckpt_dir


def dict_flat(cfg: CfgNode) -> dict:
    out = {}
    for k, v in cfg.items():
        if isinstance(v, dict):
            out[k] = {kk: vv for kk, vv in v.items()}
        else:
            out[k] = v
    return out


def evaluate(cfg: CfgNode, ckpt_path: str, split: str = "test",
             save_vis: bool = False, out_dir: Optional[str] = None) -> dict:
    """Full-frame rendering of a split + PSNR/SSIM/LPIPS means
    (the reference's test.py:37-93)."""
    from animnerf_tpu.models.evaluator import Evaluator

    system = build_system(cfg)
    mesh = make_mesh()
    sp = cfg[split]
    ds = AnimNeRFDataset(
        cfg.root_dir, mode="val", img_wh=tuple(cfg.img_wh),
        frame_start_ID=sp.frame_start_ID, frame_end_ID=sp.frame_end_ID,
        frame_skip=sp.frame_skip, cam_IDs=sp.cam_IDs,
        model_type=cfg.model_type, white_bkgd=cfg.white_bkgd,
        frame_ids_index={fid: i for i, fid in enumerate(cfg.frame_IDs)},
    )

    body_params = load_body_params_from_dataset(
        cfg.frame_IDs, cfg.root_dir, cfg.model_type)
    params = system.init_params(jax.random.PRNGKey(0), body_params)
    params = load_params(ckpt_path, params)

    eval_step = make_sharded_eval_step(system, mesh)
    evaluator = Evaluator()

    # HBM ceiling: render at most ~32k rays per device per program
    # (see render/inference.py max_rays_per_call)
    slab = 32768 * max(int(mesh.devices.size), 1)

    def run_frame(batch):
        n = batch["rays"].shape[1]
        if n <= slab:
            return eval_step(params, batch)
        outs = []
        for i in range(0, n, slab):
            sub = dict(batch)
            for k in ("rays", "rgbs", "alphas"):
                sub[k] = batch[k][:, i:i + slab]
            outs.append(jax.device_get(eval_step(params, sub)))
        return {k: np.concatenate([o[k] for o in outs], axis=1)
                for k in outs[0]}

    W, H = cfg.img_wh
    scores = []
    loader = Loader(ds, batch_size=1, shuffle=False)
    for i, batch in enumerate(loader.epoch(0)):
        out = run_frame(batch)
        rgb_key = "rgbs_fine" if "rgbs_fine" in out else "rgbs"
        pred = np.asarray(out[rgb_key]).reshape(H, W, 3)
        gt = batch["rgbs"].reshape(H, W, 3)
        s = evaluator(pred, gt)
        scores.append(s)
        print(f"frame {int(batch['frame_id'][0])}: "
              + " ".join(f"{k}={v:.4f}" for k, v in s.items()), flush=True)
        if save_vis and out_dir:
            from animnerf_tpu.utils.vis import save_triptych

            depth_key = "depths_fine" if "depths_fine" in out else "depths"
            depth = np.asarray(out[depth_key]).reshape(H, W)
            os.makedirs(out_dir, exist_ok=True)
            save_triptych(os.path.join(
                out_dir, f"{int(batch['frame_id'][0]):06d}.png"),
                gt, pred, depth)

    means = {k: float(np.mean([s[k] for s in scores]))
             for k in scores[0]} if scores else {}
    for k, v in means.items():
        print(f"mean {k}: {v:.4f}")
    return means
