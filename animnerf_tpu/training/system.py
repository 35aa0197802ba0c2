"""Training system: losses, optimizer, train/eval steps.

Re-design of the reference's PyTorch-Lightning module
(/root/reference/train.py:102-424) as pure jittable functions over an
explicit ``TrainState``:

  * six-term loss (rgb + fine, alpha L1 + fine, foreground/background sigma
    regularizers + fine, autograd normal smoothness + fine) — train.py:228-322
  * three optimizer groups via optax.multi_transform: the field at lr, the
    latent codes at lr, the body params at 0.5*lr (train.py:217-226), adam
    eps 1e-8 + per-epoch polynomial decay (utils/__init__.py:33-58)
  * SMPL-refinement mode: load a pretrained field, freeze it, optimise only
    the per-frame body params (train.py:433-437)

TPU notes: one fused program per step — no chunk loop; rays arrive already
batched (B, R, 8) and the whole step (body model x2, warp, two MLP passes,
compositing, 2nd-order normal loss, backward) is a single XLA computation.
The batch axis shards over the mesh 'data' axis (see parallel/).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from animnerf_tpu.config import CfgNode
from animnerf_tpu.models.anim_nerf import AnimNeRFConfig, AnimNeRFModel
from animnerf_tpu.utils import rng as prng
from animnerf_tpu.models.body_params import (
    batch_params_from_data,
    lookup_body_params,
)
from animnerf_tpu.models.warp import prepare_frame, rays_to_root_frame
from animnerf_tpu.render.volume_renderer import RendererConfig, render_rays_split
from animnerf_tpu.smpl.body_model import BodyModel


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any          # {'anim_nerf':…, 'body_params':…, 'latent_codes':…}
    opt_state: Any


def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def resolve_auto_tpu_opts(c: CfgNode) -> tuple[str, bool]:
    """Resolve the 'auto' defaults of compute_dtype / remat per backend.

    TPU: the MLP fast path runs in bfloat16 (f32 params and geometry —
    pixel-level parity vs the plain-f32 XLA path is 72.9 dB PSNR,
    docs/demo/scale512/parity_onchip.json), and remat is skipped when the
    step's ray count is at or below the reference workload's 16,384
    (bf16 activations fit un-rematerialised in 16G HBM at that size; +6%
    throughput — PERF.md). CPU/GPU: float32 + remat, the conservative
    reference-shaped path. Explicit config values pass through untouched.
    """
    dtype = str(c.get("compute_dtype", "float32"))
    remat = c.get("remat", True)
    if dtype == "auto" or remat == "auto":
        from animnerf_tpu.utils.platform import on_tpu

        tpu = on_tpu()
        if dtype == "auto":
            dtype = "bfloat16" if tpu else "float32"
        if remat == "auto":
            rays_per_step = (int(c.train.batch_size)
                             * int(c.train.subsamplesize) ** 2)
            remat = (rays_per_step > 16384) if tpu else True
    if isinstance(remat, str):  # CLI opts merge can leave 'false'/'true'
        remat = remat.lower() in ("true", "1", "yes")
    return dtype, bool(remat)


def _safe_normalize(n: jax.Array, eps: float = 1e-5) -> jax.Array:
    """n / (|n| + eps) with a finite gradient at n == 0.

    jnp.linalg.norm has a NaN gradient at zero (torch subgradients to 0,
    which is what keeps the reference's normal loss alive at init), so the
    norm is computed as sqrt(sum n^2 + tiny)."""
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    return n / (norm + eps)


@dataclasses.dataclass
class AnimNeRFSystem:
    """Bundles config + model + body model; exposes pure step functions."""

    cfg: CfgNode
    body_model: BodyModel

    def __post_init__(self):
        c = self.cfg
        use_fine = (c.n_importance > 0) or (c.n_depth > 0)
        compute_dtype, remat = resolve_auto_tpu_opts(c)
        self.scene_cfg = AnimNeRFConfig(
            freqs_xyz=c.freqs_xyz,
            freqs_dir=c.freqs_dir,
            use_view=c.use_view,
            use_unpose=c.use_unpose,
            unpose_view=c.unpose_view,
            k_neigh=c.k_neigh,
            use_deformation=c.use_deformation,
            deformation_dim=c.deformation_dim,
            apperance_dim=c.apperance_dim,
            use_fine=use_fine,
            share_fine=c.share_fine,
            dis_threshold=c.dis_threshold,
            query_inside=c.query_inside,
            compute_dtype=compute_dtype,
            remat=remat,
            fused_mlp=str(c.get("fused_mlp", "auto")),
        )
        self.scene = AnimNeRFModel(self.scene_cfg)
        self.renderer_cfg = RendererConfig(
            n_coarse=c.n_samples,
            n_fine=c.n_importance,
            n_fine_depth=c.n_depth,
            share_fine=c.share_fine,
            white_bkgd=c.white_bkgd,
        )
        self.latent_dim = c.deformation_dim + c.apperance_dim

    # ------------------------------------------------------------- init

    def init_params(self, rng: jax.Array, body_params: dict) -> dict:
        params = {"anim_nerf": self.scene.init(rng)}
        if self.latent_dim > 0:
            # reference init: N(0, 0.1) embeddings (train.py:133-137)
            params["latent_codes"] = 0.1 * jax.random.normal(
                jax.random.fold_in(rng, 1),
                (self.cfg.num_frames, self.latent_dim))
        params["body_params"] = body_params
        return params

    def make_optimizer(self, steps_per_epoch: int,
                       train_field: bool = True) -> optax.GradientTransformation:
        c = self.cfg.train

        def schedule(base_lr):
            """Per-epoch LR schedules (reference utils/__init__.py:46-58):
            poly (1-e/E)^exp, steplr multi-step decay, cosine annealing."""
            stype = c.scheduler.get("type", "poly")

            def fn(step):
                epoch = step // max(steps_per_epoch, 1)
                if stype == "steplr":
                    decay_steps = jnp.asarray(
                        list(c.scheduler.get("decay_step", [20])))
                    n_decays = jnp.sum(epoch >= decay_steps)
                    return base_lr * c.scheduler.get("decay_gamma", 0.1) ** n_decays
                if stype == "cosine":
                    frac = jnp.clip(epoch / c.max_epochs, 0.0, 1.0)
                    eps = 1e-8
                    return eps + (base_lr - eps) * 0.5 * (
                        1.0 + jnp.cos(jnp.pi * frac))
                # poly
                frac = 1.0 - epoch / c.max_epochs
                return base_lr * jnp.maximum(frac, 0.0) ** c.scheduler.poly_exp

            return fn

        def adam(base_lr):
            wd = float(c.optimizer.get("weight_decay", 0) or 0)
            if c.optimizer.type == "sgd":
                return optax.sgd(schedule(base_lr), momentum=c.optimizer.momentum)
            if wd > 0:
                return optax.adamw(schedule(base_lr), eps=1e-8, weight_decay=wd)
            return optax.adam(schedule(base_lr), eps=1e-8)

        transforms = {
            "field": adam(c.lr) if train_field else optax.set_to_zero(),
            "latent": adam(c.lr),
            "body": (adam(c.lr * 0.5) if self.cfg.optim_body_params
                     else optax.set_to_zero()),
        }

        self._lr_schedule = schedule(c.lr)  # exposed for logging (train/lr)

        def label_fn(params):
            labels = {"anim_nerf": jax.tree.map(lambda _: "field",
                                                params["anim_nerf"]),
                      "body_params": jax.tree.map(lambda _: "body",
                                                  params["body_params"])}
            if "latent_codes" in params:
                labels["latent_codes"] = "latent"
            return labels

        return optax.multi_transform(transforms, label_fn)

    def init_state(self, rng: jax.Array, body_params: dict,
                   steps_per_epoch: int, train_field: bool = True) -> TrainState:
        params = self.init_params(rng, body_params)
        tx = self.make_optimizer(steps_per_epoch, train_field)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=tx.init(params))

    # --------------------------------------------------------- rendering

    def _codes(self, params: dict, frame_idx: Optional[jax.Array]):
        d_code = a_code = None
        if self.latent_dim > 0 and frame_idx is not None:
            safe_idx = jnp.maximum(frame_idx, 0)
            codes = params["latent_codes"][safe_idx]
            dd = self.cfg.deformation_dim
            if dd > 0:
                d_code = codes[:, :dd]
            if self.cfg.apperance_dim > 0:
                a_code = codes[:, dd:dd + self.cfg.apperance_dim]
        return d_code, a_code

    def rows_renderable(self) -> bool:
        """The transposed pipeline pads the merged per-ray sample set to the
        lane shuffle's 128 lanes (render_rays_rows); configs with more total
        samples/ray (reference YAMLs allow it) must take render_rays_split."""
        r = self.renderer_cfg
        return (self.scene.rows_path_ok
                and r.n_coarse + r.n_fine + r.n_fine_depth <= 128)

    def render(self, params: dict, body_params: dict,
               body_params_template: dict, rays: jax.Array,
               frame_idx: Optional[jax.Array] = None, perturb: float = 0.0,
               key: Optional[jax.Array] = None):
        """Render a ray batch (B, R, 8) -> dict of (B, R, C) images.
        Equivalent of AnimNeRFSystem.forward (train.py:189-215), unchunked."""
        ctx = prepare_frame(self.body_model, body_params, body_params_template)
        rays_root = rays_to_root_frame(ctx, rays)
        d_code, a_code = self._codes(params, frame_idx)

        if d_code is None and a_code is None and self.rows_renderable():
            # transposed pipeline: samples on lanes from warp kernel to
            # fused MLP, fine merge-sort as a native lane shuffle
            from animnerf_tpu.render.volume_renderer import render_rays_rows

            out = render_rays_rows(
                self.renderer_cfg,
                lambda xyz_t: self.scene.warp_rows(ctx, xyz_t),
                lambda rows, fine: self.scene.field_rows(
                    params["anim_nerf"], rows, fine),
                rays_root, perturb=perturb, key=key)
            return out, ctx

        def warp_fn(xyz, viewdir):
            return self.scene.warp_points(ctx, xyz, viewdir)

        def field_fn(xyz, viewdir, valid, use_fine):
            return self.scene.field_points(
                params["anim_nerf"], xyz, viewdir, valid, use_fine,
                deformation_code=d_code, apperance_code=a_code)

        out = render_rays_split(self.renderer_cfg, warp_fn, field_fn,
                                rays_root, perturb=perturb, key=key)
        return out, ctx

    # ------------------------------------------------------------- loss

    def compute_loss(self, params: dict, results: dict, rgbs: jax.Array,
                     alphas: jax.Array, ctx, key: jax.Array,
                     fg_points: Optional[jax.Array] = None,
                     bg_points: Optional[jax.Array] = None,
                     frame_idx: Optional[jax.Array] = None):
        """Six-term loss (reference train.py:228-322)."""
        c = self.cfg
        t = c.train
        has_fine = c.n_importance > 0 and not c.share_fine
        d_code, _ = self._codes(params, frame_idx)

        details = {}
        loss = jnp.mean((results["rgbs"] - rgbs) ** 2)
        details["loss_rgb"] = loss
        if has_fine:
            lf = jnp.mean((results["rgbs_fine"] - rgbs) ** 2)
            details["loss_rgb_fine"] = lf
            loss = loss + lf

        la = jnp.mean(jnp.abs(results["alphas"] - alphas))
        details["loss_alphas"] = la
        loss = loss + t.lambda_alphas * la
        if has_fine:
            laf = jnp.mean(jnp.abs(results["alphas_fine"] - alphas))
            details["loss_alphas_fine"] = laf
            loss = loss + t.lambda_alphas * laf

        # fg/bg sigma terms share ONE batched MLP pass per field (exact:
        # sigma is pointwise, the split means are computed after)
        scale = 2.0 / c.n_samples
        if c.use_unpose and (fg_points is not None or bg_points is not None):
            both = fg_points is not None and bg_points is not None
            pts_sig = (jnp.concatenate([fg_points, bg_points], axis=1)
                       if both else
                       (fg_points if fg_points is not None else bg_points))
            n_fg = fg_points.shape[1] if fg_points is not None else 0
            for fine in ([False, True] if has_fine else [False]):
                s = self.scene.query_sigma(params["anim_nerf"], pts_sig,
                                           use_fine=fine,
                                           deformation_code=d_code)
                e = jnp.exp(-scale * jax.nn.relu(s))
                sfx = "_fine" if fine else ""
                if fg_points is not None:
                    lfg = jnp.mean(e[:, :n_fg])
                    details["loss_foreground" + sfx] = lfg
                    loss = loss + t.lambda_foreground * lfg
                if bg_points is not None:
                    lbg = jnp.mean(1.0 - e[:, n_fg:])
                    details["loss_background" + sfx] = lbg
                    loss = loss + t.lambda_background * lbg

        # normal smoothness on jittered template verts (train.py:288-309);
        # pts and their jittered neighbours ride ONE grad-of-MLP pass per
        # field (per-point gradients are independent, so batching is exact)
        k1, k2 = prng.split_keys(key, 2)
        pts = jax.lax.stop_gradient(ctx.verts_template)
        pts = pts + prng.normal(k1, pts.shape) * (c.dis_threshold * 0.5)
        neighbs = pts + prng.normal(k2, pts.shape) * t.epsilon
        n_pts = pts.shape[1]
        pts_nrm = jnp.concatenate([pts, neighbs], axis=1)
        for fine in ([False, True] if has_fine else [False]):
            nn = self.scene.query_normal(params["anim_nerf"], pts_nrm,
                                         use_fine=fine, deformation_code=d_code)
            n1 = _safe_normalize(nn[:, :n_pts])
            n2 = _safe_normalize(nn[:, n_pts:])
            ln = jnp.mean((n1 - n2) ** 2)
            details["loss_normals" + ("_fine" if fine else "")] = ln
            loss = loss + t.lambda_normals * ln

        details["loss"] = loss
        return loss, details

    # ------------------------------------------------------------ steps

    def loss_fn(self, params: dict, batch: dict, key: jax.Array,
                global_offset=0):
        """global_offset: this shard's first element's GLOBAL batch index
        (0 single-device; axis_index * local_B under shard_map). Noise is
        drawn per element keyed by global index, so training randomness is
        invariant to the data-parallel topology (tests/test_parallel.py
        asserts trajectory equality across mesh sizes)."""
        c = self.cfg
        frame_idx = batch["frame_idx"]
        if c.optim_body_params:
            body_params = lookup_body_params(params["body_params"], frame_idx)
        else:
            body_params = batch_params_from_data(batch, c.model_type)
        body_tmpl = batch_params_from_data(batch, c.model_type, template=True)

        keys = prng.elem_keys(key, batch["rays"].shape[0], global_offset)
        k_render, k_loss = prng.split_keys(keys, 2)
        results, ctx = self.render(params, body_params, body_tmpl,
                                   batch["rays"], frame_idx, perturb=1.0,
                                   key=k_render)
        loss, details = self.compute_loss(
            params, results, batch["rgbs"], batch["alphas"], ctx, k_loss,
            fg_points=batch.get("fg_points"), bg_points=batch.get("bg_points"),
            frame_idx=frame_idx)
        rgb_key = "rgbs_fine" if "rgbs_fine" in results else "rgbs"
        details["psnr"] = psnr(results[rgb_key], batch["rgbs"])
        return loss, details

    def make_train_step(self, tx: optax.GradientTransformation):
        def train_step(state: TrainState, batch: dict, key: jax.Array):
            key = jax.random.fold_in(key, state.step)
            grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
            (loss, details), grads = grad_fn(state.params, batch, key)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(step=state.step + 1, params=params,
                                   opt_state=opt_state)
            return new_state, details

        return train_step

    # ----------------------------------------------- compacted training

    def compaction_applicable(self) -> bool:
        """Sample-level compaction supports the flagship configuration:
        kNN unpose warp, no DeRF deformation / latent codes, no
        depth-guided fine samples (see render/compact.py for why the
        result is exact there)."""
        sc = self.scene_cfg
        return (sc.use_unpose and not sc.use_deformation
                and sc.deformation_dim == 0 and sc.apperance_dim == 0
                and self.renderer_cfg.n_fine_depth == 0)

    def compact_loss_fn(self, params: dict, batch: dict, key: jax.Array,
                        step: jax.Array, cap_c: int, global_offset=0):
        """Differentiated loss with coarse-sample compaction fused into ONE
        program: dense kNN (at its brute-force compute floor — its nearest
        distance IS the exact validity test) -> on-device survivor select
        at the static capacity `cap_c` -> LBS blend + coarse MLP on
        survivors only -> dense fine pass (see render_rays_compact).
        Bit-matching loss vs loss_fn; gradients flow through the frame
        context / coarse depths exactly as in the dense path (sel indices
        are integers, no tangents).

        details carries 'compact_count' (true survivor max over rows) and
        'compact_overflow' (count > cap_c: some survivors were dropped this
        step — the CompactTrainer detects this and re-runs the step at a
        larger capacity before the state advances, keeping training exact).
        """
        from animnerf_tpu.render.compact import render_rays_compact

        c = self.cfg
        folded = jax.random.fold_in(key, step)
        keys = prng.elem_keys(folded, batch["rays"].shape[0], global_offset)
        k_render, k_loss = prng.split_keys(keys, 2)
        frame_idx = batch["frame_idx"]
        if c.optim_body_params:
            body_params = lookup_body_params(params["body_params"], frame_idx)
        else:
            body_params = batch_params_from_data(batch, c.model_type)
        body_tmpl = batch_params_from_data(batch, c.model_type, template=True)
        ctx = prepare_frame(self.body_model, body_params, body_tmpl)
        rays_root = rays_to_root_frame(ctx, batch["rays"])
        d_code, a_code = self._codes(params, frame_idx)

        def warp_fn(xyz, viewdir):
            return self.scene.warp_points(ctx, xyz, viewdir)

        def knn_fn(xyz):
            return self.scene.warp_knn(ctx, xyz)

        def blend_fn(xyz, viewdir, dists, idx):
            return self.scene.warp_points_with_knn(ctx, xyz, viewdir,
                                                   dists, idx)

        def field_fn(xyz, viewdir, valid, use_fine):
            return self.scene.field_points(
                params["anim_nerf"], xyz, viewdir, valid, use_fine,
                deformation_code=d_code, apperance_code=a_code)

        results, count = render_rays_compact(
            self.renderer_cfg, warp_fn, field_fn, rays_root, cap_c,
            knn_fn, blend_fn, self.scene_cfg.dis_threshold,
            perturb=1.0, key=k_render)
        loss, details = self.compute_loss(
            params, results, batch["rgbs"], batch["alphas"], ctx, k_loss,
            fg_points=batch.get("fg_points"),
            bg_points=batch.get("bg_points"), frame_idx=frame_idx)
        rgb_key = "rgbs_fine" if "rgbs_fine" in results else "rgbs"
        details["psnr"] = psnr(results[rgb_key], batch["rgbs"])
        details["compact_count"] = count
        details["compact_overflow"] = (count > cap_c).astype(jnp.int32)
        return loss, details

    def make_compact_trainer(self, tx: optax.GradientTransformation,
                             quantum: int = 8192, factor: float = 1.5,
                             pipelined: bool = False, sync_every: int = 32,
                             margin: float = 1.15, mesh=None):
        return CompactTrainer(self, tx, quantum=quantum, factor=factor,
                              pipelined=pipelined, sync_every=sync_every,
                              margin=margin, mesh=mesh)

    # ---------------------------------------- rows-native compacted training

    def rows_compaction_applicable(self) -> bool:
        """The rows-native compacted step needs BOTH the transposed kernel
        pipeline (rows_renderable) and the compaction preconditions."""
        return self.compaction_applicable() and self.rows_renderable()

    @staticmethod
    def _morton_compact() -> bool:
        """Morton-order the compacted survivors + kNN vertex-tile skip
        (render/compact_rows.py `morton`). Exact either way; the spatial
        order only pays on the real kernels, so default to TPU.
        ANIMNERF_MORTON_COMPACT=0/1 overrides (tests force it on to cover
        the Morton path in interpret mode)."""
        import os

        env = os.environ.get("ANIMNERF_MORTON_COMPACT", "")
        if env in ("0", "1"):
            return env == "1"
        from animnerf_tpu.utils.platform import on_tpu

        return on_tpu()

    def rows_compact_loss_fn(self, params: dict, batch: dict, key: jax.Array,
                             step: jax.Array, cap_c: int, global_offset=0):
        """Differentiated loss with the coarse pass compacted on the
        rows-native kernel pipeline (render/compact_rows.py): conservative
        inflated-AABB pre-pass -> survivor select at `cap_c` -> fused
        kNN + warp-blend + coarse MLP on survivors only; the fine MLP
        reuses the compacted coarse rows (unsorted concat, ~71% of the
        dense merged size) before the lane merge-sort. Loss/gradients
        match loss_fn exactly (tests/test_compact_rows.py); details carry
        the survivor count and overflow flag for the RowsCompactTrainer."""
        from animnerf_tpu.ops.knn import keep_rows_within_boxes
        from animnerf_tpu.render.compact_rows import render_rays_rows_compact

        c = self.cfg
        folded = jax.random.fold_in(key, step)
        keys = prng.elem_keys(folded, batch["rays"].shape[0], global_offset)
        k_render, k_loss = prng.split_keys(keys, 2)
        frame_idx = batch["frame_idx"]
        if c.optim_body_params:
            body_params = lookup_body_params(params["body_params"], frame_idx)
        else:
            body_params = batch_params_from_data(batch, c.model_type)
        body_tmpl = batch_params_from_data(batch, c.model_type, template=True)
        ctx = prepare_frame(self.body_model, body_params, body_tmpl)
        rays_root = rays_to_root_frame(ctx, batch["rays"])

        thr = self.scene_cfg.dis_threshold
        box_verts = ctx.verts_morton if ctx.verts_morton is not None \
            else ctx.verts

        results, n_c = render_rays_rows_compact(
            self.renderer_cfg,
            lambda xyz_t, **kw: self.scene.warp_rows(ctx, xyz_t, **kw),
            lambda rows, fine: self.scene.field_rows(
                params["anim_nerf"], rows, fine),
            rays_root, cap_c,
            lambda rows: keep_rows_within_boxes(rows, box_verts, thr),
            perturb=1.0, key=k_render, morton=self._morton_compact())
        loss, details = self.compute_loss(
            params, results, batch["rgbs"], batch["alphas"], ctx, k_loss,
            fg_points=batch.get("fg_points"),
            bg_points=batch.get("bg_points"), frame_idx=frame_idx)
        rgb_key = "rgbs_fine" if "rgbs_fine" in results else "rgbs"
        details["psnr"] = psnr(results[rgb_key], batch["rgbs"])
        details["compact_count"] = n_c
        details["compact_overflow"] = (n_c > cap_c).astype(jnp.int32)
        return loss, details

    def make_rows_compact_trainer(self, tx: optax.GradientTransformation,
                                  quantum: int = 4096,
                                  pipelined: bool = False,
                                  sync_every: int = 32,
                                  margin: float = 1.05, mesh=None):
        return RowsCompactTrainer(self, tx, quantum=quantum,
                                  pipelined=pipelined,
                                  sync_every=sync_every, margin=margin,
                                  mesh=mesh)

    def make_eval_step(self):
        def eval_step(params: dict, batch: dict):
            c = self.cfg
            frame_idx = batch["frame_idx"]
            use_stored = c.optim_body_params
            if use_stored:
                stored = lookup_body_params(params["body_params"], frame_idx)
                given = batch_params_from_data(batch, c.model_type)
                # frame not in the train set (frame_idx == -1) -> given params
                sel = (frame_idx >= 0).astype(jnp.float32)
                body_params = {
                    k: sel.reshape((-1,) + (1,) * (stored[k].ndim - 1)) * stored[k]
                    + (1 - sel.reshape((-1,) + (1,) * (given[k].ndim - 1))) * given[k]
                    for k in stored}
            else:
                body_params = batch_params_from_data(batch, c.model_type)
            body_tmpl = batch_params_from_data(batch, c.model_type, template=True)
            results, _ = self.render(params, body_params, body_tmpl,
                                     batch["rays"], frame_idx, perturb=0.0)
            return results

        return eval_step


class CompactTrainer:
    """Exact sample-compacted training step (the training-side twin of the
    inference compaction in render/inference.py; math in render/compact.py).

    One fused program per capacity rung: validity pre-pass, on-device
    survivor select, compacted coarse warp+MLP (the step's dominant cost —
    only ~38% of coarse samples are in-shell on the flagship workload),
    dense fine pass (importance sampling already concentrates fine depths
    on the body: measured 98.8% in-shell, so a fine rung would pad PAST
    dense), loss, backward, optimizer update.

    The capacity is predicted from observed survivor counts (a geometric
    ladder keeps the set of compiled programs small). Two sync policies:

      strict (default): the survivor count is read back every step; a step
        that overflowed its predicted capacity is RE-RUN at the larger rung
        before the state advances (the program is pure and not donated), so
        training is exact on every step. The count read-back costs one
        host<->device round trip per step — negligible on locally-attached
        TPUs, and the training loop reads per-step metrics anyway.

      pipelined=True: steps are dispatched without any read-back (full
        async pipelining — for environments where a device sync is
        expensive, e.g. remote/tunneled TPUs). The capacity carries one
        ladder rung of safety margin above the last observed count, and
        counts are polled asynchronously every `sync_every` steps from a
        step whose compute has long finished. If a poll reveals an
        overflow, the capacity ratchets up and `overflows` is incremented:
        the steps since that count were computed with the overflow samples
        sigma-filled (a bounded, detected approximation during capacity
        ramp; steady-state behaviour is exact).

    Exactness (bit-equal loss, gradients to float reduction order) vs the
    dense step is tested in tests/test_compact_train.py.

    Status: documented OPT-IN, not the default. Measured on the real chip
    on both the blob rig (round 2: 30.2k vs 37.6k rays/s dense) and the
    surface rig (round 4, tools/bench_surface.py: 30.6k vs 66.3k dense) —
    the reference's fixed near=0.1/far=10 ray bounds keep ~36% of coarse
    samples in-shell, so the select/scatter overhead outweighs the skipped
    warp+MLP work in every regime this workload actually has. Kept (unlike
    tile_compact/knn_cluster, deleted) because it is the tested
    training-side twin of the inference compaction engine and wins when a
    workload is genuinely sparse (tight masks, small dis_threshold).
    """

    def __init__(self, system: AnimNeRFSystem,
                 tx: optax.GradientTransformation,
                 quantum: int = 8192, factor: float = 1.5,
                 pipelined: bool = False, sync_every: int = 32,
                 margin: float = 1.15, mesh=None):
        if not system.compaction_applicable():
            raise ValueError(
                "compacted training requires use_unpose and no "
                "deformation/latent codes (see compaction_applicable)")
        self.system = system
        self.tx = tx
        self.quantum = quantum
        self.factor = factor
        self.pipelined = pipelined
        self.sync_every = sync_every
        self.margin = margin  # pipelined capacity headroom over last count
        # multi-device data parallelism: a jax.sharding.Mesh with a 'data'
        # axis. Each chip compacts ITS batch shard at the shared static
        # capacity (the ladder is per batch row, so one device-uniform rung
        # serves every shard); gradients/metrics pmean over ICI and the
        # survivor count pmax's, so the host-side ladder/overflow logic is
        # identical to single-chip (tests/test_parallel.py asserts
        # trajectory equality across mesh sizes).
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self.overflows = 0  # strict: exact re-runs; pipelined: ramp events
        self._cap: Optional[int] = None
        self._b: dict[int, Any] = {}
        self._pending: list = []   # (cap_used, count device scalar)
        self._since_sync = 0

    # the capacitated loss (subclasses swap in a different engine) and the
    # first-step capacity guess (a wrong guess costs one extra compile,
    # never exactness — the primer reads the count back and re-runs)
    def _loss_fn(self):
        return self.system.compact_loss_fn

    def _prime_cap(self, batch: dict) -> int:
        return self.quantum

    def _ladder(self, n: int) -> int:
        """Capacity rung: the smallest multiple of `quantum` >= n. Multiples
        (not a geometric ladder) keep the padding overhead <= quantum while
        survivor counts drift slowly, so the compiled-program set stays
        small without paying 1.5x-rung padding."""
        q = self.quantum
        return max(q, -(-n // q) * q)

    def _b_step(self, cap_c: int):
        if cap_c not in self._b:
            if self.mesh is None:
                def b(state: TrainState, batch: dict, key: jax.Array):
                    grad_fn = jax.value_and_grad(
                        partial(self._loss_fn(), cap_c=cap_c), has_aux=True)
                    (loss, details), grads = grad_fn(
                        state.params, batch, key, state.step)
                    updates, opt_state = self.tx.update(
                        grads, state.opt_state, state.params)
                    params = optax.apply_updates(state.params, updates)
                    return TrainState(step=state.step + 1, params=params,
                                      opt_state=opt_state), details

                # NOT donated: an overflow re-runs the step at a larger rung
                # from the same state
                self._b[cap_c] = jax.jit(b)
            else:
                from jax.sharding import PartitionSpec as P

                def local(state: TrainState, batch: dict, key: jax.Array):
                    # per-element noise keyed by GLOBAL index — identical
                    # draws on any mesh size (utils/rng.py)
                    offset = (jax.lax.axis_index("data")
                              * batch["rays"].shape[0])
                    grad_fn = jax.value_and_grad(
                        partial(self._loss_fn(), cap_c=cap_c,
                                global_offset=offset), has_aux=True)
                    (loss, details), grads = grad_fn(
                        state.params, batch, key, state.step)
                    grads = jax.lax.pmean(grads, "data")
                    count = details.pop("compact_count")
                    overflow = details.pop("compact_overflow")
                    details = jax.lax.pmean(details, "data")
                    # capacity bookkeeping needs the WORST shard
                    details["compact_count"] = jax.lax.pmax(count, "data")
                    details["compact_overflow"] = jax.lax.pmax(
                        overflow, "data")
                    updates, opt_state = self.tx.update(
                        grads, state.opt_state, state.params)
                    params = optax.apply_updates(state.params, updates)
                    return TrainState(step=state.step + 1, params=params,
                                      opt_state=opt_state), details

                sm = jax.shard_map(local, mesh=self.mesh,
                                   in_specs=(P(), P("data"), P()),
                                   out_specs=(P(), P()),
                                   check_vma=False)
                self._b[cap_c] = jax.jit(sm)  # NOT donated (see above)
        return self._b[cap_c]

    def step(self, state: TrainState, batch: dict, key: jax.Array):
        """Drop-in for the jitted dense train step (same (state, batch,
        key) -> (state, details) contract; `key` is folded by state.step
        internally, like make_train_step)."""
        if self._cap is None:  # prime: one synchronous first step
            cap0 = self._prime_cap(batch)
            new_state, details = self._b_step(cap0)(state, batch, key)
            n = int(details["compact_count"])
            if n > cap0:
                self.overflows += 1
                new_state, details = self._b_step(self._ladder(n))(
                    state, batch, key)
            margin = self.margin if self.pipelined else 1.0
            self._cap = self._ladder(int(n * margin))
            return new_state, details

        cap = self._cap
        new_state, details = self._b_step(cap)(state, batch, key)

        if not self.pipelined:
            n = int(details["compact_count"])
            if n > cap:  # exact re-run at the true capacity
                self.overflows += 1
                cap = self._ladder(n)
                new_state, details = self._b_step(cap)(state, batch, key)
            self._cap = max(self._cap, self._ladder(n))
            return new_state, details

        # pipelined: no read-back on the hot path; poll old counts
        self._pending.append((cap, details["compact_count"]))
        self._since_sync += 1
        if self._since_sync >= self.sync_every and len(self._pending) > 1:
            # Drain EVERY entry except the newest (still in flight) and
            # take the window max — sampling a single step per window
            # missed overflows in the discarded steps, undercounting
            # self.overflows vs the documented "bounded, detected"
            # contract. Drained entries finished >= 1 step ago, so the
            # int() reads don't stall the pipeline.
            drained, self._pending = self._pending[:-1], self._pending[-1:]
            self._since_sync = 0
            n_max = 0
            for cap_used, count in drained:
                n = int(count)
                if n > cap_used:
                    self.overflows += 1
                n_max = max(n_max, n)
            self._cap = max(self._cap,
                            self._ladder(int(n_max * self.margin)))
        return new_state, details


class RowsCompactTrainer(CompactTrainer):
    """Compacted training on the rows-native kernel pipeline — the fast
    twin of CompactTrainer (same capacity ladder, sync policies, and
    exactness contract; see the base class).

    Where the base engine runs the kNN dense (its distances ARE the exact
    validity test) and compacts only the blend+MLP behind it, this one
    compacts BEFORE the kNN with the conservative inflated-AABB pre-pass
    (~1/30 of a kNN sweep) and feeds the fine MLP the already-compacted
    coarse rows (render/compact_rows.py). Measured keep fractions on the
    flagship workload: coarse 49% (boxes), merged fine-MLP input 71% —
    roughly halving the step's kNN + warp-blend + coarse-MLP work.
    Exactness vs the dense rows step: tests/test_compact_rows.py.
    """

    def __init__(self, system: AnimNeRFSystem,
                 tx: optax.GradientTransformation,
                 quantum: int = 4096, pipelined: bool = False,
                 sync_every: int = 32, margin: float = 1.05, mesh=None):
        if not system.rows_compaction_applicable():
            raise ValueError(
                "rows-compacted training requires the rows pipeline "
                "(fused MLP/warp on TPU, K <= 128) plus the compaction "
                "preconditions (see rows_compaction_applicable)")
        super().__init__(system, tx, quantum=quantum, pipelined=pipelined,
                         sync_every=sync_every, margin=margin, mesh=mesh)

    def _loss_fn(self):
        return self.system.rows_compact_loss_fn

    def _ladder(self, n: int) -> int:
        # the rows engine's dense size is R*n_coarse; rungs above it would
        # only duplicate the cap==N program (render_rays_rows_compact
        # clamps), so cap the ladder to keep the compiled set minimal
        cap = super()._ladder(n)
        dense_n = getattr(self, "_dense_n", None)
        return cap if dense_n is None else min(cap, dense_n)

    def _prime_cap(self, batch: dict) -> int:
        # measured boxes keep ~49% of coarse samples (+ headroom)
        r = self.system.renderer_cfg
        R = batch["rays"].shape[1]
        self._dense_n = R * r.n_coarse
        return self._ladder(int(0.55 * R * r.n_coarse))
