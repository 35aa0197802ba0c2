"""AnimNeRF scene model — functional orchestration of warp + canonical NeRF.

Re-design of /root/reference/models/anim_nerf.py:41-307. The reference is a
stateful nn.Module (set_body_model / set_latent_code mutate attributes); here
the scene model is a *static* configuration object plus pure functions:

    scene = AnimNeRFModel(cfg)
    params = scene.init(rng)                       # flax param pytrees
    ctx    = prepare_frame(body_model, p, p_tmpl)  # explicit geometry pytree
    rgb, sigma = scene.apply_points(params, ctx, xyz, viewdir, use_fine=...)

Outside-shell handling: sigma is filled with -1e5 where the blended kNN
distance exceeds dis_threshold (reference :305). The reference's
query_inside boolean-gather path (:245-288) is shape-dynamic and therefore
implemented as masked dense compute — identical results, XLA-compatible.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Optional

import jax
import jax.numpy as jnp

from animnerf_tpu.models.nerf import DeRFMLP, NeRFMLP, rotation_from_ortho6d
from animnerf_tpu.models.warp import FrameContext, unpose

SIGMA_OUTSIDE = -1e5


@dataclasses.dataclass(frozen=True)
class AnimNeRFConfig:
    """Static scene-model configuration (mirrors the reference ctor args,
    anim_nerf.py:42-60, so YAML configs map 1:1)."""

    freqs_xyz: int = 10
    freqs_dir: int = 4
    use_view: bool = False
    use_unpose: bool = True
    unpose_view: bool = False
    k_neigh: int = 4
    use_deformation: bool = False
    deformation_dim: int = 0
    apperance_dim: int = 0
    use_fine: bool = True
    share_fine: bool = False
    dis_threshold: float = 0.2
    query_inside: bool = False
    weight_std: float = 0.1
    # Experimental: all-far point-tile skip inside the kNN kernel
    # (pipeline-exact; measured neutral on v5e, see PERF.md).
    knn_far_skip: bool = False
    compute_dtype: str = "float32"  # 'bfloat16' for MXU-native training
    # Rematerialize the canonical MLP in backward: activations for millions
    # of point queries dominate HBM (a 16k-ray step OOMs a 16G chip without
    # this); recomputing the 8x256 trunk costs ~1/3 extra FLOPs.
    remat: bool = True
    # Fully-fused Pallas MLP (ops/fused_mlp.py) for the rgb+sigma queries:
    # "auto" enables it on TPU when the architecture matches the kernel
    # (use_view=False, no codes, no DeRF — the flagship configuration);
    # "on"/"off" force it. The normal-smoothness path (query_sigma /
    # query_normal) always keeps the XLA MLP: it needs grad-of-grad, the
    # kernel's custom VJP is first-order only.
    fused_mlp: str = "auto"


class AnimNeRFModel:
    """Bundles the flax modules + pure apply functions."""

    def __init__(self, cfg: AnimNeRFConfig):
        self.cfg = cfg

    @cached_property
    def nerf(self) -> NeRFMLP:
        c = self.cfg
        return NeRFMLP(
            freqs_xyz=c.freqs_xyz, freqs_dir=c.freqs_dir, use_view=c.use_view,
            deformation_dim=c.deformation_dim, apperance_dim=c.apperance_dim,
            compute_dtype=jnp.dtype(c.compute_dtype),
        )

    @cached_property
    def nerf_fine(self) -> Optional[NeRFMLP]:
        c = self.cfg
        if not c.use_fine:
            return None
        if c.share_fine:
            return self.nerf
        return NeRFMLP(
            freqs_xyz=c.freqs_xyz, freqs_dir=c.freqs_dir, use_view=c.use_view,
            deformation_dim=c.deformation_dim, apperance_dim=c.apperance_dim,
            compute_dtype=jnp.dtype(c.compute_dtype),
        )

    @cached_property
    def derf(self) -> Optional[DeRFMLP]:
        c = self.cfg
        if not c.use_deformation:
            return None
        return DeRFMLP(freqs_xyz=c.freqs_xyz, deformation_dim=c.deformation_dim,
                       out_channels=9, compute_dtype=jnp.dtype(c.compute_dtype))

    # ---------------------------------------------------------- params

    def init(self, rng: jax.Array) -> dict:
        c = self.cfg
        k_nerf, k_fine, k_derf = jax.random.split(rng, 3)
        dummy_xyz = jnp.zeros((1, 3))
        dummy_dir = jnp.zeros((1, 3)) if c.use_view else None
        dummy_def = jnp.zeros((1, c.deformation_dim)) if c.deformation_dim else None
        dummy_app = jnp.zeros((1, c.apperance_dim)) if c.apperance_dim else None
        params = {
            "nerf": self.nerf.init(k_nerf, dummy_xyz, dummy_dir, dummy_def,
                                   dummy_app)
        }
        if c.use_fine and not c.share_fine:
            params["nerf_fine"] = self.nerf_fine.init(
                k_fine, dummy_xyz, dummy_dir, dummy_def, dummy_app)
        if c.use_deformation:
            params["derf"] = self.derf.init(k_derf, dummy_xyz, dummy_def)
        return params

    def _field(self, use_fine: bool):
        if use_fine and self.cfg.use_fine:
            return self.nerf_fine, ("nerf" if self.cfg.share_fine else "nerf_fine")
        return self.nerf, "nerf"

    @cached_property
    def use_fused_mlp(self) -> bool:
        c = self.cfg
        if c.fused_mlp == "off":
            return False
        arch_ok = (not c.use_view and c.deformation_dim == 0
                   and c.apperance_dim == 0 and not c.use_deformation
                   and 3 + 6 * c.freqs_xyz <= 128)
        if not arch_ok:
            return False
        if c.fused_mlp == "on":
            return True
        # Pallas TPU lowering only (pltpu memory spaces): a GPU/CPU backend
        # must take the XLA MLP, not crash in Mosaic
        from animnerf_tpu.utils.platform import on_tpu

        return on_tpu()

    # ---------------------------------------------------------- queries

    def _expand_code(self, code, n):
        if code is None:
            return None
        return jnp.broadcast_to(code[:, None, :], (code.shape[0], n, code.shape[-1]))

    def query_canonical(self, params: dict, xyz: jax.Array,
                        viewdir: Optional[jax.Array] = None,
                        use_fine: bool = False,
                        deformation_code: Optional[jax.Array] = None,
                        apperance_code: Optional[jax.Array] = None):
        """(B, N, 3) canonical points -> (rgb (B,N,3), sigma (B,N,1))."""
        module, key = self._field(use_fine)
        n = xyz.shape[1]

        if self.use_fused_mlp:
            from animnerf_tpu.ops.fused_mlp import fused_nerf, pack_params

            c = self.cfg
            lead = xyz.shape[:-1]
            ws, bs = pack_params(params[key], c.freqs_xyz,
                                 dtype=jnp.dtype(c.compute_dtype))
            rgb, sigma = fused_nerf(xyz.reshape(-1, 3), ws, bs,
                                    n_freqs=c.freqs_xyz,
                                    dtype_name=c.compute_dtype)
            return rgb.reshape(*lead, 3), sigma.reshape(*lead, 1)

        def apply_fn(p, xyz, viewdir, d_code, a_code):
            return module.apply(p, xyz, viewdir, d_code, a_code)

        if self.cfg.remat:
            apply_fn = jax.checkpoint(apply_fn)
        return apply_fn(
            params[key], xyz, viewdir,
            self._expand_code(deformation_code, n),
            self._expand_code(apperance_code, n),
        )

    def query_sigma(self, params: dict, xyz: jax.Array, use_fine: bool = False,
                    deformation_code: Optional[jax.Array] = None):
        module, key = self._field(use_fine)

        def apply_fn(p, xyz, d_code):
            return module.apply(p, xyz, d_code, method=NeRFMLP.get_sigma)

        if self.cfg.remat:
            apply_fn = jax.checkpoint(apply_fn)
        return apply_fn(params[key], xyz,
                        self._expand_code(deformation_code, xyz.shape[1]))

    def query_normal(self, params: dict, xyz: jax.Array, use_fine: bool = False,
                     deformation_code: Optional[jax.Array] = None,
                     delta: float = 0.02):
        """d(alpha)/d(xyz) of the canonical density (reference
        nerf.py:177-190); differentiable itself for the smoothness loss."""

        def alpha_sum(pts):
            sigma = self.query_sigma(params, pts, use_fine, deformation_code)
            return jnp.sum(1.0 - jnp.exp(-delta * jax.nn.relu(sigma)))

        return jax.grad(alpha_sum)(xyz)

    def apply_deformation(self, params: dict, xyz: jax.Array,
                          valid: Optional[jax.Array],
                          deformation_code: Optional[jax.Array]):
        """DeRF residual rigid motion (reference anim_nerf.py:194-209)."""
        out = self.derf.apply(params["derf"], xyz,
                              self._expand_code(deformation_code, xyz.shape[1]))
        rot = rotation_from_ortho6d(out[..., :6])
        trans = out[..., 6:9]
        if valid is not None:
            eye = jnp.eye(3, dtype=rot.dtype)
            rot = valid[..., None] * rot + (1.0 - valid[..., None]) * eye
        return jnp.einsum("bnmk,bnk->bnm", rot, xyz) + trans

    def warp_points(self, ctx: Optional[FrameContext], xyz: jax.Array,
                    viewdir: Optional[jax.Array] = None):
        """Observed -> canonical warp (reference anim_nerf.py:180-192).
        Returns (xyz_cano, viewdir, valid|None)."""
        c = self.cfg
        if not c.use_unpose:
            return xyz, viewdir, None
        assert ctx is not None, "use_unpose requires a FrameContext"
        return unpose(ctx, xyz, viewdir, k=c.k_neigh,
                      dis_threshold=c.dis_threshold, weight_std=c.weight_std,
                      unpose_view=c.unpose_view, far_skip=c.knn_far_skip)

    def warp_knn(self, ctx: FrameContext, xyz: jax.Array):
        """kNN half of the warp: (dists, idx) against the observed verts.
        dists[..., 0] < dis_threshold is the exact validity pre-test the
        compacted training step uses (render/compact.py)."""
        from animnerf_tpu.ops.knn import knn

        c = self.cfg
        return knn(xyz, ctx.verts, k=c.k_neigh,
                   far_skip=c.dis_threshold if c.knn_far_skip else 0.0)

    def warp_points_with_knn(self, ctx: FrameContext, xyz: jax.Array,
                             viewdir, dists: jax.Array, idx: jax.Array):
        """Blend half of the warp on points whose (dists, idx) are already
        known — per-point equal to warp_points."""
        from animnerf_tpu.models.warp import unpose_with_knn

        c = self.cfg
        return unpose_with_knn(ctx, xyz, viewdir, dists, idx,
                               dis_threshold=c.dis_threshold,
                               weight_std=c.weight_std,
                               unpose_view=c.unpose_view)

    def field_points(self, params: dict, xyz: jax.Array,
                     viewdir: Optional[jax.Array] = None,
                     valid: Optional[jax.Array] = None,
                     use_fine: bool = False,
                     deformation_code: Optional[jax.Array] = None,
                     apperance_code: Optional[jax.Array] = None):
        """Canonical-space query: (DeRF) -> MLP -> outside-shell sigma fill
        (reference anim_nerf.py:298-307)."""
        c = self.cfg
        if c.use_deformation:
            xyz = self.apply_deformation(params, xyz, valid, deformation_code)

        rgb, sigma = self.query_canonical(
            params, xyz, viewdir, use_fine, deformation_code, apperance_code)

        if valid is not None:
            sigma = jnp.where(valid < 1.0, SIGMA_OUTSIDE, sigma)
            if c.query_inside:
                # masked-dense equivalent of the reference's boolean gather
                rgb = jnp.where(valid < 1.0, 0.0, rgb)
        return rgb, sigma

    def apply_points(self, params: dict, ctx: Optional[FrameContext],
                     xyz: jax.Array, viewdir: Optional[jax.Array] = None,
                     use_fine: bool = False,
                     deformation_code: Optional[jax.Array] = None,
                     apperance_code: Optional[jax.Array] = None):
        """Full observed-space point query: unpose -> (DeRF) -> canonical MLP
        -> outside-shell sigma fill (reference anim_nerf.py:290-307)."""
        xyz, viewdir, valid = self.warp_points(ctx, xyz, viewdir)
        return self.field_points(params, xyz, viewdir, valid, use_fine,
                                 deformation_code, apperance_code)


# ---------------------------------------------------------------------------
# rows-native (transposed) pipeline hooks — see render_rays_rows
# ---------------------------------------------------------------------------


def _rows_path_ok(model: "AnimNeRFModel") -> bool:
    """The transposed pipeline covers the flagship configuration: fused
    MLP applicable, fused warp on (TPU), no viewdir warping, no DeRF."""
    from animnerf_tpu.models.warp import _fused_warp_enabled

    c = model.cfg
    return (model.use_fused_mlp and c.use_unpose and not c.unpose_view
            and not c.use_deformation and _fused_warp_enabled())


def _warp_rows(model: "AnimNeRFModel", ctx, xyz_t, tile_skip: bool = False):
    from animnerf_tpu.models.warp import unpose_rows

    c = model.cfg
    return unpose_rows(ctx, xyz_t, k=c.k_neigh, weight_std=c.weight_std,
                       far_skip=c.dis_threshold if c.knn_far_skip else 0.0,
                       tile_skip=tile_skip)


def _field_rows(model: "AnimNeRFModel", params: dict, rows, use_fine: bool):
    """rows (B, 8, N) [x'|y'|z'|bd|..] -> (B, 8, N) [r|g|b|sigma|0..] with
    the outside-shell sigma fill (reference anim_nerf.py:298-307)."""
    import jax.numpy as jnp

    from animnerf_tpu.ops.fused_mlp import fused_nerf_rows, pack_params

    c = model.cfg
    _, key = model._field(use_fine)
    ws, bs = pack_params(params[key], c.freqs_xyz,
                         dtype=jnp.dtype(c.compute_dtype))
    out = fused_nerf_rows(rows, ws, bs, n_freqs=c.freqs_xyz,
                          dtype_name=c.compute_dtype)
    valid = rows[:, 3:4] < c.dis_threshold
    sigma = jnp.where(valid, out[:, 3:4], SIGMA_OUTSIDE)
    rgb = out[:, 0:3]
    if c.query_inside:
        rgb = jnp.where(valid, rgb, 0.0)
    return jnp.concatenate([rgb, sigma, out[:, 4:]], axis=1)


AnimNeRFModel.rows_path_ok = property(_rows_path_ok)
AnimNeRFModel.warp_rows = _warp_rows
AnimNeRFModel.field_rows = _field_rows
