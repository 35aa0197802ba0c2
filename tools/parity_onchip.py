"""On-hardware kernel-path parity artifact (VERDICT r3 ask 8).

Renders one 512^2 view of the committed TRAINED scale512 checkpoint on the
real chip through TWO pipelines and diffs the pixels:

  * production: ray cull + sample compaction + Pallas kernels (packed kNN,
    fused warp-blend, fused MLP, lane-shuffle merge) — what bench_render
    and the CLIs run;
  * reference-shape: plain XLA ops end to end (ANIMNERF_WARP_FUSED=0,
    fused_mlp='off', no cull, no compaction, render_rays_split) — the
    path the CPU parity tests validate against the reference's own torch
    code (tests/test_render_parity.py).

The kernel-equivalence tests run in interpret mode on CPU; this artifact
is the same comparison executed on the TPU itself. Expected deltas are
bf16-accumulation-order level plus the packed kNN's documented <=2^-13
key quantization (ops/knn_pallas.py); the JSON records max/mean |drgb|,
|dmask|, |ddepth| into docs/demo/scale512/parity_onchip.json.

Usage: python tools/parity_onchip.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    os.environ.setdefault("ANIMNERF_WARP_FUSED", "1")
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_system
    from animnerf_tpu.data.synthetic import make_body_model
    from animnerf_tpu.models.body_params import init_body_params
    from animnerf_tpu.ops.ray_utils import camera_to_c2w, gen_rays
    from animnerf_tpu.render.inference import Renderer, turntable_rotation
    from animnerf_tpu.training.checkpoints import load_params
    from animnerf_tpu.training.system import AnimNeRFSystem
    from animnerf_tpu.utils.io import load_pickle_file as load_pickle

    demo = os.path.join(REPO, "docs", "demo", "scale512", "ckpt")
    body_model = make_body_model(num_verts=6890, num_joints=24, seed=3)

    def build_system(fused: bool):
        cfg, _, _, num_joints = _flagship_system(tiny=False)
        cfg.compute_dtype = "bfloat16"
        cfg.remat = False
        if not fused:
            cfg.fused_mlp = "off"
        system = AnimNeRFSystem(cfg, body_model)
        params = system.init_params(
            jax.random.PRNGKey(0),
            init_body_params(4, pose_dim=3 * (num_joints - 1)))
        params = load_params(demo, params, ["anim_nerf", "body_params"])
        return system, params

    frame = load_pickle(os.path.join(demo, "smpl_000001.pkl"))
    body_params = {k: jnp.asarray(np.asarray(v, np.float32)).reshape(1, -1)
                   for k, v in frame.items()
                   if k in ("betas", "global_orient", "body_pose", "transl")}
    t = load_pickle(os.path.join(demo, "smpl_template.pkl"))
    tmpl = {k: jnp.asarray(np.asarray(t[k], np.float32)).reshape(1, -1)
            for k in ("betas", "global_orient", "body_pose", "transl")}

    H = W = 512
    f = 1.2 * W
    c2w = camera_to_c2w(np.eye(3), np.array([0.0, 0.0, 3.0]))
    rays = gen_rays(c2w, H, W, [f, f], 0.1, 10.0).reshape(-1, 8)
    P = turntable_rotation(17, 64)

    # production path: cull + compaction + Pallas kernels
    system, params = build_system(fused=True)
    r_prod = Renderer(system)
    assert r_prod._compaction_applicable() and system.rows_renderable()
    img_p, mask_p, depth_p = r_prod.render_frame(
        params, body_params, tmpl, rays, P, img_wh=(W, H))

    # reference-shape XLA path: no kernels, no cull, no compaction
    os.environ["ANIMNERF_WARP_FUSED"] = "0"
    system_x, params_x = build_system(fused=False)
    r_xla = Renderer(system_x)
    r_xla.cull_rays = False
    r_xla.compact_samples = False
    assert not r_xla._compaction_applicable()
    assert not system_x.rows_renderable()
    img_x, mask_x, depth_x = r_xla.render_frame(
        params_x, body_params, tmpl, rays, P, img_wh=(W, H))
    os.environ["ANIMNERF_WARP_FUSED"] = "1"

    d_rgb = np.abs(img_p - img_x)
    d_mask = np.abs(mask_p - mask_x)
    d_depth = np.abs(depth_p - depth_x)
    mse = float(np.mean((img_p - img_x) ** 2))
    stats = {
        "view": "scale512 ckpt, frame 1 optimised pose, turntable 17/64",
        "platform": jax.devices()[0].platform,
        "compute_dtype": "bfloat16",
        "max_abs_drgb": float(d_rgb.max()),
        "mean_abs_drgb": float(d_rgb.mean()),
        "psnr_between_paths": float(10.0 * np.log10(1.0 / max(mse, 1e-20))),
        "max_abs_dmask": float(d_mask.max()),
        "max_abs_ddepth": float(d_depth.max()),
        "frac_rgb_gt_1e-2": float((d_rgb > 1e-2).mean()),
    }
    out = os.path.join(REPO, "docs", "demo", "scale512",
                       "parity_onchip.json")
    with open(out, "w") as fh:
        json.dump(stats, fh, indent=1)
    print(json.dumps(stats, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
