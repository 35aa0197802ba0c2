"""Secondary benchmark: 512x512 novel-view rendering FPS (BASELINE.md metric).

Flagship model (V=6890 synthetic SMPL, 64+96 samples/ray, coarse+fine 8x256
MLPs, bf16 fast path) on one chip; the reference renders the same frame as
128 sequential 2048-ray chunks through torch.

Prints one JSON line {"metric": "novel_view_512_fps", ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_system
    from animnerf_tpu.models.body_params import init_body_params
    from animnerf_tpu.render.inference import Renderer, turntable_rotation
    from animnerf_tpu.training.system import AnimNeRFSystem

    cfg, system, params_for, num_joints = _flagship_system(tiny=False)
    cfg.compute_dtype = "bfloat16"
    cfg.remat = False
    system = AnimNeRFSystem(cfg, system.body_model)

    # Prefer the committed TRAINED scale512 checkpoint (docs/demo/scale512):
    # an untrained field has chaotic fine-sample depths, which inflates the
    # fine survivor capacity ~3x over the trained steady state — the metric
    # is "novel-view fps of a trained model", so bench that when available.
    import os

    demo = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "demo", "scale512", "ckpt")
    if os.path.isdir(demo):
        from animnerf_tpu.data.synthetic import make_body_model
        from animnerf_tpu.training.checkpoints import load_params
        from animnerf_tpu.utils.io import load_pickle_file as load_pickle

        body_model = make_body_model(num_verts=6890, num_joints=24, seed=3)
        system = AnimNeRFSystem(cfg, body_model)
        params = system.init_params(
            jax.random.PRNGKey(0),
            init_body_params(4, pose_dim=3 * (num_joints - 1)))
        params = load_params(demo, params, ["anim_nerf", "body_params"])
        frame = load_pickle(os.path.join(demo, "smpl_000001.pkl"))
        body_params = {k: jnp.asarray(np.asarray(v, np.float32)).reshape(1, -1)
                       for k, v in frame.items()
                       if k in ("betas", "global_orient", "body_pose",
                                "transl")}
        t = load_pickle(os.path.join(demo, "smpl_template.pkl"))
        tmpl = {k: jnp.asarray(np.asarray(t[k], np.float32)).reshape(1, -1)
                for k in ("betas", "global_orient", "body_pose", "transl")}
    else:
        params = system.init_params(
            jax.random.PRNGKey(0),
            init_body_params(cfg.num_frames, pose_dim=3 * (num_joints - 1)))
        body_params = params_for(1, 1)
        tmpl = params_for(2, 1)
        tmpl = dict(tmpl, transl=jnp.zeros_like(tmpl["transl"]))

    H = W = 512
    f = 1.2 * W
    from animnerf_tpu.ops.ray_utils import camera_to_c2w, gen_rays

    c2w = camera_to_c2w(np.eye(3), np.array([0.0, 0.0, 3.0]))
    rays = gen_rays(c2w, H, W, [f, f], 0.1, 10.0).reshape(-1, 8)

    renderer = Renderer(system)
    # Warm the EXACT timed angles once (compiles the compaction capacity
    # rungs those views need; a 64-view turntable pays this once and the
    # persistent compilation cache removes it for later processes), then
    # time a second pass over the same trajectory — the steady-state
    # per-view cost. The timed pass jitters the body translation by 1e-5
    # (visually nil) because the runtime dedups repeated executions with
    # bit-identical inputs.
    angles = (3, 17, 29, 41, 55)

    def frames_of(sign, rep):
        return [dict(body_params=dict(
                        body_params,
                        transl=body_params["transl"]
                        + sign * 1e-5 * (k + 1) * rep),
                     body_tmpl=tmpl, rays=rays,
                     P=turntable_rotation(i, 64), img_wh=(W, H))
                for k, i in enumerate(angles)]

    # Two warm passes: compile the capacity rungs these views need, let
    # the stream's observed-count shrink settle the caps, then time the
    # steady state (the pipelined turntable path all CLIs use).
    for rep in (1, 2):
        for _ in renderer.render_stream(params, frames_of(-1, rep)):
            pass

    n_views = len(angles)
    t0 = time.perf_counter()
    for img, _, _ in renderer.render_stream(params, frames_of(+1, 1)):
        pass
    dt = time.perf_counter() - t0

    fps = n_views / dt
    print(json.dumps({
        "metric": "novel_view_512_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
