"""In-process CLI regression tests on a tiny synthetic dataset (CPU)."""

import os
import pickle

import numpy as np
import pytest

from animnerf_tpu.config import finalize, get_default_config
from animnerf_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train 3 tiny steps through the real fit() and return (cfg, ckpt)."""
    from animnerf_tpu.training.loop import fit

    tmp = tmp_path_factory.mktemp("cli")
    root = str(tmp / "data")
    write_synthetic_dataset(root, num_frames=2, img_wh=(20, 20),
                            num_verts=160, num_joints=8, seed=5)
    cfg = get_default_config()
    cfg.root_dir = root
    cfg.model_path = os.path.join(root, "models")
    cfg.gender = "neutral"
    cfg.exp_name = "cli-tiny"
    cfg.img_wh = (20, 20)
    cfg.n_samples = 6
    cfg.n_importance = 3
    cfg.pose_dim = 21
    cfg.checkpoints_dir = str(tmp / "ckpts")
    cfg.logs_dir = str(tmp / "logs")
    cfg.outputs_dir = str(tmp / "out")
    for split, (s, e) in (("train", (1, 2)), ("val", (1, 1)), ("test", (2, 2))):
        cfg[split].frame_start_ID = s
        cfg[split].frame_end_ID = e
        cfg[split].frame_skip = 1
        cfg[split].cam_IDs = [0]
    cfg.train.batch_size = 2
    cfg.train.subsamplesize = 5
    cfg.train.max_epochs = 1
    cfg.train.max_steps = 3
    cfg.train.log_every = 1
    cfg = finalize(cfg)
    ckpt_dir = fit(cfg)
    return cfg, os.path.join(ckpt_dir, "last"), str(tmp)


def _write_cfg_yaml(cfg, path):
    import yaml

    def plain(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = plain(v)
            elif isinstance(v, tuple):
                out[k] = list(v)
            else:
                out[k] = v
        return out

    with open(path, "w") as f:
        yaml.safe_dump(plain(cfg), f)


def test_cli_novel_view(trained):
    cfg, ckpt, tmp = trained
    from animnerf_tpu.cli.novel_view import main

    main(["--ckpt_path", ckpt, "--n_views", "2", "--betas_2th", "0.3",
          "--frame_id", "1"])
    out = os.path.join(cfg.outputs_dir, cfg.exp_name,
                       "novel_view_1_optim_pose_0")
    assert os.path.exists(os.path.join(out, "novel_view.gif"))
    assert os.path.exists(os.path.join(out, "images", "000001.png"))


@pytest.mark.slow
def test_cli_novel_view_template(trained):
    cfg, ckpt, tmp = trained
    from animnerf_tpu.cli.novel_view import main

    main(["--ckpt_path", ckpt, "--n_views", "1", "--template"])
    out = os.path.join(cfg.outputs_dir, cfg.exp_name,
                       "novel_view_T_optim_pose_0")
    assert os.path.exists(os.path.join(out, "novel_view.gif"))


def test_cli_extract_mesh(trained):
    cfg, ckpt, tmp = trained
    from animnerf_tpu.cli.extract_mesh import main

    main(["--ckpt_path", ckpt, "--N_grid", "24", "--sigma_threshold", "2"])
    out = os.path.join(cfg.outputs_dir, cfg.exp_name, "mesh_1_optim_pose")
    assert os.path.exists(os.path.join(out, "mesh.obj"))
    assert os.path.exists(os.path.join(out, "smpl.obj"))


@pytest.mark.slow
def test_cli_novel_pose(trained):
    cfg, ckpt, tmp = trained
    from animnerf_tpu.cli.novel_pose import main

    actions = os.path.join(tmp, "mocap")
    os.makedirs(os.path.join(actions, "0007"), exist_ok=True)
    rng = np.random.default_rng(0)
    F = 2
    with open(os.path.join(actions, "0007", "result.pkl"), "wb") as f:
        pickle.dump({
            "anim_len": F,
            "smpl_array": rng.normal(scale=0.1, size=(F, 72)).astype(np.float32),
            "cam_array": rng.normal(scale=0.1, size=(F, 4)).astype(np.float32),
        }, f)

    main(["--ckpt_path", ckpt, "--actions_dir", actions,
          "--action_type", "0007", "--frame_skip", "1"])
    out = os.path.join(cfg.outputs_dir, cfg.exp_name, "novel_pose_0007")
    assert os.path.exists(os.path.join(out, "novel_pose.gif"))
    assert os.path.exists(os.path.join(out, "smpls_vis", "000000.png"))


def test_cli_test_split(trained):
    cfg, ckpt, tmp = trained
    from animnerf_tpu.training.loop import evaluate

    means = evaluate(cfg, ckpt, split="test", save_vis=True,
                     out_dir=os.path.join(cfg.outputs_dir, "vis"))
    assert np.isfinite(means["psnr"]) and np.isfinite(means["ssim"])
    assert os.path.exists(os.path.join(cfg.outputs_dir, "vis", "000002.png"))

def test_ray_cull_exactness(trained):
    """Ray-level background culling must not change rendered outputs."""
    import numpy as np

    from animnerf_tpu.cli.common import (
        load_cam_and_rays,
        load_frame_params,
        load_system_and_params,
    )
    from animnerf_tpu.cli.common import resolve_cfg
    from animnerf_tpu.render.inference import Renderer

    cfg, ckpt, tmp = trained
    system, params = load_system_and_params(cfg, ckpt)
    _, body_params, template = load_frame_params(cfg, 1)
    cam, rays = load_cam_and_rays(cfg, 0)
    W, H = cfg.img_wh

    r = Renderer(system)
    r.max_rays_per_call = 64  # force the slab+cull path on the tiny frame
    r.compact_samples = False  # isolate culling (compaction tested below)
    r.cull_rays = True
    img_c, mask_c, depth_c = r.render_frame(params, body_params, template,
                                            rays, img_wh=(W, H))
    r.cull_rays = False
    img_n, mask_n, depth_n = r.render_frame(params, body_params, template,
                                            rays, img_wh=(W, H))
    np.testing.assert_allclose(img_c, img_n, atol=1e-5)
    np.testing.assert_allclose(mask_c, mask_n, atol=1e-5)
    np.testing.assert_allclose(depth_c, depth_n, atol=1e-4)


def test_sample_compaction_exactness(trained):
    """Sample-level compaction (min-dist pre-pass + fixed-capacity gather +
    scatter-back) must not change rendered outputs: skipped samples have
    sigma == -1e5 either way and their rgb never carries composite weight."""
    import numpy as np

    from animnerf_tpu.cli.common import (
        load_cam_and_rays,
        load_frame_params,
        load_system_and_params,
    )
    from animnerf_tpu.render.inference import Renderer

    cfg, ckpt, tmp = trained
    system, params = load_system_and_params(cfg, ckpt)
    _, body_params, template = load_frame_params(cfg, 1)
    cam, rays = load_cam_and_rays(cfg, 0)
    W, H = cfg.img_wh

    r = Renderer(system)
    r.cull_rays = False
    r.compact_quantum = 32  # tiny frame: exercise the padding ladder
    r.compact_samples = True
    assert r._compaction_applicable()
    img_c, mask_c, depth_c = r.render_frame(params, body_params, template,
                                            rays, img_wh=(W, H))
    r.compact_samples = False
    img_n, mask_n, depth_n = r.render_frame(params, body_params, template,
                                            rays, img_wh=(W, H))
    np.testing.assert_allclose(img_c, img_n, atol=1e-5)
    np.testing.assert_allclose(mask_c, mask_n, atol=1e-5)
    np.testing.assert_allclose(depth_c, depth_n, atol=1e-4)

def test_render_stream_matches_render_frame(trained):
    """The pipelined multi-view stream must produce exactly what the
    per-frame path produces (same programs, different dispatch order) and
    its observed-count capacity shrink must stay exact."""
    import numpy as np

    from animnerf_tpu.cli.common import (
        load_cam_and_rays,
        load_frame_params,
        load_system_and_params,
    )
    from animnerf_tpu.render.inference import Renderer, turntable_rotation

    cfg, ckpt, tmp = trained
    system, params = load_system_and_params(cfg, ckpt)
    _, body_params, template = load_frame_params(cfg, 1)
    cam, rays = load_cam_and_rays(cfg, 0)
    W, H = cfg.img_wh

    r = Renderer(system)
    # 3 views: enough to exercise pipelined dispatch (view i+1 in flight
    # while i drains) AND the observed-count capacity shrink across views
    Ps = [turntable_rotation(i, 3) for i in range(3)]
    frames = [dict(body_params=body_params, body_tmpl=template, rays=rays,
                   P=P, img_wh=(W, H)) for P in Ps]
    streamed = list(r.render_stream(params, frames))
    assert len(streamed) == 3

    r2 = Renderer(system)
    for (img_s, mask_s, depth_s), P in zip(streamed, Ps):
        img_f, mask_f, depth_f = r2.render_frame(
            params, body_params, template, rays, P, img_wh=(W, H))
        np.testing.assert_allclose(img_s, img_f, atol=1e-5)
        np.testing.assert_allclose(mask_s, mask_f, atol=1e-5)
        np.testing.assert_allclose(depth_s, depth_f, atol=1e-4)

def test_maybe_hit_is_conservative(trained):
    """The segment-vs-inflated-AABB test must cover EVERY ray that has any
    coarse sample within dis_threshold of a vertex (the exactness of the
    background cull rests on this)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from animnerf_tpu.cli.common import (
        load_cam_and_rays,
        load_frame_params,
        load_system_and_params,
    )
    from animnerf_tpu.models.warp import prepare_frame, rays_to_root_frame
    from animnerf_tpu.render.inference import Renderer, turntable_rotation
    from animnerf_tpu.render.volume_renderer import sample_coarse

    cfg, ckpt, tmp = trained
    system, params = load_system_and_params(cfg, ckpt)
    _, body_params, template = load_frame_params(cfg, 1)
    cam, rays = load_cam_and_rays(cfg, 0)

    r = Renderer(system)
    for vi in (0, 2):
        P = turntable_rotation(vi, 5)
        maybe, fars = jax.device_get(r._maybe_hit(
            body_params, template, jnp.asarray(rays)[None], jnp.asarray(P)))
        maybe = np.asarray(maybe[0])

        # ground truth: any coarse sample within thr of any vertex
        ctx = prepare_frame(system.body_model, body_params, template)
        rr = rays_to_root_frame(ctx, jnp.asarray(rays)[None])
        o = jnp.einsum("ij,brj->bri", jnp.asarray(P)[:3, :3],
                       rr[..., 0:3]) + jnp.asarray(P)[:3, 3]
        d = jnp.einsum("ij,brj->bri", jnp.asarray(P)[:3, :3], rr[..., 3:6])
        rr = jnp.concatenate([o, d, rr[..., 6:8]], axis=-1)
        z = sample_coarse(system.renderer_cfg, rr, 0.0, None)
        pts = rr[..., None, 0:3] + z[..., None] * rr[..., None, 3:6]
        d2 = jnp.sum((pts[0, :, :, None] - ctx.verts[0][None, None]) ** 2,
                     axis=-1)
        true_hit = np.asarray(
            jnp.any(jnp.sqrt(d2.min(axis=-1))
                    < system.scene_cfg.dis_threshold, axis=-1))
        missed = true_hit & ~maybe
        assert not missed.any(), f"view {vi}: cull missed {missed.sum()} rays"


@pytest.mark.slow
def test_render_stream_overflow_after_shared_cap_raise(trained):
    """Regression: a view is dispatched BEFORE the previous view's finalize
    can ratchet the shared per-R caps. When both views overflow the primed
    caps, the second view's overflow check must compare against the caps it
    was DISPATCHED with (they ride the pending queue) — checking the
    current shared caps, already raised by view 1's ratchet, would mask the
    overflow and silently yield the truncated render."""
    import numpy as np

    from animnerf_tpu.cli.common import (
        load_cam_and_rays,
        load_frame_params,
        load_system_and_params,
    )
    from animnerf_tpu.render.inference import Renderer, turntable_rotation

    cfg, ckpt, tmp = trained
    system, params = load_system_and_params(cfg, ckpt)
    _, body_params, template = load_frame_params(cfg, 1)
    cam, rays = load_cam_and_rays(cfg, 0)
    W, H = cfg.img_wh

    Ps = [turntable_rotation(i, 5) for i in (0, 1, 2)]
    frames = [dict(body_params=body_params, body_tmpl=template, rays=rays,
                   P=P, img_wh=(W, H)) for P in Ps]

    # discover the stream's padded ray count R and true survivor counts
    r0 = Renderer(system)
    assert r0._compaction_applicable() and r0.cull_rays
    ref = list(r0.render_stream(params, frames))
    assert len(ref) == 3 and len(r0._caps) == 1
    [(R, _)] = r0._caps.items()

    # fresh renderer primed BELOW the true counts: every view overflows at
    # dispatch; view 1 is already in flight when view 0's finalize ratchets
    r1 = Renderer(system)
    r1._caps[R] = (1, 1)
    got = list(r1.render_stream(params, frames))
    assert len(got) == 3
    for (gi, gm, gd), (ri, rm, rd) in zip(got, ref):
        np.testing.assert_allclose(gi, ri, atol=1e-5)
        np.testing.assert_allclose(gm, rm, atol=1e-5)
        np.testing.assert_allclose(gd, rd, atol=1e-4)
