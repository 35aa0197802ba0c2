"""Training CLI (parity: reference train.py:426-461).

    python train.py --cfg_file configs/people_snapshot/male-3-casual.yaml \\
        [key value ...]

Refinement mode works exactly like the reference's *_refine.yaml flow:
set train.ckpt_path + train.model_names_to_load ['anim_nerf'] and the field
loads frozen while per-frame body params optimise on the new frames.
"""

from __future__ import annotations


def main(argv=None) -> None:
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import os

    from animnerf_tpu.config import get_cfg
    from animnerf_tpu.training.loop import evaluate, fit

    cfg = get_cfg(argv)

    # multi-host pods (DCN): same sharded program, initialised per host
    # (SURVEY.md §2.8 — replaces PL's ddp/NCCL wiring)
    if os.environ.get("ANIMNERF_MULTIHOST"):
        import jax

        jax.distributed.initialize()
    print(f"[animnerf_tpu] training {cfg.exp_name} "
          f"({cfg.num_frames} frames @ {tuple(cfg.img_wh)})", flush=True)
    profile = bool(os.environ.get("ANIMNERF_PROFILE"))
    ckpt_dir = fit(cfg, profile=profile)
    print(f"[animnerf_tpu] done; checkpoints in {ckpt_dir}", flush=True)

    # post-fit test pass, like reference trainer.test (train.py:461)
    last = os.path.join(ckpt_dir, "last")
    if os.path.exists(last):
        evaluate(cfg, last, split="test")


if __name__ == "__main__":
    main()
