"""Benchmark: training-step ray throughput on the flagship model.

Measures rays/sec of the full Anim-NeRF training step (SMPL forward x2,
root-frame rebase, kNN warp against 6,890 verts, coarse 64 + fine 96 sample
MLP evaluation, compositing, six-term loss incl. 2nd-order normal
smoothness, backward, Adam update) on one chip — the same per-step workload
as the reference's male-3-casual config (16 x 32^2 = 16,384 rays/step,
BASELINE.md).

Baseline denominator: the reference publishes no numbers (BASELINE.md);
PyTorch Anim-NeRF trains 30 epochs x 1,824 steps in roughly a day on one
consumer GPU => ~5.5 s/step ~= 3,000 rays/s. We use a deliberately generous
10,000 rays/s estimate for vs_baseline so the ratio understates, not
overstates, the speedup.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 10_000.0


def main() -> None:
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    from __graft_entry__ import _flagship_system, _rays
    from animnerf_tpu.models.body_params import init_body_params

    import os

    cfg, system, params_for, num_joints = _flagship_system(tiny=False)
    B = int(os.environ.get("ANIMNERF_BENCH_B", "16"))
    n_rays = int(os.environ.get("ANIMNERF_BENCH_RAYS", "1024"))
    # default 16 x 1024 = 16,384 rays/step — the reference workload.
    # compute_dtype/remat default to 'auto' (config.py): on TPU that is
    # the bf16 MLP fast path, remat only above the reference ray count —
    # the same resolution the product training path (loop.py::fit) uses.
    # The auto-remat heuristic reads the configured step ray count, so
    # mirror the bench workload into the config fields it reads.
    cfg.train.batch_size = B
    ss = max(int(round(n_rays ** 0.5)), 1)
    if ss * ss == n_rays:
        cfg.train.subsamplesize = ss
    else:  # non-square env override: pin remat from the true count
        cfg.remat = B * n_rays > 16384
    from animnerf_tpu.training.system import AnimNeRFSystem

    system = AnimNeRFSystem(cfg, system.body_model)
    rng = jax.random.PRNGKey(0)
    body_params = init_body_params(cfg.num_frames, pose_dim=3 * (num_joints - 1))
    state = system.init_state(rng, body_params, steps_per_epoch=100)
    tx = system.make_optimizer(steps_per_epoch=100)
    # Default engine = the fastest EXACT trainer the config supports — the
    # same selection fit() makes (training/system.py::make_best_trainer):
    # the rows-native compacted trainer (boxes pre-pass before the kNN +
    # merged compacted fine MLP on the fused kernel pipeline, loss/grad/
    # SGD-trajectory equal to dense — tests/test_compact_rows.py; 84.0k
    # vs 66.9k rays/s dense measured on-chip, PERF.md round 4).
    # ANIMNERF_BENCH_COMPACT overrides: "0"/"dense" forces the dense
    # single-program step, "1" the point-major compacted trainer (wins
    # only in genuinely sparse regimes — kept for parity with its tests),
    # "rows" forces the rows engine.
    mode = os.environ.get("ANIMNERF_BENCH_COMPACT", "auto")
    if mode == "auto":
        mode = "rows" if system.rows_compaction_applicable() else "dense"
    if mode == "rows":
        train_step = system.make_rows_compact_trainer(tx, pipelined=True).step
    elif mode == "1":
        train_step = system.make_compact_trainer(tx, pipelined=True).step
    else:
        train_step = jax.jit(system.make_train_step(tx), donate_argnums=(0,))

    rng_np = np.random.default_rng(0)
    tmpl = {k: np.array(v) for k, v in params_for(2, B).items()}
    tmpl["transl"] = np.zeros_like(tmpl["transl"])
    batch = {
        "frame_idx": np.arange(B, dtype=np.int32) % cfg.num_frames,
        "rays": _rays(B, n_rays),
        "rgbs": rng_np.uniform(size=(B, n_rays, 3)).astype(np.float32),
        "alphas": rng_np.uniform(size=(B, n_rays, 1)).astype(np.float32),
        "fg_points": rng_np.normal(scale=0.2, size=(B, 128, 3)).astype(np.float32),
        "bg_points": rng_np.normal(scale=0.8, size=(B, 128, 3)).astype(np.float32),
        **{k + "_template": v for k, v in tmpl.items()},
    }
    key = jax.random.PRNGKey(1)

    # distinct ray batches per timed step: the runtime dedups repeated
    # executions with identical inputs, which would fake the timing
    n_steps = 20
    batches = []
    for s in range(n_steps + 1):
        b = dict(batch)
        b["rays"] = _rays(B, n_rays, seed=s)
        batches.append(jax.device_put(b))

    # compile + warmup: one pass over every batch so the compaction
    # ladder's capacity rungs are all compiled before timing
    for b in batches:
        state, metrics = train_step(state, b, key)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for s in range(n_steps):
        state, metrics = train_step(state, batches[s], key)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = B * n_rays * n_steps / dt
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
