"""On-chip parity artifact for the rows-compacted TRAIN step.

The training twin of tools/parity_onchip.py (VERDICT r4 ask 4): the
rows-compacted trainer's exactness tests (tests/test_compact_rows.py) run
on the CPU interpret path, where bf16 accumulation order and the packed
kNN's key quantization never bite. This tool runs N train steps from
IDENTICAL state on the real TPU through both engines —

  dense:  the single-program dense rows step (make_train_step)
  rows:   RowsCompactTrainer (boxes pre-pass, perm-sort compaction,
          compacted merged fine MLP — the product/bench default)

— on the flagship workload (V=6890 SMPL topology, 16 x 1024 rays/step,
64 coarse + 96 fine-pass samples, six-term loss, Adam; reference workload
per BASELINE.md) with the production bf16 fast path, and records the
loss-trajectory delta and per-group parameter deltas after N steps to
docs/demo/scale512/train_parity_onchip.json.

Both engines share every RNG draw by construction (the compacted step
issues all draws on the same dense shapes in the same order —
render/compact_rows.py), so the residual measures exactly the numerical
cost of compaction on hardware: f32 reduction-order differences in the
compacted sums plus bf16 rounding of reordered MLP inputs.

Usage: python tools/parity_train_onchip.py [n_steps]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_steps: int = 10) -> dict:
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import numpy as np

    from __graft_entry__ import _flagship_system, _rays
    from animnerf_tpu.models.body_params import init_body_params
    from animnerf_tpu.training.system import AnimNeRFSystem

    cfg, system, params_for, num_joints = _flagship_system(tiny=False)
    B, n_rays = 16, 1024
    # the product defaults (config 'auto' resolution on TPU): bf16 fast
    # path, no remat at the reference ray count
    system = AnimNeRFSystem(cfg, system.body_model)
    assert system.scene_cfg.compute_dtype == "bfloat16", (
        "run on the TPU: this artifact measures the production fast path")

    rng = jax.random.PRNGKey(0)
    body_params = init_body_params(cfg.num_frames,
                                   pose_dim=3 * (num_joints - 1))
    state0 = system.init_state(rng, body_params, steps_per_epoch=100)
    tx = system.make_optimizer(steps_per_epoch=100)

    rng_np = np.random.default_rng(0)
    tmpl = {k: np.array(v) for k, v in params_for(2, B).items()}
    tmpl["transl"] = np.zeros_like(tmpl["transl"])
    base = {
        "frame_idx": np.arange(B, dtype=np.int32) % cfg.num_frames,
        "rgbs": rng_np.uniform(size=(B, n_rays, 3)).astype(np.float32),
        "alphas": rng_np.uniform(size=(B, n_rays, 1)).astype(np.float32),
        "fg_points": rng_np.normal(scale=0.2, size=(B, 128, 3)).astype(np.float32),
        "bg_points": rng_np.normal(scale=0.8, size=(B, 128, 3)).astype(np.float32),
        **{k + "_template": v for k, v in tmpl.items()},
    }
    batches = []
    for s in range(n_steps):
        b = dict(base)
        b["rays"] = _rays(B, n_rays, seed=s)
        batches.append(jax.device_put(b))
    key = jax.random.PRNGKey(1)

    def run(step_fn):
        st = jax.device_put(state0)
        losses, psnrs = [], []
        for b in batches:
            st, m = step_fn(st, b, key)
            losses.append(float(m["loss"]))
            psnrs.append(float(m["psnr"]))
        return jax.device_get(st), losses, psnrs

    def group_deltas(sa, sb):
        groups = {}
        for gname in sa.params:
            fa = jax.tree_util.tree_leaves(sa.params[gname])
            fb = jax.tree_util.tree_leaves(sb.params[gname])
            num = den = 0.0
            for a, b in zip(fa, fb):
                a = np.asarray(a, np.float64)
                b = np.asarray(b, np.float64)
                num += float(np.sum((a - b) ** 2))
                den += float(np.sum(a ** 2))
            groups[gname] = {
                "param_rel_l2": (num ** 0.5) / max(den ** 0.5, 1e-12)}
        return groups

    dense_step = jax.jit(system.make_train_step(tx))
    sd, ld, pd = run(dense_step)

    trainer = system.make_rows_compact_trainer(tx)  # strict: exact per step
    sc, lc, pc = run(trainer.step)

    dl = [abs(a - b) for a, b in zip(ld, lc)]
    rel = [d / max(abs(a), 1e-12) for d, a in zip(dl, ld)]
    groups = group_deltas(sd, sc)

    # SGD control: Adam's g/(sqrt(v)+eps) amplifies reduction-order noise
    # on near-zero grads to +-lr per step (the body-param group's grads are
    # tiny at init), so the Adam param deltas above bound Adam's noise
    # amplification, not the compaction error. A linear optimizer exposes
    # the raw trajectory difference.
    cfg_sgd = cfg.clone()
    cfg_sgd.train.optimizer.type = "sgd"
    sys_sgd = AnimNeRFSystem(cfg_sgd, system.body_model)
    tx_sgd = sys_sgd.make_optimizer(steps_per_epoch=100)

    def run_sgd(step_fn):
        st = jax.device_put(sys_sgd.init_state(rng, body_params,
                                               steps_per_epoch=100))
        losses = []
        for b in batches:
            st, m = step_fn(st, b, key)
            losses.append(float(m["loss"]))
        return jax.device_get(st), losses

    sd2, ld2 = run_sgd(jax.jit(sys_sgd.make_train_step(tx_sgd)))
    sc2, lc2 = run_sgd(sys_sgd.make_rows_compact_trainer(tx_sgd).step)
    groups_sgd = group_deltas(sd2, sc2)
    rel_sgd = [abs(a - b) / max(abs(a), 1e-12) for a, b in zip(ld2, lc2)]

    out = {
        "workload": f"{B}x{n_rays} rays, V=6890, 64c+96f samples, "
                    f"bf16 fast path, Adam, {n_steps} steps",
        "loss_dense": ld,
        "loss_rows_compact": lc,
        "max_abs_loss_delta": max(dl),
        "max_rel_loss_delta": max(rel),
        "final_psnr_dense": pd[-1],
        "final_psnr_rows_compact": pc[-1],
        "param_groups_after_n_steps": groups,
        "sgd_control": {
            "max_rel_loss_delta": max(rel_sgd),
            "param_groups_after_n_steps": groups_sgd,
        },
        "trainer_overflows": trainer.overflows,
        "trainer_cap": trainer._cap,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "demo", "scale512",
        "train_parity_onchip.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, list)}, indent=2))
    print(f"written: {path}")
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
