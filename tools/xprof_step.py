"""Op-level TPU profile of the flagship train step.

Captures a jax.profiler trace of a few steps and aggregates XLA op
durations from the xplane.pb (parsed with tensorflow's bundled
xplane_pb2 — no tensorboard plugin needed). Prints the top ops by total
device time with their HLO categories, which is the itemisation the
413 ms step's ~130 ms "long tail" needed (VERDICT r2 ask 1a).

Usage: python tools/xprof_step.py [out_dir]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir: str, n_steps: int = 6) -> None:
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import numpy as np

    from __graft_entry__ import _flagship_system, _rays
    from animnerf_tpu.models.body_params import init_body_params
    from animnerf_tpu.training.system import AnimNeRFSystem

    cfg, system, params_for, num_joints = _flagship_system(tiny=False)
    B, n_rays = 16, 1024
    cfg.compute_dtype = "bfloat16"
    cfg.remat = False
    system = AnimNeRFSystem(cfg, system.body_model)
    rng = jax.random.PRNGKey(0)
    body_params = init_body_params(cfg.num_frames, pose_dim=3 * (num_joints - 1))
    state = system.init_state(rng, body_params, steps_per_epoch=100)
    tx = system.make_optimizer(steps_per_epoch=100)
    # ANIMNERF_PROFILE_COMPACT=rows profiles the rows-compacted trainer
    if os.environ.get("ANIMNERF_PROFILE_COMPACT", "") == "rows":
        train_step = system.make_rows_compact_trainer(tx,
                                                      pipelined=True).step
    else:
        train_step = jax.jit(system.make_train_step(tx), donate_argnums=(0,))

    rng_np = np.random.default_rng(0)
    tmpl = {k: np.array(v) for k, v in params_for(2, B).items()}
    tmpl["transl"] = np.zeros_like(tmpl["transl"])
    base = {
        "frame_idx": np.arange(B, dtype=np.int32) % cfg.num_frames,
        "rays": _rays(B, n_rays),
        "rgbs": rng_np.uniform(size=(B, n_rays, 3)).astype(np.float32),
        "alphas": rng_np.uniform(size=(B, n_rays, 1)).astype(np.float32),
        "fg_points": rng_np.normal(scale=0.2, size=(B, 128, 3)).astype(np.float32),
        "bg_points": rng_np.normal(scale=0.8, size=(B, 128, 3)).astype(np.float32),
        **{k + "_template": v for k, v in tmpl.items()},
    }
    key = jax.random.PRNGKey(1)
    batches = []
    for s in range(n_steps + 2):
        b = dict(base)
        b["rays"] = _rays(B, n_rays, seed=s)
        batches.append(jax.device_put(b))

    for b in batches[:2]:  # compile + warm
        state, m = train_step(state, b, key)
    jax.block_until_ready(m["loss"])

    with jax.profiler.trace(out_dir):
        for b in batches[2:]:
            state, m = train_step(state, b, key)
        jax.block_until_ready(m["loss"])


def report(out_dir: str, top: int = 45) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {out_dir}")
    path = max(paths, key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        total = defaultdict(float)
        count = defaultdict(int)
        category = {}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" != line.name.strip():
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                name = md.name
                total[name] += ev.duration_ps / 1e9  # ms
                count[name] += 1
                for st in list(ev.stats) + list(md.stats):
                    sname = stat_meta[st.metadata_id].name
                    if sname in ("hlo_category", "category"):
                        category[name] = st.str_value or st.ref_value
        if not total:
            continue
        print(f"== plane: {plane.name} — {len(total)} distinct ops")
        grand = sum(total.values())
        print(f"total device op-time: {grand:.1f} ms (all traced steps)")
        rows = sorted(total.items(), key=lambda kv: -kv[1])
        print(f"{'ms':>9s} {'n':>4s}  {'category':18s} name")
        for name, ms in rows[:top]:
            cat = category.get(name, "")
            print(f"{ms:9.2f} {count[name]:4d}  {cat:18s} {name[:110]}")
        # category rollup
        by_cat = defaultdict(float)
        for name, ms in total.items():
            by_cat[category.get(name, "?")] += ms
        print("-- by category:")
        for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            print(f"{ms:9.2f}  {cat}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_step"
    if not glob.glob(os.path.join(out, "**", "*.xplane.pb"), recursive=True):
        capture(out)
    report(out)
