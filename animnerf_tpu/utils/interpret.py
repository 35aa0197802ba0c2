"""Force the TPU-gated rows kernel pipeline on CPU (Pallas interpret mode).

The rows-native pipeline (packed kNN, fused warp-blend, fused MLP, lane
shuffle — the production TPU path) only dispatches on real TPU backends
(utils/platform.py). This context makes it runnable on CPU for validation:
every Pallas kernel call is redirected to its interpret mode and the fused
warp gate reports enabled. Used by the multi-chip dry run
(__graft_entry__.dryrun_multichip) and the CPU test suite
(tests/test_rows_pipeline.py); NEVER used on the hot path.

Note: the fused-MLP gate (AnimNeRFModel.use_fused_mlp) is config-driven —
set ``cfg.fused_mlp = "on"`` (or poke the cached property) alongside this
context to take the rows path end to end.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def rows_interpret_forced():
    import animnerf_tpu.models.warp as MW
    import animnerf_tpu.ops.fused_mlp as FM
    import animnerf_tpu.ops.knn_pallas as KP
    import animnerf_tpu.ops.sort_lanes as SL
    import animnerf_tpu.ops.warp_blend as WB

    saved = (KP.knn_pallas, WB.warp_blend_fwd_pallas, FM.fused_nerf_fwd,
             FM.fused_nerf_bwd, SL._permute_impl, MW._fused_warp_enabled)

    knn0, wb0, ff0, fb0, pl0 = saved[:5]
    KP.knn_pallas = lambda *a, **k: knn0(*a, **{**k, "interpret": True})
    WB.warp_blend_fwd_pallas = lambda *a, **k: wb0(
        *a, **{**k, "interpret": True})
    FM.fused_nerf_fwd = lambda *a, **k: ff0(*a, **{**k, "interpret": True})
    FM.fused_nerf_bwd = lambda *a, **k: fb0(*a, **{**k, "interpret": True})
    SL._permute_impl = lambda p, o, interpret=False: SL._permute_lanes_pallas(
        p, o, interpret=True)
    MW._fused_warp_enabled = lambda: True
    try:
        yield
    finally:
        (KP.knn_pallas, WB.warp_blend_fwd_pallas, FM.fused_nerf_fwd,
         FM.fused_nerf_bwd, SL._permute_impl, MW._fused_warp_enabled) = saved
