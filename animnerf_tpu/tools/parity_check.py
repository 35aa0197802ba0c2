"""One-command real-data parity dress rehearsal.

Takes the three real assets a user of the reference repo has on disk —
a prepared People-Snapshot data dir, the SMPL model pkl, and a trained
reference PyTorch-Lightning .ckpt — converts the checkpoint torch-free,
runs this framework's test.py-equivalent evaluation on the test split,
and prints the PSNR/SSIM(/LPIPS) means plus the delta against the
reference's own printed numbers (reference test.py:91-93), so real-asset
parity (BASELINE.md: within 0.1 dB) is a single command the day the
assets are available:

    python -m animnerf_tpu.tools.parity_check \
        --data_dir data/male-3-casual \
        --smpl_pkl smplx/models/smpl/SMPL_MALE.pkl \
        --ckpt checkpoints/male-3-casual/last.ckpt \
        --cfg_file configs/people_snapshot/male-3-casual.yaml \
        --ref_psnr 29.47

Everything in the chain is exercised end-to-end on fabricated assets by
tests/test_parity_check.py (synthetic People-Snapshot dir + byte-accurate
PL zip), so only the asset paths change on the real-data day.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile


def run_parity_check(data_dir: str, smpl_pkl: str, ckpt: str,
                     cfg_file: str | None = None, opts: list | None = None,
                     ref_psnr: float | None = None, ref_ssim: float | None = None,
                     ref_lpips: float | None = None, split: str = "test",
                     out_dir: str | None = None, vis: bool = False) -> dict:
    """Convert -> evaluate -> report. Returns the metrics dict (with
    `psnr_delta` etc. when reference numbers are given)."""
    from animnerf_tpu.cli.common import resolve_cfg
    from animnerf_tpu.tools.convert_checkpoint import convert
    from animnerf_tpu.training.loop import evaluate

    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="animnerf_parity_")
    conv_dir = ckpt
    if not os.path.isdir(ckpt):  # a PL .ckpt file: convert it first
        conv_dir = os.path.join(out_dir, "converted_ckpt")
        convert(ckpt, conv_dir)

    # cfg priority mirrors the reference's load_from_checkpoint: hparams
    # frozen into the ckpt, then the YAML, then CLI opts — with the asset
    # paths from the command line winning over whatever machine the
    # reference run happened on.
    cfg = resolve_cfg(conv_dir, cfg_file, list(opts or []) + [
        "root_dir", data_dir,
        "model_path", _model_root(smpl_pkl),
        "outputs_dir", out_dir,
    ])

    means = evaluate(cfg, conv_dir, split=split, save_vis=vis,
                     out_dir=os.path.join(out_dir, "vis"))
    report = {k: float(v) for k, v in means.items()}
    for name, ref in (("psnr", ref_psnr), ("ssim", ref_ssim),
                      ("lpips", ref_lpips)):
        if ref is not None and name in report:
            report[f"{name}_ref"] = float(ref)
            report[f"{name}_delta"] = report[name] - float(ref)
    if "psnr_delta" in report:
        report["psnr_within_0.1dB"] = bool(abs(report["psnr_delta"]) <= 0.1)
    return report


def _model_root(smpl_pkl: str) -> str:
    """smplx-style model root from a concrete pkl path: the loader accepts
    either the pkl itself or the smplx `models/` root — pass through a pkl,
    walk up from `.../smpl/SMPL_X.pkl` to `models/` otherwise."""
    if os.path.isdir(smpl_pkl):
        return smpl_pkl
    parent = os.path.dirname(os.path.abspath(smpl_pkl))
    if os.path.basename(parent) in ("smpl", "smplh", "smplx", "mano", "flame"):
        return os.path.dirname(parent)
    return smpl_pkl


def main(argv=None) -> None:
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data_dir", required=True,
                   help="prepared People-Snapshot dir (cam000/, smpls/, ...)")
    p.add_argument("--smpl_pkl", required=True,
                   help="SMPL model pkl (or smplx models/ root)")
    p.add_argument("--ckpt", required=True,
                   help="reference PL .ckpt (converted automatically) or an "
                        "already-converted checkpoint dir")
    p.add_argument("--cfg_file", default=None)
    p.add_argument("--split", default="test")
    p.add_argument("--ref_psnr", type=float, default=None,
                   help="the reference test.py's printed mean PSNR")
    p.add_argument("--ref_ssim", type=float, default=None)
    p.add_argument("--ref_lpips", type=float, default=None)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--vis", action="store_true")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = p.parse_args(argv)

    report = run_parity_check(
        args.data_dir, args.smpl_pkl, args.ckpt, cfg_file=args.cfg_file,
        opts=args.opts, ref_psnr=args.ref_psnr, ref_ssim=args.ref_ssim,
        ref_lpips=args.ref_lpips, split=args.split, out_dir=args.out_dir,
        vis=args.vis)
    print(json.dumps(report, indent=2, sort_keys=True))
    if "psnr_delta" in report:
        verdict = "PASS" if report["psnr_within_0.1dB"] else "FAIL"
        print(f"PSNR delta vs reference: {report['psnr_delta']:+.3f} dB "
              f"[{verdict} at 0.1 dB]")


if __name__ == "__main__":
    main()
