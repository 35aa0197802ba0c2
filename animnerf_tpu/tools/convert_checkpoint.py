"""Convert reference (PyTorch-Lightning) checkpoints to this framework.

The reference stores one flat PL state_dict nesting `anim_nerf.*`,
`latent_codes.*`, `body_model_params.*` (+ evaluator/lpips weights,
SURVEY.md §5 checkpoint/resume). This converter reads the .ckpt torch-free
(utils/torch_pickle.py) and emits our checkpoint directory layout
(training/checkpoints.py): anim_nerf.npz / latent_codes.npz /
body_params.npz + meta.json (with the PL hparams as cfg).

Name mapping (torch Linear weight (out,in) -> flax kernel (in,out)):

    anim_nerf.nerf.xyz_encoding_{i}.0.weight  -> nerf/params/xyz_{i-1}/kernel
    anim_nerf.nerf.xyz_encoding_final.*       -> nerf/params/xyz_final/*
    anim_nerf.nerf.dir_encoding.0.*           -> nerf/params/dir_0/*
    anim_nerf.nerf.sigma.* / rgb.0.*          -> nerf/params/{sigma,rgb}/*
    anim_nerf.nerf_fine.*                     -> nerf_fine/...
    anim_nerf.derf.{xyz_encoding_{i}.0,out}.* -> derf/params/...
    latent_codes.weight                       -> latent_codes
    body_model_params.{p}.weight              -> body_params/{p}
    anim_nerf.body_model.* (SMPL buffers), evaluator.* -> dropped
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _map_mlp_key(rest: str):
    """'xyz_encoding_3.0.weight' -> ('xyz_2', 'kernel'), etc."""
    parts = rest.split(".")
    layer = parts[0]
    leaf = parts[-1]
    flax_leaf = {"weight": "kernel", "bias": "bias"}[leaf]
    if layer.startswith("xyz_encoding_"):
        suffix = layer[len("xyz_encoding_"):]
        if suffix == "final":
            return "xyz_final", flax_leaf
        return f"xyz_{int(suffix) - 1}", flax_leaf
    if layer == "dir_encoding":
        return "dir_0", flax_leaf
    if layer == "sigma":
        return "sigma", flax_leaf
    if layer == "rgb":
        return "rgb", flax_leaf
    if layer == "out":
        return "out", flax_leaf
    raise KeyError(layer)


def convert_state_dict(state_dict: dict) -> dict:
    """PL state_dict (name -> numpy) -> our params pytree."""
    nerf: dict = {}
    out: dict = {"anim_nerf": nerf}
    body: dict = {}

    for name, value in state_dict.items():
        v = np.asarray(value)
        if name.startswith("anim_nerf.body_model.") or name.startswith(
                "evaluator.") or ".lpips" in name:
            continue
        if name.startswith("anim_nerf."):
            rest = name[len("anim_nerf."):]
            module, _, tail = rest.partition(".")
            if module not in ("nerf", "nerf_fine", "derf"):
                continue
            try:
                layer, leaf = _map_mlp_key(tail)
            except KeyError:
                continue
            if leaf == "kernel":
                v = v.T  # torch (out,in) -> flax (in,out)
            nerf.setdefault(module, {"params": {}})["params"].setdefault(
                layer, {})[leaf] = v
        elif name == "latent_codes.weight":
            out["latent_codes"] = v
        elif name.startswith("body_model_params."):
            pname = name.split(".")[1]
            body[pname] = v
    if body:
        out["body_params"] = body
    return out


def convert(ckpt_path: str, out_dir: str) -> str:
    from animnerf_tpu.training.checkpoints import save_params
    from animnerf_tpu.utils.torch_pickle import load_torch_checkpoint

    raw = load_torch_checkpoint(ckpt_path)
    state_dict = raw.get("state_dict", raw)
    hparams = raw.get("hyper_parameters", {})

    params = convert_state_dict(state_dict)
    meta = {"source": ckpt_path}
    if isinstance(hparams, dict) and hparams:
        meta["cfg"] = {k: v for k, v in hparams.items()
                       if isinstance(v, (int, float, str, bool, list, tuple,
                                         dict, type(None)))}
    save_params(out_dir, params, meta)
    n = sum(np.asarray(v).size for g in params.values()
            for v in (g.values() if isinstance(g, dict) else [g])
            if not isinstance(v, dict)) if False else None
    print(f"converted {ckpt_path} -> {out_dir} "
          f"(groups: {sorted(params.keys())})")
    return out_dir


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", type=str, required=True,
                        help="reference PL .ckpt file")
    parser.add_argument("--out_dir", type=str, required=True)
    args = parser.parse_args(argv)
    convert(args.ckpt_path, args.out_dir)


if __name__ == "__main__":
    main()
