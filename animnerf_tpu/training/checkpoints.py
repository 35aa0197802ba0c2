"""Checkpointing: orbax-backed with the reference's three logical groups.

Re-design of /root/reference/utils/__init__.py:78-105 + PL ModelCheckpoint
(train.py:439-444): checkpoints expose the param groups 'anim_nerf',
'latent_codes', 'body_params' individually so refinement/transfer can load a
subset and freeze it (SURVEY.md §5 checkpoint/resume). Also keeps top-k by a
monitored metric and a 'last' pointer, like the reference's
ModelCheckpoint(monitor='train/psnr', mode='max', save_top_k, save_last).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_params(path: str, params: dict, metadata: Optional[dict] = None) -> None:
    """Write a checkpoint directory: one npz per top-level group + meta.json.

    Group-per-file makes partial loads (reference model_names_to_load,
    train.py:433-437) trivial and keeps files streamable.
    """
    os.makedirs(path, exist_ok=True)
    for group, sub in params.items():
        flat = _flatten(sub)
        np.savez(os.path.join(path, f"{group}.npz"), **flat)
    meta = dict(metadata or {})
    meta["groups"] = sorted(params.keys())
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, default=str)


def load_group(path: str, group: str, target: Any) -> Any:
    """Load one param group into the structure of `target`."""
    data = np.load(os.path.join(path, f"{group}.npz"))
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(target)
    new_leaves = []
    for p, leaf in leaves_with_path:
        key = "/".join(str(getattr(q, "key", getattr(q, "idx", q))) for q in p)
        if key in data.files:
            arr = data[key]
            if arr.shape != np.shape(leaf):
                raise ValueError(
                    f"{group}:{key} shape {arr.shape} != target {np.shape(leaf)}")
            new_leaves.append(jax.numpy.asarray(arr))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_params(path: str, target: dict,
                groups: Optional[list[str]] = None) -> dict:
    """Load all (or selected) groups; missing groups keep target values."""
    out = dict(target)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    for group in groups if groups is not None else meta["groups"]:
        if group in target and os.path.exists(os.path.join(path, f"{group}.npz")):
            out[group] = load_group(path, group, target[group])
    return out


def load_metadata(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


def save_train_state(path: str, state, metadata: Optional[dict] = None) -> None:
    """Full-state checkpoint: params groups + optimizer state + step
    (enables PL-style resume, reference train.py:460)."""
    meta = dict(metadata or {})
    meta["step"] = int(state.step)
    save_params(path, state.params, meta)
    np.savez(os.path.join(path, "opt_state.npz"), **_flatten(state.opt_state))


def load_train_state(path: str, target):
    """Restore a TrainState saved by save_train_state into `target`'s
    structure (params missing from disk keep target values)."""
    params = load_params(path, target.params)
    meta = load_metadata(path)
    opt_state = target.opt_state
    opt_file = os.path.join(path, "opt_state.npz")
    if os.path.exists(opt_file):
        data = np.load(opt_file)
        leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(
            target.opt_state)
        new_leaves = []
        for p, leaf in leaves_with_path:
            key = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                           for q in p)
            new_leaves.append(jax.numpy.asarray(data[key])
                              if key in data.files else leaf)
        opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    import jax.numpy as jnp

    return target.replace(params=params, opt_state=opt_state,
                          step=jnp.asarray(meta.get("step", 0), jnp.int32))


class CheckpointManager:
    """Top-k + last checkpoint retention keyed on a monitored metric."""

    def __init__(self, directory: str, monitor: str = "psnr",
                 mode: str = "max", save_top_k: int = 1,
                 save_last: bool = True):
        self.dir = directory
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.save_last = save_last
        self._best: list[tuple[float, str]] = []
        os.makedirs(directory, exist_ok=True)

    def _better(self, a: float, b: float) -> bool:
        return a > b if self.mode == "max" else a < b

    def save(self, params: dict, step: int, metrics: dict,
             extra_meta: Optional[dict] = None) -> Optional[str]:
        value = float(metrics.get(self.monitor, np.nan))
        meta = {"step": step, "metrics": {k: float(v) for k, v in metrics.items()}}
        meta.update(extra_meta or {})

        if self.save_last:
            save_params(os.path.join(self.dir, "last"), params, meta)

        if np.isnan(value):
            return None
        if len(self._best) < self.save_top_k or self._better(
                value, self._best[-1][0]):
            name = f"step{step:08d}"
            path = os.path.join(self.dir, name)
            save_params(path, params, meta)
            self._best.append((value, path))
            self._best.sort(key=lambda t: t[0], reverse=(self.mode == "max"))
            while len(self._best) > self.save_top_k:
                _, stale = self._best.pop()
                shutil.rmtree(stale, ignore_errors=True)
            return path
        return None

    @property
    def best_path(self) -> Optional[str]:
        return self._best[0][1] if self._best else None
