"""Chumpy-free loading of SMPL-family model pickle files.

The official SMPL ``.pkl`` files embed ``chumpy`` arrays and scipy sparse
matrices (reference handles these via smplx/utils.py:118-121 with chumpy
installed). We unpickle them without chumpy by substituting a stub class and
pulling the wrapped numpy array out of the pickled ``__dict__``.
"""

from __future__ import annotations

import io
import os
import pickle
from typing import Any

import numpy as np


class _ChumpyStub:
    """Stand-in for chumpy.Ch — pickled state lands in __dict__."""

    def __init__(self, *args, **kwargs):
        pass


class _ForgivingUnpickler(pickle.Unpickler):
    _STUBBED_MODULES = ("chumpy",)

    def find_class(self, module: str, name: str):
        if any(module == m or module.startswith(m + ".") for m in self._STUBBED_MODULES):
            return _ChumpyStub
        return super().find_class(module, name)


def _unwrap(value: Any) -> Any:
    """Convert chumpy stubs / scipy sparse / lists to plain numpy."""
    if isinstance(value, _ChumpyStub):
        # chumpy.Ch stores its backing array under 'x' in __dict__
        inner = value.__dict__.get("x")
        if inner is None:
            for v in value.__dict__.values():
                if isinstance(v, np.ndarray):
                    inner = v
                    break
        return _unwrap(inner)
    if hasattr(value, "todense"):  # scipy sparse
        return np.asarray(value.todense())
    if isinstance(value, np.ndarray):
        if value.dtype == object:
            return np.asarray([_unwrap(v) for v in value])
        return value
    return value


def load_pickle(path: str, latin1: bool = True) -> dict:
    """Unpickle a (possibly chumpy-bearing) pkl into plain numpy types."""
    with open(path, "rb") as f:
        data = f.read()
    up = _ForgivingUnpickler(io.BytesIO(data), encoding="latin1" if latin1 else "ASCII")
    raw = up.load()
    if isinstance(raw, dict):
        return {k: _unwrap(v) for k, v in raw.items()}
    return raw


def resolve_model_file(model_path: str, model_type: str, gender: str) -> str:
    """Reference layout: {model_path}/{MODEL_TYPE}_{GENDER}.pkl or
    {model_path}/{model_type}/{MODEL_TYPE}_{GENDER}.pkl, or a direct file."""
    if os.path.isfile(model_path):
        return model_path
    fname = f"{model_type.upper()}_{gender.upper()}.pkl"
    for cand in (
        os.path.join(model_path, fname),
        os.path.join(model_path, model_type, fname),
    ):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"No {model_type}/{gender} model file under {model_path!r} (tried {fname})"
    )


def load_model_data(model_path: str, model_type: str = "smpl",
                    gender: str = "neutral", num_betas: int = 10) -> dict:
    """Load an SMPL-family pkl into a dict of float32/int32 numpy arrays.

    Returns keys: v_template (V,3), shapedirs (V,3,num_betas),
    posedirs (9*(J-1), V*3), J_regressor (J,V), parents (J,),
    lbs_weights (V,J), faces (F,3).
    """
    path = resolve_model_file(model_path, model_type, gender)
    raw = load_pickle(path)

    v_template = np.asarray(raw["v_template"], dtype=np.float32)
    shapedirs = np.asarray(raw["shapedirs"], dtype=np.float32)
    num_betas = min(num_betas, shapedirs.shape[-1])
    shapedirs = shapedirs[:, :, :num_betas]

    posedirs = np.asarray(raw["posedirs"], dtype=np.float32)
    # (V, 3, P) on disk -> (P, V*3) for a single matmul (reference
    # body_models.py:239-243 does the same reshape/transpose).
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T.copy()

    J_regressor = _unwrap(raw["J_regressor"]).astype(np.float32)
    parents = np.asarray(raw["kintree_table"], dtype=np.int64)[0].astype(np.int32)
    parents[0] = -1
    lbs_weights = np.asarray(raw["weights"], dtype=np.float32)
    faces = np.asarray(raw["f"], dtype=np.int32)

    out = {
        "v_template": v_template,
        "shapedirs": shapedirs,
        "posedirs": posedirs,
        "J_regressor": J_regressor,
        "parents": parents,
        "lbs_weights": lbs_weights,
        "faces": faces,
    }
    # optional SMPL-H/X extras
    for k_src, k_dst in (
        ("hands_componentsl", "hand_components_l"),
        ("hands_componentsr", "hand_components_r"),
        ("hands_meanl", "hand_mean_l"),
        ("hands_meanr", "hand_mean_r"),
    ):
        if k_src in raw:
            out[k_dst] = np.asarray(_unwrap(raw[k_src]), dtype=np.float32)
    return out


def save_model_data(path: str, data: dict) -> None:
    """Write a model dict back out in the reference on-disk format
    (numpy arrays; posedirs unreshaped (V,3,P))."""
    posedirs = data["posedirs"]
    V = data["v_template"].shape[0]
    if posedirs.shape[0] != V:  # stored in matmul layout; undo
        posedirs = posedirs.T.reshape(V, 3, -1)
    parents = data["parents"].astype(np.int64)
    kintree = np.stack([parents, np.arange(len(parents), dtype=np.int64)])
    kintree[0, 0] = 2**32 - 1  # reference files use uint32 -1 for the root
    raw = {
        "v_template": data["v_template"],
        "shapedirs": data["shapedirs"],
        "posedirs": posedirs,
        "J_regressor": data["J_regressor"],
        "kintree_table": kintree,
        "weights": data["lbs_weights"],
        "f": data["faces"],
    }
    with open(path, "wb") as f:
        pickle.dump(raw, f)
