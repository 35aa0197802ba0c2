"""Torch-free reader for PyTorch/Lightning checkpoint files.

A torch `.ckpt`/`.pth` saved with torch.save (zipfile serialization) is a
zip archive holding `data.pkl` (a pickle whose tensors are persistent-id
references) plus one raw little-endian buffer per storage under `data/`.
This module unpickles them into plain numpy arrays with no torch import —
needed to ingest reference-trained checkpoints on TPU pods
(SURVEY.md §7.4 "checkpoint compatibility").
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled specially
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _Storage:
    def __init__(self, data: bytes, dtype_name: str):
        self.data = data
        self.dtype_name = dtype_name

    def as_numpy(self) -> np.ndarray:
        if self.dtype_name == "BFloat16Storage":
            raw = np.frombuffer(self.data, dtype=np.uint16)
            return (raw.astype(np.uint32) << 16).view(np.float32)
        return np.frombuffer(self.data, dtype=_DTYPES[self.dtype_name])


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None) -> np.ndarray:
    flat = storage.as_numpy()
    if not size:
        return flat[storage_offset].copy()
    itemsize = flat.itemsize
    strided = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )
    return np.ascontiguousarray(strided)


class _Placeholder:
    """Stands in for any torch class we don't model (dtype markers etc)."""

    def __init__(self, *a, **k):
        pass


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, f, zf: zipfile.ZipFile, prefix: str):
        super().__init__(f, encoding="latin1")
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if module == "torch._utils" and name in (
                "_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return lambda data, requires_grad=True, hooks=None: data
        if module == "torch" and name.endswith("Storage"):
            # dtype marker classes: keep the name for persistent_load
            return type(name, (_Placeholder,), {})
        if module.startswith("torch") or module.startswith(
                "pytorch_lightning") or module.startswith("lightning"):
            return _Placeholder
        if module == "collections" and name == "OrderedDict":
            return dict
        if module == "argparse" and name == "Namespace":
            return dict  # hparams Namespace -> dict(**kwargs)
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return _Placeholder

    def persistent_load(self, pid: Any):
        # ('storage', <StorageType marker>, key, location, numel)
        if isinstance(pid, tuple) and pid and pid[0] == "storage":
            storage_type, key = pid[1], pid[2]
            tname = getattr(storage_type, "__name__", None) or str(pid[1])
            # torch>=1.13 passes torch.storage.TypedStorage wrappers; dtype
            # marker objects stringify like "torch.FloatStorage"
            for cand in _DTYPES:
                if cand in str(tname) or cand in str(pid):
                    tname = cand
                    break
            else:
                tname = "FloatStorage"
            data = self._zf.read(f"{self._prefix}/data/{key}")
            return _Storage(data, tname)
        raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")


def load_torch_checkpoint(path: str) -> Any:
    """Load a torch zip-serialized checkpoint into numpy/dicts, torch-free."""
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("data.pkl")]
        if not pkl_names:
            raise ValueError(f"{path!r} is not a torch zip checkpoint")
        pkl_name = pkl_names[0]
        prefix = pkl_name[: -len("/data.pkl")]
        with zf.open(pkl_name) as f:
            up = _TorchUnpickler(io.BytesIO(f.read()), zf, prefix)
            return up.load()
