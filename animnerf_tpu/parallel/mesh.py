"""Device mesh and sharding policy.

The reference's only parallelism is PyTorch-Lightning DataParallel/DDP
(/root/reference/train.py:451-458, SURVEY.md §2.8). Here the whole
framework scales through one ``jax.sharding.Mesh``:

  * axis ``"data"`` — rays. Training batches shard their leading batch axis;
    full-frame rendering shards the ray axis. Parameters and the SMPL model
    are replicated (6,890 verts — broadcast, no gather). Gradient psum rides
    ICI automatically via jit-inserted collectives (the NCCL all-reduce
    equivalent).

Per-ray NeRF has no cross-ray coupling, so pure ray sharding is the whole
story: a 512^2 frame over 8 chips = 32k rays/chip in one fused program —
this *replaces* the reference's 2048-ray host chunk loop (train.py:205-210).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[list] = None) -> Mesh:
    """1-D mesh over the 'data' axis (rays/batch)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def mesh_for_batch(batch_size: int) -> Mesh:
    """Largest mesh whose size divides the batch (a 2-sample debug batch on
    an 8-device host should use 2 devices, not crash)."""
    n = len(jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis of every array in a train batch."""
    return NamedSharding(mesh, P("data"))

def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the ray axis of a (B, R, ...) render batch."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, axis: str = "batch") -> dict:
    """device_put a host batch with the right layout.

    axis='batch': training layout — leading axis sharded (scalars like
    frame_idx shard the same axis).
    axis='rays': rendering layout — (B, R, C) arrays shard axis 1.
    """
    out = {}
    for k, v in batch.items():
        if v.ndim == 0:
            out[k] = jax.device_put(v, replicated(mesh))
        elif axis == "rays" and v.ndim >= 2 and k in ("rays", "rgbs", "alphas"):
            out[k] = jax.device_put(v, ray_sharding(mesh))
        else:
            out[k] = jax.device_put(v, batch_sharding(mesh))
    return out


def pad_rays_for_mesh(rays: np.ndarray, mesh: Mesh, axis: int = 1):
    """Pad the ray axis to a multiple of the mesh size; returns (rays, n)."""
    n = rays.shape[axis]
    size = mesh.devices.size
    pad = (-n) % size
    if pad:
        widths = [(0, 0)] * rays.ndim
        widths[axis] = (0, pad)
        rays = np.pad(rays, widths, mode="edge")
    return rays, n
