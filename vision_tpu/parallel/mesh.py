"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DDP/NCCL layer (SURVEY.md §2.10).

The reference's only parallelism is data parallelism via
``DistributedDataParallel`` + ``DistributedSampler``
(``references/classification/train.py:325,195``). Here: one ``Mesh`` with a
``data`` axis; batches are sharded over it with ``NamedSharding``; XLA SPMD
inserts the gradient all-reduce over ICI automatically. A ``model`` axis is
provisioned for optional tensor-parallel sharding of the large ViT variants.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate"]


def make_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices (default: all).

    ``shape`` reshapes the device list for multi-axis meshes, e.g.
    ``shape=(4, 2), axis_names=("data", "model")``.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),)
    if len(shape) != len(axis_names):
        raise ValueError("shape and axis_names must have equal length")
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a host batch onto the mesh, sharded along the leading dim."""

    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
