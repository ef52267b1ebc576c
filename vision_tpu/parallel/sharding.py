"""Sharding rules: data parallelism + Megatron-style tensor parallelism for
the transformer models (SURVEY.md §2.10 "optional TP/SP for the large
ViT/MaxViT variants").

The reference has no TP (its models are single-device); on TPU the natural
extra axis is ``model``: attention qkv/mlp-in kernels are column-sharded,
out-proj/mlp-out kernels row-sharded, so each block needs exactly one
``psum`` (inserted automatically by XLA SPMD from the NamedShardings).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "infer_tp_sharding",
    "infer_fsdp_sharding",
    "shard_params",
    "param_shardings",
]

def _spec_for(path: str, leaf, axis: str):
    """TP spec for one param; returns PartitionSpec or None (replicate).

    Megatron split: qkv/mlp-in kernels column-parallel (shard the output
    dim, bias sharded along with it); out-proj/mlp-out kernels row-parallel
    (shard the input dim; XLA SPMD inserts the psum, bias replicated)."""
    if leaf.ndim == 0:
        return None
    if re.search(r"(in_proj|qkv)\.kernel$", path) and leaf.ndim == 2:
        return P(None, axis)  # column parallel
    if re.search(r"(in_proj|qkv)\.bias$", path) and leaf.ndim == 1:
        return P(axis)
    if re.search(r"(out_proj|merge)\.kernel$", path) and leaf.ndim == 2:
        return P(axis, None)  # row parallel (psum after)
    if re.search(r"mlp\.0\.kernel$", path) and leaf.ndim == 2:
        return P(None, axis)
    if re.search(r"mlp\.0\.bias$", path) and leaf.ndim == 1:
        return P(axis)
    if re.search(r"mlp\.3\.kernel$", path) and leaf.ndim == 2:
        return P(axis, None)
    return None


def _path_str(path) -> str:
    return ".".join(str(getattr(k, "key", k)) for k in path)


def infer_tp_sharding(
    params: Any, mesh: Mesh, axis: str = "model"
) -> Any:
    """Pytree of NamedShardings: TP rules where they match, replicated
    elsewhere. Shardable only when the dim divides the axis size."""
    axis_size = mesh.shape[axis]

    def leaf_spec(path, leaf):
        spec = _spec_for(_path_str(path), leaf, axis)
        if spec is not None:
            # verify divisibility; fall back to replication otherwise
            for dim, name in enumerate(spec):
                if name == axis and leaf.shape[dim] % axis_size != 0:
                    spec = None
                    break
        return NamedSharding(mesh, spec if spec is not None else P())

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def param_shardings(variables: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Shardings for a full variables dict: TP for params, replicated for
    stats/frozen collections."""
    out = {}
    for coll, tree in variables.items():
        if coll == "params":
            out[coll] = infer_tp_sharding(tree, mesh)
        else:
            out[coll] = jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P()), tree
            )
    return out


def shard_params(variables: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place variables on the mesh according to the TP rules."""
    shardings = param_shardings(variables, mesh)
    return jax.tree_util.tree_map(jax.device_put, variables, shardings)


def infer_fsdp_sharding(
    params: Any, mesh: Mesh, axis: str = "data", min_size: int = 2**14
) -> Any:
    """Fully-sharded data parallelism (ZeRO-3-style) shardings: every
    large parameter is sharded over the ``data`` axis along its largest
    divisible dimension; XLA SPMD inserts the all-gather before each use
    and the reduce-scatter on the gradient. Small leaves (biases, norms)
    stay replicated — gathering them costs more than storing them.

    This is the TPU-native memory-scaling analog of torch FSDP (the
    reference has none; its models are single-device). Composes with
    :func:`infer_tp_sharding` by using a different mesh axis.
    """
    axis_size = mesh.shape[axis]

    def leaf_spec(path, leaf):
        if leaf.ndim == 0 or leaf.size < min_size:
            return NamedSharding(mesh, P())
        # shard the largest dimension divisible by the axis
        dims = sorted(
            range(leaf.ndim), key=lambda d: leaf.shape[d], reverse=True
        )
        for d in dims:
            if leaf.shape[d] % axis_size == 0:
                spec = [None] * leaf.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_spec, params)
