"""torch state_dict -> flax variables conversion.

The model zoo reproduces the reference's pre-trained weights (BASELINE.md)
by converting torch checkpoints. Flax module trees in this codebase are
named to mirror the torch module paths (``layer1.0.conv1`` etc.), so the
conversion is mechanical:

* conv ``weight`` (4D OIHW)  -> ``kernel`` (HWIO)
* linear ``weight`` (2D OI)  -> ``kernel`` (IO)
* batchnorm ``weight``/``bias`` -> params ``scale``/``bias``;
  ``running_mean``/``running_var`` -> batch_stats ``mean``/``var``
* 5D conv3d OIDHW -> DHWIO

Model-specific irregularities (packed qkv, class tokens, …) are handled by
per-builder ``hooks`` that rewrite the torch dict before the generic walk.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["convert_torch_state_dict"]


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _torch_key(collection: str, path: Tuple[str, ...]) -> Tuple[str, str]:
    """flax (collection, path) -> (torch key, conversion kind)."""
    *mods, leaf = path
    base = ".".join(mods)
    if collection == "params":
        if leaf == "kernel":
            return f"{base}.weight", "kernel"
        if leaf == "scale":
            return f"{base}.weight", "copy"
        if leaf == "bias":
            return f"{base}.bias", "copy"
        if leaf in ("embedding",):
            return f"{base}.weight", "copy"
        # direct-named parameters (class_token, pos_embedding, ...)
        return f"{base}.{leaf}" if base else leaf, "copy"
    if collection == "batch_stats":
        if leaf == "mean":
            return f"{base}.running_mean", "copy"
        if leaf == "var":
            return f"{base}.running_var", "copy"
    if collection == "frozen":
        return f"{base}.{leaf}", "copy"
    raise KeyError(f"cannot map {collection}:{path}")


def _convert_tensor(t: np.ndarray, kind: str, target_shape) -> np.ndarray:
    t = np.asarray(t)
    if kind == "kernel":
        if t.ndim == 4:  # OIHW -> HWIO
            t = t.transpose(2, 3, 1, 0)
        elif t.ndim == 2:  # OI -> IO
            t = t.transpose(1, 0)
        elif t.ndim == 5:  # OIDHW -> DHWIO
            t = t.transpose(2, 3, 4, 1, 0)
        elif t.ndim == 3:  # OIW -> WIO
            t = t.transpose(2, 1, 0)
    if tuple(t.shape) != tuple(target_shape):
        if t.size == int(np.prod(target_shape)):
            t = t.reshape(target_shape)
        else:
            raise ValueError(
                f"shape mismatch: torch {t.shape} vs flax {tuple(target_shape)}"
            )
    return t


def convert_torch_state_dict(
    sd: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    hooks: Optional[Callable[[Dict[str, np.ndarray]], Dict[str, np.ndarray]]] = None,
    strict: bool = True,
    allow_missing: Optional[Callable[[str], bool]] = None,
) -> Dict[str, Any]:
    """Convert ``sd`` into the structure of ``variables`` (a flax variables
    dict with 'params' and optionally 'batch_stats'/'frozen' collections).

    ``allow_missing``: predicate over torch keys; variables whose torch key
    is absent from ``sd`` AND matches the predicate keep their init value
    without tripping the strict check (e.g. the zero-init ``conv2_offset``
    predictors a plain checkpoint cannot contain when loaded into a
    deform-conv backbone variant).
    """
    if hooks is not None:
        sd = hooks(dict(sd))
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}

    used = set()
    out: Dict[str, Any] = {}
    missing: List[str] = []
    for collection, tree in variables.items():
        flat = _flatten(tree if isinstance(tree, dict) else dict(tree))
        new_flat = {}
        for path, leaf in flat.items():
            tk, kind = _torch_key(collection, path)
            if tk not in sd:
                if allow_missing is None or not allow_missing(tk):
                    missing.append(tk)
                new_flat[path] = leaf
                continue
            arr = _convert_tensor(sd[tk], kind, leaf.shape)
            new_flat[path] = jnp.asarray(arr, dtype=leaf.dtype)
            used.add(tk)
        out[collection] = _unflatten(new_flat)

    unexpected = [k for k in sd if k not in used]
    if strict and (missing or unexpected):
        raise ValueError(
            f"state dict mismatch.\nmissing ({len(missing)}): {missing[:10]}\n"
            f"unexpected ({len(unexpected)}): {unexpected[:10]}"
        )
    return out
