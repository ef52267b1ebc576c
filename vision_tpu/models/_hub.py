"""Checkpoint download + cache (the TPU-side analog of
``torchvision/_internally_replaced_utils.py`` ``load_state_dict_from_url``).

Downloads torch ``.pth`` checkpoints to ``~/.cache/vision_tpu/checkpoints``
and returns a flat ``{name: numpy array}`` dict."""

from __future__ import annotations

import hashlib
import os
import pathlib
import urllib.request
from typing import Any, Dict

__all__ = ["load_state_dict_from_url", "cache_dir"]


def cache_dir() -> pathlib.Path:
    root = os.environ.get(
        "VISION_TPU_HOME", os.path.join(os.path.expanduser("~"), ".cache", "vision_tpu")
    )
    p = pathlib.Path(root) / "checkpoints"
    p.mkdir(parents=True, exist_ok=True)
    return p


def load_state_dict_from_url(url: str, progress: bool = True) -> Dict[str, Any]:
    """Download (with cache) a torch checkpoint and return numpy tensors."""
    import numpy as np

    fname = url.split("/")[-1]
    path = cache_dir() / fname
    if not path.exists():
        tmp = path.with_suffix(".tmp")
        try:
            urllib.request.urlretrieve(url, tmp)
        except Exception as e:
            raise RuntimeError(
                f"could not download {url} (offline environment?): {e}"
            ) from e
        tmp.rename(path)

    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def save_variables_msgpack(variables: Dict[str, Any], path: str) -> None:
    """Serialize flax variables to msgpack (scripts/convert_weights.py)."""
    import jax.numpy as jnp
    from flax import serialization

    variables = {
        k: v for k, v in variables.items()
    }  # plain dict (serialization wants a pytree)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))


def load_variables_msgpack(path: str, like: Dict[str, Any]) -> Dict[str, Any]:
    """Load variables written by :func:`save_variables_msgpack`; ``like``
    gives the target structure (a model's variables)."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(dict(like), f.read())
