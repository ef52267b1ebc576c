"""Feature extraction (reference ``torchvision/models/feature_extraction.py``:
FX-based ``create_feature_extractor``/``get_graph_node_names``).

FX symbolic tracing has no JAX analog (SURVEY.md §2.6 TPU plan): models in
this framework expose named intermediates explicitly via
``return_features=True``. ``create_feature_extractor`` wraps that
convention with the reference's rename-dict API.
"""

from __future__ import annotations

import inspect
from typing import Callable, Dict, List, Optional, Union

import jax

from vision_tpu.models._utils import VisionModel

__all__ = ["create_feature_extractor", "get_graph_node_names"]


def _supports_features(model: VisionModel) -> bool:
    sig = inspect.signature(model.module.__call__)
    return "return_features" in sig.parameters


def get_graph_node_names(model: VisionModel, example_input=None) -> List[str]:
    """Names of extractable intermediates (reference
    ``get_graph_node_names``; here the explicit feature dict keys)."""
    if not _supports_features(model):
        raise ValueError(
            f"{type(model.module).__name__} does not expose named "
            "intermediates (no return_features parameter)"
        )
    import jax.numpy as jnp

    if example_input is None:
        example_input = jnp.zeros((1, 64, 64, 3), jnp.float32)
    _, feats = model.module.apply(
        model.variables, example_input, train=False, return_features=True
    )
    return list(feats.keys())


def create_feature_extractor(
    model: VisionModel,
    return_nodes: Union[List[str], Dict[str, str], None] = None,
) -> Callable:
    """Build ``fn(x) -> {out_name: feature}`` (reference
    ``create_feature_extractor``). ``return_nodes`` maps intermediate names
    to output names (list form maps each name to itself)."""
    if not _supports_features(model):
        raise ValueError(
            f"{type(model.module).__name__} does not expose named "
            "intermediates (no return_features parameter)"
        )
    if isinstance(return_nodes, list):
        return_nodes = {n: n for n in return_nodes}

    module, variables = model.module, model.variables

    def extractor(x, train: bool = False):
        _, feats = module.apply(
            variables, x, train=train, return_features=True
        )
        if return_nodes is None:
            return feats
        missing = [k for k in return_nodes if k not in feats]
        if missing:
            raise KeyError(
                f"nodes {missing} not available; choose from {list(feats)}"
            )
        return {out: feats[k] for k, out in return_nodes.items()}

    return extractor
