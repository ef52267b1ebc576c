"""Model plumbing (reference ``torchvision/models/_utils.py``) + the
functional-model wrapper that gives the zoo a torch-like call surface while
staying pure underneath."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["VisionModel", "_make_divisible", "BatchNorm", "build_model"]


def _make_divisible(v: float, divisor: int, min_value: Optional[int] = None) -> int:
    """reference ``models/_utils.py:76``."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def BatchNorm(name: str, train: bool = False, epsilon: float = 1e-5) -> nn.Module:
    """torch-default BatchNorm2d (momentum 0.1 -> flax momentum 0.9)."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=epsilon, name=name
    )


@dataclasses.dataclass
class VisionModel:
    """A module + its variables, callable like a torch model.

    ``model(x)`` runs inference; ``model(x, train=True, rngs=...)`` runs the
    training forward and returns ``(out, updated_variables)`` when the model
    has batch stats. The pure ``module.apply`` remains available for
    jit/pjit training loops.
    """

    module: nn.Module
    variables: Dict[str, Any]
    preprocess: Optional[Callable] = None
    meta: Optional[Dict[str, Any]] = None

    def __call__(self, *inputs, train: bool = False, rngs=None, **kwargs):
        if train and "batch_stats" in self.variables:
            out, updates = self.module.apply(
                self.variables,
                *inputs,
                train=True,
                rngs=rngs,
                mutable=["batch_stats"],
                **kwargs,
            )
            return out, updates
        return self.module.apply(
            self.variables, *inputs, train=train, rngs=rngs, **kwargs
        )

    @property
    def params(self):
        return self.variables.get("params")

    def bind(self):
        return self.module.bind(self.variables)


def build_model(
    module: nn.Module,
    weights,
    input_shape=(1, 224, 224, 3),
    hooks=None,
    preprocess_override=None,
    seed: int = 0,
    strict: bool = True,
) -> VisionModel:
    """Initialize variables (and load converted reference weights if given)."""
    variables = module.init(
        jax.random.PRNGKey(seed), jnp.zeros(input_shape, jnp.float32)
    )
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # unfreeze copy
    preprocess = preprocess_override
    meta = None
    if weights is not None:
        from vision_tpu._torch_convert import convert_torch_state_dict

        sd = weights.get_state_dict()
        variables = convert_torch_state_dict(sd, variables, hooks=hooks, strict=strict)
        if preprocess is None:
            preprocess = weights.transforms()
        meta = weights.meta
    return VisionModel(module=module, variables=variables, preprocess=preprocess, meta=meta)
