"""Model plumbing (reference ``torchvision/models/_utils.py``) + the
functional-model wrapper that gives the zoo a torch-like call surface while
staying pure underneath."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "VisionModel",
    "_make_divisible",
    "BatchNorm",
    "build_model",
    "abstract_init",
    "fast_init",
    "init_variables",
]

# Builder init mode. "real" = flax module.init (runs the forward once);
# "abstract" = ``jax.eval_shape`` ShapeDtypeStructs (no compute/memory — for
# param-count/shape inspection, the fast path for the reference's num_params
# meta validation, ``test/test_extended_models.py``); "fast" = materialize
# real arrays per-leaf from the eval_shape tree (seeded normal / ones) — the
# values differ from flax initializers but cost no forward pass, for
# shape-level smoke tests and synthetic benchmarks.
_INIT_MODE = "real"


class _init_mode_ctx:
    _mode = "real"

    def __enter__(self):
        global _INIT_MODE
        self._prev = _INIT_MODE
        _INIT_MODE = self._mode
        return self

    def __exit__(self, *exc):
        global _INIT_MODE
        _INIT_MODE = self._prev
        return False


class abstract_init(_init_mode_ctx):
    """Context manager: builders produce shape-only variables (no compute).

    >>> with abstract_init():
    ...     m = get_model("resnet50")
    >>> n_params = sum(int(np.prod(l.shape)) for l in tree_leaves(m.params))

    Only valid for ``weights=None`` builds; loading weights requires real
    arrays and raises under this context.
    """

    _mode = "abstract"


class fast_init(_init_mode_ctx):
    """Context manager: builders materialize variables from shapes only.

    Params are seeded normals (norm/affine ``scale`` leaves get 1±0.1 so
    signal still propagates), batch-norm ``var`` gets ones, everything else
    zeros. Orders of magnitude cheaper than real init (no forward trace
    execution) and fully deterministic — used by shape-smoke tests and
    the golden-regression harness.
    """

    _mode = "fast"


def _materialize_from_shapes(shapes, seed: int = 0):
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    out = []
    for i, (path, leaf) in enumerate(leaves):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        last = names[-1] if names else ""
        top = names[0] if names else ""
        if top == "params":
            # numpy Philox: fast on host (jax threefry on 100M-param leaves
            # costs ~17s/leaf on one CPU core), deterministic across runs.
            rng = np.random.Generator(np.random.Philox(key=seed + i))
            noise = rng.standard_normal(leaf.shape, dtype=np.float32)
            if len(leaf.shape) >= 2:  # fan-in scaling keeps activations O(1)
                fan_in = float(np.prod(leaf.shape[:-1]))
                noise *= 1.0 / max(fan_in, 1.0) ** 0.5
            else:
                noise *= 0.1
            if last in ("scale", "gamma", "weight_g"):
                noise = noise * 0.1 + 1.0
            out.append(jnp.asarray(noise, leaf.dtype))
        elif last in ("var",):
            out.append(jnp.ones(leaf.shape, leaf.dtype))
        else:
            out.append(jnp.zeros(leaf.shape, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def init_variables(module: nn.Module, rng, *args, **kwargs):
    """``module.init`` that honors :class:`abstract_init`/:class:`fast_init`."""
    if _INIT_MODE == "abstract":
        return jax.eval_shape(lambda: module.init(rng, *args, **kwargs))
    if _INIT_MODE == "fast":
        shapes = jax.eval_shape(lambda: module.init(rng, *args, **kwargs))
        return _materialize_from_shapes(shapes)
    return module.init(rng, *args, **kwargs)


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
    if _INIT_MODE != "real" and weights is not None:
        raise RuntimeError("cannot load weights under abstract_init/fast_init")
    variables = init_variables(
        module, jax.random.PRNGKey(seed), jnp.zeros(input_shape, jnp.float32)
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
