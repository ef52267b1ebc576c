"""Transform base class (reference ``torchvision/transforms/v2/_transform.py``).

The v2 contract (reference ``_transform.py:57-73``): flatten the input
pytree, sample params ONCE per call, apply the same params to every leaf —
so geometry stays consistent across image/boxes/masks/keypoints.

JAX adaptation: randomness comes from an explicit PRNG key passed to
``__call__`` (or an internal stateful default key for torch-like
ergonomics). Shape-affecting random params (crop sizes etc.) are drawn on
host as Python ints — transforms run in the host input pipeline like the
reference's; value-level math stays jittable.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import tv_tensors

__all__ = ["Transform"]


def _is_array(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray))


class Transform:
    """Base class. Subclasses implement ``transform(inpt, params)`` and
    optionally ``make_params(flat_inputs, key)``."""

    # types this transform acts on; everything else passes through untouched
    _transformed_types: Tuple = (tv_tensors.TVTensor, jax.Array, np.ndarray)

    def __init__(self):
        self._fallback_key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))

    # -- randomness -----------------------------------------------------
    def _next_key(self) -> jax.Array:
        """Stateful fallback when the user doesn't pass a key (torch-like
        ergonomics; not usable under jit)."""
        self._fallback_key, sub = jax.random.split(self._fallback_key)
        return sub

    # -- overridables ---------------------------------------------------
    def check_inputs(self, flat_inputs: List[Any]) -> None:
        pass

    def make_params(self, flat_inputs: List[Any], key: jax.Array) -> Dict[str, Any]:
        return {}

    def transform(self, inpt: Any, params: Dict[str, Any]) -> Any:
        raise NotImplementedError

    # -- plumbing -------------------------------------------------------
    def _needs_transform_list(self, flat_inputs: List[Any]) -> List[bool]:
        """reference ``_transform.py:75-105``: plain arrays are treated as
        images only if no explicit Image/Video is present, and only the
        first one."""
        needs = []
        has_explicit_image = any(
            isinstance(x, (tv_tensors.Image, tv_tensors.Video)) for x in flat_inputs
        )
        transforms_plain = jax.Array in self._transformed_types or (
            np.ndarray in self._transformed_types
        )
        seen_pure = False
        for x in flat_inputs:
            if isinstance(x, tv_tensors.TVTensor):
                needs.append(isinstance(x, self._transformed_types))
            elif _is_array(x):
                treat_as_image = (
                    transforms_plain and not has_explicit_image and not seen_pure
                )
                seen_pure = True
                needs.append(treat_as_image)
            else:
                needs.append(False)
        return needs

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        flat_inputs, spec = jax.tree_util.tree_flatten(
            sample, is_leaf=lambda x: isinstance(x, tv_tensors.TVTensor)
        )
        self.check_inputs(flat_inputs)
        needs_transform_list = self._needs_transform_list(flat_inputs)
        if key is None:
            key = self._next_key()
        params = self.make_params(flat_inputs, key)
        flat_outputs = [
            self.transform(inpt, params) if needs else inpt
            for inpt, needs in zip(flat_inputs, needs_transform_list)
        ]
        return jax.tree_util.tree_unflatten(spec, flat_outputs)

    def __repr__(self) -> str:
        return f"{type(self).__name__}()"


class _RandomApplyTransform(Transform):
    """Probability-gated transform (reference ``_transform.py:169``)."""

    def __init__(self, p: float = 0.5):
        super().__init__()
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"p must be in [0, 1], got {p}")
        self.p = p

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        if key is None:
            key = self._next_key()
        gate_key, params_key = jax.random.split(key)
        sample = inputs if len(inputs) > 1 else inputs[0]
        if self.p == 0.0:
            return sample
        if self.p < 1.0 and isinstance(key, jax.core.Tracer):
            # under jit the gate is a traced select: both branches are
            # computed and blended elementwise. Valid for shape-preserving
            # transforms (flips, color, erase); shape-changing transforms
            # under a traced probability gate fail with a shape error.
            import jax.numpy as jnp

            u = jax.random.uniform(gate_key)
            applied = super().__call__(*inputs, key=params_key)
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(u < self.p, a, b), applied, sample
            )
        if self.p < 1.0 and float(jax.random.uniform(gate_key)) >= self.p:
            return sample
        return super().__call__(*inputs, key=params_key)
