"""FLOP accounting (reference ``test/common_extended_utils.py:33-113``
hand-written per-op FLOP counters validating ``meta["_ops"]``).

TPU-native formulation: no per-op counter table — XLA already computes a
cost model for every compiled executable. ``count_gmacs`` lowers the
forward once and reads ``cost_analysis()["flops"] / 2`` (MACs), which is
measured from the actual compiled program rather than hand-maintained.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["count_gmacs"]


def count_gmacs(model, input_shape: Tuple[int, ...] = (1, 224, 224, 3)) -> float:
    """GMACs of the eval forward at ``input_shape`` (flops/2, the
    reference's ``_ops`` convention)."""
    module, variables = model.module, model.variables
    fn = jax.jit(lambda v, x: module.apply(v, x, train=False))
    lowered = fn.lower(variables, jnp.zeros(input_shape, jnp.float32))
    cost = lowered.compile().cost_analysis()
    return float(cost.get("flops", 0.0)) / 2.0 / 1e9
