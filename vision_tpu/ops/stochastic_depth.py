"""Stochastic depth (reference ``torchvision/ops/stochastic_depth.py``).

Functional form with an explicit PRNG key — the JAX-native replacement for
torch's global RNG."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["stochastic_depth"]


def stochastic_depth(
    inp: jax.Array,
    p: float,
    mode: str,
    training: bool = True,
    *,
    key: jax.Array | None = None,
) -> jax.Array:
    """Randomly zero entire residual branches (reference
    ``ops/stochastic_depth.py:8-66``). ``mode`` is "batch" (one coin for the
    whole batch) or "row" (one per sample)."""
    if p < 0.0 or p > 1.0:
        raise ValueError(f"drop probability must be in [0, 1], got {p}")
    if mode not in ("batch", "row"):
        raise ValueError(f"mode must be 'batch' or 'row', got {mode!r}")
    if not training or p == 0.0:
        return inp
    if key is None:
        raise ValueError("stochastic_depth requires a PRNG key in training mode")

    survival_rate = 1.0 - p
    if mode == "row":
        size = (inp.shape[0],) + (1,) * (inp.ndim - 1)
    else:
        size = (1,) * inp.ndim
    noise = jax.random.bernoulli(key, survival_rate, size).astype(inp.dtype)
    if survival_rate > 0.0:
        noise = noise / survival_rate
    return inp * noise
