"""DropBlock2d/3d (reference ``torchvision/ops/drop_block.py``).

Channels-last, explicit PRNG key. The block expansion (a mask pixel zeroes a
block_size window around it) is expressed as max-pooling the seed noise —
a ``reduce_window`` that XLA maps directly to the VPU."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["drop_block2d", "drop_block3d"]


def drop_block2d(
    inp: jax.Array,
    p: float,
    block_size: int,
    inplace: bool = False,  # accepted for API parity; meaningless in JAX
    eps: float = 1e-06,
    training: bool = True,
    *,
    key: jax.Array | None = None,
) -> jax.Array:
    """DropBlock2d on ``[N, H, W, C]`` (reference ``ops/drop_block.py:10``)."""
    if p < 0.0 or p > 1.0:
        raise ValueError(f"drop probability must be in [0, 1], got {p}")
    if inp.ndim != 4:
        raise ValueError(f"expected 4D (NHWC) input, got {inp.ndim}D")
    if not training or p == 0.0:
        return inp
    if key is None:
        raise ValueError("drop_block2d requires a PRNG key in training mode")

    n, h, w, c = inp.shape
    block_size = min(block_size, h, w)
    gamma = (p * h * w) / ((block_size**2) * ((h - block_size + 1) * (w - block_size + 1)))
    seed_shape = (n, h - block_size + 1, w - block_size + 1, c)
    bern = jax.random.bernoulli(key, gamma, seed_shape).astype(inp.dtype)
    pad = block_size // 2
    noise = jnp.pad(
        bern,
        (
            (0, 0),
            (pad, h - seed_shape[1] - pad),
            (pad, w - seed_shape[2] - pad),
            (0, 0),
        ),
    )
    # expand each seed to a block_size x block_size block via max-pool
    noise = jax.lax.reduce_window(
        noise,
        -jnp.inf,
        jax.lax.max,
        (1, block_size, block_size, 1),
        (1, 1, 1, 1),
        "SAME",
    )
    mask = 1.0 - noise
    normalize_scale = mask.size / (eps + jnp.sum(mask))
    return inp * mask * normalize_scale


def drop_block3d(
    inp: jax.Array,
    p: float,
    block_size: int,
    inplace: bool = False,
    eps: float = 1e-06,
    training: bool = True,
    *,
    key: jax.Array | None = None,
) -> jax.Array:
    """DropBlock3d on ``[N, T, H, W, C]`` (reference ``ops/drop_block.py:86``)."""
    if p < 0.0 or p > 1.0:
        raise ValueError(f"drop probability must be in [0, 1], got {p}")
    if inp.ndim != 5:
        raise ValueError(f"expected 5D (NTHWC) input, got {inp.ndim}D")
    if not training or p == 0.0:
        return inp
    if key is None:
        raise ValueError("drop_block3d requires a PRNG key in training mode")

    n, t, h, w, c = inp.shape
    block_size = min(block_size, t, h, w)
    gamma = (p * t * h * w) / (
        (block_size**3)
        * ((t - block_size + 1) * (h - block_size + 1) * (w - block_size + 1))
    )
    seed_shape = (n, t - block_size + 1, h - block_size + 1, w - block_size + 1, c)
    bern = jax.random.bernoulli(key, gamma, seed_shape).astype(inp.dtype)
    pads = []
    for full, seed in ((t, seed_shape[1]), (h, seed_shape[2]), (w, seed_shape[3])):
        lo = block_size // 2
        pads.append((lo, full - seed - lo))
    noise = jnp.pad(bern, ((0, 0), pads[0], pads[1], pads[2], (0, 0)))
    noise = jax.lax.reduce_window(
        noise,
        -jnp.inf,
        jax.lax.max,
        (1, block_size, block_size, block_size, 1),
        (1, 1, 1, 1, 1),
        "SAME",
    )
    mask = 1.0 - noise
    normalize_scale = mask.size / (eps + jnp.sum(mask))
    return inp * mask * normalize_scale
