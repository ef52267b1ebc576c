"""Triplet losses with online mining (counterpart of reference
``references/similarity/loss.py``): batch_all and batch_hard strategies
over the pairwise distance matrix — one MXU matmul + static masks, fully
jittable (no dynamic triplet gathering)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "pairwise_sq_dists",
    "batch_all_triplet_loss",
    "batch_hard_triplet_loss",
    "TripletMarginLoss",
]


def pairwise_sq_dists(emb: jnp.ndarray) -> jnp.ndarray:
    """(N, D) -> (N, N) squared euclidean distances."""
    sq = jnp.sum(emb**2, axis=-1)
    d = sq[:, None] + sq[None, :] - 2.0 * emb @ emb.T
    return jnp.maximum(d, 0.0)


def batch_all_triplet_loss(labels, embeddings, margin: float = 1.0):
    """reference loss.py:51: mean over all valid (a, p, n) triplets with
    positive loss. Returns (loss, fraction_positive_triplets)."""
    d = jnp.sqrt(pairwise_sq_dists(embeddings) + 1e-12)
    same = labels[:, None] == labels[None, :]
    n = embeddings.shape[0]
    not_self = ~jnp.eye(n, dtype=bool)
    pos_mask = same & not_self
    neg_mask = ~same
    loss = jax.nn.relu(d[:, :, None] - d[:, None, :] + margin)
    valid = pos_mask[:, :, None] & neg_mask[:, None, :]
    loss = loss * valid
    num_positive = jnp.sum((loss > 1e-16) & valid)
    num_valid = jnp.sum(valid)
    frac = num_positive / jnp.maximum(num_valid, 1)
    return jnp.sum(loss) / jnp.maximum(num_positive, 1), frac


def batch_hard_triplet_loss(labels, embeddings, margin: float = 1.0):
    """reference loss.py:25: hardest positive and hardest negative per
    anchor. Returns (loss, -1) for API symmetry."""
    d = jnp.sqrt(pairwise_sq_dists(embeddings) + 1e-12)
    same = labels[:, None] == labels[None, :]
    n = embeddings.shape[0]
    pos_mask = (same & ~jnp.eye(n, dtype=bool)).astype(d.dtype)
    hardest_pos = jnp.max(d * pos_mask, axis=1)
    neg_mask = (~same).astype(d.dtype)
    max_d = jnp.max(d, axis=1, keepdims=True)
    hardest_neg = jnp.min(d + max_d * (1.0 - neg_mask), axis=1)
    loss = jax.nn.relu(hardest_pos - hardest_neg + margin)
    return jnp.mean(loss), jnp.asarray(-1.0)


class TripletMarginLoss:
    """reference loss.py:9: strategy dispatcher."""

    def __init__(self, margin: float = 1.0, mining: str = "batch_all"):
        if mining not in ("batch_all", "batch_hard"):
            raise ValueError(f"unknown mining strategy {mining!r}")
        self.margin = margin
        self.mining = mining

    def __call__(self, embeddings, labels):
        fn = (
            batch_all_triplet_loss
            if self.mining == "batch_all"
            else batch_hard_triplet_loss
        )
        return fn(labels, embeddings, self.margin)
