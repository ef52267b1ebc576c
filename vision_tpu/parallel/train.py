"""pjit training step — the TPU equivalent of the reference's
``train_one_epoch`` inner loop (``references/classification/train.py:19``).

One jitted ``train_step(state, batch, key)`` with donated state; batch
sharded over the ``data`` mesh axis, params replicated; XLA SPMD inserts
the grad all-reduce. Loss supports label smoothing + MixUp-style soft
labels (the reference uses ``CrossEntropyLoss(label_smoothing=...)``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["TrainState", "make_train_step", "reduce_across_devices"]


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    def tree_flatten(self):
        return (self.params, self.batch_stats, self.opt_state, self.step), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.batch_stats, s.opt_state, s.step), ()),
    lambda aux, c: TrainState(*c),
)


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """labels: int [N] or soft [N, C] (MixUp/CutMix)."""
    logits = logits.astype(jnp.float32)  # stable softmax under bf16 compute
    if labels.ndim == logits.ndim - 1:
        labels = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    if label_smoothing > 0:
        n = logits.shape[-1]
        labels = labels * (1.0 - label_smoothing) + label_smoothing / n
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.sum(labels * logp, axis=-1))


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    loss_fn: Callable = cross_entropy_loss,
    label_smoothing: float = 0.0,
    has_batch_stats: bool = True,
    donate: bool = True,
    compute_dtype=None,
):
    """Build a jitted data-parallel train step.

    ``apply_fn(variables, images, train=True, rngs=..., mutable=[...])`` is
    the flax module apply. The returned step takes (state, batch, key) with
    ``batch = {"image": [N,H,W,C], "label": [N] or [N,C]}``.

    ``compute_dtype=jnp.bfloat16`` is the TPU-native equivalent of the
    reference's ``--amp`` autocast (``train.py:29,287``): the forward and
    backward run in bf16 (params/stats/images cast at the step boundary),
    while master params, optimizer state, and BatchNorm running stats stay
    f32 — the grad of the cast upcasts cotangents back, so the optimizer
    sees f32 grads. bf16 shares f32's exponent range, so no GradScaler
    analog is needed; the loss softmax is computed in f32 regardless.
    """

    def cast(tree):
        if compute_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype")
            and jnp.issubdtype(x.dtype, jnp.floating)
            and x.dtype != compute_dtype
            else x,
            tree,
        )

    def step_fn(state: TrainState, batch: Dict[str, jax.Array], key: jax.Array):
        def loss_of(params):
            variables = {"params": cast(params)}
            mutable = []
            if has_batch_stats:
                # batch_stats stay f32: train-mode normalization uses the
                # batch statistics (not these), and casting the carry would
                # re-quantize the running averages to bf16 every step —
                # torch AMP likewise keeps BN state in f32
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = apply_fn(
                variables,
                cast(batch["image"]),
                train=True,
                rngs={"dropout": key},
                mutable=mutable,
            )
            if mutable:
                logits, updates = out
                new_stats = updates.get("batch_stats", state.batch_stats)
                if compute_dtype is not None:
                    # master stats keep the state dtype (flax computes the
                    # batch statistics in f32 even for bf16 inputs)
                    new_stats = jax.tree_util.tree_map(
                        lambda n, o: n.astype(o.dtype),
                        new_stats,
                        state.batch_stats,
                    )
            else:
                logits, new_stats = out, state.batch_stats
            loss = loss_fn(logits, batch["label"], label_smoothing)
            return loss, (new_stats, logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss}
        if batch["label"].ndim == 1:
            metrics["accuracy"] = jnp.mean(
                jnp.argmax(logits, -1) == batch["label"]
            )
        return (
            TrainState(new_params, new_stats, new_opt_state, state.step + 1),
            metrics,
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def reduce_across_devices(tree, mesh: Optional[Mesh] = None):
    """Metric reduction helper (the reference's ``reduce_across_processes``,
    ``references/classification/utils.py``). Under SPMD jit, metrics come
    back already reduced; this host-side helper averages a pytree of
    per-device values if needed."""
    return jax.tree_util.tree_map(lambda x: jnp.mean(jnp.asarray(x)), tree)
