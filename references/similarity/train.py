"""Metric-learning / similarity training CLI (reference
``references/similarity/``: EmbeddingNet over a backbone, semi-hard-aware
triplet margin loss over all valid triplets in a PK-sampled batch, FMNIST
demo).

Example (smoke run on fake data):
    python references/similarity/train.py --fake-data --epochs 1 \
        --steps-per-epoch 2 --p 4 --k 4
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "classification"))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import utils
from vision_tpu.models import get_model
from vision_tpu.parallel.train import TrainState


def pairwise_sq_dists(emb: jnp.ndarray) -> jnp.ndarray:
    """(N, D) -> (N, N) squared euclidean distances, one MXU matmul."""
    sq = jnp.sum(emb**2, axis=-1)
    d = sq[:, None] + sq[None, :] - 2.0 * emb @ emb.T
    return jnp.maximum(d, 0.0)


def triplet_margin_loss(emb: jnp.ndarray, labels: jnp.ndarray,
                        margin: float = 1.0) -> jnp.ndarray:
    """Batch-all triplet loss (reference ``loss.py`` TripletMarginLoss):
    mean over triplets with positive loss; masks (a,p,n) validity
    statically — no dynamic shapes."""
    d = jnp.sqrt(pairwise_sq_dists(emb) + 1e-12)
    same = labels[:, None] == labels[None, :]
    n = emb.shape[0]
    not_self = ~jnp.eye(n, dtype=bool)
    pos_mask = same & not_self                      # (a, p)
    neg_mask = ~same                                # (a, n)
    # loss[a, p, n] = relu(d_ap - d_an + margin)
    loss = jax.nn.relu(d[:, :, None] - d[:, None, :] + margin)
    valid = pos_mask[:, :, None] & neg_mask[:, None, :]
    loss = loss * valid
    num_positive = jnp.sum((loss > 1e-16) & valid)
    return jnp.sum(loss) / jnp.maximum(num_positive, 1)


class PKSampler:
    """reference ``sampler.py`` PKSampler: batches of P classes x K
    samples each."""

    def __init__(self, labels, p: int, k: int, seed: int = 0):
        self.labels = np.asarray(labels)
        self.p, self.k = p, k
        self.rng = np.random.RandomState(seed)
        self.groups = {}
        for i, y in enumerate(self.labels):
            self.groups.setdefault(int(y), []).append(i)

    def __iter__(self):
        classes = list(self.groups)
        while True:
            chosen = self.rng.choice(
                classes, size=min(self.p, len(classes)), replace=False
            )
            batch = []
            for c in chosen:
                idxs = self.groups[c]
                batch.extend(
                    self.rng.choice(idxs, size=self.k, replace=len(idxs) < self.k)
                )
            yield batch


class EmbeddingNet:
    """reference ``model.py`` EmbeddingNet: backbone features -> L2-
    normalized embedding."""

    def __init__(self, backbone_name="resnet18", dim=128):
        backbone = get_model(backbone_name, num_classes=dim)
        self.module = backbone.module
        self.variables = backbone.variables

    def apply(self, variables, x, **kw):
        out = self.module.apply(variables, x, **kw)
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
        )


def main(args):
    print(args)
    net = EmbeddingNet(args.model, args.dim)
    variables = dict(net.variables)
    params = variables.pop("params")
    batch_stats = variables.pop("batch_stats", {})
    tx = optax.adam(args.lr)
    state = TrainState(
        params=params, batch_stats=batch_stats,
        opt_state=tx.init(params), step=jnp.zeros((), jnp.int32),
    )

    @jax.jit
    def train_step(state, images, labels):
        def loss_fn(p):
            emb, mutated = net.module.apply(
                {"params": p, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
            )
            return triplet_margin_loss(emb, labels, args.margin), mutated[
                "batch_stats"
            ]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_bs, opt_state=opt_state, step=state.step + 1,
            ),
            loss,
        )

    rng = np.random.RandomState(0)
    n_fake = 256
    fake_x = rng.rand(n_fake, args.size, args.size, 3).astype(np.float32)
    fake_y = rng.randint(0, 10, n_fake)
    sampler = iter(PKSampler(fake_y, args.p, args.k))

    logger = utils.MetricLogger()
    for epoch in range(args.epochs):
        for _ in range(args.steps_per_epoch or 10):
            idxs = next(sampler)
            state, loss = train_step(
                state, jnp.asarray(fake_x[idxs]), jnp.asarray(fake_y[idxs])
            )
            logger.update(loss=float(loss))
        print(f"epoch {epoch}: {logger}")


def get_args_parser():
    p = argparse.ArgumentParser(description="vision_tpu similarity training")
    p.add_argument("--model", default="resnet18", type=str)
    p.add_argument("--dim", default=128, type=int)
    p.add_argument("--p", default=8, type=int, help="classes per batch")
    p.add_argument("--k", default=8, type=int, help="samples per class")
    p.add_argument("--margin", default=1.0, type=float)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--epochs", default=10, type=int)
    p.add_argument("--steps-per-epoch", default=None, type=int)
    p.add_argument("--size", default=32, type=int)
    p.add_argument("--fake-data", action="store_true")
    return p


if __name__ == "__main__":
    main(get_args_parser().parse_args())
