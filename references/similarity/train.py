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


def _local(name):
    """Load a sibling module by path (sys.path has ../classification
    first for utils, whose sampler.py would shadow ours)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"similarity_{name}",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     f"{name}.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_loss = _local("loss")
TripletMarginLoss = _loss.TripletMarginLoss
pairwise_sq_dists = _loss.pairwise_sq_dists


PKSampler = _local("sampler").PKSampler


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
            loss, _frac = TripletMarginLoss(args.margin, args.mining)(
                emb, labels
            )
            return loss, mutated["batch_stats"]

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
    p.add_argument("--mining", default="batch_all", type=str,
                   choices=["batch_all", "batch_hard"])
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--epochs", default=10, type=int)
    p.add_argument("--steps-per-epoch", default=None, type=int)
    p.add_argument("--size", default=32, type=int)
    p.add_argument("--fake-data", action="store_true")
    return p


if __name__ == "__main__":
    main(get_args_parser().parse_args())
