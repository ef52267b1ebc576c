"""Optical-flow (RAFT) training CLI (reference
``references/optical_flow/train.py``: sequence loss exponentially
weighted over refinement iterations with gamma=0.8, EPE / 1px / 3px / 5px
metrics, AdamW + OneCycle).

Example (smoke run on fake data):
    python references/optical_flow/train.py --model raft_small \
        --fake-data --epochs 1 --batch-size 2 --steps-per-epoch 2 --size 64
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "classification"))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import utils
from vision_tpu.models import get_model
from vision_tpu.parallel import make_mesh, replicate, shard_batch
from vision_tpu.parallel.train import TrainState


def sequence_loss(flow_preds, flow_gt, valid_mask=None, gamma: float = 0.8,
                  max_flow: float = 400.0) -> jnp.ndarray:
    """reference ``utils.py`` sequence_loss: sum_i gamma^(N-1-i) * L1_i,
    masked by validity and by |gt| < max_flow."""
    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    valid = mag < max_flow
    if valid_mask is not None:
        valid = valid & valid_mask
    n = len(flow_preds)
    total = 0.0
    for i, pred in enumerate(flow_preds):
        w = gamma ** (n - 1 - i)
        l1 = jnp.sum(jnp.abs(pred - flow_gt), axis=-1)
        total = total + w * jnp.sum(l1 * valid) / jnp.maximum(jnp.sum(valid), 1)
    return total


def epe_metrics(pred, gt, valid_mask=None):
    """End-point-error stats (reference evaluate): epe, 1px, 3px, 5px."""
    epe = jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1))
    if valid_mask is not None:
        w = valid_mask.astype(jnp.float32)
    else:
        w = jnp.ones_like(epe)
    denom = jnp.maximum(jnp.sum(w), 1)
    return {
        "epe": jnp.sum(epe * w) / denom,
        "1px": jnp.sum((epe < 1) * w) / denom,
        "3px": jnp.sum((epe < 3) * w) / denom,
        "5px": jnp.sum((epe < 5) * w) / denom,
    }


def _chairs_batches(args, split="train", seed=0):
    """Real-data path over vision_tpu.datasets.FlyingChairs. With
    ``--augment`` the full RAFT preset runs (presets.py: asymmetric
    jitter, scale/stretch/crop, flips, erasing); otherwise a plain random
    crop. Either way static shapes + [-1, 1] images."""
    from vision_tpu.datasets import FlyingChairs

    ds = FlyingChairs(args.data_path, split=split)
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(ds)) if split == "train" else np.arange(len(ds))
    preset = None
    if split == "train" and getattr(args, "augment", False):
        # load by path: sys.path has ../classification first (for utils),
        # whose presets.py would shadow a bare `import presets`
        import importlib.util

        _dir = os.path.dirname(os.path.abspath(__file__))
        for _name in ("transforms", "presets"):
            _spec = importlib.util.spec_from_file_location(
                _name, os.path.join(_dir, f"{_name}.py")
            )
            _mod = importlib.util.module_from_spec(_spec)
            sys.modules[_name] = _mod
            _spec.loader.exec_module(_mod)
        flow_presets = sys.modules["presets"]
        preset = flow_presets.OpticalFlowPresetTrain(
            crop_size=(args.size, args.size)
        )
    b1, b2, bf = [], [], []
    for idx in order:
        img1, img2, flow = ds[int(idx)]
        h, w = img1.shape[:2]
        s = args.size
        if h < s or w < s:
            continue
        if preset is not None:
            i1, i2, fl, _ = preset(
                np.asarray(img1), np.asarray(img2),
                np.asarray(flow, np.float32), None, rng,
            )
            b1.append(i1)
            b2.append(i2)
            bf.append(fl)
        else:
            top = rng.randint(0, h - s + 1)
            left = rng.randint(0, w - s + 1)
            sl = np.s_[top : top + s, left : left + s]
            b1.append(np.asarray(img1[sl], np.float32) / 127.5 - 1.0)
            b2.append(np.asarray(img2[sl], np.float32) / 127.5 - 1.0)
            bf.append(np.asarray(flow[sl], np.float32))
        if len(b1) == args.batch_size:
            yield {
                "image1": np.stack(b1),
                "image2": np.stack(b2),
                "flow": np.stack(bf),
            }
            b1, b2, bf = [], [], []


def _fake_batches(args, steps, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        yield {
            "image1": rng.rand(args.batch_size, args.size, args.size, 3)
            .astype(np.float32),
            "image2": rng.rand(args.batch_size, args.size, args.size, 3)
            .astype(np.float32),
            "flow": rng.randn(args.batch_size, args.size, args.size, 2)
            .astype(np.float32),
        }


def main(args):
    print(args)
    model = get_model(args.model)
    module = model.module
    variables = dict(model.variables)
    params = variables["params"]
    # raft_large's context encoder uses BatchNorm -> carry batch_stats
    # (raft_small is InstanceNorm-only and has none)
    batch_stats = variables.get("batch_stats", {})

    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    state = TrainState(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    mesh = make_mesh()
    state = replicate(state, mesh)

    @jax.jit
    def train_step(state, batch):
        def loss_fn(p):
            if state.batch_stats:
                preds, mutated = module.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    batch["image1"], batch["image2"], train=True,
                    num_flow_updates=args.num_flow_updates,
                    mutable=["batch_stats"],
                )
                new_stats = mutated["batch_stats"]
            else:
                preds = module.apply(
                    {"params": p}, batch["image1"], batch["image2"],
                    train=True, num_flow_updates=args.num_flow_updates,
                )
                new_stats = {}
            loss = sequence_loss(preds, batch["flow"], gamma=args.gamma)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.clip(g, -1.0, 1.0), grads
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats, opt_state=opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    @jax.jit
    def eval_step(state, batch):
        vars_in = {"params": state.params}
        if state.batch_stats:
            vars_in["batch_stats"] = state.batch_stats
        preds = module.apply(
            vars_in, batch["image1"], batch["image2"],
            train=False, num_flow_updates=args.num_flow_updates,
        )
        return epe_metrics(preds[-1], batch["flow"])

    for epoch in range(args.epochs):
        logger = utils.MetricLogger()
        if args.fake_data:
            steps = args.steps_per_epoch or 100
            train_iter = _fake_batches(args, steps, seed=epoch)
            eval_iter = _fake_batches(args, 1, seed=999)
        else:
            train_iter = _chairs_batches(args, "train", seed=epoch)
            eval_iter = _chairs_batches(args, "val")
        t0 = time.time()
        for batch in logger.log_every(
            train_iter, args.print_freq, f"Epoch [{epoch}]",
        ):
            state, loss = train_step(state, shard_batch(batch, mesh))
            logger.update(loss=float(loss))
        print(f"epoch {epoch} done in {time.time() - t0:.1f}s")

        for batch in eval_iter:
            m = eval_step(state, shard_batch(batch, mesh))
            print({k: float(v) for k, v in m.items()})
            break

    if args.output_dir:
        utils.save_checkpoint(
            os.path.join(args.output_dir, "checkpoint.msgpack"),
            {"params": jax.device_get(state.params)},
        )


def get_args_parser():
    p = argparse.ArgumentParser(description="vision_tpu optical flow (RAFT)")
    p.add_argument("--data-path", default="/data/flyingchairs", type=str)
    p.add_argument("--model", default="raft_large", type=str)
    p.add_argument("--batch-size", default=2, type=int)
    p.add_argument("--epochs", default=1, type=int)
    p.add_argument("--steps-per-epoch", default=None, type=int)
    p.add_argument("--lr", default=4e-4, type=float)
    p.add_argument("--weight-decay", default=1e-4, type=float)
    p.add_argument("--gamma", default=0.8, type=float)
    p.add_argument("--num-flow-updates", default=12, type=int)
    p.add_argument("--print-freq", default=10, type=int)
    p.add_argument("--output-dir", default=None, type=str)
    p.add_argument("--size", default=64, type=int)
    p.add_argument("--fake-data", action="store_true")
    p.add_argument(
        "--augment", action="store_true",
        help="full RAFT train preset (presets.py) on the real-data path",
    )
    return p


if __name__ == "__main__":
    main(get_args_parser().parse_args())
