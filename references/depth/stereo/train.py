"""Stereo-depth training CLI (reference ``references/depth/stereo/``:
RAFT-Stereo recipe — sequence loss over refinement iterations on the
disparity channel, D1/EPE metrics).

Stereo disparity is horizontal-only correspondence, so the recurrent
matcher is RAFT applied to a rectified pair with the vertical flow
channel constrained to zero (the reference's raft_stereo uses the same
RAFT machinery with a 1-D correlation volume).

Example (smoke run on fake data):
    python references/depth/stereo/train.py --fake-data --epochs 1 \
        --batch-size 8 --steps-per-epoch 1 --size 64
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "..", "classification")
)

import jax
import jax.numpy as jnp
import numpy as np
import optax

import utils
from vision_tpu.models import get_model
from vision_tpu.parallel import make_mesh, shard_batch
from vision_tpu.parallel.train import TrainState


def disparity_sequence_loss(flow_preds, disp_gt, valid_mask=None,
                            gamma: float = 0.9) -> jnp.ndarray:
    """reference stereo ``utils/losses.py`` sequence_loss on the x channel
    (disparity), gamma-weighted over iterations; the y channel is driven
    to zero."""
    n = len(flow_preds)
    total = 0.0
    valid = (
        valid_mask.astype(jnp.float32)
        if valid_mask is not None
        else jnp.ones(disp_gt.shape[:-1], jnp.float32)
    )
    denom = jnp.maximum(jnp.sum(valid), 1)
    for i, pred in enumerate(flow_preds):
        w = gamma ** (n - 1 - i)
        # disparity is leftward correspondence: gt_x = -disparity
        l1 = jnp.abs(pred[..., 0] + disp_gt[..., 0]) + jnp.abs(pred[..., 1])
        total = total + w * jnp.sum(l1 * valid) / denom
    return total


def d1_metrics(pred_flow, disp_gt, valid_mask=None):
    """EPE + D1-all (fraction of pixels off by >3px and >5%)."""
    pred_disp = -pred_flow[..., 0]
    err = jnp.abs(pred_disp - disp_gt[..., 0])
    valid = (
        valid_mask.astype(jnp.float32)
        if valid_mask is not None
        else jnp.ones(err.shape, jnp.float32)
    )
    denom = jnp.maximum(jnp.sum(valid), 1)
    bad = (err > 3.0) & (err > 0.05 * jnp.abs(disp_gt[..., 0]))
    return {
        "epe": jnp.sum(err * valid) / denom,
        "d1": jnp.sum(bad * valid) / denom,
    }


def _stereo_batches(args, split="train", seed=0):
    """Real-data path over the vision_tpu stereo datasets (--dataset
    kitti2015 | sceneflow | middlebury2014 | instereo2k): random crop to
    a fixed canvas with the validity mask carried through (Kitti
    disparities are sparse)."""
    from vision_tpu import datasets as D

    builders = {
        "kitti2015": lambda: D.Kitti2015Stereo(args.data_path, split=split),
        "sceneflow": lambda: D.SceneFlowStereo(args.data_path),
        "middlebury2014": lambda: D.Middlebury2014Stereo(
            args.data_path, split=split
        ),
        "instereo2k": lambda: D.InStereo2k(args.data_path, split=split),
    }
    ds = builders[args.dataset]()
    rng = np.random.RandomState(seed)
    order = (
        rng.permutation(len(ds)) if split == "train" else np.arange(len(ds))
    )
    s = args.size
    bl, br, bd, bv = [], [], [], []
    for idx in order:
        left, right, disp, valid = ds[int(idx)]
        if disp is None:
            continue
        left = np.asarray(left)
        h, w = left.shape[:2]
        if h < s or w < s:
            continue
        top = rng.randint(0, h - s + 1) if split == "train" else (h - s) // 2
        lft = rng.randint(0, w - s + 1) if split == "train" else (w - s) // 2
        sl = np.s_[top : top + s, lft : lft + s]
        bl.append(np.asarray(left, np.float32)[sl] / 127.5 - 1.0)
        br.append(np.asarray(right, np.float32)[sl] / 127.5 - 1.0)
        bd.append(np.asarray(disp, np.float32)[sl])
        bv.append(
            np.asarray(valid)[sl]
            if valid is not None
            else np.ones((s, s), bool)
        )
        if len(bl) == args.batch_size:
            yield {
                "left": np.stack(bl),
                "right": np.stack(br),
                "disparity": np.stack(bd),
                "valid": np.stack(bv),
            }
            bl, br, bd, bv = [], [], [], []


def _fake_batches(args, steps, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        yield {
            "left": rng.rand(args.batch_size, args.size, args.size, 3)
            .astype(np.float32),
            "right": rng.rand(args.batch_size, args.size, args.size, 3)
            .astype(np.float32),
            "disparity": np.abs(
                rng.randn(args.batch_size, args.size, args.size, 1)
            ).astype(np.float32),
            "valid": np.ones(
                (args.batch_size, args.size, args.size), bool
            ),
        }


def main(args):
    print(args)
    model = get_model(args.model)
    module = model.module
    params = dict(model.variables)["params"]
    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    state = TrainState(
        params=params, batch_stats={}, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    mesh = make_mesh()

    @jax.jit
    def train_step(state, batch):
        def loss_fn(p):
            preds = module.apply(
                {"params": p}, batch["left"], batch["right"], train=True,
                num_flow_updates=args.num_flow_updates,
            )
            return disparity_sequence_loss(
                preds, batch["disparity"], valid_mask=batch.get("valid"),
                gamma=args.gamma,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                params=optax.apply_updates(state.params, updates),
                batch_stats={}, opt_state=opt_state, step=state.step + 1,
            ),
            loss,
        )

    @jax.jit
    def eval_step(state, batch):
        preds = module.apply(
            {"params": state.params}, batch["left"], batch["right"],
            train=False, num_flow_updates=args.num_flow_updates,
        )
        return d1_metrics(
            preds[-1], batch["disparity"], valid_mask=batch.get("valid")
        )

    for epoch in range(args.epochs):
        logger = utils.MetricLogger()
        steps = args.steps_per_epoch or 100
        if args.fake_data:
            train_iter = _fake_batches(args, steps, seed=epoch)
            eval_iter = _fake_batches(args, 1, seed=999)
        else:
            train_iter = _stereo_batches(args, "train", seed=epoch)
            eval_iter = _stereo_batches(args, "train", seed=999)
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
    p = argparse.ArgumentParser(description="vision_tpu stereo depth (RAFT)")
    p.add_argument("--dataset", default="kitti2015", type=str,
                   choices=["kitti2015", "sceneflow", "middlebury2014",
                            "instereo2k"])
    p.add_argument("--data-path", default="/data/sceneflow", type=str)
    p.add_argument("--model", default="raft_small", type=str)
    p.add_argument("--batch-size", default=2, type=int)
    p.add_argument("--epochs", default=1, type=int)
    p.add_argument("--steps-per-epoch", default=None, type=int)
    p.add_argument("--lr", default=4e-4, type=float)
    p.add_argument("--weight-decay", default=1e-4, type=float)
    p.add_argument("--gamma", default=0.9, type=float)
    p.add_argument("--num-flow-updates", default=10, type=int)
    p.add_argument("--print-freq", default=10, type=int)
    p.add_argument("--output-dir", default=None, type=str)
    p.add_argument("--size", default=64, type=int)
    p.add_argument("--fake-data", action="store_true")
    return p


if __name__ == "__main__":
    main(get_args_parser().parse_args())
