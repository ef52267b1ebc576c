"""Semantic-segmentation training CLI (reference
``references/segmentation/train.py``: criterion with 0.5-weighted aux
loss, poly LR schedule with power 0.9, ConfusionMatrix mIoU evaluation).

TPU shape: one jitted train step over a ``data``-axis Mesh; the confusion
matrix is accumulated on-device as a (C, C) bincount matmul and fetched
once per evaluation.

Example (smoke run on fake data):
    python references/segmentation/train.py --model fcn_resnet50 \
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

import utils  # references/classification/utils.py (MetricLogger etc.)
from vision_tpu.models import get_model
from vision_tpu.parallel import make_mesh, replicate, shard_batch
from vision_tpu.parallel.train import TrainState


def criterion(outputs: dict, target: jnp.ndarray, num_classes: int,
              ignore_index: int = 255) -> jnp.ndarray:
    """reference ``train.py`` criterion: CE on 'out' + 0.5 * CE on 'aux',
    ignore_index=255."""
    losses = {}
    for name, logits in outputs.items():
        valid = target != ignore_index
        tgt = jnp.where(valid, target, 0)
        one_hot = jax.nn.one_hot(tgt, num_classes)
        ce = -jnp.sum(one_hot * jax.nn.log_softmax(logits, axis=-1), axis=-1)
        losses[name] = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)
    if "aux" in losses:
        return losses["out"] + 0.5 * losses["aux"]
    return losses["out"]


class ConfusionMatrix:
    """reference ``utils.py`` ConfusionMatrix: (C, C) histogram of
    (gt, pred); computes global acc, per-class acc, per-class IoU."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.mat = np.zeros((num_classes, num_classes), np.int64)

    def update(self, target: np.ndarray, pred: np.ndarray):
        t = np.asarray(target).reshape(-1)
        p = np.asarray(pred).reshape(-1)
        k = (t >= 0) & (t < self.num_classes)
        inds = self.num_classes * t[k].astype(np.int64) + p[k]
        self.mat += np.bincount(
            inds, minlength=self.num_classes**2
        ).reshape(self.num_classes, self.num_classes)

    def compute(self):
        h = self.mat.astype(np.float64)
        acc_global = np.diag(h).sum() / np.maximum(h.sum(), 1)
        acc = np.diag(h) / np.maximum(h.sum(1), 1)
        iou = np.diag(h) / np.maximum(h.sum(1) + h.sum(0) - np.diag(h), 1)
        return acc_global, acc, iou

    def __str__(self):
        acc_global, acc, iou = self.compute()
        return (
            f"global correct: {acc_global * 100:.1f}\n"
            f"mean IoU: {np.nanmean(iou) * 100:.1f}"
        )


def poly_lr_schedule(base_lr: float, total_steps: int, power: float = 0.9,
                     warmup_iters: int = 0, warmup_decay: float = 0.01,
                     warmup_method: str = "linear"):
    """reference ``train.py``: SequentialLR(warmup, PolynomialLR) — the
    LinearLR/ConstantLR warmup runs FIRST (pure ramp, no decay applied),
    then PolynomialLR decays over the remaining
    ``total_steps - warmup_iters`` iterations (the reference builds the
    main scheduler with ``iters_per_epoch * (epochs - lr_warmup_epochs)``
    total iters and switches at the warmup milestone)."""

    def schedule(step):
        decay_steps = max(total_steps - warmup_iters, 1)
        frac = jnp.clip((step - warmup_iters) / decay_steps, 0.0, 1.0)
        lr = base_lr * (1.0 - frac) ** power
        if warmup_iters > 0:
            if warmup_method == "constant":
                wf = jnp.asarray(warmup_decay, jnp.float32)
            else:
                wf = warmup_decay + (1.0 - warmup_decay) * jnp.minimum(
                    step / max(warmup_iters, 1), 1.0
                )
            lr = jnp.where(step < warmup_iters, base_lr * wf, lr)
        return lr

    return schedule


def _fake_batches(args, num_classes, steps, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        yield {
            "image": rng.rand(
                args.batch_size, args.size, args.size, 3
            ).astype(np.float32),
            "target": rng.randint(
                0, num_classes, (args.batch_size, args.size, args.size)
            ).astype(np.int32),
        }


_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _voc_sample(img, mask, size, train, rng):
    """Fixed-canvas preprocessing (static shapes for jit): random-resize +
    crop/pad to size x size for training, resize for eval; normalize."""
    from vision_tpu.transforms.v2 import functional as TF

    h, w = img.shape[:2]
    if train:
        scale = rng.uniform(0.5, 2.0) * size / min(h, w)
    else:
        scale = size / min(h, w)
    nh, nw = max(int(h * scale), size), max(int(w * scale), size)
    img = np.asarray(TF.resize(img, (nh, nw)))
    mask = np.asarray(TF.resize(mask[..., None], (nh, nw),
                                interpolation="nearest"))[..., 0]
    top = rng.randint(0, nh - size + 1) if train else (nh - size) // 2
    left = rng.randint(0, nw - size + 1) if train else (nw - size) // 2
    img = img[top : top + size, left : left + size]
    mask = mask[top : top + size, left : left + size]
    if train and rng.rand() < 0.5:
        img, mask = img[:, ::-1], mask[:, ::-1]
    img = (img.astype(np.float32) / 255.0 - _MEAN) / _STD
    return img, mask.astype(np.int32)


def _load_local(name):
    """Load a sibling module by path (sys.path has ../classification
    first for utils, whose presets.py would shadow ours)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"_segmentation_{name}",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     f"{name}.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _voc_batches(args, split, train, seed=0):
    """Real-data path over vision_tpu.datasets.VOCSegmentation. Training
    uses presets.SegmentationPresetTrain (random-resize, hflip,
    pad-if-smaller with 255-ignore, crop); eval keeps the fixed square
    canvas of _voc_sample (static eval shapes)."""
    from vision_tpu.datasets import VOCSegmentation

    ds = VOCSegmentation(args.data_path, image_set=split)
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(ds)) if train else np.arange(len(ds))
    preset = (
        _load_local("presets").SegmentationPresetTrain(
            base_size=args.size, crop_size=args.size
        )
        if train
        else None
    )
    batch_imgs, batch_masks = [], []
    for idx in order:
        img, mask = ds[int(idx)]
        if preset is not None:
            img, mask = preset(np.asarray(img), np.asarray(mask), rng)
        else:
            img, mask = _voc_sample(
                np.asarray(img), np.asarray(mask), args.size, train, rng
            )
        batch_imgs.append(img)
        batch_masks.append(mask)
        if len(batch_imgs) == args.batch_size:
            yield {
                "image": np.stack(batch_imgs),
                "target": np.stack(batch_masks),
            }
            batch_imgs, batch_masks = [], []


def main(args):
    print(args)
    num_classes = args.num_classes
    if args.weights:
        kwargs = {"weights": args.weights}
    else:
        kwargs = {"num_classes": num_classes}
        if "lraspp" not in args.model:  # lraspp has no aux head
            kwargs["aux_loss"] = args.aux_loss
    model = get_model(args.model, **kwargs)
    module = model.module
    variables = dict(model.variables)
    params = variables.pop("params")
    batch_stats = variables.pop("batch_stats", {})

    steps_total = (args.steps_per_epoch or 100) * args.epochs
    lr = poly_lr_schedule(
        args.lr, steps_total,
        warmup_iters=args.lr_warmup_epochs * (args.steps_per_epoch or 100),
        warmup_decay=args.lr_warmup_decay,
        warmup_method=args.lr_warmup_method,
    )
    tx = optax.sgd(lr, momentum=args.momentum)
    if args.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(args.weight_decay), tx)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    mesh = make_mesh()
    state = replicate(state, mesh)

    base_key = jax.random.PRNGKey(args.seed)

    def amp_cast(tree):
        # --amp: bf16 compute, f32 master state (reference --amp,
        # segmentation/train.py:320)
        if not args.amp:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    @jax.jit
    def train_step(state, batch):
        step_key = jax.random.fold_in(base_key, state.step)

        def loss_fn(p):
            outputs, mutated = module.apply(
                {
                    "params": amp_cast(p),
                    # f32 carry: casting would re-quantize the running
                    # averages every step (torch AMP keeps BN state f32)
                    "batch_stats": state.batch_stats,
                },
                amp_cast(batch["image"]), train=True,
                mutable=["batch_stats"],
                rngs={"dropout": step_key},
            )
            outputs = jax.tree_util.tree_map(
                lambda o: o.astype(jnp.float32), outputs
            )
            loss = criterion(outputs, batch["target"], num_classes)
            new_bs = jax.tree_util.tree_map(
                lambda n, o: n.astype(o.dtype),
                mutated["batch_stats"],
                state.batch_stats,
            )
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_bs,
                opt_state=opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    @jax.jit
    def eval_step(state, batch):
        outputs = module.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=False,
        )
        return jnp.argmax(outputs["out"], axis=-1)

    start_epoch = args.start_epoch
    if args.resume:
        # optimizer state (momentum + the step count the warmup/poly
        # schedule reads) resumes too; older checkpoints without it fall
        # back to fresh opt_state (reference train.py:341-351 semantics).
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "epoch": 0,
        }
        has_opt = "opt_state" in utils.checkpoint_keys(args.resume)
        if has_opt:
            template["opt_state"] = state.opt_state
            template["step"] = state.step
        restored = utils.load_checkpoint(args.resume, template)
        state = TrainState(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"] if has_opt else state.opt_state,
            step=restored["step"] if has_opt else state.step,
        )
        start_epoch = int(restored["epoch"]) + 1

    if args.test_only:
        confmat = ConfusionMatrix(num_classes)
        eval_iter = (
            _fake_batches(args, num_classes, 2, seed=999)
            if args.fake_data
            else _voc_batches(args, "val", False)
        )
        for batch in eval_iter:
            batch = shard_batch(batch, mesh)
            pred = eval_step(state, batch)
            confmat.update(batch["target"], np.asarray(pred))
        print(confmat)
        return

    for epoch in range(start_epoch, args.epochs):
        logger = utils.MetricLogger()
        if args.fake_data:
            steps = args.steps_per_epoch or 100
            train_iter = _fake_batches(args, num_classes, steps, seed=epoch)
            eval_iter = _fake_batches(args, num_classes, 2, seed=999)
        else:
            train_iter = _voc_batches(args, "train", True, seed=epoch)
            eval_iter = _voc_batches(args, "val", False)
        t0 = time.time()
        for batch in logger.log_every(
            train_iter, args.print_freq, f"Epoch [{epoch}]",
        ):
            batch = shard_batch(batch, mesh)
            state, loss = train_step(state, batch)
            logger.update(loss=float(loss))
        print(f"epoch {epoch} done in {time.time() - t0:.1f}s")

        confmat = ConfusionMatrix(num_classes)
        for batch in eval_iter:
            batch = shard_batch(batch, mesh)
            pred = eval_step(state, batch)
            confmat.update(batch["target"], np.asarray(pred))
        print(confmat)

        if args.output_dir:
            utils.save_checkpoint(
                os.path.join(args.output_dir, f"checkpoint_{epoch}"),
                {
                    "params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats),
                    "opt_state": jax.device_get(state.opt_state),
                    "step": jax.device_get(state.step),
                    "epoch": epoch,
                },
            )
            print(f"saved checkpoint_{epoch} to {args.output_dir}")


def get_args_parser():
    p = argparse.ArgumentParser(description="vision_tpu segmentation training")
    p.add_argument("--data-path", default="/data/voc", type=str)
    p.add_argument("--model", default="fcn_resnet50", type=str)
    p.add_argument("--num-classes", default=21, type=int)
    p.add_argument("--aux-loss", action="store_true", default=True)
    p.add_argument(
        "--amp", action="store_true",
        help="bf16 compute with f32 master weights (reference --amp)",
    )
    p.add_argument("--batch-size", default=8, type=int)
    p.add_argument("--epochs", default=30, type=int)
    p.add_argument("--steps-per-epoch", default=None, type=int)
    p.add_argument("--lr", default=0.01, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument(
        "--weight-decay", "--wd", dest="weight_decay", default=1e-4,
        type=float,
    )
    p.add_argument("--lr-warmup-epochs", default=0, type=int)
    p.add_argument(
        "--lr-warmup-method", default="linear", type=str,
        choices=("linear", "constant"),
    )
    p.add_argument("--lr-warmup-decay", default=0.01, type=float)
    p.add_argument("--resume", default="", type=str)
    p.add_argument("--start-epoch", default=0, type=int)
    p.add_argument(
        "--test-only", action="store_true",
        help="evaluate mIoU of the (resumed) model and exit",
    )
    p.add_argument(
        "--weights", default=None, type=str,
        help="weights enum name to start from",
    )
    p.add_argument(
        "--use-deterministic-algorithms", action="store_true",
        help="no-op: XLA on TPU is deterministic by default",
    )
    p.add_argument("--print-freq", default=10, type=int)
    p.add_argument("--output-dir", default=None, type=str)
    p.add_argument("--size", default=480, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--fake-data", action="store_true")
    return p


if __name__ == "__main__":
    main(get_args_parser().parse_args())
