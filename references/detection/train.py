"""Detection training CLI (reference ``references/detection/train.py``:
argparse main around engine.train_one_epoch/evaluate with warmup LR,
aspect-ratio-free fixed-canvas batching).

Batches are static-shape: images padded to one canvas, GT padded to
``--max-boxes`` with a valid mask — the whole step jits once.

Example (smoke run on fake data):
    python references/detection/train.py --model retinanet_resnet50_fpn \
        --fake-data --epochs 1 --batch-size 2 --steps-per-epoch 2 --size 64
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "classification"))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import utils
from engine import make_detection_train_step, train_one_epoch
from vision_tpu.models import get_model


def warmup_schedule(base_lr: float, warmup_iters: int = 1000,
                    warmup_factor: float = 1.0 / 1000):
    """reference ``engine.py:12``: linear warmup over the first epoch."""

    def schedule(step):
        frac = jnp.minimum(step / max(warmup_iters, 1), 1.0)
        return base_lr * (warmup_factor * (1 - frac) + frac)

    return schedule


def _coco_batches(args, ann_file, img_dir, train=True, seed=0):
    """Real-data path over vision_tpu.datasets.CocoDetection: resize the
    longer side to the fixed canvas, pad, scale boxes, pad GT to
    ``--max-boxes`` with a valid mask (static shapes for jit)."""
    from vision_tpu.datasets import CocoDetection
    from vision_tpu.transforms.v2 import functional as TF

    ds = CocoDetection(img_dir, ann_file)
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(ds)) if train else np.arange(len(ds))
    s, g = args.size, args.max_boxes
    imgs, boxes_l, labels_l, valid_l = [], [], [], []
    for idx in order:
        img, annos = ds[int(idx)]
        img = np.asarray(img)
        h, w = img.shape[:2]
        scale = s / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        img = np.asarray(TF.resize(img, (nh, nw))).astype(np.float32) / 255.0
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = img
        if train and rng.rand() < 0.5:
            canvas = canvas[:, ::-1].copy()
            flip = True
        else:
            flip = False
        boxes = np.zeros((g, 4), np.float32)
        labels = np.zeros((g,), np.int32)
        valid = np.zeros((g,), bool)
        for j, a in enumerate(annos[:g]):
            x, y, bw, bh = a["bbox"]
            x1, y1 = x * scale, y * scale
            x2, y2 = (x + bw) * scale, (y + bh) * scale
            if flip:
                x1, x2 = nw - x2, nw - x1
            if x2 > x1 + 1 and y2 > y1 + 1:
                boxes[j] = [x1, y1, x2, y2]
                labels[j] = a["category_id"]
                valid[j] = True
        imgs.append(canvas)
        boxes_l.append(boxes)
        labels_l.append(labels)
        valid_l.append(valid)
        if len(imgs) == args.batch_size:
            yield {
                "image": np.stack(imgs),
                "boxes": np.stack(boxes_l),
                "labels": np.stack(labels_l),
                "valid": np.stack(valid_l),
            }
            imgs, boxes_l, labels_l, valid_l = [], [], [], []


def _fake_batches(args, steps, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        n, g, s = args.batch_size, args.max_boxes, args.size
        x1 = rng.uniform(0, s / 2, (n, g, 1))
        y1 = rng.uniform(0, s / 2, (n, g, 1))
        bw = rng.uniform(4, s / 2, (n, g, 1))
        bh = rng.uniform(4, s / 2, (n, g, 1))
        yield {
            "image": rng.rand(n, s, s, 3).astype(np.float32),
            "boxes": np.concatenate(
                [x1, y1, np.minimum(x1 + bw, s), np.minimum(y1 + bh, s)], -1
            ).astype(np.float32),
            "labels": rng.randint(1, args.num_classes, (n, g)).astype(np.int32),
            "valid": (rng.rand(n, g) < 0.7),
        }


def main(args):
    print(args)
    model = get_model(args.model, num_classes=args.num_classes)
    module = model.module
    params = dict(model.variables)["params"]

    lr = warmup_schedule(args.lr, warmup_iters=args.warmup_iters)
    tx = optax.chain(
        optax.add_decayed_weights(args.weight_decay),
        optax.sgd(lr, momentum=args.momentum),
    )
    opt_state = tx.init(params)
    one_stage = any(s in args.model for s in ("retinanet", "ssd", "fcos"))
    step_fn = make_detection_train_step(
        module, tx, one_stage=one_stage, variables=model.variables
    )

    key = jax.random.PRNGKey(args.seed)
    for epoch in range(args.epochs):
        if args.fake_data:
            steps = args.steps_per_epoch or 100
            train_iter = _fake_batches(args, steps, seed=epoch)
        else:
            train_iter = _coco_batches(
                args,
                os.path.join(
                    args.data_path, "annotations", "instances_train2017.json"
                ),
                os.path.join(args.data_path, "train2017"),
                train=True, seed=epoch,
            )
        t0 = time.time()
        params, opt_state, key = train_one_epoch(
            step_fn, params, opt_state, train_iter, key, epoch,
            print_freq=args.print_freq,
        )
        print(f"epoch {epoch} done in {time.time() - t0:.1f}s")

    if args.output_dir:
        utils.save_checkpoint(
            os.path.join(args.output_dir, "checkpoint.msgpack"),
            {"params": jax.device_get(params)},
        )


def get_args_parser():
    p = argparse.ArgumentParser(description="vision_tpu detection training")
    p.add_argument("--data-path", default="/data/coco", type=str)
    p.add_argument("--model", default="retinanet_resnet50_fpn", type=str)
    p.add_argument("--num-classes", default=91, type=int)
    p.add_argument("--batch-size", default=2, type=int)
    p.add_argument("--max-boxes", default=32, type=int)
    p.add_argument("--epochs", default=26, type=int)
    p.add_argument("--steps-per-epoch", default=None, type=int)
    p.add_argument("--lr", default=0.02, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--weight-decay", default=1e-4, type=float)
    p.add_argument("--warmup-iters", default=1000, type=int)
    p.add_argument("--print-freq", default=20, type=int)
    p.add_argument("--output-dir", default=None, type=str)
    p.add_argument("--size", default=640, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--fake-data", action="store_true")
    return p


if __name__ == "__main__":
    main(get_args_parser().parse_args())
