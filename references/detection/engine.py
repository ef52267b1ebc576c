"""Detection train/eval engine (reference
``references/detection/engine.py``: train_one_epoch :12, evaluate :76)."""

from __future__ import annotations

import math
import os
import sys
from typing import Dict, Optional

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "classification")
)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import utils  # classification/utils.py (MetricLogger etc.)
from coco_eval import CocoEvaluator


def make_detection_train_step(module, tx, loss_weights: Optional[Dict] = None,
                              one_stage: bool = False, variables=None,
                              compute_dtype=None):
    """jit'ed train step over detection ``compute_loss`` modules.
    Batch: {"image": [N,H,W,C], "boxes": [N,G,4], "labels": [N,G],
    "valid": [N,G]}.

    ``compute_dtype=jnp.bfloat16`` is the --amp path: params/stats/images
    cast at the step boundary (backbone+head convs run bf16) while gt
    boxes/labels/targets stay f32, so all box-coordinate math promotes to
    f32 — the reference's autocast policy, which registers f32 casts for
    the roi ops (csrc/ops/autocast/) while convs run fp16. Master params,
    optimizer state and BN running stats stay f32.

    Two conventions (matching the model families):
    * two-stage (Faster/Mask/Keypoint R-CNN): ``compute_loss(images,
      gt_boxes, gt_labels, gt_valid, key)`` runs the whole path (RPN
      sampling needs the key). When the batch carries "masks"
      ([N, G, H, W]) or "keypoints" ([N, G, K, 3]) they are forwarded so
      the mask/keypoint branch losses train too.
    * one-stage (RetinaNet/SSD/FCOS, ``one_stage=True``): forward first
      (raw head outputs + anchors), then ``compute_loss(*outputs,
      gt_boxes, gt_labels, gt_valid)``."""

    # non-trainable collections. FrozenBatchNorm buffers live in
    # "constants" and are never updated; live BatchNorm backbones
    # (SSDLite's MobileNetV3) carry "batch_stats", which the production
    # train step must update (reference trains BN: ``train.py:model.train()``)
    # — so batch_stats is threaded through the step as mutable state.
    extra = {
        k: v for k, v in (variables or {}).items() if k != "params"
    }
    has_bs = "batch_stats" in extra

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

    def step(params, extra, opt_state, batch, key):
        def loss_fn(p):
            mut = {}
            p = cast(p)
            # batch_stats stay f32: casting the carried running averages
            # would re-quantize them to bf16 every step (torch AMP keeps
            # BN state in f32); train-mode normalization uses the batch
            # statistics, so compute speed is unaffected
            ex = cast({k: v for k, v in extra.items() if k != "batch_stats"})
            if has_bs:
                ex["batch_stats"] = extra["batch_stats"]
            img = cast(batch["image"])
            if one_stage:
                if has_bs:
                    outputs, mut = module.apply(
                        {"params": p, **ex}, img, train=True,
                        mutable=["batch_stats"],
                    )
                else:
                    outputs = module.apply(
                        {"params": p, **ex}, img, train=True
                    )
                losses = module.apply(
                    {"params": p, **ex},
                    *outputs,
                    batch["boxes"],
                    batch["labels"],
                    batch["valid"],
                    method="compute_loss",
                )
            else:
                kw = {}
                if "masks" in batch:
                    kw["gt_masks"] = batch["masks"]
                if "keypoints" in batch:
                    kw["gt_keypoints"] = batch["keypoints"]
                out = module.apply(
                    {"params": p, **ex},
                    img,
                    batch["boxes"],
                    batch["labels"],
                    batch["valid"],
                    key,
                    method="compute_loss",
                    mutable=["batch_stats"] if has_bs else False,
                    **kw,
                )
                losses, mut = out if has_bs else (out, {})
            total = sum(
                v.astype(jnp.float32) for v in losses.values()
            )
            return total, (losses, mut)

        (total, (losses, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if has_bs:
            new_bs = mut["batch_stats"]
            if compute_dtype is not None:
                # master stats keep the f32 state dtype
                new_bs = jax.tree_util.tree_map(
                    lambda n, o: n.astype(o.dtype),
                    new_bs,
                    extra["batch_stats"],
                )
            extra = {**extra, "batch_stats": new_bs}
        return params, extra, opt_state, total, losses

    return jax.jit(step, donate_argnums=(0, 1, 2)), extra


def train_one_epoch(
    step_fn, params, extra, opt_state, data_loader, key, epoch,
    print_freq=10,
):
    """reference ``engine.py:12`` (the lr warmup lives in the optax
    schedule)."""
    logger = utils.MetricLogger()
    header = f"Epoch: [{epoch}]"
    for batch in logger.log_every(data_loader, print_freq, header):
        key, sub = jax.random.split(key)
        params, extra, opt_state, total, losses = step_fn(
            params, extra, opt_state, batch, sub
        )
        loss_value = float(total)
        if not math.isfinite(loss_value):
            print(f"Loss is {loss_value}, stopping training")
            sys.exit(1)
        logger.update(loss=loss_value, **{k: float(v) for k, v in losses.items()})
    return params, extra, opt_state, key


def evaluate_detection(model, data_loader, ground_truths, postprocess=None):
    """reference ``engine.py:76``: run the jitted eval path per batch,
    accumulate into CocoEvaluator, summarize mAP."""
    evaluator = CocoEvaluator(ground_truths)
    logger = utils.MetricLogger()
    for img_ids, batch, image_sizes, original_sizes in logger.log_every(
        data_loader, 10, "Test:"
    ):
        dets = model(batch)
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        labels = np.asarray(dets.labels)
        valid = np.asarray(dets.valid)
        preds = {}
        for i, img_id in enumerate(img_ids):
            keep = valid[i]
            b = boxes[i][keep]
            if postprocess is not None:
                b = postprocess(b, image_sizes[i], original_sizes[i])
            preds[img_id] = {
                "boxes": b,
                "scores": scores[i][keep],
                "labels": labels[i][keep],
            }
        evaluator.update(preds)
    return evaluator.summarize()
