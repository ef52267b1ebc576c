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


def epoch_lr(args, epoch: int) -> float:
    """Per-epoch LR (the reference steps MultiStepLR / CosineAnnealingLR
    once per EPOCH, detection/train.py:252-260); the per-step warmup factor
    is composed separately inside the optimizer."""
    if args.lr_scheduler == "multisteplr":
        return args.lr * args.lr_gamma ** sum(
            epoch >= m for m in args.lr_steps
        )
    if args.lr_scheduler == "cosineannealinglr":
        import math

        return args.lr * 0.5 * (1.0 + math.cos(math.pi * epoch / args.epochs))
    raise ValueError(f"unknown scheduler {args.lr_scheduler}")


_BACKBONE_LAYER_ORDER = ("layer4", "layer3", "layer2", "layer1", "conv1")


def make_tx(args, params):
    """Detection optimizer with the reference's full recipe surface:
    sgd/adamw, --norm-weight-decay, per-step linear warmup (engine.py:12),
    per-epoch LR decay via an injected hyperparam (set by ``epoch_lr``),
    and --trainable-backbone-layers freezing (the reference's
    requires_grad_(False), here an update mask — backbone_utils.py
    _validate_trainable_layers)."""

    def norm_mask(want_norm):
        def mask(params):
            def walk(d):
                return {
                    k: (walk(v) if isinstance(v, dict) else
                        (("scale" in d) == want_norm))
                    for k, v in d.items()
                }

            return walk(params)

        return mask

    def frozen_mask(params):
        # freeze body modules outside the last N stages; FPN/heads always
        # train. Body keys are "conv1" / "layerN.M" (BN buffers live in
        # the frozen "constants" collection already).
        n = args.trainable_backbone_layers
        train_layers = set(_BACKBONE_LAYER_ORDER[:n])

        def fill(d, value):
            return {
                k: (fill(v, value) if isinstance(v, dict) else value)
                for k, v in d.items()
            }

        out = fill(params, False)
        body = params.get("backbone", {}).get("body", None)
        if body is not None:
            out["backbone"]["body"] = {
                k: fill(v, k.split(".")[0] not in train_layers)
                for k, v in body.items()
            }
        return out

    def factory(learning_rate):
        wd = args.weight_decay
        nwd = args.norm_weight_decay
        if nwd is None or nwd == wd:
            decays = [optax.add_decayed_weights(wd)] if wd else []
        else:
            decays = [
                optax.add_decayed_weights(wd, mask=norm_mask(False)),
            ]
            if nwd:
                decays.append(
                    optax.add_decayed_weights(nwd, mask=norm_mask(True))
                )
        if args.opt == "sgd":
            opt = optax.sgd(learning_rate, momentum=args.momentum)
            parts = [*decays, opt]
        elif args.opt == "adamw":
            parts = [
                optax.scale_by_adam(),
                *decays,
                optax.scale_by_learning_rate(learning_rate),
            ]
        else:
            raise ValueError(f"unknown optimizer {args.opt}")
        # per-step warmup factor (reference LinearLR over warmup_iters)
        parts.append(
            optax.scale_by_schedule(
                lambda step: (
                    1.0 / 1000
                    + (1.0 - 1.0 / 1000)
                    * jnp.minimum(step / max(args.warmup_iters, 1), 1.0)
                )
            )
        )
        if args.trainable_backbone_layers is not None:
            parts.append(optax.masked(optax.set_to_zero(), frozen_mask))
        return optax.chain(*parts)

    tx = optax.inject_hyperparams(factory)(learning_rate=args.lr)
    return tx


def set_epoch_lr(opt_state, lr: float):
    """Host-side per-epoch LR assignment on the injected hyperparam."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def _coco_batches(args, ann_file, img_dir, train=True, seed=0):
    """Real-data path over vision_tpu.datasets.CocoDetection with
    aspect-ratio grouped batching (reference
    ``references/detection/group_by_aspect_ratio.py``): each group maps to
    ONE static canvas shape so the jitted step compiles once per group.
    Augmentation comes from ``presets.DetectionPresetTrain``; GT is padded
    to ``--max-boxes`` with a valid mask (static shapes for jit)."""
    # load detection-local modules by path: the bare name "presets" may
    # already be bound to classification/presets.py in sys.modules
    import importlib.util

    def _load_local(name):
        spec = importlib.util.spec_from_file_location(
            f"_detection_{name}",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), f"{name}.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    gba = _load_local("group_by_aspect_ratio")
    det_presets = _load_local("presets")
    coco_utils = _load_local("coco_utils")
    with_masks = getattr(args, "with_masks", False)
    with_keypoints = getattr(args, "with_keypoints", False)
    convert = coco_utils.ConvertCocoPolysToMask(with_masks=with_masks)
    GroupedBatchSampler = gba.GroupedBatchSampler
    create_aspect_ratio_groups = gba.create_aspect_ratio_groups
    group_canvas_sizes = gba.group_canvas_sizes
    DetectionPresetTrain = det_presets.DetectionPresetTrain
    DetectionPresetEval = det_presets.DetectionPresetEval

    from vision_tpu import tv_tensors
    from vision_tpu.datasets import CocoDetection
    from vision_tpu.transforms.v2 import functional as TF

    ds = CocoDetection(img_dir, ann_file)
    rng = np.random.RandomState(seed)
    order = (rng.permutation(len(ds)) if train else np.arange(len(ds))).tolist()
    k = args.aspect_ratio_group_factor if train else 0
    if k > 0:
        group_ids = create_aspect_ratio_groups(ds, k=k)
        canvases = group_canvas_sizes(
            k, short_side=args.size,
            long_side=int(round(args.size * 1333 / 800)),
        )
        batches = iter(GroupedBatchSampler(order, group_ids, args.batch_size))
    else:
        group_ids = None
        canvases = None
        batches = (
            order[i : i + args.batch_size]
            for i in range(0, len(order) - args.batch_size + 1, args.batch_size)
        )
    preset = (
        DetectionPresetTrain(
            data_augmentation=args.data_augmentation,
            # hflip must swap chiral COCO joints, not just mirror x
            keypoint_flip_indices=(
                det_presets.COCO_PERSON_KEYPOINT_FLIP_INDICES
                if with_keypoints
                else None
            ),
        )
        if train
        else DetectionPresetEval()
    )
    key = jax.random.PRNGKey(seed)
    g = args.max_boxes
    for batch_indices in batches:
        ch, cw = (
            canvases[group_ids[batch_indices[0]]]
            if canvases is not None
            else (args.size, args.size)
        )
        imgs, boxes_l, labels_l, valid_l = [], [], [], []
        masks_l, kps_l = [], []
        for idx in batch_indices:
            img, annos = ds[int(idx)]
            img = np.asarray(img)
            h, w = img.shape[:2]
            # coco_utils converter: crowd filter, xywh->xyxy, clamp to
            # canvas, degenerate-box drop (reference coco_utils.py:28)
            _, t = convert(
                img, {"image_id": int(idx), "annotations": annos}
            )
            scale = min(ch / h, cw / w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            img = np.asarray(TF.resize(img, (nh, nw)))
            canvas = np.zeros((ch, cw, 3), img.dtype)
            canvas[:nh, :nw] = img
            raw_boxes = (t["boxes"][:g] * scale).tolist()
            raw_labels = t["labels"][:g].tolist()
            n_gt = len(raw_boxes)
            target_dict = {
                "boxes": tv_tensors.BoundingBoxes(
                    np.asarray(raw_boxes, np.float32).reshape(-1, 4),
                    format="XYXY", canvas_size=(ch, cw),
                ),
                "labels": np.asarray(raw_labels, np.int64),
            }
            if with_masks:
                # gt masks resized with the image and placed on the same
                # canvas, then through the preset as tv_tensors.Mask so
                # geometry (flips/crops) stays aligned with the boxes
                mk = np.zeros((n_gt, ch, cw), np.float32)
                for mi in range(n_gt):
                    mm = np.asarray(
                        TF.resize(
                            t["masks"][mi][..., None].astype(np.uint8),
                            (nh, nw), interpolation="nearest",
                        )
                    )[..., 0]
                    mk[mi, :nh, :nw] = mm
                target_dict["masks"] = tv_tensors.Mask(mk)
            if with_keypoints:
                if "keypoints" not in t:
                    raise ValueError(
                        "--with-keypoints needs a keypoint annotation "
                        "file (person_keypoints_*.json)"
                    )
                kp = np.asarray(t["keypoints"][:g], np.float32)
                # visibility rides as channel 2 of the KeyPoints tensor so
                # SanitizeBoundingBoxes row-drops and the keypoint-aware
                # hflip (left/right joint swap) keep it aligned with the
                # coordinates (advisor r2: indexing a pre-preset vis array
                # with post-preset rows corrupted supervision)
                target_dict["keypoints"] = tv_tensors.KeyPoints(
                    np.concatenate([kp[..., :2] * scale, kp[..., 2:3]], -1),
                    canvas_size=(ch, cw),
                )
            key, sub = jax.random.split(key)
            img_t, target = preset(
                (tv_tensors.Image(canvas), target_dict), key=sub
            )
            out_boxes = np.asarray(target["boxes"].data, np.float32)
            out_labels = np.asarray(target["labels"])
            boxes = np.zeros((g, 4), np.float32)
            labels = np.zeros((g,), np.int32)
            valid = np.zeros((g,), bool)
            keepable = (
                (out_boxes[:, 2] > out_boxes[:, 0] + 1)
                & (out_boxes[:, 3] > out_boxes[:, 1] + 1)
            )
            sel = np.nonzero(keepable)[0][:g]
            boxes[: len(sel)] = out_boxes[sel]
            labels[: len(sel)] = out_labels[sel]
            valid[: len(sel)] = True
            arr = np.asarray(img_t.data, np.float32)
            imgs.append(arr)
            boxes_l.append(boxes)
            labels_l.append(labels)
            valid_l.append(valid)
            if with_masks:
                om = np.asarray(target["masks"].data, np.float32)
                pad_m = np.zeros((g, ch, cw), np.float32)
                pad_m[: len(sel)] = om[sel]
                masks_l.append(pad_m)
            if with_keypoints:
                ok = np.asarray(target["keypoints"].data, np.float32)
                pad_k = np.zeros((g, ok.shape[-2], 3), np.float32)
                pad_k[: len(sel)] = ok[sel]  # (x, y, visibility)
                kps_l.append(pad_k)
        out = {
            "image": np.stack(imgs),
            "boxes": np.stack(boxes_l),
            "labels": np.stack(labels_l),
            "valid": np.stack(valid_l),
        }
        if with_masks:
            out["masks"] = np.stack(masks_l)
        if with_keypoints:
            out["keypoints"] = np.stack(kps_l)
        yield out


def _coco_eval_data(args, ann_file, img_dir):
    """Eval loader: (img_ids, device_batch, image_sizes, original_sizes)
    batches + the ground-truth dict for CocoEvaluator. Fixed square canvas
    (long side -> --size), boxes stay in canvas coords; evaluate_detection
    rescales back via postprocess."""
    from vision_tpu.datasets import CocoDetection
    from vision_tpu.transforms.v2 import functional as TF

    ds = CocoDetection(img_dir, ann_file)
    gts = {}
    for i in range(len(ds)):
        img_id = ds.ids[i]
        annos = [ds.coco.anns[a] for a in ds.coco.img_to_anns.get(img_id, [])]
        boxes, labels, crowd = [], [], []
        for a in annos:
            x, y, w, h = a["bbox"]
            boxes.append([x, y, x + w, y + h])
            labels.append(a["category_id"])
            crowd.append(a.get("iscrowd", 0))
        gts[img_id] = {
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int64),
            "iscrowd": np.asarray(crowd, np.int64),
        }

    s = args.size

    def batches():
        imgs, ids, sizes, orig = [], [], [], []
        for i in range(len(ds)):
            img, _ = ds[i]
            img = np.asarray(img)
            h, w = img.shape[:2]
            scale = s / max(h, w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            img = np.asarray(TF.resize(img, (nh, nw))).astype(np.float32)
            canvas = np.zeros((s, s, 3), np.float32)
            canvas[:nh, :nw] = img / 255.0
            imgs.append(canvas)
            ids.append(ds.ids[i])
            sizes.append((nh, nw))
            orig.append((h, w))
            if len(imgs) == args.batch_size or i == len(ds) - 1:
                while len(imgs) < args.batch_size:  # static tail pad
                    imgs.append(np.zeros_like(imgs[0]))
                yield ids, np.stack(imgs), sizes, orig
                imgs, ids, sizes, orig = [], [], [], []

    return batches, gts


def run_coco_eval(args, model):
    """--test-only: COCO val mAP via engine.evaluate_detection (reference
    engine.py:76 evaluate + CocoEvaluator)."""
    from engine import evaluate_detection

    from vision_tpu.models.detection.transform import resize_boxes

    batches, gts = _coco_eval_data(
        args,
        os.path.join(args.data_path, "annotations", "instances_val2017.json"),
        os.path.join(args.data_path, "val2017"),
    )
    module, variables = model.module, dict(model.variables)
    one_stage = any(k in args.model for k in ("retinanet", "ssd", "fcos"))

    @jax.jit
    def forward(batch):
        if one_stage:
            heads = module.apply(variables, batch, train=False)
            return module.apply(
                variables, *heads, (args.size, args.size),
                method="postprocess_detections",
            )
        return module.apply(variables, batch, train=False)

    def model_fn(batch):
        return forward(jnp.asarray(batch))

    def postprocess(boxes, image_size, original_size):
        return np.asarray(
            resize_boxes(jnp.asarray(boxes), image_size, original_size)
        )

    metrics = evaluate_detection(model_fn, batches(), gts, postprocess)
    print({k: round(float(v), 4) for k, v in metrics.items()})
    return metrics


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
            **(
                {"masks": (rng.rand(n, g, s, s) > 0.5).astype(np.float32)}
                if getattr(args, "with_masks", False)
                else {}
            ),
            **(
                # keypoints scattered inside each gt box, all visible
                {
                    "keypoints": np.concatenate(
                        [
                            x1[..., None] + bw[..., None] * rng.rand(n, g, 17, 1),
                            y1[..., None] + bh[..., None] * rng.rand(n, g, 17, 1),
                            np.ones((n, g, 17, 1)),
                        ],
                        -1,
                    ).astype(np.float32)
                }
                if getattr(args, "with_keypoints", False)
                else {}
            ),
        }


def main(args):
    print(args)
    model_kwargs = {"num_classes": args.num_classes}
    if args.weights:
        model_kwargs = {"weights": args.weights}
    elif args.weights_backbone:
        model_kwargs["weights_backbone"] = args.weights_backbone
    if args.rpn_score_thresh is not None:
        model_kwargs["rpn_score_thresh"] = args.rpn_score_thresh
    model = get_model(args.model, **model_kwargs)
    if args.test_only and not args.resume:
        return run_coco_eval(args, model)
    module = model.module
    params = dict(model.variables)["params"]

    tx = make_tx(args, params)
    opt_state = tx.init(params)
    one_stage = any(s in args.model for s in ("retinanet", "ssd", "fcos"))
    step_fn, extra = make_detection_train_step(
        module, tx, one_stage=one_stage, variables=model.variables,
        compute_dtype=jnp.bfloat16 if args.amp else None,
    )

    start_epoch = args.start_epoch
    if args.resume:
        # optimizer state (momentum buffers + step count driving the
        # warmup schedule) resumes too — the reference checkpoints
        # optimizer + lr_scheduler state (train.py:341-351); older
        # checkpoints without it fall back to fresh opt_state.
        template = {"params": params, "extra": extra, "epoch": 0}
        has_opt = "opt_state" in utils.checkpoint_keys(args.resume)
        if has_opt:
            template["opt_state"] = opt_state
        restored = utils.load_checkpoint(args.resume, template)
        params = restored["params"]
        extra = restored["extra"]
        if has_opt:
            opt_state = restored["opt_state"]
        start_epoch = int(restored["epoch"]) + 1
        if args.test_only:
            model.variables = {"params": params, **extra}
            return run_coco_eval(args, model)

    key = jax.random.PRNGKey(args.seed)
    for epoch in range(start_epoch, args.epochs):
        opt_state = set_epoch_lr(opt_state, epoch_lr(args, epoch))
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
        params, extra, opt_state, key = train_one_epoch(
            step_fn, params, extra, opt_state, train_iter, key, epoch,
            print_freq=args.print_freq,
        )
        print(f"epoch {epoch} done in {time.time() - t0:.1f}s")
        if args.output_dir:
            utils.save_checkpoint(
                os.path.join(args.output_dir, f"checkpoint_{epoch}"),
                {
                    "params": jax.device_get(params),
                    "extra": jax.device_get(extra),
                    "opt_state": jax.device_get(opt_state),
                    "epoch": epoch,
                },
            )


def get_args_parser():
    p = argparse.ArgumentParser(description="vision_tpu detection training")
    p.add_argument("--data-path", default="/data/coco", type=str)
    p.add_argument("--model", default="retinanet_resnet50_fpn", type=str)
    p.add_argument("--num-classes", default=91, type=int)
    p.add_argument("--batch-size", default=2, type=int)
    p.add_argument(
        "--amp", action="store_true",
        help="bf16 convs with f32 master weights and f32 box math "
        "(reference --amp, detection/train.py:167)",
    )
    p.add_argument("--max-boxes", default=32, type=int)
    p.add_argument(
        "--with-masks", action="store_true",
        help="carry instance masks and train the mask branch "
        "(maskrcnn_* models)",
    )
    p.add_argument(
        "--with-keypoints", action="store_true",
        help="carry keypoints and train the keypoint branch "
        "(keypointrcnn_* models)",
    )
    p.add_argument("--epochs", default=26, type=int)
    p.add_argument("--steps-per-epoch", default=None, type=int)
    p.add_argument("--opt", default="sgd", type=str, choices=("sgd", "adamw"))
    p.add_argument("--lr", default=0.02, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument(
        "--weight-decay", "--wd", dest="weight_decay", default=1e-4,
        type=float,
    )
    p.add_argument(
        "--norm-weight-decay", default=None, type=float,
        help="weight decay for normalization-layer params; None = same as "
        "--weight-decay",
    )
    p.add_argument(
        "--lr-scheduler", default="multisteplr", type=str,
        choices=("multisteplr", "cosineannealinglr"),
    )
    p.add_argument(
        "--lr-steps", default=[16, 22], nargs="+", type=int,
        help="multisteplr epoch milestones",
    )
    p.add_argument("--lr-gamma", default=0.1, type=float)
    p.add_argument("--warmup-iters", default=1000, type=int)
    p.add_argument("--resume", default="", type=str)
    p.add_argument("--start-epoch", default=0, type=int)
    p.add_argument(
        "--trainable-backbone-layers", default=None, type=int,
        help="train only the last N backbone stages (reference "
        "backbone_utils._validate_trainable_layers); None = all. "
        "Implemented as a frozen-update mask (the JAX requires_grad)",
    )
    p.add_argument(
        "--rpn-score-thresh", default=None, type=float,
        help="rpn score threshold for eval (rcnn families)",
    )
    p.add_argument(
        "--weights", default=None, type=str,
        help="weights enum name to start from (downloads + converts the "
        "reference torch checkpoint)",
    )
    p.add_argument(
        "--weights-backbone", default=None, type=str,
        help="CLASSIFICATION weights enum for the trunk, e.g. "
        "'ResNet50_Weights.IMAGENET1K_V1' — the standard from-ImageNet "
        "detection recipe (reference builders' weights_backbone=)",
    )
    p.add_argument(
        "--dataset", default="coco", type=str, choices=("coco",),
        help="accepted for reference-CLI parity (COCO is the dataset)",
    )
    p.add_argument(
        "--sync-bn", action="store_true",
        help="no-op: SPMD BatchNorm statistics are always global",
    )
    p.add_argument(
        "--use-deterministic-algorithms", action="store_true",
        help="no-op: XLA on TPU is deterministic by default",
    )
    p.add_argument("--print-freq", default=20, type=int)
    p.add_argument("--output-dir", default=None, type=str)
    p.add_argument("--size", default=640, type=int)
    p.add_argument(
        "--aspect-ratio-group-factor", default=3, type=int,
        help="2k+1 log-spaced aspect bins in [0.5, 2]; 0 disables grouping",
    )
    p.add_argument(
        "--data-augmentation", default="hflip", type=str,
        help="hflip | lsj | multiscale | ssd | ssdlite (presets.py)",
    )
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--fake-data", action="store_true")
    p.add_argument("--test-only", action="store_true",
                   help="COCO val mAP eval only (engine.evaluate_detection)")
    return p


if __name__ == "__main__":
    main(get_args_parser().parse_args())
