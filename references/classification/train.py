"""Classification training CLI (reference
``references/classification/train.py``: main :204, train_one_epoch :19,
evaluate :62).

TPU shape (SURVEY.md §3.5): one Python process per host,
``jax.distributed.initialize`` for multi-host, one pjit'ed train step with
donated state over a ``data``-axis Mesh, orbax checkpoints, host-0 logging.

Example (smoke run on fake data):
    python references/classification/train.py --model resnet18 \
        --fake-data --epochs 1 --batch-size 8 --steps-per-epoch 5
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import presets
import utils
from vision_tpu import datasets
from vision_tpu.io.prefetch import prefetch_to_device
from vision_tpu.models import get_model
from vision_tpu.parallel import (
    TrainState,
    make_mesh,
    make_train_step,
    replicate,
    shard_batch,
)
from vision_tpu.transforms import v2 as T


def get_args_parser():
    p = argparse.ArgumentParser(description="vision_tpu classification training")
    p.add_argument("--data-path", default="/data/imagenet", type=str)
    p.add_argument("--model", default="resnet18", type=str)
    p.add_argument("--batch-size", default=32, type=int, help="per-host batch")
    p.add_argument(
        "--amp", action="store_true",
        help="bf16 compute with f32 master weights — the TPU equivalent of "
        "the reference's torch.cuda.amp autocast (train.py:29,287); no "
        "GradScaler analog is needed (bf16 keeps f32's exponent range)",
    )
    p.add_argument("--epochs", default=90, type=int)
    p.add_argument("--steps-per-epoch", default=None, type=int)
    p.add_argument("--workers", default=16, type=int)
    p.add_argument("--opt", default="sgd", type=str)
    p.add_argument("--lr", default=0.1, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument(
        "--weight-decay", "--wd", dest="weight_decay", default=1e-4,
        type=float,
    )
    p.add_argument(
        "--norm-weight-decay", default=None, type=float,
        help="weight decay for normalization-layer params (reference "
        "utils.set_weight_decay); None = same as --weight-decay",
    )
    p.add_argument(
        "--bias-weight-decay", default=None, type=float,
        help="weight decay for all bias params; None = same as "
        "--weight-decay",
    )
    p.add_argument(
        "--transformer-embedding-decay", default=None, type=float,
        help="weight decay for class tokens / position embeddings / "
        "relative position bias tables; None = same as --weight-decay",
    )
    p.add_argument("--label-smoothing", default=0.0, type=float)
    p.add_argument("--mixup-alpha", default=0.0, type=float)
    p.add_argument("--cutmix-alpha", default=0.0, type=float)
    p.add_argument("--lr-scheduler", default="steplr", type=str)
    p.add_argument("--lr-step-size", default=30, type=int)
    p.add_argument("--lr-gamma", default=0.1, type=float)
    p.add_argument(
        "--lr-min", default=0.0, type=float,
        help="cosine annealing floor (reference eta_min)",
    )
    p.add_argument("--lr-warmup-epochs", default=0, type=int)
    p.add_argument(
        "--lr-warmup-method", default="linear", type=str,
        choices=("linear", "constant"),
    )
    p.add_argument(
        "--lr-warmup-decay", default=0.01, type=float,
        help="warmup start factor (start lr = lr * decay)",
    )
    p.add_argument("--print-freq", default=10, type=int)
    p.add_argument("--output-dir", default=".", type=str)
    p.add_argument("--resume", default="", type=str)
    p.add_argument("--start-epoch", default=0, type=int)
    p.add_argument(
        "--test-only", action="store_true",
        help="evaluate the (resumed) model and exit",
    )
    p.add_argument(
        "--weights", default=None, type=str,
        help="weights enum name to start from, e.g. IMAGENET1K_V2 "
        "(downloads + converts the reference torch checkpoint)",
    )
    p.add_argument("--auto-augment", default=None, type=str)
    p.add_argument("--ra-magnitude", default=9, type=int)
    p.add_argument("--augmix-severity", default=3, type=int)
    p.add_argument(
        "--interpolation", default="bilinear", type=str,
        help="resize/auto-augment interpolation mode",
    )
    p.add_argument("--random-erase", default=0.0, type=float)
    p.add_argument("--model-ema", action="store_true")
    p.add_argument("--model-ema-decay", default=0.99998, type=float)
    p.add_argument(
        "--model-ema-steps", default=32, type=int,
        help="EMA update interval in optimizer steps; the decay is "
        "adjusted for it like the reference (train.py:329-339)",
    )
    p.add_argument(
        "--sync-bn", action="store_true",
        help="accepted for reference-CLI parity; under SPMD jit the "
        "batch is one logical array, so BatchNorm statistics are ALWAYS "
        "global across data-parallel shards (XLA inserts the all-reduce) "
        "— this flag is a no-op",
    )
    p.add_argument(
        "--use-deterministic-algorithms", action="store_true",
        help="accepted for reference-CLI parity; XLA on TPU is "
        "deterministic by default (tests/test_determinism.py) — no-op",
    )
    p.add_argument("--val-resize-size", default=256, type=int)
    p.add_argument("--val-crop-size", default=224, type=int)
    p.add_argument("--train-crop-size", default=224, type=int)
    p.add_argument("--fake-data", action="store_true")
    p.add_argument(
        "--tpu-decode", action="store_true",
        help="offload JPEG IDCT/upsample/color + augmentation to the "
        "TPU; host does Huffman only (io/tpu_loader.py)",
    )
    p.add_argument(
        "--tpu-decode-scale", default=0, type=int,
        help="DCT-scaled decode: ship only the top-left MxM "
        "coefficients (M in 1..7; 0 = full)",
    )
    p.add_argument(
        "--device-augment", action="store_true",
        help="run the train augmentation (random-resized-crop/flip/"
        "auto-augment/normalize + MixUp/CutMix) as ONE jitted program on "
        "device; the host only decodes and resizes to a static canvas",
    )
    p.add_argument(
        "--ra-sampler", action="store_true",
        help="repeated-augmentation sampler (reference sampler.py RASampler)",
    )
    p.add_argument("--ra-reps", default=3, type=int)
    p.add_argument("--clip-grad-norm", default=None, type=float)
    p.add_argument("--num-classes", default=1000, type=int)
    p.add_argument("--seed", default=0, type=int)
    return p


def load_data(args):
    """reference ``train.py:114`` load_data."""
    train_preset = presets.ClassificationPresetTrain(
        crop_size=args.train_crop_size,
        interpolation=getattr(args, "interpolation", "bilinear"),
        auto_augment_policy=args.auto_augment,
        ra_magnitude=args.ra_magnitude,
        augmix_severity=getattr(args, "augmix_severity", 3),
        random_erase_prob=args.random_erase,
    )
    eval_preset = presets.ClassificationPresetEval(
        crop_size=args.val_crop_size, resize_size=args.val_resize_size
    )
    if args.fake_data:
        n_train = (args.steps_per_epoch or 10) * args.batch_size
        canvas = (
            args.train_crop_size + 32
            if args.device_augment
            else args.train_crop_size
        )
        train_ds = datasets.FakeData(
            n_train, (canvas, canvas, 3), args.num_classes
        )
        val_ds = datasets.FakeData(
            2 * args.batch_size, (args.val_crop_size, args.val_crop_size, 3),
            args.num_classes,
        )
        if args.device_augment:
            train_tf = np.asarray  # raw uint8; augmentation happens on device
        else:
            train_tf = lambda img: np.asarray(  # noqa: E731
                T.ToDtype(jnp.float32, scale=True)(jnp.asarray(img))
            )
        val_tf = lambda img: np.asarray(  # noqa: E731
            T.ToDtype(jnp.float32, scale=True)(jnp.asarray(img))
        )
    else:
        train_dir = os.path.join(args.data_path, "train")
        val_dir = os.path.join(args.data_path, "val")
        if args.device_augment:
            # host side: decode + static-canvas resize only; all randomized
            # augmentation runs jitted on device (make_device_augment)
            from vision_tpu.transforms.v2 import functional as TF

            canvas = args.train_crop_size + 32

            def train_tf(img, _canvas=canvas):  # noqa: E306
                return np.asarray(TF.resize(jnp.asarray(img), (_canvas, _canvas)))

        else:
            train_tf = lambda img: np.asarray(train_preset(jnp.asarray(img)))  # noqa: E731
        val_tf = lambda img: np.asarray(eval_preset(jnp.asarray(img)))  # noqa: E731
        train_ds = datasets.ImageFolder(train_dir)
        val_ds = datasets.ImageFolder(val_dir)

    if getattr(args, "tpu_decode", False) and not args.fake_data:
        # host does Huffman entropy-decode only; IDCT/upsample/color +
        # RandomResizedCrop/flip/normalize run on device, bucketed by
        # coefficient-canvas shape (vision_tpu/io/tpu_loader.py)
        from vision_tpu.io.tpu_loader import TpuJpegLoader

        class _JpegFiles:
            def __init__(self, folder):
                self.items = folder.samples

            def __len__(self):
                return len(self.items)

            def __getitem__(self, i):
                path, label = self.items[i]
                with open(path, "rb") as f:
                    return f.read(), label

        train_loader = TpuJpegLoader(
            _JpegFiles(train_ds), args.batch_size,
            crop_size=args.train_crop_size, train=True,
            coef_limit=args.tpu_decode_scale, seed=args.seed,
            drop_remainder=True,
        )
        val_loader = TpuJpegLoader(
            _JpegFiles(val_ds), args.batch_size,
            crop_size=args.val_crop_size, train=False,
            val_resize_size=args.val_resize_size,
        )
        return train_loader, val_loader, None

    n_hosts = jax.process_count()
    rank = jax.process_index()
    if args.ra_sampler:
        import sampler as _sampler_mod

        train_sampler = _sampler_mod.RASampler(
            train_ds, num_replicas=n_hosts, rank=rank, shuffle=True,
            repetitions=args.ra_reps, seed=args.seed,
        )
    else:
        train_sampler = datasets.DistributedSampler(
            train_ds, num_replicas=n_hosts, rank=rank, shuffle=True,
            seed=args.seed,
        )
    train_loader = datasets.DataLoader(
        train_ds,
        batch_size=args.batch_size,
        sampler=train_sampler,
        num_workers=args.workers,
        drop_last=True,
        collate_fn=lambda batch: {
            "image": np.stack([train_tf(b[0]) for b in batch]),
            "label": np.asarray([b[1] for b in batch], np.int32),
        },
    )
    val_loader = datasets.DataLoader(
        val_ds,
        batch_size=args.batch_size,
        collate_fn=lambda batch: {
            "image": np.stack([val_tf(b[0]) for b in batch]),
            "label": np.asarray([b[1] for b in batch], np.int32),
        },
    )
    return train_loader, val_loader, train_sampler


def make_device_augment(args):
    """ONE jitted program: per-sample RandomResizedCrop + flip (+auto
    augment) + normalize, then batch MixUp/CutMix — the fused-augmentation
    pipeline (BASELINE config #2; benchmarks/augmentation.py).

    RandomResizedCrop + flip run as ONE batched two-matmul MXU resample
    (``RandomResizedCrop.batched`` — ~7x the vmapped gather path);
    RandAugment/TrivialAugmentWide/AugMix run through the batched TPU
    engine (``v2/_batch_augment.py`` — shear passes + bucketed color
    branches, no per-pixel gathers) between the crop/flip stage and the
    normalize stage: ~17x faster than vmapping their ``lax.switch`` op
    selection, matching the per-sample path within 1 uint8 count."""
    rrc = T.RandomResizedCrop(args.train_crop_size, antialias=True)
    interp = getattr(args, "interpolation", "bilinear")
    batched_aa = None
    if args.auto_augment == "ra":
        batched_aa = T.RandAugment(
            magnitude=args.ra_magnitude, interpolation=interp
        )
    elif args.auto_augment == "ta_wide":
        batched_aa = T.TrivialAugmentWide(interpolation=interp)
    elif args.auto_augment == "augmix":
        batched_aa = T.AugMix(severity=getattr(args, "augmix_severity", 3))
    post_stages = [
        T.ToDtype(jnp.float32, scale=True),
        T.Normalize(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
    ]
    if args.random_erase > 0:
        # after Normalize, like the reference preset (presets.py)
        post_stages.append(T.RandomErasing(p=args.random_erase))
    post = T.Compose(post_stages)
    mixers = []
    if args.mixup_alpha > 0:
        mixers.append(T.MixUp(args.mixup_alpha, num_classes=args.num_classes))
    if args.cutmix_alpha > 0:
        mixers.append(T.CutMix(args.cutmix_alpha, num_classes=args.num_classes))

    @jax.jit
    def augment(batch, key):
        k1, k2, k3, kaa, kpost = jax.random.split(key, 5)
        n = batch["image"].shape[0]
        imgs = rrc.batched(batch["image"], k1, flip_p=0.5)
        if batched_aa is not None:
            imgs = batched_aa.batched(imgs, kaa)
        pkeys = jax.random.split(kpost, n)
        imgs = jax.vmap(lambda im, k: post(im, key=k))(imgs, pkeys)
        labels = batch["label"]
        if mixers:
            onehot = jax.nn.one_hot(labels, args.num_classes)
            outs = [m((imgs, onehot), key=k3) for m in mixers]
            idx = jax.random.randint(k2, (), 0, len(mixers))
            imgs = jax.lax.switch(idx, [lambda o=o: o[0] for o in outs])
            labels = jax.lax.switch(idx, [lambda o=o: o[1] for o in outs])
        return {"image": imgs, "label": labels}

    return augment


_EMBED_KEYS = (
    "class_token", "cls_token", "position_embedding", "pos_embedding",
    "relative_position_bias",
)


def _wd_groups(args):
    """Group-wise weight decay (reference ``utils.set_weight_decay``):
    norm-layer params, biases, and transformer embeddings can carry their
    own decay. Returns {group: wd} with None entries resolved to the main
    decay, or None when everything shares one value."""
    main = args.weight_decay
    groups = {
        "main": main,
        "norm": args.norm_weight_decay,
        "bias": args.bias_weight_decay,
        "embed": args.transformer_embedding_decay,
    }
    groups = {k: (main if v is None else v) for k, v in groups.items()}
    if all(v == main for v in groups.values()):
        return None
    return groups


def _wd_label_tree(params):
    """Label every param leaf: 'embed' (token/position tables), 'norm'
    (module whose param set contains 'scale' — flax norm layers are the
    only users of that name), 'bias' (conv/dense bias), else 'main'."""

    def walk(d, path):
        keys = set(d.keys())
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = walk(v, path + (k,))
                continue
            ps = "/".join(path + (k,)).lower()
            if any(e in ps for e in _EMBED_KEYS):
                out[k] = "embed"
            elif "scale" in keys:
                out[k] = "norm"
            elif k == "bias":
                out[k] = "bias"
            else:
                out[k] = "main"
        return out

    return walk(params, ())


def _decay_transforms(args):
    """One masked add_decayed_weights per distinct group value."""
    groups = _wd_groups(args)
    if groups is None:
        if args.weight_decay:
            return [optax.add_decayed_weights(args.weight_decay)]
        return []

    def mask_for(group):
        def mask(params):
            labels = _wd_label_tree(params)
            return jax.tree_util.tree_map(lambda g: g == group, labels)

        return mask

    return [
        optax.add_decayed_weights(v, mask=mask_for(g))
        for g, v in groups.items()
        if v
    ]


def make_optimizer(args, steps_per_epoch: int):
    if args.lr_scheduler == "steplr":
        sched = optax.exponential_decay(
            args.lr,
            transition_steps=args.lr_step_size * steps_per_epoch,
            decay_rate=args.lr_gamma,
            staircase=True,
        )
    elif args.lr_scheduler == "cosineannealinglr":
        # reference train.py: CosineAnnealingLR(T_max=epochs - warmup_epochs)
        # — the cosine spans only the post-warmup epochs, reaching lr_min
        # exactly at the end of training
        cos_epochs = args.epochs - getattr(args, "lr_warmup_epochs", 0)
        sched = optax.cosine_decay_schedule(
            args.lr,
            max(1, cos_epochs) * steps_per_epoch,
            alpha=(args.lr_min / args.lr) if args.lr else 0.0,
        )
    else:
        raise ValueError(f"unknown scheduler {args.lr_scheduler}")
    if args.lr_warmup_epochs > 0:
        warm_steps = args.lr_warmup_epochs * steps_per_epoch
        start = args.lr * args.lr_warmup_decay
        if args.lr_warmup_method == "constant":
            warmup = optax.constant_schedule(start)
        else:
            warmup = optax.linear_schedule(start, args.lr, warm_steps)
        sched = optax.join_schedules(
            [
                warmup,
                sched,
            ],
            [args.lr_warmup_epochs * steps_per_epoch],
        )
    decays = _decay_transforms(args)
    if args.opt == "sgd":
        tx = optax.chain(*decays, optax.sgd(sched, momentum=args.momentum))
    elif args.opt == "adamw":
        # decomposed AdamW so group decays slot in before the lr scaling —
        # matches torch's decoupled p -= lr * (adam_update + wd * p)
        tx = optax.chain(
            optax.scale_by_adam(), *decays, optax.scale_by_learning_rate(sched)
        )
    else:
        raise ValueError(f"unknown optimizer {args.opt}")
    if getattr(args, "clip_grad_norm", None):
        tx = optax.chain(optax.clip_by_global_norm(args.clip_grad_norm), tx)
    return tx


def evaluate(eval_step, state, val_loader, mesh, header="Test:"):
    """reference ``train.py:62`` evaluate."""
    logger = utils.MetricLogger()
    n = 0
    for batch in val_loader:
        batch = shard_batch(batch, mesh)
        acc1, acc5 = eval_step(state.params, state.batch_stats, batch)
        bs = batch["label"].shape[0]
        logger.meters["acc1"].update(float(acc1), n=bs)
        logger.meters["acc5"].update(float(acc5), n=bs)
        n += bs
    print(
        f"{header} Acc@1 {logger.meters['acc1'].global_avg:.3f} "
        f"Acc@5 {logger.meters['acc5'].global_avg:.3f}"
    )
    return logger.meters["acc1"].global_avg


def main(args):
    print(args)
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)

    mesh = make_mesh()
    print(f"devices: {jax.device_count()} mesh: {mesh}")

    train_loader, val_loader, train_sampler = load_data(args)
    steps_per_epoch = len(train_loader)

    model_kwargs = {"num_classes": args.num_classes}
    if args.weights:
        # start from a converted reference checkpoint (downloads the torch
        # .pth; weights enums pin num_classes themselves)
        model_kwargs = {"weights": args.weights}
    model = get_model(args.model, **model_kwargs)
    tx = make_optimizer(args, steps_per_epoch)
    state = TrainState(
        params=model.variables["params"],
        batch_stats=model.variables.get("batch_stats", {}),
        opt_state=tx.init(model.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )

    # --tpu-decode batches arrive decoded+augmented+normalized on device
    if getattr(args, "tpu_decode", False):
        args.device_augment = False
    device_augment = make_device_augment(args) if args.device_augment else None
    mixup = None
    if not args.device_augment and (args.mixup_alpha > 0 or args.cutmix_alpha > 0):
        choices = []
        if args.mixup_alpha > 0:
            choices.append(T.MixUp(args.mixup_alpha, num_classes=args.num_classes))
        if args.cutmix_alpha > 0:
            choices.append(T.CutMix(args.cutmix_alpha, num_classes=args.num_classes))
        mixup = T.RandomChoice(choices)

    amp_dtype = jnp.bfloat16 if args.amp else None
    train_step = make_train_step(
        model.module.apply, tx, label_smoothing=args.label_smoothing,
        has_batch_stats=bool(state.batch_stats),
        compute_dtype=amp_dtype,
    )

    def _amp_cast(tree):
        if amp_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(amp_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    @jax.jit
    def eval_step(params, batch_stats, batch):
        variables = {"params": _amp_cast(params)}
        if batch_stats:
            # eval normalizes with the running averages — use them at
            # full f32 precision (torch AMP runs BN in f32 too)
            variables["batch_stats"] = batch_stats
        logits = model.module.apply(
            variables, _amp_cast(batch["image"]), train=False
        )
        return utils.accuracy(logits.astype(jnp.float32), batch["label"], topk=(1, 5))

    ema = None
    if args.model_ema:
        # reference train.py:329-339: the published decay assumes an
        # update every optimizer step of a full-recipe run; adjust it for
        # the actual update interval and epoch count
        adjust = (
            jax.process_count()
            * args.batch_size
            * args.model_ema_steps
            / args.epochs
        )
        alpha = min(1.0, (1.0 - args.model_ema_decay) * adjust)
        ema = utils.ExponentialMovingAverage(state.params, 1.0 - alpha)

    if args.resume:
        if args.test_only:
            # eval needs params/batch_stats only; a raw (untyped) restore
            # tolerates checkpoints from runs with a different optimizer
            # or EMA setting (TrainState round-trips as a 4-list)
            raw = utils.load_checkpoint(args.resume)
            st = raw["state"]
            state = TrainState(st[0], st[1], state.opt_state, state.step)
            if ema is not None and "ema" in raw:
                ema.shadow = raw["ema"]
        else:
            template = {"state": state, "epoch": 0}
            if "ema" in utils.checkpoint_keys(args.resume):
                # EMA shadow shares the params' tree structure; shape the
                # template even when this run doesn't use --model-ema so
                # the strict orbax restore accepts the stored layout
                template["ema"] = state.params
            restored = utils.load_checkpoint(args.resume, template)
            state = restored["state"]
            if ema is not None and "ema" in restored:
                ema.shadow = restored["ema"]
            args.start_epoch = int(restored["epoch"]) + 1

    if args.test_only:
        with mesh:
            state = replicate(state, mesh)
            evaluate(eval_step, state, val_loader, mesh)
        return

    with mesh:
        state = replicate(state, mesh)
        key = jax.random.PRNGKey(args.seed)
        start = time.time()
        host_step = 0  # host-side twin of state.step (no device fetch)
        for epoch in range(args.start_epoch, args.epochs):
            if train_sampler is not None:
                train_sampler.set_epoch(epoch)
            train_loader.set_epoch(epoch)
            logger = utils.MetricLogger()
            header = f"Epoch: [{epoch}]"
            train_iter = (
                iter(train_loader)  # batches are produced on device
                if getattr(args, "tpu_decode", False)
                else prefetch_to_device(train_loader)
            )
            for batch in logger.log_every(
                train_iter, args.print_freq, header
            ):
                key, sub, mkey = jax.random.split(key, 3)
                if device_augment is not None:
                    batch = shard_batch(batch, mesh)
                    batch = device_augment(batch, mkey)
                else:
                    if mixup is not None:
                        img, lbl = mixup(
                            (batch["image"], batch["label"]), key=mkey
                        )
                        batch = {"image": img, "label": lbl}
                    batch = shard_batch(batch, mesh)
                state, metrics = train_step(state, batch, sub)
                host_step += 1
                if ema is not None and host_step % args.model_ema_steps == 0:
                    ema.update(state.params)
                logger.update(
                    loss=float(metrics["loss"]),
                    **(
                        {"acc1": float(metrics["accuracy"]) * 100}
                        if "accuracy" in metrics
                        else {}
                    ),
                )
            evaluate(eval_step, state, val_loader, mesh)
            if ema is not None:
                # reference train.py:444-449: evaluate the EMA weights too
                ema_state = TrainState(
                    ema.shadow, state.batch_stats, state.opt_state, state.step
                )
                evaluate(
                    eval_step, ema_state, val_loader, mesh,
                    header="Test: EMA",
                )
            if args.output_dir and jax.process_index() == 0:
                ckpt = {"state": jax.device_get(state), "epoch": epoch}
                if ema is not None:
                    ckpt["ema"] = jax.device_get(ema.shadow)
                utils.save_checkpoint(
                    os.path.join(args.output_dir, f"checkpoint_{epoch}"),
                    ckpt,
                )
        print(f"Training time {time.time() - start:.1f}s")


if __name__ == "__main__":
    main(get_args_parser().parse_args())
