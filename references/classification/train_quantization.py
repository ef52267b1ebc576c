"""Quantization training/eval CLI (reference
``references/classification/train_quantization.py``: eager PTQ calibrate +
QAT finetune loops).

TPU shape: QAT = the standard pjit train step with a wrapped apply that
fake-quantizes weights (per-channel int8, STE) and activations (per-tensor)
— ``vision_tpu.models.quantization.qat_apply``. PTQ = observer pass over
calibration batches, then int8-weight + calibrated-activation eval.

Smoke runs (fake data):
    # QAT finetune
    python references/classification/train_quantization.py --model resnet18 \
        --fake-data --epochs 1 --batch-size 8 --steps-per-epoch 3
    # PTQ: calibrate + eval only
    python references/classification/train_quantization.py --model resnet18 \
        --fake-data --post-training-quantize --batch-size 8
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

import utils
from train import evaluate, get_args_parser, load_data, make_optimizer
from vision_tpu.models import get_model
from vision_tpu.models.quantization import qat_apply, quantize_model
from vision_tpu.parallel import (
    TrainState,
    make_mesh,
    make_train_step,
    replicate,
    shard_batch,
)
from vision_tpu.io.prefetch import prefetch_to_device


def quantization_args_parser():
    p = get_args_parser()
    p.add_argument(
        "--post-training-quantize", action="store_true",
        help="PTQ only: calibrate activation scales, evaluate int8 model",
    )
    p.add_argument(
        "--num-calibration-batches", default=4, type=int,
        help="batches for the PTQ observer pass",
    )
    return p


def main(args):
    print(args)
    mesh = make_mesh()
    train_loader, val_loader, train_sampler = load_data(args)
    model = get_model(args.model, num_classes=args.num_classes)

    @jax.jit
    def float_eval_step(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits = model.module.apply(variables, batch["image"], train=False)
        return utils.accuracy(logits, batch["label"], topk=(1, 5))

    if args.post_training_quantize:
        # PTQ (reference: prepare + observe + convert)
        qm = quantize_model(model, quantize_activations=True)
        calib = []
        for i, batch in enumerate(train_loader):
            if i >= args.num_calibration_batches:
                break
            calib.append(jnp.asarray(batch["image"]))
        scales = qm.calibrate(calib)
        print(f"calibrated {len(scales)} activation scales")
        logger = utils.MetricLogger()
        for batch in val_loader:
            logits = qm(jnp.asarray(batch["image"]))
            acc1, acc5 = utils.accuracy(
                logits, jnp.asarray(batch["label"]), topk=(1, 5)
            )
            logger.meters["acc1"].update(float(acc1), n=len(batch["label"]))
            logger.meters["acc5"].update(float(acc5), n=len(batch["label"]))
        print(
            f"PTQ int8: Acc@1 {logger.meters['acc1'].global_avg:.3f} "
            f"Acc@5 {logger.meters['acc5'].global_avg:.3f} "
            f"(int8 kernel bytes: {qm.memory_bytes()})"
        )
        return

    # QAT: standard pjit train step over a fake-quantized apply
    steps_per_epoch = len(train_loader)
    tx = make_optimizer(args, steps_per_epoch)
    state = TrainState(
        params=model.variables["params"],
        batch_stats=model.variables.get("batch_stats", {}),
        opt_state=tx.init(model.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )

    def qat_apply_fn(variables, *a, **kw):
        return qat_apply(model.module.apply, variables, *a, **kw)

    train_step = make_train_step(
        qat_apply_fn, tx, label_smoothing=args.label_smoothing,
        has_batch_stats=bool(state.batch_stats),
    )

    with mesh:
        state = replicate(state, mesh)
        key = jax.random.PRNGKey(args.seed)
        start = time.time()
        for epoch in range(args.start_epoch, args.epochs):
            if train_sampler is not None:  # None on the --tpu-decode path
                train_sampler.set_epoch(epoch)
            train_loader.set_epoch(epoch)
            logger = utils.MetricLogger()
            for batch in logger.log_every(
                prefetch_to_device(train_loader), args.print_freq,
                f"QAT Epoch: [{epoch}]",
            ):
                key, sub = jax.random.split(key)
                batch = shard_batch(batch, mesh)
                state, metrics = train_step(state, batch, sub)
                logger.update(loss=float(metrics["loss"]))
            evaluate(float_eval_step, state, val_loader, mesh, header="Float:")

        # convert: int8 weights from the QAT-trained params
        model.variables = {
            "params": jax.device_get(state.params),
            **(
                {"batch_stats": jax.device_get(state.batch_stats)}
                if state.batch_stats
                else {}
            ),
        }
        qm = quantize_model(model)
        logger = utils.MetricLogger()
        for batch in val_loader:
            logits = qm(jnp.asarray(batch["image"]))
            acc1, acc5 = utils.accuracy(
                logits, jnp.asarray(batch["label"]), topk=(1, 5)
            )
            logger.meters["acc1"].update(float(acc1), n=len(batch["label"]))
        print(
            f"QAT->int8: Acc@1 {logger.meters['acc1'].global_avg:.3f} "
            f"(training {time.time() - start:.1f}s)"
        )
        if args.output_dir and jax.process_index() == 0:
            utils.save_checkpoint(
                os.path.join(args.output_dir, "qat_final"),
                {"state": jax.device_get(state), "epoch": args.epochs - 1},
            )


if __name__ == "__main__":
    main(quantization_args_parser().parse_args())
