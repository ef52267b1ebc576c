#!/usr/bin/env python
"""ImageNet-val top-1/top-5 evaluation with the reference-parity gate.

SURVEY.md §7 step 4: converted reference weights must reproduce the
published acc@1 within 0.05% — this script IS that gate (the data is the
only missing piece in the build sandbox; on a machine with ImageNet-val,
this runs end to end).

    # networked machine: download + convert reference weights in one step
    python scripts/eval_imagenet.py --model resnet50 --weights IMAGENET1K_V2 \
        --data /data/imagenet/val --gate

    # offline: weights converted earlier via scripts/convert_weights.py
    python scripts/eval_imagenet.py --model resnet50 \
        --from-msgpack resnet50_v2.msgpack --data /data/imagenet/val

The val directory uses the standard ImageFolder layout
(``val/n01440764/*.JPEG``). Images are decoded on host threads, preprocessed
with the weights' own eval preset (resize -> center crop -> normalize), and
batched through a jitted forward.
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--data", required=True, help="ImageNet val dir (ImageFolder layout)")
    p.add_argument("--weights", default=None, help="weights enum member (downloads)")
    p.add_argument("--from-msgpack", default=None, help="converted variables file")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--limit", type=int, default=None, help="eval only first N images")
    p.add_argument(
        "--gate", action="store_true",
        help="exit 1 unless |acc@1 - published| <= 0.05 (SURVEY §7 step 4)",
    )
    p.add_argument(
        "--published", type=float, default=None,
        help="override the published acc@1 the gate compares against "
        "(default: the weights meta _metrics entry; override exists for "
        "offline fixtures, tests/test_convert_scripts.py)",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.datasets import ImageFolder
    from vision_tpu.io.prefetch import prefetch_to_device
    from vision_tpu.models import get_model, get_model_weights

    enum = get_model_weights(args.model)
    member = enum[args.weights] if args.weights else enum.DEFAULT

    if args.from_msgpack:
        from vision_tpu.models._hub import load_variables_msgpack

        model = get_model(args.model)
        model.variables = load_variables_msgpack(
            args.from_msgpack, model.variables
        )
        preprocess = member.transforms()
    elif args.weights:
        model = get_model(args.model, weights=member)
        preprocess = model.preprocess
    else:
        print(
            "note: no --weights / --from-msgpack; evaluating RANDOM init "
            "(plumbing check only)"
        )
        model = get_model(args.model)
        preprocess = member.transforms()

    module, variables = model.module, model.variables

    # ImageNet-val images vary in size, so the variable-size half of the
    # preset (short-side resize + center crop) runs PER IMAGE on host;
    # the batch entering jit is a fixed crop_size canvas and only the
    # rescale/normalize + forward run on device.
    crop = preprocess.crop_size

    def host_preprocess(img):
        from vision_tpu.transforms.v2 import functional as TF

        img = TF.resize(
            np.asarray(img), preprocess.resize_size,
            interpolation=preprocess.interpolation,
            antialias=preprocess.antialias,
        )
        return np.asarray(TF.center_crop(img, crop))

    mean = jnp.asarray(preprocess.mean, jnp.float32)
    std = jnp.asarray(preprocess.std, jnp.float32)

    @jax.jit
    def forward(variables, batch):
        x = batch.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        logits = module.apply(variables, x, train=False)
        return jax.lax.top_k(logits, 5)[1]

    ds = ImageFolder(args.data)
    n_total = len(ds) if args.limit is None else min(args.limit, len(ds))
    bs = args.batch_size

    def host_batches():
        imgs, labels = [], []
        for i in range(n_total):
            img, label = ds[i]
            imgs.append(host_preprocess(img))
            labels.append(label)
            if len(imgs) == bs or i == n_total - 1:
                # pad the tail batch so the jit shape stays static
                while len(imgs) < bs:
                    imgs.append(np.zeros_like(imgs[0]))
                    labels.append(-1)
                yield np.stack(imgs), np.asarray(labels)
                imgs, labels = [], []

    top1 = top5 = seen = 0
    t0 = time.time()
    for raw, labels in host_batches():
        pred = np.asarray(forward(variables, jnp.asarray(raw)))
        valid = labels >= 0
        top1 += int((pred[:, 0] == labels)[valid].sum())
        top5 += int(((pred == labels[:, None]).any(1))[valid].sum())
        seen += int(valid.sum())
        if seen % (bs * 50) < bs:
            print(
                f"{seen}/{n_total} acc@1={100 * top1 / max(seen, 1):.3f} "
                f"({seen / (time.time() - t0):.1f} img/s)"
            )

    acc1 = 100.0 * top1 / max(seen, 1)
    acc5 = 100.0 * top5 / max(seen, 1)
    published = args.published
    if published is None:
        for metrics in (member.meta.get("_metrics") or {}).values():
            published = metrics.get("acc@1", published)
    print(
        f"{args.model} [{member}]: acc@1={acc1:.3f} acc@5={acc5:.3f} "
        f"(published acc@1={published})"
    )
    if args.gate:
        if published is None:
            print("no published acc@1 in weights meta; cannot gate")
            return 1
        delta = abs(acc1 - published)
        print(f"gate: |delta|={delta:.3f} (allowed 0.05)")
        return 0 if delta <= 0.05 else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
