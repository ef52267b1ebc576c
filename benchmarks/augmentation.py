"""On-device augmentation pipeline throughput.

The train-augmentation Compose (RandomResizedCrop + flip + ColorJitter +
normalize + MixUp) compiles under ONE jit (BASELINE config #2 "fused
augmentation kernels"); this times the whole batched pipeline on device
with the bench.py chained-fori methodology (single scalar fetch — the
axon tunnel adds ~35ms per dispatch).

Run: ``python benchmarks/augmentation.py [--batch 128] [--iters 20]``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.transforms import v2 as T

    pipeline = T.Compose(
        [
            T.RandomResizedCrop(args.crop, antialias=True),
            T.RandomHorizontalFlip(p=0.5),
            T.ColorJitter(brightness=0.4, contrast=0.4, saturation=0.4),
            T.ToDtype(jnp.float32, scale=True),
            T.Normalize(
                mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]
            ),
        ]
    )
    mixup = T.MixUp(alpha=0.2, num_classes=1000)

    def one_sample(img, key):
        return pipeline(img, key=key)

    @jax.jit
    def augment_batch(raw, labels, key, acc):
        k1, k2 = jax.random.split(key)
        keys = jax.random.split(k1, raw.shape[0])
        imgs = jax.vmap(one_sample)(raw, keys)
        imgs, soft = mixup((imgs, labels), key=k2)
        return acc + jnp.sum(imgs) * 1e-9 + jnp.sum(soft) * 1e-9

    @jax.jit
    def loop(raw, labels, key):
        def body(i, carry):
            acc, key = carry
            key, sub = jax.random.split(key)
            return augment_batch(raw, labels, sub, acc), key

        acc, _ = jax.lax.fori_loop(
            0, args.iters, body, (jnp.float32(0.0), key)
        )
        return acc

    rng = np.random.RandomState(0)
    raw = jnp.asarray(
        rng.randint(0, 256, (args.batch, args.size, args.size, 3)), jnp.uint8
    )
    labels = jnp.asarray(rng.randint(0, 1000, (args.batch,)), jnp.int32)
    key = jax.random.PRNGKey(0)
    float(loop(raw, labels, key))  # compile
    t0 = time.perf_counter()
    float(loop(raw, labels, key))
    dt = (time.perf_counter() - t0) / args.iters
    print(
        f"fused augmentation (crop{args.size}->{args.crop} + flip + jitter "
        f"+ normalize + mixup), batch {args.batch}: "
        f"{args.batch / dt:.0f} img/s ({dt * 1e3:.2f} ms/batch) on "
        f"{jax.default_backend()}"
    )


def auto_augment_ab(args):
    """A/B the two auto-augment execution strategies on device — the
    source of the "batched engine is ~20x vmap(switch)" claim:

    - ``vmap``: per-sample ``lax.switch`` op selection under ``jax.vmap``
      (every sample pays every branch; XLA can't fuse across the switch)
    - ``batched``: the ``_batch_augment.py`` engine (three shear/translate
      barrel passes + fused color branches shared across the batch)

    Run: ``python benchmarks/augmentation.py --ab ra|ta_wide|augmix``.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.transforms import v2 as T

    aug = {
        "ra": T.RandAugment(magnitude=9),
        "ta_wide": T.TrivialAugmentWide(),
        "augmix": T.AugMix(),
    }[args.ab]

    def run(fn):
        @jax.jit
        def loop(raw, key):
            def body(i, carry):
                acc, key = carry
                key, sub = jax.random.split(key)
                out = fn(raw, sub)
                return acc + jnp.sum(out, dtype=jnp.int32), key

            acc, _ = jax.lax.fori_loop(
                0, args.iters, body, (jnp.int32(0), key)
            )
            return acc

        rng = np.random.RandomState(0)
        raw = jnp.asarray(
            rng.randint(0, 256, (args.batch, args.crop, args.crop, 3)),
            jnp.uint8,
        )
        int(loop(raw, jax.random.PRNGKey(0)))  # compile
        t0 = time.perf_counter()
        int(loop(raw, jax.random.PRNGKey(0)))
        return (time.perf_counter() - t0) / args.iters

    def vmapped(raw, key):
        keys = jax.random.split(key, raw.shape[0])
        return jax.vmap(lambda im, k: aug(im, key=k))(raw, keys)

    dt_b = run(aug.batched)
    dt_v = run(vmapped)
    print(
        f"{args.ab} @{args.crop}px batch {args.batch} on "
        f"{jax.default_backend()}: batched engine "
        f"{args.batch / dt_b:.0f} img/s ({dt_b * 1e3:.2f} ms/batch), "
        f"vmap(switch) {args.batch / dt_v:.0f} img/s "
        f"({dt_v * 1e3:.2f} ms/batch) -> {dt_v / dt_b:.1f}x"
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--crop", type=int, default=224)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument(
        "--ab", choices=("ra", "ta_wide", "augmix"), default=None,
        help="A/B the batched auto-augment engine vs vmap(lax.switch)",
    )
    a = p.parse_args()
    auto_augment_ab(a) if a.ab else main(a)
