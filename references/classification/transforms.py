"""Batch-level mixing transforms for the classification reference
(counterpart of reference ``references/classification/transforms.py``):
``get_mixup_cutmix`` plus p-gated RandomMixUp / RandomCutMix wrappers.

The mixing math itself lives in the library
(vision_tpu/transforms/v2/_augment.py MixUp / CutMix — jittable, key
based); this module provides the reference-script surface: probability
gating (the library classes always mix; the reference's Random* apply
with p) and the RandomChoice composition used by the train loop."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vision_tpu.transforms import v2 as T

__all__ = ["get_mixup_cutmix", "RandomMixUp", "RandomCutMix"]


class _PGated:
    """Apply a batch mixer with probability p (reference
    transforms.py:45/:129 semantics); identity otherwise (labels still
    one-hot so both branches agree in structure)."""

    def __init__(self, mixer, num_classes: int, p: float = 0.5):
        self.mixer = mixer
        self.num_classes = num_classes
        self.p = p

    def __call__(self, sample, key):
        imgs, labels = sample
        kgate, kmix = jax.random.split(key)
        mixed_imgs, mixed_labels = self.mixer((imgs, labels), key=kmix)
        if labels.ndim == 1:
            labels = jax.nn.one_hot(labels, self.num_classes)
        gate = jax.random.uniform(kgate) < self.p
        return (
            jnp.where(gate, mixed_imgs, imgs),
            jnp.where(gate, mixed_labels, labels),
        )


class RandomMixUp(_PGated):
    def __init__(self, num_classes: int, p: float = 0.5, alpha: float = 1.0):
        super().__init__(
            T.MixUp(alpha, num_classes=num_classes), num_classes, p
        )


class RandomCutMix(_PGated):
    def __init__(self, num_classes: int, p: float = 0.5, alpha: float = 1.0):
        super().__init__(
            T.CutMix(alpha, num_classes=num_classes), num_classes, p
        )


def get_mixup_cutmix(*, mixup_alpha: float, cutmix_alpha: float,
                     num_classes: int):
    """reference transforms.py:10: RandomChoice of the enabled mixers, or
    None when both alphas are 0."""
    choices = []
    if mixup_alpha > 0:
        choices.append(T.MixUp(mixup_alpha, num_classes=num_classes))
    if cutmix_alpha > 0:
        choices.append(T.CutMix(cutmix_alpha, num_classes=num_classes))
    if not choices:
        return None
    return T.RandomChoice(choices)
