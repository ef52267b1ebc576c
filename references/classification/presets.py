"""Train/eval transform presets (reference
``references/classification/presets.py``)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from vision_tpu.transforms import v2 as T


class ClassificationPresetTrain:
    """reference ``presets.py:17``: RandomResizedCrop + flip + auto-augment
    + ToDtype + Normalize + RandomErasing."""

    def __init__(
        self,
        *,
        crop_size: int,
        mean=(0.485, 0.456, 0.406),
        std=(0.229, 0.224, 0.225),
        interpolation: str = "bilinear",
        hflip_prob: float = 0.5,
        auto_augment_policy: Optional[str] = None,
        ra_magnitude: int = 9,
        augmix_severity: int = 3,
        random_erase_prob: float = 0.0,
    ):
        transforms = [
            T.RandomResizedCrop(crop_size, interpolation=interpolation, antialias=True)
        ]
        if hflip_prob > 0:
            transforms.append(T.RandomHorizontalFlip(hflip_prob))
        if auto_augment_policy is not None:
            if auto_augment_policy == "ra":
                transforms.append(
                    T.RandAugment(interpolation=interpolation, magnitude=ra_magnitude)
                )
            elif auto_augment_policy == "ta_wide":
                transforms.append(T.TrivialAugmentWide(interpolation=interpolation))
            elif auto_augment_policy == "augmix":
                transforms.append(T.AugMix(severity=augmix_severity))
            else:
                transforms.append(
                    T.AutoAugment(policy=auto_augment_policy, interpolation=interpolation)
                )
        transforms += [
            T.ToDtype(jnp.float32, scale=True),
            T.Normalize(mean=list(mean), std=list(std)),
        ]
        if random_erase_prob > 0:
            transforms.append(T.RandomErasing(p=random_erase_prob))
        self.transforms = T.Compose(transforms)

    def __call__(self, img, key=None):
        return self.transforms(img, key=key)


class ClassificationPresetEval:
    def __init__(
        self,
        *,
        crop_size: int,
        resize_size: int = 256,
        mean=(0.485, 0.456, 0.406),
        std=(0.229, 0.224, 0.225),
        interpolation: str = "bilinear",
    ):
        from vision_tpu.transforms import ImageClassification

        self._preset = ImageClassification(
            crop_size=crop_size,
            resize_size=resize_size,
            mean=mean,
            std=std,
            interpolation=interpolation,
        )

    def __call__(self, img, key=None):
        return self._preset(img)
