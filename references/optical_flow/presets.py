"""Optical-flow train/eval presets (counterpart of reference
``references/optical_flow/presets.py``): the RAFT augmentation recipe
composed from ``transforms.py``. Images come in as uint8 HWC numpy; the
output is float32 in [-1, 1] plus (H, W, 2) flow and a bool valid mask.
"""

from __future__ import annotations

import numpy as np

import transforms as T


class OpticalFlowPresetEval:
    def __init__(self):
        self.transforms = T.Compose(
            [
                T.ConvertImageDtype(np.float32),
                T.Normalize(mean=0.5, std=0.5),  # [0, 1] -> [-1, 1]
                T.ValidateModelInput(),
            ]
        )

    def __call__(self, img1, img2, flow, valid, rng=None):
        rng = rng or np.random.RandomState(0)
        return self.transforms(img1, img2, flow, valid, rng)


class OpticalFlowPresetTrain:
    """RAFT training preset: asymmetric jitter -> scale/stretch/crop ->
    flips -> normalize -> erasing on frame 2 -> valid mask."""

    def __init__(
        self,
        *,
        crop_size,
        min_scale=-0.2,
        max_scale=0.5,
        stretch_prob=0.8,
        brightness=0.4,
        contrast=0.4,
        saturation=0.4,
        hue=0.5 / 3.14,
        asymmetric_jitter_prob=0.2,
        do_flip=True,
    ):
        transforms = [
            T.ConvertImageDtype(np.float32),
            T.AsymmetricColorJitter(
                brightness=brightness,
                contrast=contrast,
                saturation=saturation,
                hue=hue,
                p=asymmetric_jitter_prob,
            ),
            T.RandomResizeAndCrop(
                crop_size=crop_size,
                min_scale=min_scale,
                max_scale=max_scale,
                stretch_prob=stretch_prob,
            ),
        ]
        if do_flip:
            transforms += [
                T.RandomHorizontalFlip(p=0.5),
                T.RandomVerticalFlip(p=0.1),
            ]
        transforms += [
            T.Normalize(mean=0.5, std=0.5),
            T.RandomErasing(max_erase=2),
            T.MakeValidFlowMask(),
            T.ValidateModelInput(),
        ]
        self.transforms = T.Compose(transforms)

    def __call__(self, img1, img2, flow, valid, rng):
        return self.transforms(img1, img2, flow, valid, rng)
