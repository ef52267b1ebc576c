"""Segmentation train/eval presets (counterpart of reference
``references/segmentation/presets.py``): random-resize (0.5x..2x of
base), hflip, pad-if-smaller with mask ignore fill 255, random crop,
normalize. Host-side numpy HWC images + (H, W) integer masks; the jitted
train step consumes fixed-size crops."""

from __future__ import annotations

from typing import Tuple

import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _resize(img: np.ndarray, size: Tuple[int, int], *, nearest=False):
    import jax

    method = "nearest" if nearest else "bilinear"
    return np.asarray(
        jax.image.resize(
            img.astype(np.float32) if not nearest else img,
            (size[0], size[1]) + img.shape[2:],
            method=method,
        )
    )


class SegmentationPresetTrain:
    def __init__(
        self,
        *,
        base_size: int,
        crop_size: int,
        hflip_prob: float = 0.5,
        mean=IMAGENET_MEAN,
        std=IMAGENET_STD,
    ):
        self.base_size = base_size
        self.crop_size = crop_size
        self.hflip_prob = hflip_prob
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img, target, rng: np.random.RandomState):
        img = np.asarray(img)
        target = np.asarray(target)
        h, w = img.shape[:2]

        # RandomResize: scale shorter side into [0.5, 2] * base_size
        size = rng.randint(int(0.5 * self.base_size),
                           int(2.0 * self.base_size) + 1)
        scale = size / min(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        img = _resize(img, (nh, nw))
        target = _resize(target, (nh, nw), nearest=True)

        if rng.rand() < self.hflip_prob:
            img, target = img[:, ::-1], target[:, ::-1]

        # PadIfSmaller: image 0, mask 255 (ignore)
        c = self.crop_size
        ph, pw = max(0, c - img.shape[0]), max(0, c - img.shape[1])
        if ph or pw:
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
            target = np.pad(
                target, ((0, ph), (0, pw)), constant_values=255
            )

        y0 = rng.randint(0, img.shape[0] - c + 1)
        x0 = rng.randint(0, img.shape[1] - c + 1)
        img = img[y0 : y0 + c, x0 : x0 + c]
        target = target[y0 : y0 + c, x0 : x0 + c]

        img = (img / 255.0 - self.mean) / self.std
        return img.astype(np.float32), target.astype(np.int32)


class SegmentationPresetEval:
    def __init__(self, *, base_size: int, mean=IMAGENET_MEAN,
                 std=IMAGENET_STD):
        self.base_size = base_size
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img, target, rng=None):
        img = np.asarray(img)
        target = np.asarray(target)
        h, w = img.shape[:2]
        scale = self.base_size / min(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        img = _resize(img, (nh, nw))
        target = _resize(target, (nh, nw), nearest=True)
        img = (img / 255.0 - self.mean) / self.std
        return img.astype(np.float32), target.astype(np.int32)
