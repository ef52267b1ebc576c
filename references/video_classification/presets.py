"""Video classification train/eval presets (counterpart of reference
``references/video_classification/presets.py``): the Kinetics recipe on
(T, H, W, C) uint8 clips -> float32 normalized fixed-size crops. The
reference's ConvertBCHWtoCBHW layout shuffle has no analog here — the
models are natively NTHWC."""

from __future__ import annotations

from typing import Tuple

import numpy as np

KINETICS_MEAN = (0.43216, 0.394666, 0.37645)
KINETICS_STD = (0.22803, 0.22145, 0.216989)


def _resize_clip(clip: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize of every frame (antialias off, matching the
    reference's hard-coded antialias=False for video models)."""
    import jax

    t = clip.shape[0]
    return np.asarray(
        jax.image.resize(
            clip.astype(np.float32),
            (t, size[0], size[1], clip.shape[3]),
            method="bilinear",
        )
    )


def _short_side_size(h: int, w: int, size: int) -> Tuple[int, int]:
    scale = size / min(h, w)
    return int(round(h * scale)), int(round(w * scale))


class VideoClassificationPresetTrain:
    def __init__(self, *, crop_size: int, resize_size: int,
                 mean=KINETICS_MEAN, std=KINETICS_STD, hflip_prob=0.5):
        self.crop_size = crop_size
        self.resize_size = resize_size
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.hflip_prob = hflip_prob

    def __call__(self, clip: np.ndarray, rng: np.random.RandomState):
        clip = np.asarray(clip)
        scale = 1.0 / 255.0 if clip.dtype == np.uint8 else 1.0
        h, w = clip.shape[1:3]
        clip = _resize_clip(
            clip, _short_side_size(h, w, self.resize_size)
        ) * scale
        if rng.rand() < self.hflip_prob:
            clip = clip[:, :, ::-1]
        clip = (clip - self.mean) / self.std
        c = self.crop_size
        y0 = rng.randint(0, clip.shape[1] - c + 1)
        x0 = rng.randint(0, clip.shape[2] - c + 1)
        return clip[:, y0 : y0 + c, x0 : x0 + c].astype(np.float32)


class VideoClassificationPresetEval:
    def __init__(self, *, crop_size: int, resize_size: int,
                 mean=KINETICS_MEAN, std=KINETICS_STD):
        self.crop_size = crop_size
        self.resize_size = resize_size
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, clip: np.ndarray, rng=None):
        clip = np.asarray(clip)
        scale = 1.0 / 255.0 if clip.dtype == np.uint8 else 1.0
        h, w = clip.shape[1:3]
        clip = _resize_clip(
            clip, _short_side_size(h, w, self.resize_size)
        ) * scale
        clip = (clip - self.mean) / self.std
        c = self.crop_size
        y0 = (clip.shape[1] - c) // 2
        x0 = (clip.shape[2] - c) // 2
        return clip[:, y0 : y0 + c, x0 : x0 + c].astype(np.float32)
