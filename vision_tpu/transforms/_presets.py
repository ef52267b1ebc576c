"""Inference presets attached to weights (reference
``torchvision/transforms/_presets.py``).

Each preset is a callable; image input is channels-last uint8 or float.
These compile into one fused XLA program together with the model forward.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vision_tpu.transforms.v2 import functional as F

__all__ = [
    "ImageClassification",
    "ObjectDetection",
    "SemanticSegmentation",
    "VideoClassification",
    "OpticalFlow",
]


class ImageClassification:
    """reference ``_presets.py:39``: resize(shorter edge) -> center_crop ->
    rescale to [0,1] -> normalize."""

    def __init__(
        self,
        *,
        crop_size: int,
        resize_size: int = 256,
        mean: Sequence[float] = (0.485, 0.456, 0.406),
        std: Sequence[float] = (0.229, 0.224, 0.225),
        interpolation: str = "bilinear",
        antialias: bool = True,
    ):
        self.crop_size = crop_size
        self.resize_size = resize_size
        self.mean = list(mean)
        self.std = list(std)
        self.interpolation = interpolation
        self.antialias = antialias

    def __call__(self, img: jax.Array) -> jax.Array:
        img = F.resize_image(
            img, self.resize_size, self.interpolation, antialias=self.antialias
        )
        img = F.center_crop_image(img, self.crop_size)
        img = F.to_dtype_image(img, jnp.float32, scale=True)
        return F.normalize_image(img, self.mean, self.std)

    def __repr__(self):
        return (
            f"ImageClassification(crop_size={self.crop_size}, "
            f"resize_size={self.resize_size})"
        )


class ObjectDetection:
    """reference ``_presets.py:23``: just convert to float [0,1]."""

    def __call__(self, img: jax.Array) -> jax.Array:
        return F.to_dtype_image(img, jnp.float32, scale=True)


class SemanticSegmentation:
    """reference ``_presets.py:147``."""

    def __init__(
        self,
        *,
        resize_size: Optional[int],
        mean: Sequence[float] = (0.485, 0.456, 0.406),
        std: Sequence[float] = (0.229, 0.224, 0.225),
        interpolation: str = "bilinear",
        antialias: bool = True,
    ):
        self.resize_size = [resize_size] if resize_size is not None else None
        self.mean = list(mean)
        self.std = list(std)
        self.interpolation = interpolation
        self.antialias = antialias

    def __call__(self, img: jax.Array) -> jax.Array:
        if self.resize_size is not None:
            img = F.resize_image(
                img, self.resize_size, self.interpolation, antialias=self.antialias
            )
        img = F.to_dtype_image(img, jnp.float32, scale=True)
        return F.normalize_image(img, self.mean, self.std)


class VideoClassification:
    """reference ``_presets.py:86``: resize -> center crop -> rescale ->
    normalize, over (..., T, H, W, C) clips."""

    def __init__(
        self,
        *,
        crop_size: Tuple[int, int],
        resize_size: Tuple[int, int],
        mean: Sequence[float] = (0.43216, 0.394666, 0.37645),
        std: Sequence[float] = (0.22803, 0.22145, 0.216989),
        interpolation: str = "bilinear",
    ):
        self.crop_size = crop_size
        self.resize_size = resize_size
        self.mean = list(mean)
        self.std = list(std)
        self.interpolation = interpolation

    def __call__(self, vid: jax.Array) -> jax.Array:
        from vision_tpu.transforms.v2.functional._resample import resize_2d

        vid = resize_2d(
            vid,
            tuple(self.resize_size)
            if len(self.resize_size) == 2
            else (self.resize_size[0], self.resize_size[0]),
            mode=self.interpolation,
            antialias=False,
        )
        vid = F.center_crop_image(vid, self.crop_size)
        vid = F.to_dtype_image(vid, jnp.float32, scale=True)
        return F.normalize_image(vid, self.mean, self.std)


class OpticalFlow:
    """reference ``_presets.py:191``: float [-1, 1]."""

    def __call__(self, img1: jax.Array, img2: jax.Array):
        img1 = F.to_dtype_image(img1, jnp.float32, scale=True)
        img2 = F.to_dtype_image(img2, jnp.float32, scale=True)
        img1 = F.normalize_image(img1, [0.5, 0.5, 0.5], [0.5, 0.5, 0.5])
        img2 = F.normalize_image(img2, [0.5, 0.5, 0.5], [0.5, 0.5, 0.5])
        return img1, img2
