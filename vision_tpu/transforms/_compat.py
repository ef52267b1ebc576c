"""v1-API compatibility surface (reference ``torchvision/transforms/``):
the v1 classes are thin aliases of their v2 implementations (the reference
itself recommends v2 for all new code; v1 kept for import compatibility).

Provides the v1-only names: ``InterpolationMode``, ``ToTensor``,
``ConvertImageDtype``."""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from vision_tpu.transforms.v2._transform import Transform

__all__ = ["InterpolationMode", "ToTensor", "ConvertImageDtype"]


class InterpolationMode(str, enum.Enum):
    """reference ``transforms/functional.py`` InterpolationMode. A str
    subclass so members pass anywhere the framework takes a mode string."""

    NEAREST = "nearest"
    NEAREST_EXACT = "nearest-exact"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
    BOX = "box"
    HAMMING = "hamming"
    LANCZOS = "lanczos"

    def __str__(self):
        return self.value


class ToTensor(Transform):
    """reference v1 ``ToTensor``: uint8 HWC -> float32 in [0, 1]. (The v2
    replacement is ``Compose([ToImage(), ToDtype(float32, scale=True)])``;
    NHWC is kept — no CHW permute on TPU.)"""

    def transform(self, inpt, params):
        arr = jnp.asarray(np.asarray(inpt))
        if jnp.issubdtype(arr.dtype, jnp.integer):
            return arr.astype(jnp.float32) / 255.0
        return arr.astype(jnp.float32)


class ConvertImageDtype(Transform):
    """reference v1 ``ConvertImageDtype`` == v2 ToDtype(dtype, scale=True)."""

    def __init__(self, dtype=jnp.float32):
        super().__init__()
        self.dtype = dtype

    def transform(self, inpt, params):
        from vision_tpu.transforms.v2.functional import to_dtype

        return to_dtype(inpt, self.dtype, scale=True)
