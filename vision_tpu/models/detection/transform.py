"""GeneralizedRCNNTransform (reference
``torchvision/models/detection/transform.py:86-287``): normalize + min/max
resize + pad-to-canvas batching, and the inverse postprocess.

TPU design: the output canvas is a FIXED static size (ceil(max_size/32)*32
square by default) so the whole detector compiles once — the reference pads
to the per-batch max, a dynamic shape XLA can't jit (SURVEY.md §7 step 6
"bucketed static image sizes").
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models.detection.image_list import ImageList
from vision_tpu.transforms.v2.functional._resample import resize_2d

__all__ = ["GeneralizedRCNNTransform", "resize_boxes", "resize_keypoints"]


def resize_boxes(boxes, original_size, new_size):
    """reference ``transform.py`` resize_boxes."""
    rh = new_size[0] / original_size[0]
    rw = new_size[1] / original_size[1]
    x1 = boxes[..., 0] * rw
    y1 = boxes[..., 1] * rh
    x2 = boxes[..., 2] * rw
    y2 = boxes[..., 3] * rh
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def resize_keypoints(kp, original_size, new_size):
    rh = new_size[0] / original_size[0]
    rw = new_size[1] / original_size[1]
    return jnp.stack(
        [kp[..., 0] * rw, kp[..., 1] * rh] + (
            [kp[..., 2]] if kp.shape[-1] == 3 else []
        ),
        axis=-1,
    )


class GeneralizedRCNNTransform:
    def __init__(
        self,
        min_size: int = 800,
        max_size: int = 1333,
        image_mean: Tuple[float, ...] = (0.485, 0.456, 0.406),
        image_std: Tuple[float, ...] = (0.229, 0.224, 0.225),
        size_divisible: int = 32,
        fixed_size: Optional[Tuple[int, int]] = None,
    ):
        self.min_size = min_size
        self.max_size = max_size
        self.image_mean = list(image_mean)
        self.image_std = list(image_std)
        self.size_divisible = size_divisible
        if fixed_size is None:
            canvas = int(math.ceil(max_size / size_divisible) * size_divisible)
            fixed_size = (canvas, canvas)
        self.fixed_size = fixed_size

    def _target_size(self, h: int, w: int) -> Tuple[int, int]:
        """reference ``transform.py:179``: scale so short side -> min_size,
        capped by max_size on the long side."""
        scale = min(self.min_size / min(h, w), self.max_size / max(h, w))
        return int(round(h * scale)), int(round(w * scale))

    def __call__(
        self, images: List[jax.Array]
    ) -> ImageList:
        """images: list of HWC float arrays in [0,1] (any sizes).
        Returns ImageList with a static-canvas batch."""
        canvas_h, canvas_w = self.fixed_size
        mean = jnp.asarray(self.image_mean, jnp.float32)
        std = jnp.asarray(self.image_std, jnp.float32)

        batched = []
        sizes = []
        for img in images:
            h, w = int(img.shape[0]), int(img.shape[1])
            nh, nw = self._target_size(h, w)
            x = (img.astype(jnp.float32) - mean) / std
            x = resize_2d(x, (nh, nw), mode="bilinear", antialias=False)
            x = jnp.pad(
                x, ((0, canvas_h - nh), (0, canvas_w - nw), (0, 0))
            )
            batched.append(x)
            sizes.append((nh, nw))
        return ImageList(jnp.stack(batched), sizes)

    def postprocess_boxes(
        self,
        boxes: jax.Array,
        image_size: Tuple[int, int],
        original_size: Tuple[int, int],
    ) -> jax.Array:
        """reference ``transform.py:257`` postprocess: rescale boxes from
        the resized frame back to original image coordinates."""
        return resize_boxes(boxes, image_size, original_size)
