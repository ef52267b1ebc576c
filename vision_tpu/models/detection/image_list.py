"""ImageList (reference ``torchvision/models/detection/image_list.py``):
a padded batch tensor + per-image unpadded sizes."""

from __future__ import annotations

from typing import List, Tuple

import jax


class ImageList:
    def __init__(self, tensors: jax.Array, image_sizes: List[Tuple[int, int]]):
        self.tensors = tensors  # [N, H, W, C] padded
        self.image_sizes = image_sizes  # [(h, w)] valid region per image
