"""Anchor generation (reference
``torchvision/models/detection/anchor_utils.py``)."""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["AnchorGenerator", "DefaultBoxGenerator"]


class AnchorGenerator:
    """reference ``anchor_utils.py:10-135``.

    Anchors are computed in numpy at trace time (static grid sizes) — they
    are compile-time constants under jit.
    """

    def __init__(
        self,
        sizes: Sequence[Sequence[int]] = ((128, 256, 512),),
        aspect_ratios: Sequence[Sequence[float]] = ((0.5, 1.0, 2.0),),
    ):
        if not isinstance(sizes[0], (list, tuple)):
            sizes = tuple((s,) for s in sizes)
        if not isinstance(aspect_ratios[0], (list, tuple)):
            aspect_ratios = (aspect_ratios,) * len(sizes)
        self.sizes = sizes
        self.aspect_ratios = aspect_ratios
        self.cell_anchors = [
            self._generate_anchors(size, ar)
            for size, ar in zip(sizes, aspect_ratios)
        ]

    @staticmethod
    def _generate_anchors(scales, aspect_ratios) -> np.ndarray:
        scales = np.asarray(scales, dtype=np.float32)
        aspect_ratios = np.asarray(aspect_ratios, dtype=np.float32)
        h_ratios = np.sqrt(aspect_ratios)
        w_ratios = 1.0 / h_ratios
        ws = (w_ratios[:, None] * scales[None, :]).reshape(-1)
        hs = (h_ratios[:, None] * scales[None, :]).reshape(-1)
        base = np.stack([-ws, -hs, ws, hs], axis=1) / 2
        return np.round(base)

    def num_anchors_per_location(self) -> List[int]:
        return [len(s) * len(a) for s, a in zip(self.sizes, self.aspect_ratios)]

    def __call__(
        self,
        image_size: Tuple[int, int],
        feature_map_sizes: Sequence[Tuple[int, int]],
    ) -> List[jax.Array]:
        """Returns per-level anchors [H*W*A, 4] in image coordinates."""
        img_h, img_w = image_size
        anchors = []
        for (fh, fw), cell in zip(feature_map_sizes, self.cell_anchors):
            stride_h = img_h // fh
            stride_w = img_w // fw
            shifts_x = np.arange(fw, dtype=np.float32) * stride_w
            shifts_y = np.arange(fh, dtype=np.float32) * stride_h
            sy, sx = np.meshgrid(shifts_y, shifts_x, indexing="ij")
            shifts = np.stack(
                [sx.reshape(-1), sy.reshape(-1), sx.reshape(-1), sy.reshape(-1)],
                axis=1,
            )  # [H*W, 4]
            a = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)
            anchors.append(jnp.asarray(a))
        return anchors


class DefaultBoxGenerator:
    """SSD default boxes (reference ``anchor_utils.py:136-`` DefaultBoxGenerator)."""

    def __init__(
        self,
        aspect_ratios: Sequence[Sequence[int]],
        min_ratio: float = 0.15,
        max_ratio: float = 0.9,
        scales: Optional[List[float]] = None,
        steps: Optional[List[int]] = None,
        clip: bool = True,
    ):
        self.aspect_ratios = aspect_ratios
        self.steps = steps
        self.clip = clip
        num_outputs = len(aspect_ratios)
        if scales is None:
            if num_outputs > 1:
                range_ratio = max_ratio - min_ratio
                self.scales = [
                    min_ratio + range_ratio * k / (num_outputs - 1.0)
                    for k in range(num_outputs)
                ]
                self.scales.append(1.0)
            else:
                self.scales = [min_ratio, max_ratio]
        else:
            self.scales = scales

        self._wh_pairs = self._generate_wh_pairs(num_outputs)

    def _generate_wh_pairs(self, num_outputs: int) -> List[np.ndarray]:
        _wh_pairs = []
        for k in range(num_outputs):
            s_k = self.scales[k]
            s_prime_k = math.sqrt(self.scales[k] * self.scales[k + 1])
            wh_pairs = [[s_k, s_k], [s_prime_k, s_prime_k]]
            for ar in self.aspect_ratios[k]:
                sq_ar = math.sqrt(ar)
                w = self.scales[k] * sq_ar
                h = self.scales[k] / sq_ar
                wh_pairs.extend([[w, h], [h, w]])
            _wh_pairs.append(np.asarray(wh_pairs, dtype=np.float32))
        return _wh_pairs

    def num_anchors_per_location(self) -> List[int]:
        return [2 + 2 * len(r) for r in self.aspect_ratios]

    def __call__(
        self,
        image_size: Tuple[int, int],
        feature_map_sizes: Sequence[Tuple[int, int]],
    ) -> jax.Array:
        """Returns xyxy default boxes [sum(H*W*A), 4] in image coords."""
        img_h, img_w = image_size
        boxes = []
        for k, (fh, fw) in enumerate(feature_map_sizes):
            if self.steps is not None:
                x_step = img_w / self.steps[k]
                y_step = img_h / self.steps[k]
            else:
                x_step, y_step = float(fw), float(fh)
            shifts_x = ((np.arange(fw) + 0.5) / x_step).astype(np.float32)
            shifts_y = ((np.arange(fh) + 0.5) / y_step).astype(np.float32)
            sy, sx = np.meshgrid(shifts_y, shifts_x, indexing="ij")
            sx, sy = sx.reshape(-1), sy.reshape(-1)
            wh = self._wh_pairs[k]
            if self.clip:
                wh = np.clip(wh, 0, 1)
            n_a = wh.shape[0]
            cx = np.repeat(sx, n_a)
            cy = np.repeat(sy, n_a)
            ws = np.tile(wh[:, 0], sx.shape[0])
            hs = np.tile(wh[:, 1], sx.shape[0])
            cxcywh = np.stack([cx, cy, ws, hs], axis=1)
            boxes.append(cxcywh)
        default = np.concatenate(boxes, axis=0)
        # scale to image size, convert to xyxy
        x1 = (default[:, 0] - 0.5 * default[:, 2]) * img_w
        y1 = (default[:, 1] - 0.5 * default[:, 3]) * img_h
        x2 = (default[:, 0] + 0.5 * default[:, 2]) * img_w
        y2 = (default[:, 1] + 0.5 * default[:, 3]) * img_h
        return jnp.asarray(np.stack([x1, y1, x2, y2], axis=1))
