"""Multi-scale RoIAlign pooling with FPN level assignment
(reference ``torchvision/ops/poolers.py``).

TPU design (SURVEY.md §7 step 2): the reference scatters rois to levels
with boolean indexing and per-level roi_align on dynamically-sized subsets
(``poolers.py:147-229``). Under XLA that becomes: run roi_align for the
full (static K) roi set against *every* level, then select per-roi rows by
the LevelMapper assignment with a masked sum — static shapes, no host sync.
The redundant per-level compute is gather-bound, trades FLOPs for
compile-friendliness, and is later fused by a Pallas kernel.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from vision_tpu.ops.roi_align import roi_align

__all__ = ["LevelMapper", "MultiScaleRoIAlign"]


class LevelMapper:
    """FPN-paper heuristic mapping box area -> pyramid level
    (reference ``ops/poolers.py:47-86``)."""

    def __init__(
        self,
        k_min: int,
        k_max: int,
        canonical_scale: int = 224,
        canonical_level: int = 4,
        eps: float = 1e-6,
    ):
        self.k_min = k_min
        self.k_max = k_max
        self.s0 = canonical_scale
        self.lvl0 = canonical_level
        self.eps = eps

    def __call__(self, boxes: jax.Array) -> jax.Array:
        """boxes: [K, 4] xyxy -> int32 level index in [0, k_max - k_min]."""
        s = jnp.sqrt(
            (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        )
        target_lvls = jnp.floor(
            self.lvl0 + jnp.log2(s / self.s0) + self.eps
        )
        target_lvls = jnp.clip(target_lvls, self.k_min, self.k_max)
        return (target_lvls - self.k_min).astype(jnp.int32)


def _infer_scale(feature_size: int, original_size: int) -> float:
    """reference ``ops/poolers.py:98-112``: snap the size ratio to a
    power of two."""
    approx_scale = feature_size / original_size
    scale = 2 ** float(round(math.log2(approx_scale)))
    return scale


class MultiScaleRoIAlign:
    """reference ``ops/poolers.py:230``. Stateless (no parameters).

    Args:
        featmap_names: which keys of the feature dict to use.
        output_size: (PH, PW).
        sampling_ratio: as roi_align.
        canonical_scale/level: LevelMapper knobs.
    """

    def __init__(
        self,
        featmap_names: Sequence[str],
        output_size: int | Tuple[int, int],
        sampling_ratio: int,
        *,
        canonical_scale: int = 224,
        canonical_level: int = 4,
    ):
        self.featmap_names = list(featmap_names)
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        self.output_size = tuple(output_size)
        self.sampling_ratio = sampling_ratio
        self.canonical_scale = canonical_scale
        self.canonical_level = canonical_level

    def __call__(
        self,
        x: Dict[str, jax.Array],
        rois: jax.Array,
        image_size: Tuple[int, int],
    ) -> jax.Array:
        """x: dict of NHWC features; rois: [K, 5] (batch, x1, y1, x2, y2) in
        input-image coordinates; image_size: (H, W) of the model input.
        Returns [K, PH, PW, C]."""
        feats = [x[k] for k in self.featmap_names]
        scales = [
            _infer_scale(f.shape[1], image_size[0]) for f in feats
        ]
        if len(feats) == 1:
            return roi_align(
                feats[0], rois, self.output_size, scales[0], self.sampling_ratio
            )

        lvl_min = int(-math.log2(scales[0]))
        lvl_max = int(-math.log2(scales[-1]))
        mapper = LevelMapper(
            lvl_min,
            lvl_max,
            canonical_scale=self.canonical_scale,
            canonical_level=self.canonical_level,
        )
        levels = mapper(rois[:, 1:5])  # [K]

        out = None
        for lvl, (feat, scale) in enumerate(zip(feats, scales)):
            pooled = roi_align(
                feat, rois, self.output_size, scale, self.sampling_ratio
            )  # [K, PH, PW, C]
            sel = (levels == lvl).astype(pooled.dtype)[:, None, None, None]
            out = pooled * sel if out is None else out + pooled * sel
        return out
