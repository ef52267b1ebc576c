"""Detection utilities (reference
``torchvision/models/detection/_utils.py``): BoxCoder, BoxLinearCoder,
Matcher, BalancedPositiveNegativeSampler.

TPU design: everything operates on fixed-size padded tensors with validity
masks; the Matcher and sampler are batched masked ops (no per-image Python
loops, SURVEY.md §7 design stance (d)).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "BoxCoder",
    "BoxLinearCoder",
    "Matcher",
    "BalancedPositiveNegativeSampler",
]

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


class BoxCoder:
    """reference ``detection/_utils.py:122-238``: encode/decode box deltas
    (dx, dy, dw, dh) with weights and exp clip."""

    def __init__(
        self,
        weights: Tuple[float, float, float, float],
        bbox_xform_clip: float = math.log(1000.0 / 16),
    ):
        self.weights = weights
        self.bbox_xform_clip = bbox_xform_clip

    def encode(self, reference_boxes: jax.Array, proposals: jax.Array) -> jax.Array:
        """reference encode_boxes; inputs [..., N, 4] xyxy ->
        deltas [..., N, 4]."""
        wx, wy, ww, wh = self.weights
        ex_w = proposals[..., 2] - proposals[..., 0]
        ex_h = proposals[..., 3] - proposals[..., 1]
        ex_cx = proposals[..., 0] + 0.5 * ex_w
        ex_cy = proposals[..., 1] + 0.5 * ex_h

        gt_w = reference_boxes[..., 2] - reference_boxes[..., 0]
        gt_h = reference_boxes[..., 3] - reference_boxes[..., 1]
        gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
        gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

        dx = wx * (gt_cx - ex_cx) / ex_w
        dy = wy * (gt_cy - ex_cy) / ex_h
        dw = ww * jnp.log(gt_w / ex_w)
        dh = wh * jnp.log(gt_h / ex_h)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def decode(self, rel_codes: jax.Array, boxes: jax.Array) -> jax.Array:
        """reference decode_single; rel_codes [..., N, K*4], boxes
        [..., N, 4] -> [..., N, K, 4] (always f32: box-coordinate math is
        an f32-registered op under mixed precision, like the reference's
        autocast registrations in ``csrc/ops/autocast/`` — bf16 has ~3 px
        resolution at an 800 px canvas)."""
        rel_codes = rel_codes.astype(jnp.float32)
        boxes = boxes.astype(jnp.float32)
        widths = boxes[..., 2] - boxes[..., 0]
        heights = boxes[..., 3] - boxes[..., 1]
        ctr_x = boxes[..., 0] + 0.5 * widths
        ctr_y = boxes[..., 1] + 0.5 * heights

        wx, wy, ww, wh = self.weights
        codes = rel_codes.reshape(*rel_codes.shape[:-1], -1, 4)
        dx = codes[..., 0] / wx
        dy = codes[..., 1] / wy
        dw = jnp.clip(codes[..., 2] / ww, a_max=self.bbox_xform_clip)
        dh = jnp.clip(codes[..., 3] / wh, a_max=self.bbox_xform_clip)

        pred_cx = dx * widths[..., None] + ctr_x[..., None]
        pred_cy = dy * heights[..., None] + ctr_y[..., None]
        pred_w = jnp.exp(dw) * widths[..., None]
        pred_h = jnp.exp(dh) * heights[..., None]

        return jnp.stack(
            [
                pred_cx - 0.5 * pred_w,
                pred_cy - 0.5 * pred_h,
                pred_cx + 0.5 * pred_w,
                pred_cy + 0.5 * pred_h,
            ],
            axis=-1,
        )


class BoxLinearCoder:
    """FCOS linear transform (reference ``detection/_utils.py:240-310``):
    distances from anchor center to the 4 edges."""

    def __init__(self, normalize_by_size: bool = True):
        self.normalize_by_size = normalize_by_size

    def encode(self, reference_boxes: jax.Array, proposals: jax.Array) -> jax.Array:
        cx = (proposals[..., 0] + proposals[..., 2]) / 2
        cy = (proposals[..., 1] + proposals[..., 3]) / 2
        l = cx - reference_boxes[..., 0]
        t = cy - reference_boxes[..., 1]
        r = reference_boxes[..., 2] - cx
        b = reference_boxes[..., 3] - cy
        targets = jnp.stack([l, t, r, b], axis=-1)
        if self.normalize_by_size:
            w = proposals[..., 2] - proposals[..., 0]
            h = proposals[..., 3] - proposals[..., 1]
            strides = jnp.stack([w, h, w, h], axis=-1)
            targets = targets / strides
        return targets

    def decode(self, rel_codes: jax.Array, boxes: jax.Array) -> jax.Array:
        # f32-registered like BoxCoder.decode (autocast seam)
        rel_codes = rel_codes.astype(jnp.float32)
        boxes = boxes.astype(jnp.float32)
        cx = (boxes[..., 0] + boxes[..., 2]) / 2
        cy = (boxes[..., 1] + boxes[..., 3]) / 2
        if self.normalize_by_size:
            w = boxes[..., 2] - boxes[..., 0]
            h = boxes[..., 3] - boxes[..., 1]
            rel_codes = rel_codes * jnp.stack([w, h, w, h], axis=-1)
        return jnp.stack(
            [
                cx - rel_codes[..., 0],
                cy - rel_codes[..., 1],
                cx + rel_codes[..., 2],
                cy + rel_codes[..., 3],
            ],
            axis=-1,
        )


class Matcher:
    """reference ``detection/_utils.py:313``, fully vectorized.

    ``__call__(match_quality_matrix, valid_gt=None)`` with matrix [M, N]
    (M gt, N predictions) returns int32 matches [N]: gt index, or
    BELOW_LOW_THRESHOLD (-1) / BETWEEN_THRESHOLDS (-2). Padded gt rows are
    masked out via ``valid_gt`` [M] bool.
    """

    def __init__(
        self,
        high_threshold: float,
        low_threshold: float,
        allow_low_quality_matches: bool = False,
    ):
        if low_threshold > high_threshold:
            raise ValueError("low_threshold must be <= high_threshold")
        self.high_threshold = high_threshold
        self.low_threshold = low_threshold
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(
        self, match_quality_matrix: jax.Array, valid_gt: Optional[jax.Array] = None
    ) -> jax.Array:
        m = match_quality_matrix
        if valid_gt is not None:
            m = jnp.where(valid_gt[:, None], m, -1.0)
        matched_vals = jnp.max(m, axis=0)
        matches = jnp.argmax(m, axis=0).astype(jnp.int32)
        all_matches = matches

        below = matched_vals < self.low_threshold
        between = (matched_vals >= self.low_threshold) & (
            matched_vals < self.high_threshold
        )
        matches = jnp.where(below, BELOW_LOW_THRESHOLD, matches)
        matches = jnp.where(between, BETWEEN_THRESHOLDS, matches)

        if self.allow_low_quality_matches:
            # for each gt, the set of predictions tying its max quality gets
            # restored to the original argmax assignment
            highest_per_gt = jnp.max(m, axis=1, keepdims=True)  # [M, 1]
            is_best = m == highest_per_gt  # [M, N]
            if valid_gt is not None:
                is_best = is_best & valid_gt[:, None]
            pred_is_best_for_some_gt = jnp.any(is_best, axis=0)  # [N]
            matches = jnp.where(pred_is_best_for_some_gt, all_matches, matches)
        return matches


class SSDMatcher(Matcher):
    """reference ``detection/_utils.py`` SSDMatcher: single-threshold
    matching, then each gt's single best prediction is FORCED to that gt
    (``matches[argmax_pred_per_gt] = gt``; on conflicts the later gt
    wins, matching the reference's sequential assignment). This differs
    from ``allow_low_quality_matches`` (which restores the prediction's
    own argmax gt for every tying prediction)."""

    def __init__(self, threshold: float = 0.5):
        super().__init__(threshold, threshold, allow_low_quality_matches=False)

    def __call__(
        self, match_quality_matrix: jax.Array, valid_gt: Optional[jax.Array] = None
    ) -> jax.Array:
        matches = super().__call__(match_quality_matrix, valid_gt)
        m = match_quality_matrix
        if valid_gt is not None:
            m = jnp.where(valid_gt[:, None], m, -1.0)
        num_gt, num_pred = m.shape
        best_pred = jnp.argmax(m, axis=1)  # [M]
        onehot = best_pred[:, None] == jnp.arange(num_pred)[None, :]
        if valid_gt is not None:
            onehot = onehot & valid_gt[:, None]
        gt_idx = jnp.arange(num_gt)[:, None]
        # later gt wins on conflicts == max gt index claiming this pred
        forced = jnp.max(jnp.where(onehot, gt_idx, -1), axis=0)  # [N]
        return jnp.where(forced >= 0, forced, matches).astype(jnp.int32)


class BalancedPositiveNegativeSampler:
    """reference ``detection/_utils.py:11``: sample a fixed number of
    positives/negatives per image.

    TPU version: returns boolean masks [N] for pos and neg with *at most*
    the budgeted counts selected, chosen by random priority (top_k over
    random keys) — fixed-size, no host sync.
    """

    def __init__(self, batch_size_per_image: int, positive_fraction: float):
        self.batch_size_per_image = batch_size_per_image
        self.positive_fraction = positive_fraction

    def __call__(
        self, matched_idxs: jax.Array, key: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """matched_idxs: [N] (>= 0 positive, == -1 negative (below low
        threshold), == -2 ignored). Returns (pos_mask, neg_mask)."""
        positive = matched_idxs >= 0
        negative = matched_idxs == BELOW_LOW_THRESHOLD

        num_pos_budget = int(self.batch_size_per_image * self.positive_fraction)
        n = matched_idxs.shape[0]
        kp, kn = jax.random.split(key)

        # random priority: non-candidates get -inf so they never selected
        pri_pos = jnp.where(positive, jax.random.uniform(kp, (n,)), -jnp.inf)
        pri_neg = jnp.where(negative, jax.random.uniform(kn, (n,)), -jnp.inf)

        num_pos = jnp.minimum(jnp.sum(positive), num_pos_budget)
        # dynamic top-k via rank comparison: selected iff rank < num
        rank_pos = jnp.argsort(jnp.argsort(-pri_pos))
        pos_mask = positive & (rank_pos < num_pos)

        num_neg_budget = self.batch_size_per_image - num_pos
        num_neg = jnp.minimum(jnp.sum(negative), num_neg_budget)
        rank_neg = jnp.argsort(jnp.argsort(-pri_neg))
        neg_mask = negative & (rank_neg < num_neg)
        return pos_mask, neg_mask
