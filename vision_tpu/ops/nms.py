"""Non-maximum suppression — TPU-native, static-shape formulations.

The reference implements NMS natively: a CPU greedy loop
(``csrc/ops/cpu/nms_kernel.cpp:18-95``) and a CUDA 64x64 bitmask-tile kernel
(``csrc/ops/cuda/nms_kernel.cu:57-105``). Both return a dynamically-sized
int64 index list — a shape XLA cannot express under jit.

TPU design: every result is fixed-size.

* :func:`nms_mask` — the jit-native primitive: boolean keep mask over the
  *original* box order. Greedy-equivalent to the reference (same sort order,
  stable ties, strict ``>`` threshold comparison like the CUDA kernel).
* :func:`nms` — reference-API-shaped wrapper: ``-1``-padded int32 index
  vector in descending-score order (prefix = kept indices).
* :func:`batched_nms` — the coordinate-offset trick
  (reference ``ops/boxes.py:93``), always vectorized (no per-class loop).

The sequential greedy dependence is expressed as a ``lax.fori_loop`` over
score-sorted rows of the IoU matrix — O(N) iterations of O(N) VPU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["nms", "nms_mask", "batched_nms", "batched_nms_mask"]


def _iou_matrix(boxes: jax.Array) -> jax.Array:
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    # Guard 0/0 (degenerate boxes): reference CPU kernel computes
    # inter/union with union>0 always for valid boxes; degenerate boxes get
    # iou 0 so they never suppress each other.
    return jnp.where(union > 0, inter / union, 0.0)


def nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Greedy NMS; returns boolean keep mask aligned with the input order.

    ``valid`` optionally marks padding rows (False = ignore): padded entries
    are never kept and never suppress — this is how dynamic box counts are
    expressed on TPU.
    """
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=bool)
    boxes = boxes.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)

    order = jnp.argsort(-scores, stable=True)
    sboxes = boxes[order]
    iou = _iou_matrix(sboxes)
    # suppress[i, j]: row i (higher score) suppresses j (lower score)
    suppress = iou > iou_threshold

    idx = jnp.arange(n)

    def body(i, keep):
        # If row i survives, kill every later box it overlaps.
        kill = keep[i] & suppress[i] & (idx > i)
        return keep & ~kill

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), dtype=bool))
    if valid is not None:
        keep_sorted = keep_sorted & (scores[order] > -jnp.inf)
    # scatter back to original order
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float) -> jax.Array:
    """Reference-shaped NMS (``torchvision.ops.nms``, ``ops/boxes.py:20``):
    kept indices in descending score order — padded with ``-1`` to length N
    so the shape is static. ``result[result >= 0]`` outside jit reproduces
    the reference exactly."""
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=jnp.int32)
    order = jnp.argsort(-scores.astype(jnp.float32), stable=True)
    keep = nms_mask(boxes, scores, iou_threshold)
    keep_sorted = keep[order]
    # stable-compact kept indices to the front, -1 padding behind
    # (suppressed rows scatter to index n, dropped out of bounds)
    rank = jnp.cumsum(keep_sorted) - 1
    out = jnp.full((n,), -1, dtype=jnp.int32).at[
        jnp.where(keep_sorted, rank, n)
    ].set(order.astype(jnp.int32), mode="drop")
    return out


def batched_nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    idxs: jax.Array,
    iou_threshold: float,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Category-aware NMS keep mask via the coordinate-offset trick
    (reference ``ops/boxes.py:93-111``): boxes of different ``idxs`` are
    translated to disjoint regions so they never overlap."""
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool)
    boxes = boxes.astype(jnp.float32)
    max_coord = jnp.max(boxes)
    offsets = idxs.astype(jnp.float32) * (max_coord + 1.0)
    boxes_for_nms = boxes + offsets[:, None]
    return nms_mask(boxes_for_nms, scores, iou_threshold, valid=valid)


def batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    idxs: jax.Array,
    iou_threshold: float,
) -> jax.Array:
    """Reference-shaped batched NMS (``ops/boxes.py:57``): ``-1``-padded kept
    indices in descending score order."""
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=jnp.int32)
    keep = batched_nms_mask(boxes, scores, idxs, iou_threshold)
    order = jnp.argsort(-scores.astype(jnp.float32), stable=True)
    keep_sorted = keep[order]
    rank = jnp.cumsum(keep_sorted) - 1
    out = jnp.full((n,), -1, dtype=jnp.int32).at[
        jnp.where(keep_sorted, rank, n)
    ].set(order.astype(jnp.int32), mode="drop")
    return out
