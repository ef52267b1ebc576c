"""Box operations (reference ``torchvision/ops/boxes.py``).

All functions are pure jnp over static shapes. Functions that in the
reference return dynamically-sized index lists (``nms``, ``batched_nms``,
``remove_small_boxes``) here return fixed-size results: boolean keep masks
or ``-1``-padded index vectors — the TPU-native formulation (no host sync,
no dynamic shapes under jit). See ``vision_tpu.ops.nms`` for details.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vision_tpu.ops import _box_convert as _bc

__all__ = [
    "box_convert",
    "box_area",
    "box_iou",
    "generalized_box_iou",
    "complete_box_iou",
    "distance_box_iou",
    "clip_boxes_to_image",
    "remove_small_boxes",
    "masks_to_boxes",
    "nms",
    "batched_nms",
]


def _upcast(t: jax.Array) -> jax.Array:
    # Protect against overflow in multiplications (reference ops/_utils.py)
    if jnp.issubdtype(t.dtype, jnp.floating):
        return t if t.dtype in (jnp.float32, jnp.float64) else t.astype(jnp.float32)
    return t.astype(jnp.int32) if t.dtype in (jnp.int8, jnp.int16) else t


def box_convert(boxes: jax.Array, in_fmt: str, out_fmt: str) -> jax.Array:
    """Convert boxes between formats (reference ``ops/boxes.py:191``).

    Supported: xyxy, xywh, cxcywh, xywhr, cxcywhr, xyxyxyxy.
    """
    allowed = ("xyxy", "xywh", "cxcywh", "xywhr", "cxcywhr", "xyxyxyxy")
    in_fmt, out_fmt = in_fmt.lower(), out_fmt.lower()
    if in_fmt not in allowed or out_fmt not in allowed:
        raise ValueError(f"unsupported format pair {in_fmt}->{out_fmt}")
    if in_fmt == out_fmt:
        return boxes

    rotated = ("xywhr", "cxcywhr", "xyxyxyxy")
    if (in_fmt in rotated) != (out_fmt in rotated):
        raise ValueError(f"cannot convert between {in_fmt} and {out_fmt}")

    if in_fmt in rotated:
        if in_fmt != "xywhr":
            boxes = {
                "cxcywhr": _bc._box_cxcywhr_to_xywhr,
                "xyxyxyxy": _bc._box_xyxyxyxy_to_xywhr,
            }[in_fmt](boxes)
        if out_fmt == "xywhr":
            return boxes
        return {
            "cxcywhr": _bc._box_xywhr_to_cxcywhr,
            "xyxyxyxy": _bc._box_xywhr_to_xyxyxyxy,
        }[out_fmt](boxes)

    if in_fmt != "xyxy":
        boxes = {
            "xywh": _bc._box_xywh_to_xyxy,
            "cxcywh": _bc._box_cxcywh_to_xyxy,
        }[in_fmt](boxes)
    if out_fmt == "xyxy":
        return boxes
    return {
        "xywh": _bc._box_xyxy_to_xywh,
        "cxcywh": _bc._box_xyxy_to_cxcywh,
    }[out_fmt](boxes)


def box_area(boxes: jax.Array, fmt: str = "xyxy") -> jax.Array:
    """Area of boxes (reference ``ops/boxes.py:279``)."""
    boxes = _upcast(boxes)
    if fmt in ("xywhr", "cxcywhr"):
        return boxes[..., 2] * boxes[..., 3]
    if fmt == "xyxyxyxy":
        b = box_convert(boxes, "xyxyxyxy", "xywhr")
        return b[..., 2] * b[..., 3]
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def _box_inter_union(boxes1, boxes2) -> Tuple[jax.Array, jax.Array]:
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter, union


def box_iou(boxes1: jax.Array, boxes2: jax.Array, fmt: str = "xyxy") -> jax.Array:
    """Pairwise IoU ``(N, M)`` (reference ``ops/boxes.py:350``).

    Rotated formats dispatch to ``vision_tpu.ops.box_iou_rotated``
    (reference native op, ``csrc/ops/box_iou_rotated.cpp``).
    """
    if fmt in ("xywhr", "cxcywhr", "xyxyxyxy"):
        from vision_tpu.ops._box_iou_rotated import box_iou_rotated

        b1 = box_convert(_upcast(boxes1), fmt, "cxcywhr")
        b2 = box_convert(_upcast(boxes2), fmt, "cxcywhr")
        return box_iou_rotated(b1, b2)
    boxes1, boxes2 = _upcast(boxes1), _upcast(boxes2)
    inter, union = _box_inter_union(boxes1, boxes2)
    return inter / union


def generalized_box_iou(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """GIoU (reference ``ops/boxes.py:409``)."""
    boxes1, boxes2 = _upcast(boxes1), _upcast(boxes2)
    inter, union = _box_inter_union(boxes1, boxes2)
    iou = inter / union
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def complete_box_iou(
    boxes1: jax.Array, boxes2: jax.Array, eps: float = 1e-7
) -> jax.Array:
    """CIoU (reference ``ops/boxes.py:439``)."""
    boxes1, boxes2 = _upcast(boxes1), _upcast(boxes2)
    diou, iou = _box_diou_iou(boxes1, boxes2, eps)
    w_pred = boxes1[..., :, None, 2] - boxes1[..., :, None, 0]
    h_pred = boxes1[..., :, None, 3] - boxes1[..., :, None, 1]
    w_gt = boxes2[..., None, :, 2] - boxes2[..., None, :, 0]
    h_gt = boxes2[..., None, :, 3] - boxes2[..., None, :, 1]
    v = (4 / (jnp.pi**2)) * (
        jnp.arctan(w_gt / h_gt) - jnp.arctan(w_pred / h_pred)
    ) ** 2
    alpha = jax.lax.stop_gradient(v / (1 - iou + v + eps))
    return diou - alpha * v


def distance_box_iou(
    boxes1: jax.Array, boxes2: jax.Array, eps: float = 1e-7
) -> jax.Array:
    """DIoU (reference ``ops/boxes.py:472``)."""
    boxes1, boxes2 = _upcast(boxes1), _upcast(boxes2)
    diou, _ = _box_diou_iou(boxes1, boxes2, eps)
    return diou


def _box_diou_iou(boxes1, boxes2, eps):
    inter, union = _box_inter_union(boxes1, boxes2)
    iou = inter / union
    lti = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rbi = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    whi = jnp.clip(rbi - lti, 0)
    diagonal = whi[..., 0] ** 2 + whi[..., 1] ** 2 + eps
    cx1 = (boxes1[..., :, None, 0] + boxes1[..., :, None, 2]) / 2
    cy1 = (boxes1[..., :, None, 1] + boxes1[..., :, None, 3]) / 2
    cx2 = (boxes2[..., None, :, 0] + boxes2[..., None, :, 2]) / 2
    cy2 = (boxes2[..., None, :, 1] + boxes2[..., None, :, 3]) / 2
    centers = (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2
    return iou - centers / diagonal, iou


def clip_boxes_to_image(boxes: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Clamp xyxy boxes to ``[0, W] x [0, H]`` (reference ``ops/boxes.py:155``).

    ``size`` is (H, W)."""
    h, w = size
    x = jnp.clip(boxes[..., 0::2], 0, w)
    y = jnp.clip(boxes[..., 1::2], 0, h)
    return jnp.stack(
        [x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1
    ).astype(boxes.dtype)


def remove_small_boxes(boxes: jax.Array, min_size: float) -> jax.Array:
    """Boolean mask of boxes with both sides >= min_size
    (reference ``ops/boxes.py:129`` returns indices; TPU version returns a
    mask — combine with ``jnp.nonzero`` outside jit if indices are needed).
    """
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


def masks_to_boxes(masks: jax.Array) -> jax.Array:
    """Bounding boxes around nonzero mask regions, ``(N, H, W) -> (N, 4)``
    xyxy (reference ``ops/boxes.py:518``). Empty masks produce zeros."""
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks != 0
    big = jnp.float32(1e9)
    x1 = jnp.min(jnp.where(m, xs, big), axis=(1, 2))
    y1 = jnp.min(jnp.where(m, ys, big), axis=(1, 2))
    x2 = jnp.max(jnp.where(m, xs, -big), axis=(1, 2))
    y2 = jnp.max(jnp.where(m, ys, -big), axis=(1, 2))
    any_m = jnp.any(m, axis=(1, 2))
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    return jnp.where(any_m[:, None], boxes, 0.0)


# NMS lives in its own module (Pallas kernel + XLA fallback); re-exported
# here for reference-API parity.
from vision_tpu.ops.nms import batched_nms, nms  # noqa: E402,F401
