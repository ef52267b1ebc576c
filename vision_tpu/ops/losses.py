"""Detection losses (reference ``torchvision/ops/focal_loss.py``,
``giou_loss.py``, ``ciou_loss.py``, ``diou_loss.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vision_tpu.ops.boxes import _upcast, complete_box_iou, distance_box_iou

__all__ = [
    "sigmoid_focal_loss",
    "generalized_box_iou_loss",
    "complete_box_iou_loss",
    "distance_box_iou_loss",
]


def _reduce(loss: jax.Array, reduction: str) -> jax.Array:
    if reduction == "none":
        return loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(f"invalid reduction {reduction!r}")


def sigmoid_focal_loss(
    inputs: jax.Array,
    targets: jax.Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
    reduction: str = "none",
) -> jax.Array:
    """Focal loss (RetinaNet), reference ``ops/focal_loss.py:9``."""
    p = jax.nn.sigmoid(inputs)
    # numerically-stable BCE-with-logits
    ce_loss = jnp.clip(inputs, 0) - inputs * targets + jnp.log1p(
        jnp.exp(-jnp.abs(inputs))
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce_loss * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return _reduce(loss, reduction)


def generalized_box_iou_loss(
    boxes1: jax.Array,
    boxes2: jax.Array,
    reduction: str = "none",
    eps: float = 1e-7,
) -> jax.Array:
    """GIoU loss over *paired* boxes (reference ``ops/giou_loss.py:9``)."""
    boxes1, boxes2 = _upcast(boxes1), _upcast(boxes2)
    x1, y1, x2, y2 = jnp.split(boxes1, 4, axis=-1)
    x1g, y1g, x2g, y2g = jnp.split(boxes2, 4, axis=-1)
    xkis1 = jnp.maximum(x1, x1g)
    ykis1 = jnp.maximum(y1, y1g)
    xkis2 = jnp.minimum(x2, x2g)
    ykis2 = jnp.minimum(y2, y2g)
    intsctk = jnp.clip(xkis2 - xkis1, 0) * jnp.clip(ykis2 - ykis1, 0)
    unionk = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsctk
    iouk = intsctk / (unionk + eps)
    xc1 = jnp.minimum(x1, x1g)
    yc1 = jnp.minimum(y1, y1g)
    xc2 = jnp.maximum(x2, x2g)
    yc2 = jnp.maximum(y2, y2g)
    area_c = (xc2 - xc1) * (yc2 - yc1)
    miouk = iouk - (area_c - unionk) / (area_c + eps)
    loss = (1 - miouk).squeeze(-1)
    return _reduce(loss, reduction)


def complete_box_iou_loss(
    boxes1: jax.Array,
    boxes2: jax.Array,
    reduction: str = "none",
    eps: float = 1e-7,
) -> jax.Array:
    """CIoU loss over paired boxes (reference ``ops/ciou_loss.py:9``)."""
    boxes1, boxes2 = _upcast(boxes1), _upcast(boxes2)
    ciou = jax.vmap(lambda a, b: complete_box_iou(a[None], b[None], eps)[0, 0])(
        boxes1.reshape(-1, 4), boxes2.reshape(-1, 4)
    ).reshape(boxes1.shape[:-1])
    return _reduce(1 - ciou, reduction)


def distance_box_iou_loss(
    boxes1: jax.Array,
    boxes2: jax.Array,
    reduction: str = "none",
    eps: float = 1e-7,
) -> jax.Array:
    """DIoU loss over paired boxes (reference ``ops/diou_loss.py:9``)."""
    boxes1, boxes2 = _upcast(boxes1), _upcast(boxes2)
    diou = jax.vmap(lambda a, b: distance_box_iou(a[None], b[None], eps)[0, 0])(
        boxes1.reshape(-1, 4), boxes2.reshape(-1, 4)
    ).reshape(boxes1.shape[:-1])
    return _reduce(1 - diou, reduction)
