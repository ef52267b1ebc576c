"""Box format conversion math (reference ``torchvision/ops/_box_convert.py``).

All functions are pure jnp, operate on ``(..., N, K)`` arrays, and are
jit/vmap-safe. Rotated formats use degrees, counter-clockwise-positive angle
(matching the reference's convention, `_box_convert.py` rotated helpers).
"""

from __future__ import annotations

import jax.numpy as jnp


def _box_xywh_to_xyxy(boxes):
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def _box_xyxy_to_xywh(boxes):
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def _box_cxcywh_to_xyxy(boxes):
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def _box_xyxy_to_cxcywh(boxes):
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def _box_xywhr_to_cxcywhr(boxes):
    x, y, w, h, r = jnp.split(boxes, 5, axis=-1)
    r_rad = jnp.deg2rad(r)
    cos, sin = jnp.cos(r_rad), jnp.sin(r_rad)
    cx = x + w / 2 * cos + h / 2 * sin
    cy = y - w / 2 * sin + h / 2 * cos
    return jnp.concatenate([cx, cy, w, h, r], axis=-1)


def _box_cxcywhr_to_xywhr(boxes):
    cx, cy, w, h, r = jnp.split(boxes, 5, axis=-1)
    r_rad = jnp.deg2rad(r)
    cos, sin = jnp.cos(r_rad), jnp.sin(r_rad)
    x = cx - w / 2 * cos - h / 2 * sin
    y = cy + w / 2 * sin - h / 2 * cos
    return jnp.concatenate([x, y, w, h, r], axis=-1)


def _box_xywhr_to_xyxyxyxy(boxes):
    x1, y1, w, h, r = jnp.split(boxes, 5, axis=-1)
    r_rad = jnp.deg2rad(r)
    cos, sin = jnp.cos(r_rad), jnp.sin(r_rad)
    x2 = x1 + w * cos
    y2 = y1 - w * sin
    x3 = x2 + h * sin
    y3 = y2 + h * cos
    x4 = x1 + h * sin
    y4 = y1 + h * cos
    return jnp.concatenate([x1, y1, x2, y2, x3, y3, x4, y4], axis=-1)


def _box_xyxyxyxy_to_xywhr(boxes):
    x1, y1, x2, y2, x3, y3, x4, y4 = jnp.split(boxes, 8, axis=-1)
    r_rad = jnp.arctan2(y1 - y2, x2 - x1)
    r = jnp.rad2deg(r_rad)
    w = jnp.sqrt((y2 - y1) ** 2 + (x2 - x1) ** 2)
    h = jnp.sqrt((y3 - y2) ** 2 + (x3 - x2) ** 2)
    return jnp.concatenate([x1, y1, w, h, r], axis=-1)
