"""Pairwise IoU of rotated boxes — vectorized convex-polygon intersection.

Reference: ``torchvision/csrc/ops/box_iou_rotated_utils.h`` (rotated rect
intersection via polygon clipping, used by ``box_iou(fmt=rotated)``,
``ops/boxes.py:398``).

TPU formulation: instead of the reference's per-pair scalar clipping loop,
all candidate intersection vertices are computed at once —
16 edge-edge intersections + 2x4 contained corners = 24 masked candidates
per pair — then sorted by angle around their centroid (the intersection of
convex sets is convex) and integrated with a masked shoelace fan. Pure VPU
math, vmap over the (N, M) pair grid, no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vision_tpu.ops import _box_convert as _bc

__all__ = ["box_iou_rotated"]


def _corners(boxes: jax.Array) -> jax.Array:
    """cxcywhr [..., 5] -> corners [..., 4, 2]."""
    xywhr = _bc._box_cxcywhr_to_xywhr(boxes)
    pts = _bc._box_xywhr_to_xyxyxyxy(xywhr)  # [..., 8]
    return pts.reshape(*pts.shape[:-1], 4, 2)


def _pair_intersection_area(c1: jax.Array, c2: jax.Array) -> jax.Array:
    """c1, c2: [4, 2] corners of two convex quads -> intersection area."""

    def cross(o, a, b):
        return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
            a[..., 1] - o[..., 1]
        ) * (b[..., 0] - o[..., 0])

    # --- 16 edge-edge intersections ---
    p1 = c1  # [4, 2] edge starts
    p2 = jnp.roll(c1, -1, axis=0)  # edge ends
    q1 = c2
    q2 = jnp.roll(c2, -1, axis=0)

    d1 = (p2 - p1)[:, None, :]  # [4, 1, 2]
    d2 = (q2 - q1)[None, :, :]  # [1, 4, 2]
    w = q1[None, :, :] - p1[:, None, :]  # [4, 4, 2]
    den = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]  # [4, 4]
    t = (w[..., 0] * d2[..., 1] - w[..., 1] * d2[..., 0]) / jnp.where(
        den == 0, 1.0, den
    )
    u = (w[..., 0] * d1[..., 1] - w[..., 1] * d1[..., 0]) / jnp.where(
        den == 0, 1.0, den
    )
    valid_int = (den != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts_int = p1[:, None, :] + t[..., None] * d1  # [4, 4, 2]
    pts_int = pts_int.reshape(16, 2)
    valid_int = valid_int.reshape(16)

    # --- corners of one quad inside the other ---
    def inside(pts, quad):
        # convex quad with consistent winding: point inside iff all cross
        # products with edges share sign
        a = quad[None, :, :]  # [1, 4, 2]
        b = jnp.roll(quad, -1, axis=0)[None, :, :]
        cr = (b[..., 0] - a[..., 0]) * (pts[:, None, 1] - a[..., 1]) - (
            b[..., 1] - a[..., 1]
        ) * (pts[:, None, 0] - a[..., 0])
        return jnp.all(cr >= -1e-9, axis=1) | jnp.all(cr <= 1e-9, axis=1)

    in1 = inside(c1, c2)  # c1 corners inside quad2
    in2 = inside(c2, c1)

    pts = jnp.concatenate([pts_int, c1, c2], axis=0)  # [24, 2]
    valid = jnp.concatenate([valid_int, in1, in2], axis=0)  # [24]

    num_valid = jnp.sum(valid)

    # centroid of valid points
    centroid = jnp.sum(
        jnp.where(valid[:, None], pts, 0.0), axis=0
    ) / jnp.maximum(num_valid, 1)

    ang = jnp.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    ang = jnp.where(valid, ang, jnp.inf)  # invalid sort last
    order = jnp.argsort(ang)
    pts_sorted = pts[order]
    valid_sorted = valid[order]

    # masked shoelace fan from the first (valid) vertex: replace invalid
    # points with p0 so their triangles are degenerate
    p0 = pts_sorted[0]
    pts_fan = jnp.where(valid_sorted[:, None], pts_sorted, p0)
    a = pts_fan[:-1]
    b = jnp.roll(pts_fan, -1, axis=0)[:-1]
    area2 = jnp.sum(
        (a[:, 0] - p0[0]) * (b[:, 1] - p0[1])
        - (a[:, 1] - p0[1]) * (b[:, 0] - p0[0])
    )
    area = jnp.abs(area2) / 2.0
    return jnp.where(num_valid >= 3, area, 0.0)


def box_iou_rotated(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise IoU of rotated boxes in cxcywhr (degrees) format.

    boxes1: [N, 5]; boxes2: [M, 5] -> [N, M].
    """
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)
    c1 = _corners(boxes1)  # [N, 4, 2]
    c2 = _corners(boxes2)  # [M, 4, 2]
    area1 = boxes1[:, 2] * boxes1[:, 3]
    area2 = boxes2[:, 2] * boxes2[:, 3]

    inter = jax.vmap(
        lambda a: jax.vmap(lambda b: _pair_intersection_area(a, b))(c2)
    )(c1)  # [N, M]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)
