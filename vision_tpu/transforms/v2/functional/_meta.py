"""Metadata functionals (reference
``torchvision/transforms/v2/functional/_meta.py``)."""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import tv_tensors
from vision_tpu.ops.boxes import box_convert
from vision_tpu.tv_tensors import BoundingBoxes, BoundingBoxFormat, Image, KeyPoints, Mask, Video

__all__ = [
    "get_size",
    "get_num_channels",
    "get_num_frames",
    "convert_bounding_box_format",
    "clamp_bounding_boxes",
    "clamp_keypoints",
]


def get_size(inpt) -> List[int]:
    """[H, W] of an image/video/mask/boxes/keypoints
    (reference ``_meta.py`` ``get_size``)."""
    if isinstance(inpt, BoundingBoxes):
        return list(inpt.canvas_size)
    if isinstance(inpt, KeyPoints):
        return list(inpt.canvas_size)
    if isinstance(inpt, Mask):
        return list(inpt.shape[-2:])
    # channels-last image/video arrays
    arr = inpt.data if isinstance(inpt, tv_tensors.TVTensor) else inpt
    if arr.ndim < 3:
        return list(arr.shape[-2:])
    return list(arr.shape[-3:-1])


def get_num_channels(inpt) -> int:
    arr = inpt.data if isinstance(inpt, tv_tensors.TVTensor) else inpt
    if isinstance(inpt, Mask) or arr.ndim < 3:
        return 1
    return int(arr.shape[-1])


def get_num_frames(inpt) -> int:
    arr = inpt.data if isinstance(inpt, tv_tensors.TVTensor) else inpt
    return int(arr.shape[-4])


def _fmt_str(fmt: Union[str, BoundingBoxFormat]) -> str:
    if isinstance(fmt, BoundingBoxFormat):
        return fmt.value.lower()
    return fmt.lower()


def convert_bounding_box_format(
    inpt,
    old_format: Optional[Union[str, BoundingBoxFormat]] = None,
    new_format: Optional[Union[str, BoundingBoxFormat]] = None,
    inplace: bool = False,
):
    """reference ``_meta.py`` ``convert_bounding_box_format``.

    ``inplace`` is accepted for signature parity and ignored (JAX is
    functional; the reference returns the boxes either way)."""
    del inplace
    if new_format is None:
        raise TypeError("new_format is required")
    if isinstance(inpt, BoundingBoxes):
        out = box_convert(inpt.data, _fmt_str(inpt.format), _fmt_str(new_format))
        new_fmt = (
            new_format
            if isinstance(new_format, BoundingBoxFormat)
            else BoundingBoxFormat(new_format.upper())
        )
        return BoundingBoxes(
            out,
            format=new_fmt,
            canvas_size=inpt.canvas_size,
            clamping_mode=inpt.clamping_mode,
        )
    if old_format is None:
        raise TypeError("old_format is required for plain arrays")
    return box_convert(inpt, _fmt_str(old_format), _fmt_str(new_format))


def clamp_bounding_boxes(
    inpt,
    format: Optional[BoundingBoxFormat] = None,
    canvas_size: Optional[Tuple[int, int]] = None,
    clamping_mode: str = "auto",
):
    """Clamp boxes to the canvas (reference ``_meta.py:403,663``).

    Non-rotated: clamp xyxy to [0, W] x [0, H] (soft == hard).
    Rotated: the reference's polygon algorithm (``_meta.py:512-660``) —
    order vertices, clamp y-intercepts against the left edge, rotate the
    frame 90° four times; "soft" = smallest angle-preserving box enclosing
    the canvas∩box intersection, "hard" = largest enclosed box.
    """
    if isinstance(inpt, BoundingBoxes):
        fmt, cs = inpt.format, inpt.canvas_size
        mode = inpt.clamping_mode if clamping_mode == "auto" else clamping_mode
        out = _clamp_array(inpt.data, fmt, cs, mode)
        return BoundingBoxes(
            out, format=fmt, canvas_size=cs, clamping_mode=inpt.clamping_mode
        )
    if format is None or canvas_size is None:
        raise TypeError("format and canvas_size required for plain arrays")
    mode = "soft" if clamping_mode == "auto" else clamping_mode
    return _clamp_array(inpt, format, canvas_size, mode)


def _order_box_points(boxes8, indices=None):
    """reference ``_meta.py:428`` _order_bounding_boxes_points: roll each
    polygon so (x1, y1) is the lowest-x (ties: lowest-y) vertex."""
    if indices is None:
        x, y = boxes8[..., 0::2], boxes8[..., 1::2]
        y_max = jnp.maximum(jnp.max(jnp.abs(y), axis=1, keepdims=True), 1e-12)
        x_max = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-12)
        start = jnp.argmin(y / y_max + (x / x_max) * 100.0, axis=1)
        base = jnp.ones_like(boxes8)
        base = base.at[:, 0].set(start * 2)
        indices = jnp.remainder(jnp.cumsum(base, axis=1), 8).astype(jnp.int32)
    return indices, jnp.take_along_axis(boxes8, indices, axis=1)


def _slope_intercept(box8):
    """reference ``_meta.py:459``: per-edge slope a and y-intercept b."""
    x, y = box8[..., ::2], box8[..., 1::2]
    dx = jnp.diff(x, append=x[..., 0:1])
    dy = jnp.diff(y, append=y[..., 0:1])
    a = dy / dx  # inf on vertical edges, like the reference
    b = y - a * x
    return a, b


def _intersection_point(a, b):
    """reference ``_meta.py:472``: pairwise line intersections -> 8-vec."""
    x = -jnp.diff(b, prepend=b[..., 3:4]) / jnp.diff(a, prepend=a[..., 3:4])
    y = a * x + b
    return jnp.concatenate([x[..., :, None], y[..., :, None]], -1).reshape(
        a.shape[0], 8
    )


def _clamp_y_intercept(boxes8, orig8, canvas_size, mode):
    """reference ``_meta.py:484``."""
    a, b = _slope_intercept(boxes8)
    a1, a2, a3, a4 = [a[..., i] for i in range(4)]
    b1, b2, b3, b4 = [b[..., i] for i in range(4)]
    _, bm = _slope_intercept(orig8)
    b1m, b2m, b3m, b4m = [bm[..., i] for i in range(4)]
    h, w = canvas_size

    b1 = jnp.clip(jnp.clip(b2, b1, b3), 0, h)
    b4 = jnp.clip(jnp.clip(b3, b2, b4), 0, h)
    if mode == "hard":
        b1 = b4 = (b1 + b4) / 2
        b2_cand = jnp.stack(
            [b1 * a2 / a1, b3 * a2 / a3, (a1 - a2) * w + b1, (a3 - a2) * w + b3],
            axis=1,
        )
        b2 = jnp.minimum(jnp.max(b2_cand, axis=1), b2)
        b3_cand = jnp.stack(
            [
                h * (1 - a3 / a4) + b4 * a3 / a4,
                h * (1 - a3 / a2) + b2 * a3 / a2,
                (a2 - a3) * w + b2,
                (a4 - a3) * w + b4,
            ],
            axis=1,
        )
        b3 = jnp.maximum(jnp.min(b3_cand, axis=1), b3)
    b1 = jnp.clip(b1, b1m, b3m)
    b3 = jnp.clip(b3, b1m, b3m)
    b2 = jnp.clip(b2, b2m, b4m)
    b4 = jnp.clip(b4, b2m, b4m)
    return jnp.stack([b1, b2, b3, b4], axis=-1)


def _clamp_along_y_axis(boxes8, orig8, canvas_size, mode):
    """reference ``_meta.py:553`` _clamp_along_y_axis."""
    a, _ = _slope_intercept(boxes8)
    x1, y1, x2, y2, x3, y3, x4, y4 = [boxes8[..., i] for i in range(8)]
    b = _clamp_y_intercept(boxes8, orig8, canvas_size, mode)

    case_a = _intersection_point(a, b)
    case_b = boxes8.at[..., 0].set(jnp.maximum(boxes8[..., 0], 0))
    case_b = case_b.at[..., 6].set(jnp.maximum(case_b[..., 6], 0))
    case_c = jnp.zeros_like(boxes8)

    cond_a = (x1 < 0) & ~jnp.any(jnp.isnan(case_a), axis=-1)
    cond_b = jnp.isclose(y1, y2) | jnp.isclose(y3, y4)
    cond_c = (x1 <= 0) & (x2 <= 0) & (x3 <= 0) & (x4 <= 0)
    cond_c = (
        cond_c
        | jnp.isclose(y1, y4)
        | jnp.isclose(y2, y3)
        | (cond_b & jnp.isclose(x1, x2))
    )
    out = boxes8
    for cond, case in ((cond_a, case_a), (cond_b, case_b), (cond_c, case_c)):
        out = jnp.where(cond[..., None], case, out)
    return out


def _clamp_rotated_array(boxes, fmt, canvas_size, mode):
    """reference ``_meta.py:603`` _clamp_rotated_bounding_boxes: order
    points, clamp against the left edge, rotate the frame 90° CCW four
    times so each canvas edge takes a turn as "left"."""
    original_shape = boxes.shape
    fmt_str = _fmt_str(fmt)
    out = box_convert(
        boxes.astype(jnp.float32).reshape(-1, boxes.shape[-1]),
        fmt_str, "xyxyxyxy",
    ).reshape(-1, 8)
    orig = out
    h, w = canvas_size
    for _ in range(4):
        indices, out = _order_box_points(out)
        _, orig = _order_box_points(orig, indices)
        out = _clamp_along_y_axis(out, orig, (h, w), mode)
        _, out = _order_box_points(out, indices)
        _, orig = _order_box_points(orig, indices)
        # rotate 90 degrees counter-clockwise
        out = jnp.concatenate(
            [out[:, 1::2][..., None], (w - out[:, ::2])[..., None]], -1
        ).reshape(-1, 8)
        orig = jnp.concatenate(
            [orig[:, 1::2][..., None], (w - orig[:, ::2])[..., None]], -1
        ).reshape(-1, 8)
        h, w = w, h
    return box_convert(out, "xyxyxyxy", fmt_str).reshape(original_shape)


def _clamp_array(boxes, fmt, canvas_size, mode):
    if mode is None:
        return boxes
    if isinstance(fmt, str):
        fmt = BoundingBoxFormat[fmt.upper()]
    if fmt in (
        BoundingBoxFormat.XYWHR,
        BoundingBoxFormat.CXCYWHR,
        BoundingBoxFormat.XYXYXYXY,
    ):
        in_dtype = boxes.dtype
        return _clamp_rotated_array(boxes, fmt, canvas_size, mode).astype(
            in_dtype
        )
    h, w = canvas_size
    in_dtype = boxes.dtype
    xyxy = box_convert(boxes.astype(jnp.float32), _fmt_str(fmt), "xyxy")
    x = jnp.clip(xyxy[..., 0::2], 0, w)
    y = jnp.clip(xyxy[..., 1::2], 0, h)
    xyxy = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)
    return box_convert(xyxy, "xyxy", _fmt_str(fmt)).astype(in_dtype)


def clamp_keypoints(
    inpt,
    canvas_size: Optional[Tuple[int, int]] = None,
):
    """Clamp keypoints into the canvas (reference ``_meta.py`` tail):
    x to [0, W-1], y to [0, H-1]."""
    if isinstance(inpt, KeyPoints):
        cs = inpt.canvas_size
        out = _clamp_kp(inpt.data, cs)
        return KeyPoints(out, canvas_size=cs)
    if canvas_size is None:
        raise TypeError("canvas_size required for plain arrays")
    return _clamp_kp(inpt, canvas_size)


def _clamp_kp(kp, canvas_size):
    h, w = canvas_size
    x = jnp.clip(kp[..., 0:1], 0, w - 1)
    y = jnp.clip(kp[..., 1:2], 0, h - 1)
    # channels beyond (x, y) — e.g. COCO visibility — pass through untouched
    return jnp.concatenate([x, y, kp[..., 2:]], axis=-1).astype(kp.dtype)
