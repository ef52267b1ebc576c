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
):
    """reference ``_meta.py`` ``convert_bounding_box_format``."""
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
    Rotated boxes currently pass through unclamped (the reference's rotated
    polygon clamping, ``_meta.py:512-660``, is a niche path; tracked TODO).
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


def _clamp_array(boxes, fmt, canvas_size, mode):
    if mode is None:
        return boxes
    if fmt in (
        BoundingBoxFormat.XYWHR,
        BoundingBoxFormat.CXCYWHR,
        BoundingBoxFormat.XYXYXYXY,
    ):
        return boxes  # TODO: rotated polygon clamping
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
    x = jnp.clip(kp[..., 0], 0, w - 1)
    y = jnp.clip(kp[..., 1], 0, h - 1)
    return jnp.stack([x, y], axis=-1).astype(kp.dtype)
