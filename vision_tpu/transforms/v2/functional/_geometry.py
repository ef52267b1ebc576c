"""Geometric functionals (reference
``torchvision/transforms/v2/functional/_geometry.py``, 3041 LoC).

Channels-last images ``(..., H, W, C)``; masks ``(..., H, W)``; boxes carry
(format, canvas_size) metadata. Every kernel is a pure jittable function of
static shapes. Affine-family image kernels share one inverse-warp sampler
(`_affine_grid_sample`) replicating torch's
``_gen_affine_grid`` + ``grid_sample(align_corners=False, padding=zeros)``
+ mask-based fill (``transforms/_functional_tensor.py``
``_apply_grid_transform``).
"""

from __future__ import annotations

import math
import numbers
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import tv_tensors
from vision_tpu.ops.boxes import box_convert
from vision_tpu.transforms.v2.functional._meta import (
    clamp_bounding_boxes,
)
from vision_tpu.transforms.v2.functional._resample import resize_2d
from vision_tpu.tv_tensors import (
    BoundingBoxes,
    BoundingBoxFormat,
    Image,
    KeyPoints,
    Mask,
    Video,
)

__all__ = [
    "resize",
    "resize_image",
    "resize_mask",
    "resize_bounding_boxes",
    "resize_keypoints",
    "horizontal_flip",
    "horizontal_flip_image",
    "horizontal_flip_mask",
    "horizontal_flip_bounding_boxes",
    "horizontal_flip_keypoints",
    "vertical_flip",
    "vertical_flip_image",
    "vertical_flip_mask",
    "vertical_flip_bounding_boxes",
    "vertical_flip_keypoints",
    "crop",
    "crop_image",
    "crop_mask",
    "crop_bounding_boxes",
    "crop_keypoints",
    "center_crop",
    "center_crop_image",
    "pad",
    "pad_image",
    "resized_crop",
    "resized_crop_image",
    "affine",
    "affine_image",
    "affine_bounding_boxes",
    "affine_keypoints",
    "affine_mask",
    "rotate",
    "rotate_image",
    "rotate_bounding_boxes",
    "rotate_mask",
    "perspective",
    "perspective_image",
    "perspective_bounding_boxes",
    "perspective_mask",
    "elastic",
    "elastic_image",
    "five_crop",
    "ten_crop",
]

_InterpT = str


def _is_image_like(inpt) -> bool:
    return isinstance(inpt, (jax.Array, np.ndarray)) and not isinstance(
        inpt, tv_tensors.TVTensor
    )


# ======================================================================
# resize
# ======================================================================
def _compute_resized_output_size(
    canvas_size: Tuple[int, int],
    size: Union[int, Sequence[int], None],
    max_size: Optional[int] = None,
) -> Tuple[int, int]:
    """reference ``_geometry.py`` ``_compute_resized_output_size`` semantics:
    int / [s] -> shorter edge s (aspect preserved, max_size cap);
    (h, w) -> exact."""
    h, w = canvas_size
    if isinstance(size, int):
        size = [size]
    elif isinstance(size, (list, tuple)) and len(size) == 2:
        return int(size[0]), int(size[1])
    (requested,) = size
    short, long = (w, h) if w <= h else (h, w)
    new_short = requested
    new_long = int(requested * long / short)
    if max_size is not None:
        if max_size <= requested:
            raise ValueError(f"max_size {max_size} must be > size {requested}")
        if new_long > max_size:
            new_short = int(max_size * new_short / new_long)
            new_long = max_size
    new_h, new_w = (new_long, new_short) if w <= h else (new_short, new_long)
    return new_h, new_w


def resize_image(
    image: jax.Array,
    size: Union[int, Sequence[int], None],
    interpolation: _InterpT = "bilinear",
    max_size: Optional[int] = None,
    antialias: bool = True,
) -> jax.Array:
    """reference ``_geometry.py:285`` resize_image."""
    h, w = image.shape[-3], image.shape[-2]
    new_h, new_w = _compute_resized_output_size((h, w), size, max_size)
    if (new_h, new_w) == (h, w) and interpolation != "area":
        return image
    return resize_2d(image, (new_h, new_w), mode=interpolation, antialias=antialias)


def resize_mask(
    mask: jax.Array, size, max_size: Optional[int] = None
) -> jax.Array:
    """Masks resize with nearest, no channel axis (reference resize_mask)."""
    h, w = mask.shape[-2], mask.shape[-1]
    new_h, new_w = _compute_resized_output_size((h, w), size, max_size)
    if (new_h, new_w) == (h, w):
        return mask
    out = resize_2d(
        mask[..., None], (new_h, new_w), mode="nearest", antialias=False
    )
    return out[..., 0]


def resize_bounding_boxes(
    boxes: jax.Array,
    format: BoundingBoxFormat,
    canvas_size: Tuple[int, int],
    size,
    max_size: Optional[int] = None,
) -> Tuple[jax.Array, Tuple[int, int]]:
    """reference ``_geometry.py:534``: scale coordinates by the ratios."""
    old_h, old_w = canvas_size
    new_h, new_w = _compute_resized_output_size(canvas_size, size, max_size)
    rw, rh = new_w / old_w, new_h / old_h
    b = boxes.astype(jnp.float32)
    if format in (BoundingBoxFormat.XYXYXYXY,):
        scale = jnp.array([rw, rh] * 4, dtype=jnp.float32)
        out = b * scale
    elif format in (BoundingBoxFormat.XYWHR, BoundingBoxFormat.CXCYWHR):
        # xy scales per-axis; w/h scale... rotated boxes under anisotropic
        # scale are approximated like the reference (scale w by rw, h by rh)
        out = b * jnp.array([rw, rh, rw, rh, 1.0], dtype=jnp.float32)
    else:
        out = b * jnp.array([rw, rh, rw, rh], dtype=jnp.float32)
    return out.astype(boxes.dtype), (new_h, new_w)


def resize_keypoints(
    kp: jax.Array, canvas_size: Tuple[int, int], size, max_size=None
) -> Tuple[jax.Array, Tuple[int, int]]:
    old_h, old_w = canvas_size
    new_h, new_w = _compute_resized_output_size(canvas_size, size, max_size)
    scale = jnp.array([new_w / old_w, new_h / old_h], dtype=jnp.float32)
    xy = (kp[..., :2].astype(jnp.float32) * scale).astype(kp.dtype)
    return jnp.concatenate([xy, kp[..., 2:]], axis=-1), (new_h, new_w)


def resize(
    inpt,
    size,
    interpolation: _InterpT = "bilinear",
    max_size: Optional[int] = None,
    antialias: bool = True,
):
    """Public dispatching resize (reference ``_geometry.py:249``)."""
    if _is_image_like(inpt):
        return resize_image(inpt, size, interpolation, max_size, antialias)
    if isinstance(inpt, (Image, Video)):
        return type(inpt)(
            resize_image(inpt.data, size, interpolation, max_size, antialias)
        )
    if isinstance(inpt, Mask):
        return Mask(resize_mask(inpt.data, size, max_size))
    if isinstance(inpt, BoundingBoxes):
        out, cs = resize_bounding_boxes(
            inpt.data, inpt.format, inpt.canvas_size, size, max_size
        )
        return BoundingBoxes(
            out, format=inpt.format, canvas_size=cs, clamping_mode=inpt.clamping_mode
        )
    if isinstance(inpt, KeyPoints):
        out, cs = resize_keypoints(inpt.data, inpt.canvas_size, size, max_size)
        return KeyPoints(out, canvas_size=cs)
    raise TypeError(f"resize: unsupported type {type(inpt).__name__}")


# ======================================================================
# flips
# ======================================================================
def horizontal_flip_image(image: jax.Array) -> jax.Array:
    return image[..., :, ::-1, :]


def horizontal_flip_mask(mask: jax.Array) -> jax.Array:
    return mask[..., :, ::-1]


def horizontal_flip_bounding_boxes(
    boxes: jax.Array, format: BoundingBoxFormat, canvas_size: Tuple[int, int]
) -> jax.Array:
    """reference ``_geometry.py:96-120`` incl. rotated formats."""
    w = canvas_size[1]
    b = boxes
    if format == BoundingBoxFormat.XYXY:
        x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
        return jnp.concatenate([w - x2, y1, w - x1, y2], axis=-1)
    if format == BoundingBoxFormat.XYWH:
        x, y, bw, bh = jnp.split(b, 4, axis=-1)
        return jnp.concatenate([w - x - bw, y, bw, bh], axis=-1)
    if format == BoundingBoxFormat.CXCYWH:
        cx, cy, bw, bh = jnp.split(b, 4, axis=-1)
        return jnp.concatenate([w - cx, cy, bw, bh], axis=-1)
    if format == BoundingBoxFormat.CXCYWHR:
        cx, cy, bw, bh, r = jnp.split(b, 5, axis=-1)
        return jnp.concatenate([w - cx, cy, bw, bh, -r], axis=-1)
    if format == BoundingBoxFormat.XYWHR:
        x, y, bw, bh, r = jnp.split(b, 5, axis=-1)
        return jnp.concatenate([w - x, y, bw, bh, 180.0 - r], axis=-1)
    if format == BoundingBoxFormat.XYXYXYXY:
        pts = b.reshape(*b.shape[:-1], 4, 2)
        flipped = jnp.stack([w - pts[..., 0], pts[..., 1]], axis=-1)
        return flipped.reshape(b.shape)
    raise ValueError(f"unsupported format {format}")


def horizontal_flip_keypoints(
    kp: jax.Array, canvas_size: Tuple[int, int]
) -> jax.Array:
    # channels beyond (x, y) — e.g. COCO visibility — pass through untouched
    w = canvas_size[1]
    return jnp.concatenate(
        [(w - 1 - kp[..., 0:1]).astype(kp.dtype), kp[..., 1:]], axis=-1
    )


def vertical_flip_image(image: jax.Array) -> jax.Array:
    return image[..., ::-1, :, :]


def vertical_flip_mask(mask: jax.Array) -> jax.Array:
    return mask[..., ::-1, :]


def vertical_flip_bounding_boxes(
    boxes: jax.Array, format: BoundingBoxFormat, canvas_size: Tuple[int, int]
) -> jax.Array:
    h = canvas_size[0]
    b = boxes
    if format == BoundingBoxFormat.XYXY:
        x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
        return jnp.concatenate([x1, h - y2, x2, h - y1], axis=-1)
    if format == BoundingBoxFormat.XYWH:
        x, y, bw, bh = jnp.split(b, 4, axis=-1)
        return jnp.concatenate([x, h - y - bh, bw, bh], axis=-1)
    if format == BoundingBoxFormat.CXCYWH:
        cx, cy, bw, bh = jnp.split(b, 4, axis=-1)
        return jnp.concatenate([cx, h - cy, bw, bh], axis=-1)
    if format == BoundingBoxFormat.CXCYWHR:
        cx, cy, bw, bh, r = jnp.split(b, 5, axis=-1)
        return jnp.concatenate([cx, h - cy, bw, bh, -r], axis=-1)
    if format == BoundingBoxFormat.XYWHR:
        x, y, bw, bh, r = jnp.split(b, 5, axis=-1)
        return jnp.concatenate([x, h - y, bw, bh, -r], axis=-1)
    if format == BoundingBoxFormat.XYXYXYXY:
        pts = b.reshape(*b.shape[:-1], 4, 2)
        flipped = jnp.stack([pts[..., 0], h - pts[..., 1]], axis=-1)
        return flipped.reshape(b.shape)
    raise ValueError(f"unsupported format {format}")


def vertical_flip_keypoints(kp: jax.Array, canvas_size: Tuple[int, int]) -> jax.Array:
    h = canvas_size[0]
    return jnp.concatenate(
        [kp[..., 0:1], (h - 1 - kp[..., 1:2]).astype(kp.dtype), kp[..., 2:]],
        axis=-1,
    )


def _dispatch_flip(inpt, image_k, mask_k, boxes_k, kp_k):
    if _is_image_like(inpt):
        return image_k(inpt)
    if isinstance(inpt, (Image, Video)):
        return type(inpt)(image_k(inpt.data))
    if isinstance(inpt, Mask):
        return Mask(mask_k(inpt.data))
    if isinstance(inpt, BoundingBoxes):
        out = boxes_k(inpt.data, inpt.format, inpt.canvas_size)
        return tv_tensors.wrap(out, like=inpt)
    if isinstance(inpt, KeyPoints):
        return KeyPoints(kp_k(inpt.data, inpt.canvas_size), canvas_size=inpt.canvas_size)
    raise TypeError(f"unsupported type {type(inpt).__name__}")


def horizontal_flip(inpt):
    return _dispatch_flip(
        inpt,
        horizontal_flip_image,
        horizontal_flip_mask,
        horizontal_flip_bounding_boxes,
        horizontal_flip_keypoints,
    )


def vertical_flip(inpt):
    return _dispatch_flip(
        inpt,
        vertical_flip_image,
        vertical_flip_mask,
        vertical_flip_bounding_boxes,
        vertical_flip_keypoints,
    )


# ======================================================================
# crop / pad
# ======================================================================
def crop_image(
    image: jax.Array, top: int, left: int, height: int, width: int
) -> jax.Array:
    """reference crop_image: out-of-bounds regions are zero-padded."""
    h, w = image.shape[-3], image.shape[-2]
    pad_top = max(-top, 0)
    pad_left = max(-left, 0)
    pad_bottom = max(top + height - h, 0)
    pad_right = max(left + width - w, 0)
    if pad_top or pad_left or pad_bottom or pad_right:
        cfg = [(0, 0)] * (image.ndim - 3) + [
            (pad_top, pad_bottom),
            (pad_left, pad_right),
            (0, 0),
        ]
        image = jnp.pad(image, cfg)
        top += pad_top
        left += pad_left
    return image[..., top : top + height, left : left + width, :]


def crop_mask(mask: jax.Array, top, left, height, width) -> jax.Array:
    out = crop_image(mask[..., None], top, left, height, width)
    return out[..., 0]


def crop_bounding_boxes(
    boxes: jax.Array,
    format: BoundingBoxFormat,
    top: int,
    left: int,
    height: int,
    width: int,
) -> Tuple[jax.Array, Tuple[int, int]]:
    b = boxes.astype(jnp.float32)
    if format == BoundingBoxFormat.XYXYXYXY:
        shift = jnp.array([left, top] * 4, dtype=jnp.float32)
        out = b - shift
    elif format in (BoundingBoxFormat.XYWHR, BoundingBoxFormat.CXCYWHR):
        shift = jnp.array([left, top, 0, 0, 0], dtype=jnp.float32)
        out = b - shift
    elif format in (BoundingBoxFormat.XYWH, BoundingBoxFormat.CXCYWH):
        shift = jnp.array([left, top, 0, 0], dtype=jnp.float32)
        out = b - shift
    else:
        shift = jnp.array([left, top, left, top], dtype=jnp.float32)
        out = b - shift
    return out.astype(boxes.dtype), (height, width)


def crop_keypoints(
    kp: jax.Array, top: int, left: int, height: int, width: int
) -> Tuple[jax.Array, Tuple[int, int]]:
    xy = kp[..., :2] - jnp.array([left, top], dtype=kp.dtype)
    return jnp.concatenate([xy, kp[..., 2:]], axis=-1), (height, width)


def crop(inpt, top: int, left: int, height: int, width: int):
    if _is_image_like(inpt):
        return crop_image(inpt, top, left, height, width)
    if isinstance(inpt, (Image, Video)):
        return type(inpt)(crop_image(inpt.data, top, left, height, width))
    if isinstance(inpt, Mask):
        return Mask(crop_mask(inpt.data, top, left, height, width))
    if isinstance(inpt, BoundingBoxes):
        out, cs = crop_bounding_boxes(
            inpt.data, inpt.format, top, left, height, width
        )
        bb = BoundingBoxes(
            out, format=inpt.format, canvas_size=cs, clamping_mode=inpt.clamping_mode
        )
        return clamp_bounding_boxes(bb)
    if isinstance(inpt, KeyPoints):
        out, cs = crop_keypoints(inpt.data, top, left, height, width)
        return KeyPoints(out, canvas_size=cs)
    raise TypeError(f"crop: unsupported type {type(inpt).__name__}")


def center_crop_image(image: jax.Array, output_size) -> jax.Array:
    """reference center_crop (``_geometry.py`` center_crop_image): pads with
    0 if the image is smaller than the crop."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    elif len(output_size) == 1:
        output_size = (output_size[0], output_size[0])
    crop_h, crop_w = output_size
    h, w = image.shape[-3], image.shape[-2]
    top = int(round((h - crop_h) / 2.0))
    left = int(round((w - crop_w) / 2.0))
    return crop_image(image, top, left, crop_h, crop_w)


def center_crop(inpt, output_size):
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    elif len(output_size) == 1:
        output_size = (output_size[0], output_size[0])
    crop_h, crop_w = output_size

    if _is_image_like(inpt) or isinstance(inpt, (Image, Video, Mask)):
        if isinstance(inpt, Mask):
            h, w = inpt.shape[-2:]
        elif _is_image_like(inpt):
            h, w = inpt.shape[-3], inpt.shape[-2]
        else:
            h, w = inpt.shape[-3], inpt.shape[-2]
    else:
        from vision_tpu.transforms.v2.functional._meta import get_size

        h, w = get_size(inpt)
    top = int(round((h - crop_h) / 2.0))
    left = int(round((w - crop_w) / 2.0))
    return crop(inpt, top, left, crop_h, crop_w)


def _parse_pad(padding) -> Tuple[int, int, int, int]:
    """-> (left, top, right, bottom), torch conventions."""
    if isinstance(padding, numbers.Number):
        return (padding,) * 4
    if len(padding) == 1:
        return (padding[0],) * 4
    if len(padding) == 2:
        l, t = padding
        return (l, t, l, t)
    if len(padding) == 4:
        return tuple(padding)
    raise ValueError(f"invalid padding {padding}")


def pad_image(
    image: jax.Array,
    padding,
    fill=0,
    padding_mode: str = "constant",
) -> jax.Array:
    left, top, right, bottom = _parse_pad(padding)
    cfg = [(0, 0)] * (image.ndim - 3) + [(top, bottom), (left, right), (0, 0)]
    if padding_mode == "constant":
        if fill is None:
            fill = 0
        if isinstance(fill, (list, tuple)):
            chans = [
                jnp.pad(
                    image[..., c : c + 1],
                    cfg,
                    constant_values=fill[c if len(fill) > 1 else 0],
                )
                for c in range(image.shape[-1])
            ]
            return jnp.concatenate(chans, axis=-1)
        return jnp.pad(image, cfg, constant_values=fill)
    mode = {"edge": "edge", "reflect": "reflect", "symmetric": "symmetric"}[
        padding_mode
    ]
    return jnp.pad(image, cfg, mode=mode)


def pad(inpt, padding, fill=0, padding_mode: str = "constant"):
    left, top, right, bottom = _parse_pad(padding)
    if _is_image_like(inpt):
        return pad_image(inpt, padding, fill, padding_mode)
    if isinstance(inpt, (Image, Video)):
        return type(inpt)(pad_image(inpt.data, padding, fill, padding_mode))
    if isinstance(inpt, Mask):
        out = pad_image(inpt.data[..., None], padding, fill, padding_mode)
        return Mask(out[..., 0])
    if isinstance(inpt, BoundingBoxes):
        h, w = inpt.canvas_size
        new_cs = (h + top + bottom, w + left + right)
        out, _ = crop_bounding_boxes(
            inpt.data, inpt.format, -top, -left, *new_cs
        )
        bb = BoundingBoxes(
            out,
            format=inpt.format,
            canvas_size=new_cs,
            clamping_mode=inpt.clamping_mode,
        )
        return clamp_bounding_boxes(bb)
    if isinstance(inpt, KeyPoints):
        h, w = inpt.canvas_size
        new_cs = (h + top + bottom, w + left + right)
        xy = inpt.data[..., :2] + jnp.array([left, top], dtype=inpt.dtype)
        out = jnp.concatenate([xy, inpt.data[..., 2:]], axis=-1)
        return KeyPoints(out, canvas_size=new_cs)
    raise TypeError(f"pad: unsupported type {type(inpt).__name__}")


def resized_crop_image(
    image, top, left, height, width, size, interpolation="bilinear", antialias=True
):
    """reference ``_geometry.py:2688``: crop then resize."""
    image = crop_image(image, top, left, height, width)
    return resize_image(image, size, interpolation, antialias=antialias)


def resized_crop(
    inpt, top, left, height, width, size, interpolation="bilinear", antialias=True
):
    if _is_image_like(inpt):
        return resized_crop_image(
            inpt, top, left, height, width, size, interpolation, antialias
        )
    out = crop(inpt, top, left, height, width)
    return resize(out, size, interpolation, antialias=antialias)


def resized_crop_dynamic(image, top, left, height, width, size):
    """Jit-traceable resized crop: the crop rect (top, left, height, width)
    may be TRACED scalars; the output size is static. Expressed as one
    bilinear coordinate gather (align_corners=False source mapping with
    torch interpolate's edge clamping) — the fused-augmentation form of
    RandomResizedCrop for on-device input pipelines. No antialias in this
    path (data-dependent kernel widths are not expressible with static
    shapes); the eager path keeps full antialiased semantics.

    image: [..., H, W, C]."""
    import jax.numpy as jnp

    out_h, out_w = (size, size) if isinstance(size, int) else tuple(size)
    in_h, in_w = image.shape[-3], image.shape[-2]
    top = jnp.asarray(top, jnp.float32)
    left = jnp.asarray(left, jnp.float32)
    height = jnp.asarray(height, jnp.float32)
    width = jnp.asarray(width, jnp.float32)

    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gy = jnp.maximum(top + (ys + 0.5) * height / out_h - 0.5, 0.0)
    gx = jnp.maximum(left + (xs + 0.5) * width / out_w - 0.5, 0.0)
    gy = jnp.minimum(gy, in_h - 1.0)
    gx = jnp.minimum(gx, in_w - 1.0)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, in_h - 1)
    x1 = jnp.minimum(x0 + 1, in_w - 1)
    img = image.astype(jnp.float32)
    # gather rows then columns (works for [H,W,C] and [N,H,W,C])
    def take_hw(yy, xx):
        rows = jnp.take(img, yy, axis=-3)
        return jnp.take(rows, xx, axis=-2)

    ly = (gy - y0).reshape((1,) * (image.ndim - 3) + (out_h, 1, 1))
    lx = (gx - x0).reshape((1,) * (image.ndim - 3) + (1, out_w, 1))
    out = (
        take_hw(y0, x0) * (1 - ly) * (1 - lx)
        + take_hw(y0, x1) * (1 - ly) * lx
        + take_hw(y1, x0) * ly * (1 - lx)
        + take_hw(y1, x1) * ly * lx
    )
    if jnp.issubdtype(image.dtype, jnp.floating):
        return out.astype(image.dtype)
    # integer input MUST come back in the integer dtype: downstream
    # dtype-branching ops (ToDtype(scale=True), RandAugment's value-range
    # logic) otherwise treat 0-255 data as already-scaled floats
    info = jnp.iinfo(image.dtype)
    return jnp.clip(jnp.round(out), info.min, info.max).astype(image.dtype)


def resized_crop_flip_batch(
    images,
    top,
    left,
    height,
    width,
    size,
    flip=None,
    precision: str = "high",
):
    """Batched MXU resized-crop (+ optional fused horizontal flip): the
    TPU-first form of :func:`resized_crop_dynamic` for whole-batch input
    pipelines.

    ``resized_crop_dynamic`` under ``vmap`` lowers to four per-sample
    coordinate gathers — scalar loads on TPU, measured 5.4 ms for a
    128x256x256 batch on v5e. Here the bilinear sample is two separable
    per-sample weight matmuls (the :func:`vision_tpu.ops.roi_align_mxu`
    trick): ``out[n] = W_y[n] @ img[n] @ W_x[n]^T`` where
    ``W_y[n, o, i] = relu(1 - |gy[n, o] - i|)`` is the tent-weight row
    (exactly the two-point lerp, since ``gy`` is clamped inside the
    image) built elementwise from the same source mapping as
    ``resized_crop_dynamic`` — no gathers, all batched einsum on the MXU.
    A per-sample ``flip`` flag reverses the ``gx`` rows, folding
    RandomHorizontalFlip into the same two matmuls for free.

    Matches ``vmap(resized_crop_dynamic)`` to f32 accumulation-order
    (<=1 uint8 count at round boundaries; ``precision="highest"`` for
    the exact-parity 6-pass MXU formulation, "high" = bf16x3 default).

    Args:
        images: [N, H, W, C].
        top/left/height/width: [N] float32 crop rects (traced ok).
        size: static output (h, w) or int.
        flip: optional [N] bool — mirror the output horizontally.
    """
    out_h, out_w = (size, size) if isinstance(size, int) else tuple(size)
    n, in_h, in_w, _ = images.shape
    f32 = jnp.float32
    top = jnp.asarray(top, f32)[:, None]
    left = jnp.asarray(left, f32)[:, None]
    height = jnp.asarray(height, f32)[:, None]
    width = jnp.asarray(width, f32)[:, None]

    ys = jnp.arange(out_h, dtype=f32)[None, :]
    xs = jnp.arange(out_w, dtype=f32)[None, :]
    gy = jnp.clip(top + (ys + 0.5) * height / out_h - 0.5, 0.0, in_h - 1.0)
    gx = jnp.clip(left + (xs + 0.5) * width / out_w - 0.5, 0.0, in_w - 1.0)
    if flip is not None:
        gx = jnp.where(flip[:, None], gx[:, ::-1], gx)
    # tent weights == the bilinear lerp: at most two adjacent nonzeros
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(gy[:, :, None] - jnp.arange(in_h, dtype=f32))
    )  # [N, out_h, H]
    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(gx[:, :, None] - jnp.arange(in_w, dtype=f32))
    )  # [N, out_w, W]
    x = images.astype(f32)
    t = jnp.einsum("noi,niwc->nowc", wy, x, precision=precision)
    out = jnp.einsum("npw,nowc->nopc", wx, t, precision=precision)
    if jnp.issubdtype(images.dtype, jnp.floating):
        return out.astype(images.dtype)
    info = jnp.iinfo(images.dtype)
    return jnp.clip(jnp.round(out), info.min, info.max).astype(images.dtype)


# ======================================================================
# affine family
# ======================================================================
def _is_traced(*vals) -> bool:
    return any(isinstance(v, jax.core.Tracer) for v in vals)


def _get_inverse_affine_matrix(
    center: List[float],
    angle: float,
    translate: List[float],
    scale: float,
    shear: List[float],
    inverted: bool = True,
) -> List[float]:
    """reference ``transforms/functional.py:1006`` — the PIL-convention
    inverse affine matrix. Pure Python floats at trace time normally; when
    any parameter is a TRACED scalar (jitted RandAugment magnitudes) the
    same formulas run in jnp and the matrix entries stay traced."""
    if _is_traced(angle, translate[0], translate[1], scale, shear[0], shear[1]):
        rad = jnp.float32(math.pi / 180.0)
        rot = jnp.asarray(angle, jnp.float32) * rad
        sx = jnp.asarray(shear[0], jnp.float32) * rad
        sy = jnp.asarray(shear[1], jnp.float32) * rad
        cx, cy = center
        tx, ty = translate
        a = jnp.cos(rot - sy) / jnp.cos(sy)
        b = -jnp.cos(rot - sy) * jnp.tan(sx) / jnp.cos(sy) - jnp.sin(rot)
        c = jnp.sin(rot - sy) / jnp.cos(sy)
        d = -jnp.sin(rot - sy) * jnp.tan(sx) / jnp.cos(sy) + jnp.cos(rot)
        if inverted:
            m = [d / scale, -b / scale, 0.0, -c / scale, a / scale, 0.0]
            m[2] = m[0] * (-cx - tx) + m[1] * (-cy - ty) + cx
            m[5] = m[3] * (-cx - tx) + m[4] * (-cy - ty) + cy
        else:
            m = [a * scale, b * scale, 0.0, c * scale, d * scale, 0.0]
            m[2] = m[0] * (-cx) + m[1] * (-cy) + cx + tx
            m[5] = m[3] * (-cx) + m[4] * (-cy) + cy + ty
        return m
    rot = math.radians(angle)
    sx = math.radians(shear[0])
    sy = math.radians(shear[1])
    cx, cy = center
    tx, ty = translate

    a = math.cos(rot - sy) / math.cos(sy)
    b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
    c = math.sin(rot - sy) / math.cos(sy)
    d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)

    if inverted:
        matrix = [d, -b, 0.0, -c, a, 0.0]
        matrix = [x / scale for x in matrix]
        matrix[2] += matrix[0] * (-cx - tx) + matrix[1] * (-cy - ty)
        matrix[5] += matrix[3] * (-cx - tx) + matrix[4] * (-cy - ty)
        matrix[2] += cx
        matrix[5] += cy
    else:
        matrix = [a, b, 0.0, c, d, 0.0]
        matrix = [x * scale for x in matrix]
        matrix[2] += matrix[0] * (-cx) + matrix[1] * (-cy)
        matrix[5] += matrix[3] * (-cx) + matrix[4] * (-cy)
        matrix[2] += cx + tx
        matrix[5] += cy + ty
    return matrix


def _sample_bilinear_zero_pad(image, src_y, src_x):
    """grid_sample(bilinear, zeros, align_corners=False) equivalent:
    image (..., H, W, C); src_y/src_x (OH, OW) in pixel coords."""
    h, w = image.shape[-3], image.shape[-2]
    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    y1, x1 = y0 + 1, x0 + 1
    ly, lx = src_y - y0, src_x - x0

    def corner(yy, xx, wy, wx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yc = jnp.clip(yy, 0, h - 1)
        xc = jnp.clip(xx, 0, w - 1)
        v = image[..., yc, xc, :]  # (..., OH, OW, C)
        wgt = (wy * wx * valid)[..., None]
        return v * wgt

    return (
        corner(y0, x0, 1 - ly, 1 - lx)
        + corner(y0, x1, 1 - ly, lx)
        + corner(y1, x0, ly, 1 - lx)
        + corner(y1, x1, ly, lx)
    )


def _sample_nearest_zero_pad(image, src_y, src_x):
    """grid_sample(nearest, zeros, align_corners=False): torch rounds the
    unnormalized source coordinate with nearbyint (round-half-to-even),
    which jnp.round matches."""
    h, w = image.shape[-3], image.shape[-2]
    yy = jnp.round(src_y).astype(jnp.int32)
    xx = jnp.round(src_x).astype(jnp.int32)
    valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
    yc = jnp.clip(yy, 0, h - 1)
    xc = jnp.clip(xx, 0, w - 1)
    v = image[..., yc, xc, :]
    return v * valid[..., None]


def _affine_grid_sample(
    image: jax.Array,
    matrix: Sequence[float],
    out_size: Tuple[int, int],
    interpolation: str = "bilinear",
    fill=None,
) -> jax.Array:
    """Inverse-warp with the 6-coeff matrix in the torchvision convention:
    centered output pixel coords -> centered source coords."""
    h, w = image.shape[-3], image.shape[-2]
    oh, ow = out_size
    if _is_traced(*matrix):
        m0, m1, m2, m3, m4, m5 = [jnp.asarray(m, jnp.float32) for m in matrix]
    else:
        m0, m1, m2, m3, m4, m5 = [float(m) for m in matrix]

    # centered output pixel coordinates (torch _gen_affine_grid)
    ys = jnp.arange(oh, dtype=jnp.float32) - oh * 0.5 + 0.5
    xs = jnp.arange(ow, dtype=jnp.float32) - ow * 0.5 + 0.5
    yg, xg = jnp.meshgrid(ys, xs, indexing="ij")  # (OH, OW)

    # Bit-match torch: theta is rescaled by [0.5w, 0.5h] into normalized
    # coords (float32), then grid_sample unnormalizes ((g+1)*size - 1)/2.
    # Replicating this float32 round-trip keeps nearest-mode rounding
    # decisions at exact .5 boundaries identical to the reference.
    if _is_traced(m0, m1, m2, m3, m4, m5):
        cvt = lambda v: jnp.asarray(v, jnp.float32)  # noqa: E731
    else:
        cvt = np.float32
    r0 = cvt(m0) / np.float32(0.5 * w)
    r1 = cvt(m1) / np.float32(0.5 * w)
    r2 = cvt(m2) / np.float32(0.5 * w)
    r3 = cvt(m3) / np.float32(0.5 * h)
    r4 = cvt(m4) / np.float32(0.5 * h)
    r5 = cvt(m5) / np.float32(0.5 * h)
    gx = r0 * xg + r1 * yg + r2
    gy = r3 * xg + r4 * yg + r5
    src_x = ((gx + 1.0) * w - 1.0) * 0.5
    src_y = ((gy + 1.0) * h - 1.0) * 0.5

    orig_dtype = image.dtype
    img = image.astype(jnp.float32)

    if fill is not None:
        ones = jnp.ones(img.shape[:-1] + (1,), dtype=jnp.float32)
        img = jnp.concatenate([img, ones], axis=-1)

    if interpolation == "nearest":
        out = _sample_nearest_zero_pad(img, src_y, src_x)
    else:
        out = _sample_bilinear_zero_pad(img, src_y, src_x)

    if fill is not None:
        mask = out[..., -1:]
        out = out[..., :-1]
        if isinstance(fill, (list, tuple)):
            fill_arr = jnp.array(fill, dtype=jnp.float32)
        else:
            fill_arr = jnp.full((out.shape[-1],), float(fill), dtype=jnp.float32)
        if interpolation == "nearest":
            keep = mask >= 0.5
            out = jnp.where(keep, out, fill_arr)
        else:
            out = out * mask + (1.0 - mask) * fill_arr

    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(orig_dtype)


def affine_image(
    image: jax.Array,
    angle: float,
    translate: List[float],
    scale: float,
    shear: List[float],
    interpolation: str = "nearest",
    fill=None,
    center: Optional[List[float]] = None,
) -> jax.Array:
    """reference affine_image (``_geometry.py``): rotation about center with
    translate/scale/shear in the PIL convention."""
    h, w = image.shape[-3], image.shape[-2]
    if center is None:
        center_f = [0.0, 0.0]
    else:
        center_f = [c - s * 0.5 for c, s in zip(center, (w, h))]
    if _is_traced(angle, scale, *translate, *shear):
        translate_f = list(translate)
        shear_f = list(shear)
    else:
        translate_f = [float(t) for t in translate]
        shear_f = list(map(float, shear))
    matrix = _get_inverse_affine_matrix(
        center_f, angle, translate_f, scale, shear_f
    )
    return _affine_grid_sample(image, matrix, (h, w), interpolation, fill)


def _compute_affine_output_size(
    matrix: Sequence[float], w: int, h: int
) -> Tuple[int, int]:
    """Expanded canvas (new_w, new_h) from the actual affine matrix —
    PIL-style corner transform (reference ``_geometry.py:810-832``
    ``_compute_affine_output_size_python``). Using the matrix (not a
    closed-form rotation) keeps rotate(expand=True, center=...) correct."""
    # float32 throughout + 1e-4 truncation before ceil/floor, exactly like
    # the reference tensor path — in float64 the cos(90°)=6e-17 epsilon
    # survives the sum and inflates the canvas by one pixel.
    half_w, half_h = 0.5 * w, 0.5 * h
    theta = np.asarray(matrix, dtype=np.float32).reshape(2, 3)
    pts = np.array(
        [
            [-half_w, -half_h, 1.0],
            [-half_w, half_h, 1.0],
            [half_w, half_h, 1.0],
            [half_w, -half_h, 1.0],
        ],
        dtype=np.float32,
    )
    new_pts = pts @ theta.T
    halfs = np.array([half_w, half_h], dtype=np.float32)
    min_vals = new_pts.min(axis=0) + halfs
    max_vals = new_pts.max(axis=0) + halfs
    tol, inv_tol = 1e-4, 1e4
    cmax = np.ceil(np.trunc(max_vals * inv_tol) * tol)
    cmin = np.floor(np.trunc(min_vals * inv_tol) * tol)
    size = cmax - cmin
    return int(size[0]), int(size[1])


def _affine_bounding_boxes_with_expand(
    boxes: jax.Array,
    format: BoundingBoxFormat,
    canvas_size: Tuple[int, int],
    angle: float,
    translate,
    scale: float,
    shear,
    center=None,
    expand: bool = False,
    clamping_mode: Optional[str] = "soft",
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Transform the 4 corners with the forward matrix, take the envelope
    (reference ``_affine_bounding_boxes_with_expand``)."""
    h, w = canvas_size
    if center is None:
        center = [w * 0.5, h * 0.5]
    dtype = boxes.dtype
    fmt_name = format.value.lower()
    xyxy = box_convert(boxes.astype(jnp.float32), fmt_name, "xyxy")

    m = _get_inverse_affine_matrix(
        center, angle, [float(t) for t in translate], scale,
        list(map(float, shear)), inverted=False,
    )
    M = jnp.array([[m[0], m[1], m[2]], [m[3], m[4], m[5]]], dtype=jnp.float32)

    x1, y1, x2, y2 = (xyxy[..., i] for i in range(4))
    corners = jnp.stack(
        [
            jnp.stack([x1, y1], -1),
            jnp.stack([x2, y1], -1),
            jnp.stack([x2, y2], -1),
            jnp.stack([x1, y2], -1),
        ],
        axis=-2,
    )  # [..., 4, 2]
    ones = jnp.ones(corners.shape[:-1] + (1,), dtype=jnp.float32)
    pts = jnp.concatenate([corners, ones], axis=-1)  # [..., 4, 3]
    tp = pts @ M.T  # [..., 4, 2]

    out_x1 = jnp.min(tp[..., 0], axis=-1)
    out_y1 = jnp.min(tp[..., 1], axis=-1)
    out_x2 = jnp.max(tp[..., 0], axis=-1)
    out_y2 = jnp.max(tp[..., 1], axis=-1)
    out = jnp.stack([out_x1, out_y1, out_x2, out_y2], axis=-1)

    new_canvas = canvas_size
    if expand:
        # transform the image frame corners to get the translation offset,
        # and the inverted matrix for the new canvas size — both exactly as
        # the reference (``_geometry.py:1185-1203``)
        frame = np.array(
            [[0.0, 0.0, 1.0], [0.0, h, 1.0], [w, h, 1.0], [w, 0.0, 1.0]],
            dtype=np.float32,
        )
        Mn = np.array([[m[0], m[1], m[2]], [m[3], m[4], m[5]]], dtype=np.float32)
        new_pts = frame @ Mn.T
        tr = new_pts.min(axis=0)
        out = out - jnp.array([tr[0], tr[1], tr[0], tr[1]], dtype=jnp.float32)
        inv = _get_inverse_affine_matrix(
            center, angle, [float(t) for t in translate], scale,
            list(map(float, shear)),
        )
        new_w, new_h = _compute_affine_output_size(inv, w, h)
        new_canvas = (new_h, new_w)

    # clamp inside the kernel to the (possibly expanded) canvas — the
    # reference kernel contract (``_geometry.py:1205-1207``); plain-array
    # callers get clamped output without going through the TVTensor path
    out = clamp_bounding_boxes(
        out, format=BoundingBoxFormat.XYXY, canvas_size=new_canvas,
        clamping_mode=clamping_mode,
    )
    out = box_convert(out, "xyxy", fmt_name).astype(dtype)
    return out, new_canvas


def affine_bounding_boxes(
    boxes, format, canvas_size, angle, translate, scale, shear, center=None,
    clamping_mode="soft",
):
    out, _ = _affine_bounding_boxes_with_expand(
        boxes, format, canvas_size, angle, translate, scale, shear, center,
        False, clamping_mode,
    )
    return out


def _affine_keypoints_with_expand(
    kp, canvas_size, angle, translate, scale, shear, center=None,
    expand: bool = False,
):
    """Affine-transform keypoints; with ``expand`` also translate them into
    the expanded canvas (reference ``_geometry.py:1000-1070``
    ``_affine_keypoints_with_expand``: subtract the transformed-frame
    minimum ``tr``, size the canvas from the inverted matrix)."""
    h, w = canvas_size
    if center is None:
        center = [w * 0.5, h * 0.5]
    m = _get_inverse_affine_matrix(
        center, angle, [float(t) for t in translate], scale,
        list(map(float, shear)), inverted=False,
    )
    M = jnp.array([[m[0], m[1], m[2]], [m[3], m[4], m[5]]], dtype=jnp.float32)
    extra = kp[..., 2:]  # pass-through channels (e.g. visibility)
    kp = kp[..., :2]
    ones = jnp.ones(kp.shape[:-1] + (1,), dtype=jnp.float32)
    pts = jnp.concatenate([kp.astype(jnp.float32), ones], axis=-1)
    out = pts @ M.T

    new_canvas = canvas_size
    if expand:
        frame = np.array(
            [[0.0, 0.0, 1.0], [0.0, h, 1.0], [w, h, 1.0], [w, 0.0, 1.0]],
            dtype=np.float32,
        )
        Mn = np.array([[m[0], m[1], m[2]], [m[3], m[4], m[5]]], dtype=np.float32)
        tr = (frame @ Mn.T).min(axis=0)
        out = out - jnp.asarray(tr, dtype=jnp.float32)
        inv = _get_inverse_affine_matrix(
            center, angle, [float(t) for t in translate], scale,
            list(map(float, shear)),
        )
        new_w, new_h = _compute_affine_output_size(inv, w, h)
        new_canvas = (new_h, new_w)
    out = jnp.concatenate([out.astype(kp.dtype), extra], axis=-1)
    return out, new_canvas


def affine_keypoints(
    kp, canvas_size, angle, translate, scale, shear, center=None
):
    """Returns ``(keypoints, canvas_size)`` like the reference kernel."""
    return _affine_keypoints_with_expand(
        kp, canvas_size, angle, translate, scale, shear, center, False
    )


def affine_mask(mask, angle, translate, scale, shear, fill=None, center=None):
    out = affine_image(
        mask[..., None], angle, translate, scale, shear, "nearest", fill, center
    )
    return out[..., 0]


def affine(
    inpt,
    angle: float,
    translate: List[float],
    scale: float,
    shear: List[float],
    interpolation: str = "nearest",
    fill=None,
    center=None,
):
    """Public affine (reference ``_geometry.py`` ``affine``)."""
    if _is_image_like(inpt):
        return affine_image(inpt, angle, translate, scale, shear, interpolation, fill, center)
    if isinstance(inpt, (Image, Video)):
        return type(inpt)(
            affine_image(inpt.data, angle, translate, scale, shear, interpolation, fill, center)
        )
    if isinstance(inpt, Mask):
        return Mask(affine_mask(inpt.data, angle, translate, scale, shear, fill, center))
    if isinstance(inpt, BoundingBoxes):
        out = affine_bounding_boxes(
            inpt.data, inpt.format, inpt.canvas_size, angle, translate,
            scale, shear, center, clamping_mode=inpt.clamping_mode,
        )
        return tv_tensors.wrap(out, like=inpt)
    if isinstance(inpt, KeyPoints):
        out, _ = affine_keypoints(
            inpt.data, inpt.canvas_size, angle, translate, scale, shear, center
        )
        return KeyPoints(out, canvas_size=inpt.canvas_size)
    raise TypeError(f"affine: unsupported type {type(inpt).__name__}")


def rotate_image(
    image: jax.Array,
    angle: float,
    interpolation: str = "nearest",
    expand: bool = False,
    center=None,
    fill=None,
) -> jax.Array:
    """reference rotate_image. ``expand=True`` grows the canvas to fit."""
    h, w = image.shape[-3], image.shape[-2]
    if center is None:
        center_f = [0.0, 0.0]
    else:
        center_f = [c - s * 0.5 for c, s in zip(center, (w, h))]
    matrix = _get_inverse_affine_matrix(center_f, -angle, [0.0, 0.0], 1.0, [0.0, 0.0])
    if expand and _is_traced(angle):
        raise ValueError(
            "rotate(expand=True) needs a concrete angle: the expanded "
            "canvas size is data-dependent and cannot be traced"
        )
    if expand:
        new_w, new_h = _compute_affine_output_size(matrix, w, h)
        out_size = (new_h, new_w)
    else:
        out_size = (h, w)
    return _affine_grid_sample(image, matrix, out_size, interpolation, fill)


def rotate_mask(mask, angle, expand=False, center=None, fill=None):
    out = rotate_image(mask[..., None], angle, "nearest", expand, center, fill)
    return out[..., 0]


def rotate_bounding_boxes(
    boxes, format, canvas_size, angle, expand=False, center=None,
    clamping_mode="soft",
):
    return _affine_bounding_boxes_with_expand(
        boxes, format, canvas_size, -angle, [0.0, 0.0], 1.0, [0.0, 0.0],
        center, expand, clamping_mode,
    )


def rotate(
    inpt,
    angle: float,
    interpolation: str = "nearest",
    expand: bool = False,
    center=None,
    fill=None,
):
    if _is_image_like(inpt):
        return rotate_image(inpt, angle, interpolation, expand, center, fill)
    if isinstance(inpt, (Image, Video)):
        return type(inpt)(
            rotate_image(inpt.data, angle, interpolation, expand, center, fill)
        )
    if isinstance(inpt, Mask):
        return Mask(rotate_mask(inpt.data, angle, expand, center, fill))
    if isinstance(inpt, BoundingBoxes):
        out, cs = rotate_bounding_boxes(
            inpt.data, inpt.format, inpt.canvas_size, angle, expand, center,
            clamping_mode=inpt.clamping_mode,
        )
        return BoundingBoxes(
            out, format=inpt.format, canvas_size=cs, clamping_mode=inpt.clamping_mode
        )
    if isinstance(inpt, KeyPoints):
        out, cs = _affine_keypoints_with_expand(
            inpt.data, inpt.canvas_size, -angle, [0.0, 0.0], 1.0, [0.0, 0.0],
            center, expand,
        )
        return KeyPoints(out, canvas_size=cs)
    raise TypeError(f"rotate: unsupported type {type(inpt).__name__}")


# ======================================================================
# perspective / elastic
# ======================================================================
def _perspective_coeffs(
    startpoints: Sequence[Sequence[float]], endpoints: Sequence[Sequence[float]]
) -> List[float]:
    """Solve the 8-dof homography mapping endpoints -> startpoints
    (reference ``transforms/functional.py`` ``_get_perspective_coeffs``)."""
    a = np.zeros((2 * len(startpoints), 8), dtype=np.float64)
    b = []
    for i, (p1, p2) in enumerate(zip(endpoints, startpoints)):
        a[2 * i, :] = [p1[0], p1[1], 1, 0, 0, 0, -p2[0] * p1[0], -p2[0] * p1[1]]
        a[2 * i + 1, :] = [0, 0, 0, p1[0], p1[1], 1, -p2[1] * p1[0], -p2[1] * p1[1]]
        b.extend([p2[0], p2[1]])
    res = np.linalg.lstsq(a, np.array(b, dtype=np.float64), rcond=None)[0]
    return [float(c) for c in res]


def perspective_image(
    image: jax.Array,
    startpoints=None,
    endpoints=None,
    interpolation: str = "bilinear",
    fill=None,
    coefficients: Optional[Sequence[float]] = None,
) -> jax.Array:
    """reference perspective_image: inverse-warp with homography
    x_src = (c0 x + c1 y + c2) / (c6 x + c7 y + 1)."""
    if coefficients is None:
        coefficients = _perspective_coeffs(startpoints, endpoints)
    c = [float(v) for v in coefficients]
    h, w = image.shape[-3], image.shape[-2]
    # torch builds the grid over pixel coords 0.5-centered
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    yg, xg = jnp.meshgrid(ys, xs, indexing="ij")
    den = c[6] * xg + c[7] * yg + 1.0
    src_x = (c[0] * xg + c[1] * yg + c[2]) / den - 0.5
    src_y = (c[3] * xg + c[4] * yg + c[5]) / den - 0.5

    orig_dtype = image.dtype
    img = image.astype(jnp.float32)
    if fill is not None:
        ones = jnp.ones(img.shape[:-1] + (1,), dtype=jnp.float32)
        img = jnp.concatenate([img, ones], axis=-1)
    if interpolation == "nearest":
        out = _sample_nearest_zero_pad(img, src_y, src_x)
    else:
        out = _sample_bilinear_zero_pad(img, src_y, src_x)
    if fill is not None:
        mask = out[..., -1:]
        out = out[..., :-1]
        fill_arr = (
            jnp.array(fill, dtype=jnp.float32)
            if isinstance(fill, (list, tuple))
            else jnp.full((out.shape[-1],), float(fill), dtype=jnp.float32)
        )
        if interpolation == "nearest":
            out = jnp.where(mask >= 0.5, out, fill_arr)
        else:
            out = out * mask + (1.0 - mask) * fill_arr
    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(orig_dtype)


def perspective_mask(mask, startpoints=None, endpoints=None, fill=None, coefficients=None):
    out = perspective_image(
        mask[..., None], startpoints, endpoints, "nearest", fill, coefficients
    )
    return out[..., 0]


def perspective_bounding_boxes(
    boxes, format, canvas_size, startpoints=None, endpoints=None, coefficients=None
):
    """Transform corners with the FORWARD homography (the inverse of the
    image warp coefficients), envelope bbox (reference
    perspective_bounding_boxes)."""
    if coefficients is None:
        coefficients = _perspective_coeffs(startpoints, endpoints)
    c = coefficients
    # invert the homography (image coeffs map dst->src; boxes need src->dst)
    M = np.array(
        [[c[0], c[1], c[2]], [c[3], c[4], c[5]], [c[6], c[7], 1.0]],
        dtype=np.float64,
    )
    Minv = np.linalg.inv(M)
    dtype = boxes.dtype
    fmt_name = format.value.lower()
    xyxy = box_convert(boxes.astype(jnp.float32), fmt_name, "xyxy")
    x1, y1, x2, y2 = (xyxy[..., i] for i in range(4))
    corners = jnp.stack(
        [
            jnp.stack([x1, y1], -1),
            jnp.stack([x2, y1], -1),
            jnp.stack([x2, y2], -1),
            jnp.stack([x1, y2], -1),
        ],
        axis=-2,
    )
    # raw coordinates, no pixel-center offset — the reference transforms
    # corner coordinates directly (``_geometry.py:2159-2167``; its analytic
    # inv_coeffs are adj(M)/adj[2,2], identical to this normalized inverse)
    ones = jnp.ones(corners.shape[:-1] + (1,), dtype=jnp.float32)
    pts = jnp.concatenate([corners, ones], axis=-1)
    Mj = jnp.array(Minv, dtype=jnp.float32)
    tp = pts @ Mj.T
    tp = tp[..., :2] / tp[..., 2:3]
    out = jnp.stack(
        [
            jnp.min(tp[..., 0], axis=-1),
            jnp.min(tp[..., 1], axis=-1),
            jnp.max(tp[..., 0], axis=-1),
            jnp.max(tp[..., 1], axis=-1),
        ],
        axis=-1,
    )
    return box_convert(out, "xyxy", fmt_name).astype(dtype)


def perspective_keypoints(
    kp, canvas_size, startpoints=None, endpoints=None, coefficients=None
):
    """Forward homography on points (reference perspective_keypoints);
    trailing channels beyond (x, y) pass through untouched."""
    if coefficients is None:
        coefficients = _perspective_coeffs(startpoints, endpoints)
    c = coefficients
    M = np.array(
        [[c[0], c[1], c[2]], [c[3], c[4], c[5]], [c[6], c[7], 1.0]],
        dtype=np.float64,
    )
    Minv = np.linalg.inv(M)
    dtype = kp.dtype
    xy = kp[..., :2].astype(jnp.float32)
    extra = kp[..., 2:]
    # raw coordinates, no pixel-center offset (matches the reference's
    # keypoint kernel, which reuses the bbox thetas on raw points)
    ones = jnp.ones(xy.shape[:-1] + (1,), dtype=jnp.float32)
    pts = jnp.concatenate([xy, ones], axis=-1)
    tp = pts @ jnp.array(Minv, dtype=jnp.float32).T
    out = tp[..., :2] / tp[..., 2:3]
    return jnp.concatenate([out.astype(dtype), extra], axis=-1)


def perspective(
    inpt,
    startpoints=None,
    endpoints=None,
    interpolation: str = "bilinear",
    fill=None,
    coefficients=None,
):
    if _is_image_like(inpt):
        return perspective_image(
            inpt, startpoints, endpoints, interpolation, fill, coefficients
        )
    if isinstance(inpt, (Image, Video)):
        return type(inpt)(
            perspective_image(
                inpt.data, startpoints, endpoints, interpolation, fill, coefficients
            )
        )
    if isinstance(inpt, Mask):
        return Mask(
            perspective_mask(inpt.data, startpoints, endpoints, fill, coefficients)
        )
    if isinstance(inpt, BoundingBoxes):
        out = perspective_bounding_boxes(
            inpt.data, inpt.format, inpt.canvas_size, startpoints, endpoints, coefficients
        )
        return clamp_bounding_boxes(tv_tensors.wrap(out, like=inpt))
    if isinstance(inpt, KeyPoints):
        out = perspective_keypoints(
            inpt.data, inpt.canvas_size, startpoints, endpoints, coefficients
        )
        return KeyPoints(out, canvas_size=inpt.canvas_size)
    raise TypeError(f"perspective: unsupported type {type(inpt).__name__}")


def elastic_image(
    image: jax.Array,
    displacement: jax.Array,
    interpolation: str = "bilinear",
    fill=None,
) -> jax.Array:
    """reference elastic_image: displacement [1, H, W, 2] in normalized
    [-1, 1] grid units added to the base grid."""
    h, w = image.shape[-3], image.shape[-2]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    yg, xg = jnp.meshgrid(ys, xs, indexing="ij")
    d = displacement.reshape(h, w, 2).astype(jnp.float32)
    # normalized displacement -> pixel displacement
    src_x = xg + d[..., 0] * (w * 0.5)
    src_y = yg + d[..., 1] * (h * 0.5)

    orig_dtype = image.dtype
    img = image.astype(jnp.float32)
    if fill is not None:
        ones = jnp.ones(img.shape[:-1] + (1,), dtype=jnp.float32)
        img = jnp.concatenate([img, ones], axis=-1)
    if interpolation == "nearest":
        out = _sample_nearest_zero_pad(img, src_y, src_x)
    else:
        out = _sample_bilinear_zero_pad(img, src_y, src_x)
    if fill is not None:
        mask = out[..., -1:]
        out = out[..., :-1]
        fill_arr = (
            jnp.array(fill, dtype=jnp.float32)
            if isinstance(fill, (list, tuple))
            else jnp.full((out.shape[-1],), float(fill), dtype=jnp.float32)
        )
        if interpolation == "nearest":
            out = jnp.where(mask >= 0.5, out, fill_arr)
        else:
            out = out * mask + (1.0 - mask) * fill_arr
    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(orig_dtype)


def _elastic_inverse_points(xy, canvas_size, displacement, ceil_points):
    """The reference's approximate inverse warp for points
    (``_geometry.py:2403-2413`` keypoints, ``:2456-2474`` boxes): the
    identity grid at integer pixel ``i`` maps to ``i`` itself, so
    ``(inv_grid[i] + 1) * size/2 - 0.5 == i - d[i] * size/2``. Keypoints
    truncate the lookup index (``.to(long)``); box corners ceil first
    (``points.ceil_()``). The INDEX (not the original float coordinate)
    is what gets displaced — matching the reference exactly."""
    h, w = canvas_size
    d = jnp.asarray(displacement, jnp.float32).reshape(h, w, 2)
    pts = jnp.ceil(xy) if ceil_points else xy
    xi = jnp.clip(pts[..., 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(pts[..., 1].astype(jnp.int32), 0, h - 1)
    ox = xi.astype(jnp.float32) - d[yi, xi, 0] * (w * 0.5)
    oy = yi.astype(jnp.float32) - d[yi, xi, 1] * (h * 0.5)
    return jnp.stack([ox, oy], axis=-1)


def elastic_keypoints(kp, canvas_size, displacement):
    """reference elastic_keypoints (``_geometry.py:2382-2415``).
    Trailing channels beyond (x, y) pass through."""
    dtype = kp.dtype
    xy = kp[..., :2].astype(jnp.float32)
    extra = kp[..., 2:]
    out = _elastic_inverse_points(
        xy, canvas_size, displacement, ceil_points=False
    )
    return jnp.concatenate([out.astype(dtype), extra], axis=-1)


def elastic_bounding_boxes(
    boxes, format, canvas_size, displacement, clamping_mode="soft"
):
    """reference elastic_bounding_boxes (``_geometry.py:2424-2490``):
    ceil the 4 corners, displace the integer lookup, envelope bbox,
    clamp to canvas."""
    dtype = boxes.dtype
    fmt_name = format.value.lower()
    xyxy = box_convert(boxes.astype(jnp.float32), fmt_name, "xyxy")
    x1, y1, x2, y2 = (xyxy[..., i] for i in range(4))
    # reference corner order: [[0,1],[2,1],[2,3],[0,3]]
    corners = jnp.stack(
        [
            jnp.stack([x1, y1], -1),
            jnp.stack([x2, y1], -1),
            jnp.stack([x2, y2], -1),
            jnp.stack([x1, y2], -1),
        ],
        axis=-2,
    )
    tp = _elastic_inverse_points(
        corners, canvas_size, displacement, ceil_points=True
    )
    out = jnp.stack(
        [
            jnp.min(tp[..., 0], axis=-1),
            jnp.min(tp[..., 1], axis=-1),
            jnp.max(tp[..., 0], axis=-1),
            jnp.max(tp[..., 1], axis=-1),
        ],
        axis=-1,
    )
    if clamping_mode is not None:
        h, w = canvas_size
        out = jnp.stack(
            [
                jnp.clip(out[..., 0], 0.0, w),
                jnp.clip(out[..., 1], 0.0, h),
                jnp.clip(out[..., 2], 0.0, w),
                jnp.clip(out[..., 3], 0.0, h),
            ],
            axis=-1,
        )  # non-rotated: hard == soft clamping (reference _meta.py:418)
    return box_convert(out, "xyxy", fmt_name).astype(dtype)


def elastic(inpt, displacement, interpolation: str = "bilinear", fill=None):
    if _is_image_like(inpt):
        return elastic_image(inpt, displacement, interpolation, fill)
    if isinstance(inpt, (Image, Video)):
        return type(inpt)(elastic_image(inpt.data, displacement, interpolation, fill))
    if isinstance(inpt, Mask):
        out = elastic_image(inpt.data[..., None], displacement, "nearest", fill)
        return Mask(out[..., 0])
    if isinstance(inpt, BoundingBoxes):
        out = elastic_bounding_boxes(
            inpt.data, inpt.format, inpt.canvas_size, displacement,
            clamping_mode=inpt.clamping_mode,
        )
        return tv_tensors.wrap(out, like=inpt)
    if isinstance(inpt, KeyPoints):
        out = elastic_keypoints(inpt.data, inpt.canvas_size, displacement)
        return KeyPoints(out, canvas_size=inpt.canvas_size)
    raise TypeError(f"elastic: unsupported type {type(inpt).__name__}")


# ======================================================================
# five/ten crop
# ======================================================================
def five_crop(inpt, size):
    """reference five_crop: (tl, tr, bl, br, center)."""
    if isinstance(size, int):
        size = (size, size)
    elif len(size) == 1:
        size = (size[0], size[0])
    crop_h, crop_w = size
    if isinstance(inpt, tv_tensors.TVTensor):
        h, w = inpt.shape[-3], inpt.shape[-2]
    else:
        h, w = inpt.shape[-3], inpt.shape[-2]
    if crop_w > w or crop_h > h:
        raise ValueError(f"crop size {size} larger than image ({h}, {w})")
    tl = crop(inpt, 0, 0, crop_h, crop_w)
    tr = crop(inpt, 0, w - crop_w, crop_h, crop_w)
    bl = crop(inpt, h - crop_h, 0, crop_h, crop_w)
    br = crop(inpt, h - crop_h, w - crop_w, crop_h, crop_w)
    c = center_crop(inpt, (crop_h, crop_w))
    return tl, tr, bl, br, c


def ten_crop(inpt, size, vertical_flip: bool = False):
    """reference ten_crop: five_crop + flipped five_crop."""
    first = five_crop(inpt, size)
    flipped = (
        globals()["vertical_flip"](inpt) if vertical_flip else horizontal_flip(inpt)
    )
    second = five_crop(flipped, size)
    return first + second
