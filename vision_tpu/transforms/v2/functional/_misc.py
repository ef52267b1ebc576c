"""Misc functionals (reference
``torchvision/transforms/v2/functional/_misc.py``): normalize,
gaussian_blur, gaussian_noise, to_dtype, sanitize_bounding_boxes."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import tv_tensors
from vision_tpu.ops.boxes import box_convert
from vision_tpu.tv_tensors import BoundingBoxes, Image, Video

__all__ = [
    "normalize",
    "normalize_image",
    "gaussian_blur",
    "gaussian_blur_image",
    "gaussian_noise",
    "to_dtype",
    "to_dtype_image",
    "sanitize_bounding_boxes",
]


def _unwrap(inpt):
    if isinstance(inpt, tv_tensors.TVTensor):
        return inpt.data, lambda out: tv_tensors.wrap(out, like=inpt)
    return inpt, lambda out: out


def normalize_image(
    image: jax.Array, mean: Sequence[float], std: Sequence[float]
) -> jax.Array:
    """reference normalize_image: (x - mean) / std over the channel axis.
    Input must be float."""
    if not jnp.issubdtype(image.dtype, jnp.floating):
        raise TypeError(f"normalize expects float input, got {image.dtype}")
    mean = jnp.asarray(mean, dtype=image.dtype)
    std = jnp.asarray(std, dtype=image.dtype)
    return (image - mean) / std


def normalize(
    inpt,
    mean: Sequence[float],
    std: Sequence[float],
    inplace: bool = False,
):
    # inplace accepted for reference signature parity, ignored (JAX is
    # functional; the reference returns the tensor either way)
    del inplace
    img, rewrap = _unwrap(inpt)
    return rewrap(normalize_image(img, mean, std))


def _gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    """reference ``transforms/_functional_tensor.py`` ``_get_gaussian_kernel1d``."""
    ksize_half = (kernel_size - 1) * 0.5
    x = np.linspace(-ksize_half, ksize_half, kernel_size)
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    return (pdf / pdf.sum()).astype(np.float32)


def gaussian_blur_image(
    image: jax.Array,
    kernel_size: Union[int, Sequence[int]],
    sigma: Optional[Union[float, Sequence[float]]] = None,
) -> jax.Array:
    """Separable gaussian blur with reflect padding (reference
    gaussian_blur_image)."""
    if isinstance(kernel_size, int):
        kernel_size = [kernel_size, kernel_size]
    if len(kernel_size) == 1:
        kernel_size = [kernel_size[0], kernel_size[0]]
    for ks in kernel_size:
        if ks <= 0 or ks % 2 == 0:
            raise ValueError(f"kernel_size must be positive odd, got {kernel_size}")
    if sigma is None:
        sigma = [ks * 0.15 + 0.35 for ks in kernel_size]
    elif isinstance(sigma, (int, float)):
        sigma = [float(sigma), float(sigma)]
    elif len(sigma) == 1:
        sigma = [float(sigma[0]), float(sigma[0])]

    ky = jnp.asarray(_gaussian_kernel1d(kernel_size[0], sigma[0]))
    kx = jnp.asarray(_gaussian_kernel1d(kernel_size[1], sigma[1]))

    orig_dtype = image.dtype
    f = image.astype(jnp.float32)
    lead = f.shape[:-3]
    h, w, c = f.shape[-3:]
    x = f.reshape((-1, h, w, c))

    pad_y = kernel_size[0] // 2
    pad_x = kernel_size[1] // 2
    x = jnp.pad(
        x, ((0, 0), (pad_y, pad_y), (pad_x, pad_x), (0, 0)), mode="reflect"
    )
    # separable depthwise convs
    x = jax.lax.conv_general_dilated(
        x,
        jnp.broadcast_to(ky[:, None, None, None], (kernel_size[0], 1, 1, c)),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    x = jax.lax.conv_general_dilated(
        x,
        jnp.broadcast_to(kx[None, :, None, None], (1, kernel_size[1], 1, c)),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    out = x.reshape(lead + (h, w, c))
    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(orig_dtype)


def gaussian_blur(inpt, kernel_size, sigma=None):
    img, rewrap = _unwrap(inpt)
    if isinstance(inpt, tv_tensors.Mask):
        return inpt  # blur is a no-op on masks in the reference
    if isinstance(inpt, (tv_tensors.BoundingBoxes, tv_tensors.KeyPoints)):
        return inpt
    return rewrap(gaussian_blur_image(img, kernel_size, sigma))


def gaussian_noise(
    inpt,
    mean: float = 0.0,
    sigma: float = 0.1,
    clip: bool = True,
    *,
    key: jax.Array,
):
    """reference gaussian_noise (``_misc.py:gaussian_noise_image``):
    float images get ``clip(x + mean + sigma*N, 0, 1)``; uint8 images add
    int16-cast noise scaled by 255 and clamp to [0, 255] (reference
    ``_misc.py:208-216``); other dtypes raise."""
    img, rewrap = _unwrap(inpt)
    if sigma < 0:
        raise ValueError(f"sigma shouldn't be negative. Got {sigma}")
    if jnp.issubdtype(img.dtype, jnp.floating):
        noise = (
            mean + jax.random.normal(key, img.shape, dtype=img.dtype) * sigma
        )
        out = img + noise
        if clip:
            out = jnp.clip(out, 0.0, 1.0)
        return rewrap(out)
    if img.dtype == jnp.uint8:
        noise = (
            mean * 255.0
            + jax.random.normal(key, img.shape, jnp.float32) * (sigma * 255.0)
        ).astype(jnp.int16)
        out = img.astype(jnp.int16) + noise
        if clip:
            out = jnp.clip(out, 0, 255)
        return rewrap(out.astype(jnp.uint8))
    raise ValueError(
        f"Input is expected to be uint8 or float, got dtype={img.dtype}"
    )


def _num_value_bits(dtype) -> int:
    return {
        jnp.uint8.dtype: 8,
        jnp.int8.dtype: 7,
        jnp.int16.dtype: 15,
        jnp.uint16.dtype: 16,
        jnp.int32.dtype: 31,
        jnp.int64.dtype: 63,
    }[jnp.dtype(dtype)]


def to_dtype_image(image: jax.Array, dtype=jnp.float32, scale: bool = False) -> jax.Array:
    """Value-range dtype conversion (reference ``_misc.py`` to_dtype_image,
    transcribed exactly — incl. the ``max + 1 - eps`` float->int trick)."""
    dtype = jnp.dtype(dtype)
    if image.dtype == dtype:
        return image
    if not scale:
        return image.astype(dtype)

    float_input = jnp.issubdtype(image.dtype, jnp.floating)
    float_output = jnp.issubdtype(dtype, jnp.floating)

    if float_input:
        if float_output:
            return image.astype(dtype)
        if image.dtype == jnp.float32 and dtype in (jnp.int32, jnp.int64):
            raise RuntimeError(
                f"conversion {image.dtype} -> {dtype} cannot be performed safely"
            )
        eps = 1e-3
        max_value = float(jnp.iinfo(dtype).max)
        return (image * (max_value + 1.0 - eps)).astype(dtype)
    else:
        if float_output:
            return image.astype(dtype) * (1.0 / float(jnp.iinfo(image.dtype).max))
        in_bits = _num_value_bits(image.dtype)
        out_bits = _num_value_bits(dtype)
        if in_bits > out_bits:
            return (image >> (in_bits - out_bits)).astype(dtype)
        return image.astype(dtype) << (out_bits - in_bits)


def to_dtype(inpt, dtype=jnp.float32, scale: bool = False):
    img, rewrap = _unwrap(inpt)
    if isinstance(inpt, (tv_tensors.Image, tv_tensors.Video)) or not isinstance(
        inpt, tv_tensors.TVTensor
    ):
        return rewrap(to_dtype_image(img, dtype, scale))
    return rewrap(img.astype(dtype))  # boxes/masks/kp: plain cast


def sanitize_bounding_boxes(
    boxes,
    format=None,
    canvas_size=None,
    min_size: float = 1.0,
    min_area: float = 1.0,
) -> Tuple[BoundingBoxes, jax.Array]:
    """Return (boxes, valid_mask) of boxes that are non-degenerate and
    inside the canvas (reference ``_misc.py`` sanitize_bounding_boxes —
    which *removes* rows; the TPU version returns a mask, keeping shapes
    static; combine with boolean indexing outside jit).

    ``format``/``canvas_size`` follow the reference contract
    (``_misc.py:sanitize_bounding_boxes``): required for (and only
    accepted with) plain-array input; BoundingBoxes carry their own."""
    wrap_output = isinstance(boxes, BoundingBoxes)
    if wrap_output:
        if format is not None or canvas_size is not None:
            raise ValueError(
                "format and canvas_size must not be passed with a "
                "BoundingBoxes input (reference contract)"
            )
    else:
        if format is None or canvas_size is None:
            raise ValueError(
                "format and canvas_size are required for plain-array "
                "input (reference contract)"
            )
        fmt_enum = (
            format
            if isinstance(format, tv_tensors.BoundingBoxFormat)
            else tv_tensors.BoundingBoxFormat(str(format).upper())
        )
        boxes = BoundingBoxes(
            jnp.asarray(boxes), format=fmt_enum, canvas_size=tuple(canvas_size)
        )
    h, w = boxes.canvas_size
    fmt = boxes.format.value.lower()
    xyxy = box_convert(boxes.data.astype(jnp.float32), fmt, "xyxy")
    ws = xyxy[..., 2] - xyxy[..., 0]
    hs = xyxy[..., 3] - xyxy[..., 1]
    # reference _get_sanitize_bounding_boxes_mask (_misc.py:435-440):
    # size/area floors AND every coordinate inside [0, w]x[0, h] — a box
    # sticking out of the canvas at all is removed (clamp first to keep it)
    valid = (ws >= min_size) & (hs >= min_size) & (ws * hs >= min_area)
    valid &= jnp.all(xyxy >= 0, axis=-1)
    valid &= (xyxy[..., 0] <= w) & (xyxy[..., 2] <= w)
    valid &= (xyxy[..., 1] <= h) & (xyxy[..., 3] <= h)
    # reference returns the same container kind it was given: a pure
    # tensor in -> a pure tensor out (_misc.py:391), BoundingBoxes in ->
    # BoundingBoxes out
    return (boxes if wrap_output else boxes.data), valid
