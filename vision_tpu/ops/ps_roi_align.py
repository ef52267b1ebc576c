"""Position-sensitive RoIAlign (R-FCN), channels-last.

Reference: ``torchvision/csrc/ops/cpu/ps_roi_align_kernel.cpp``.
Input channels are consumed position-sensitively: output channel ``c_out``
at pooled bin ``(ph, pw)`` reads input channel
``(c_out * PH + ph) * PW + pw``; always aligned (-0.5 offset), roi size NOT
clamped to 1. The reference returns (output, channel_mapping) where
channel_mapping feeds the native backward; our backward is autodiff, so only
the output is returned.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["ps_roi_align"]


def _bilinear_sample(feat, y, x):
    """feat: [K, H, W, C]; y, x: [K, S] -> [K, S, C].

    roi_align-family edge semantics: y/x < -1 or > size contribute 0,
    otherwise clamped bilinear.
    """
    _, height, width, _ = feat.shape
    yz = (y >= -1.0) & (y <= height)
    xz = (x >= -1.0) & (x <= width)
    y = jnp.clip(y, 0.0)
    x = jnp.clip(x, 0.0)
    y_low = y.astype(jnp.int32)
    x_low = x.astype(jnp.int32)
    y_high = jnp.where(y_low >= height - 1, height - 1, y_low + 1)
    y_low = jnp.minimum(y_low, height - 1)
    y = jnp.where(y_low >= height - 1, y_low.astype(y.dtype), y)
    x_high = jnp.where(x_low >= width - 1, width - 1, x_low + 1)
    x_low = jnp.minimum(x_low, width - 1)
    x = jnp.where(x_low >= width - 1, x_low.astype(x.dtype), x)

    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx

    k = jnp.arange(feat.shape[0])[:, None]

    def g(yy, xx):
        return feat[k, yy, xx]  # [K, S, C]

    w_valid = (yz & xz).astype(feat.dtype)[..., None]
    out = (
        (hy * hx)[..., None] * g(y_low, x_low)
        + (hy * lx)[..., None] * g(y_low, x_high)
        + (ly * hx)[..., None] * g(y_high, x_low)
        + (ly * lx)[..., None] * g(y_high, x_high)
    )
    return out * w_valid


def ps_roi_align(
    inp: jax.Array,
    boxes: jax.Array,
    output_size: Tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = -1,
) -> jax.Array:
    """PSRoIAlign forward (reference ``torchvision.ops.ps_roi_align``).

    inp: ``[N, H, W, C]`` with ``C = C_out * PH * PW``; rois ``[K, 5]``.
    Returns ``[K, PH, PW, C_out]``.
    """
    rois = boxes  # reference kwarg name is `boxes`; `rois` internally
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph_n, pw_n = output_size
    n, height, width, channels = inp.shape
    if channels % (ph_n * pw_n) != 0:
        raise ValueError(
            f"input channels {channels} not divisible by {ph_n}*{pw_n}"
        )
    c_out = channels // (ph_n * pw_n)
    k = rois.shape[0]

    orig_dtype = inp.dtype
    inp = inp.astype(jnp.float32)
    rois = rois.astype(jnp.float32)

    batch_ind = rois[:, 0].astype(jnp.int32)
    start_w = rois[:, 1] * spatial_scale - 0.5
    start_h = rois[:, 2] * spatial_scale - 0.5
    end_w = rois[:, 3] * spatial_scale - 0.5
    end_h = rois[:, 4] * spatial_scale - 0.5
    roi_w = end_w - start_w
    roi_h = end_h - start_h
    bin_h = roi_h / ph_n
    bin_w = roi_w / pw_n

    if sampling_ratio > 0:
        grid_h = jnp.full((k,), float(sampling_ratio))
        grid_w = jnp.full((k,), float(sampling_ratio))
        n_iy = n_ix = sampling_ratio
    else:
        grid_h = jnp.ceil(roi_h / ph_n)
        grid_w = jnp.ceil(roi_w / pw_n)
        n_iy, n_ix = height, width
    count = grid_h * grid_w  # [K]

    iy = jnp.arange(n_iy, dtype=jnp.float32)
    ix = jnp.arange(n_ix, dtype=jnp.float32)
    yvalid = iy[None, :] < grid_h[:, None]  # [K, IY]
    xvalid = ix[None, :] < grid_w[:, None]

    out = jnp.zeros((k, ph_n, pw_n, c_out), dtype=jnp.float32)
    for ph in range(ph_n):
        hstart = ph * bin_h + start_h  # [K]
        y = hstart[:, None] + (iy[None, :] + 0.5) * (bin_h / grid_h)[:, None]
        for pw in range(pw_n):
            wstart = pw * bin_w + start_w
            x = wstart[:, None] + (ix[None, :] + 0.5) * (bin_w / grid_w)[:, None]
            # position-sensitive channel slice for this bin
            c_idx = (jnp.arange(c_out) * ph_n + ph) * pw_n + pw  # [C_out]
            feat = inp[batch_ind][..., c_idx]  # [K, H, W, C_out]
            # full sampling grid for this bin: [K, IY*IX]
            yy = jnp.repeat(y, n_ix, axis=1)
            xx = jnp.tile(x, (1, n_iy))
            vals = _bilinear_sample(feat, yy, xx)  # [K, IY*IX, C_out]
            vmask = (
                jnp.repeat(yvalid, n_ix, axis=1) & jnp.tile(xvalid, (1, n_iy))
            ).astype(jnp.float32)[..., None]
            s = jnp.sum(vals * vmask, axis=1) / count[:, None]
            out = out.at[:, ph, pw, :].set(s)
    return out.astype(orig_dtype)
