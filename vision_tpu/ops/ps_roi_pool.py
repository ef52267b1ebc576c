"""Position-sensitive RoIPool (R-FCN), channels-last.

Reference: ``torchvision/csrc/ops/cpu/ps_roi_pool_kernel.cpp`` — integer
roi bounds (rounded), roi size clamped to >=1 (no +1, unlike roi_pool),
bin edges clipped to ``size-1``, *average* pooling over the bin, empty
bins = 0, position-sensitive channel mapping as in ps_roi_align.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["ps_roi_pool"]


def ps_roi_pool(
    inp: jax.Array,
    boxes: jax.Array,
    output_size: Tuple[int, int],
    spatial_scale: float = 1.0,
) -> jax.Array:
    """PSRoIPool forward (reference ``torchvision.ops.ps_roi_pool``).

    inp: ``[N, H, W, C]`` with ``C = C_out * PH * PW``; rois ``[K, 5]``.
    Returns ``[K, PH, PW, C_out]``.
    """
    rois = boxes  # reference kwarg name is `boxes`; `rois` internally
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph_n, pw_n = output_size
    _, height, width, channels = inp.shape
    if channels % (ph_n * pw_n) != 0:
        raise ValueError(f"input channels {channels} not divisible by {ph_n}*{pw_n}")
    c_out = channels // (ph_n * pw_n)
    k = rois.shape[0]

    orig_dtype = inp.dtype
    inp = inp.astype(jnp.float32)
    rois = rois.astype(jnp.float32)

    batch_ind = rois[:, 0].astype(jnp.int32)
    start_w = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    start_h = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    end_w = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    end_h = jnp.round(rois[:, 4] * spatial_scale).astype(jnp.int32)

    roi_w = jnp.maximum(end_w - start_w, 1).astype(jnp.float32)
    roi_h = jnp.maximum(end_h - start_h, 1).astype(jnp.float32)
    bin_h = roi_h / ph_n
    bin_w = roi_w / pw_n

    hs = jnp.arange(height)[None, :]
    ws = jnp.arange(width)[None, :]

    out = jnp.zeros((k, ph_n, pw_n, c_out), dtype=jnp.float32)
    for ph in range(ph_n):
        hstart = jnp.clip(
            jnp.floor(ph * bin_h).astype(jnp.int32) + start_h, 0, height - 1
        )
        hend = jnp.clip(
            jnp.ceil((ph + 1) * bin_h).astype(jnp.int32) + start_h, 0, height - 1
        )
        hmask = (hs >= hstart[:, None]) & (hs < hend[:, None])  # [K, H]
        for pw in range(pw_n):
            wstart = jnp.clip(
                jnp.floor(pw * bin_w).astype(jnp.int32) + start_w, 0, width - 1
            )
            wend = jnp.clip(
                jnp.ceil((pw + 1) * bin_w).astype(jnp.int32) + start_w, 0, width - 1
            )
            wmask = (ws >= wstart[:, None]) & (ws < wend[:, None])  # [K, W]
            c_idx = (jnp.arange(c_out) * ph_n + ph) * pw_n + pw
            feat = inp[batch_ind][..., c_idx]  # [K, H, W, C_out]
            m = (hmask[:, :, None] & wmask[:, None, :])[..., None]
            s = jnp.sum(jnp.where(m, feat, 0.0), axis=(1, 2))  # [K, C_out]
            area = ((hend - hstart) * (wend - wstart)).astype(jnp.float32)
            is_empty = (hend <= hstart) | (wend <= wstart)
            val = jnp.where(
                is_empty[:, None], 0.0, s / jnp.maximum(area, 1.0)[:, None]
            )
            out = out.at[:, ph, pw, :].set(val)
    return out.astype(orig_dtype)
