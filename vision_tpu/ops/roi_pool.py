"""RoIPool — max-pool RoI variant, channels-last, static shapes.

Reference: ``torchvision/csrc/ops/cpu/roi_pool_kernel.cpp`` (integer-rounded
roi bounds, floor/ceil bin edges, empty bins = 0). The reference forward
also returns an argmax map for the backward; here the backward is XLA
autodiff through the masked max (ties split gradient instead of
first-argmax-wins — measure-zero difference for float inputs).

The per-bin masked max is a static PH*PW unrolled loop of VPU reductions
over the per-roi gathered feature map.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["roi_pool"]


def roi_pool(
    inp: jax.Array,
    boxes: jax.Array,
    output_size: Tuple[int, int],
    spatial_scale: float = 1.0,
) -> jax.Array:
    """RoIPool forward (reference ``torchvision.ops.roi_pool``).

    inp: ``[N, H, W, C]``; rois: ``[K, 5]`` (batch_idx, x1, y1, x2, y2).
    Returns ``[K, PH, PW, C]``.
    """
    rois = boxes  # reference kwarg name is `boxes`; `rois` internally
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph_n, pw_n = output_size
    _, height, width, _ = inp.shape

    orig_dtype = inp.dtype
    inp = inp.astype(jnp.float32)
    rois = rois.astype(jnp.float32)

    batch_ind = rois[:, 0].astype(jnp.int32)
    start_w = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    start_h = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    end_w = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    end_h = jnp.round(rois[:, 4] * spatial_scale).astype(jnp.int32)

    roi_w = jnp.maximum(end_w - start_w + 1, 1).astype(jnp.float32)
    roi_h = jnp.maximum(end_h - start_h + 1, 1).astype(jnp.float32)
    bin_h = roi_h / ph_n  # [K]
    bin_w = roi_w / pw_n

    feat = inp[batch_ind]  # [K, H, W, C]
    hs = jnp.arange(height)[None, :]  # [1, H]
    ws = jnp.arange(width)[None, :]

    rows = []
    for ph in range(ph_n):
        hstart = jnp.clip(jnp.floor(ph * bin_h).astype(jnp.int32) + start_h, 0, height)
        hend = jnp.clip(jnp.ceil((ph + 1) * bin_h).astype(jnp.int32) + start_h, 0, height)
        hmask = (hs >= hstart[:, None]) & (hs < hend[:, None])  # [K, H]
        cols = []
        for pw in range(pw_n):
            wstart = jnp.clip(
                jnp.floor(pw * bin_w).astype(jnp.int32) + start_w, 0, width
            )
            wend = jnp.clip(
                jnp.ceil((pw + 1) * bin_w).astype(jnp.int32) + start_w, 0, width
            )
            wmask = (ws >= wstart[:, None]) & (ws < wend[:, None])  # [K, W]
            m = (hmask[:, :, None] & wmask[:, None, :])[..., None]  # [K,H,W,1]
            val = jnp.max(
                jnp.where(m, feat, -jnp.inf), axis=(1, 2)
            )  # [K, C]
            is_empty = (hend <= hstart) | (wend <= wstart)
            val = jnp.where(is_empty[:, None], 0.0, val)
            cols.append(val)
        rows.append(jnp.stack(cols, axis=1))  # [K, PW, C]
    out = jnp.stack(rows, axis=1)  # [K, PH, PW, C]
    return out.astype(orig_dtype)
