"""DeformConv2d (v1 + v2/modulated) — gather-based im2col + MXU GEMM.

Reference: ``torchvision/csrc/ops/cpu/deform_conv2d_kernel.cpp`` (the
``deformable_im2col_kernel`` at :140-195 defines the sampling semantics:
``y = out_y*stride - pad + i*dilation + offset_h``, zero outside
``(-1, size)``, per-corner validity) followed by a GEMM with the weight.

TPU design: the im2col gather produces ``[N, OH, OW, KH*KW*C_in]`` columns
that feed a single ``dot_general`` on the MXU. The bilinear sample is a
4-corner gather on the 128-lane channel axis. Backward is XLA autodiff
(scatter-add for the input/offset/mask grads), matching the reference's
``_deform_conv2d_backward`` schema deterministically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["deform_conv2d"]


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def deform_conv2d(
    inp: jax.Array,
    offset: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (0, 0),
    dilation: Tuple[int, int] = (1, 1),
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Deformable convolution v1/v2 (reference ``torchvision.ops.deform_conv2d``,
    ``ops/deform_conv.py:14``).

    Args:
        inp: ``[N, H, W, C_in]`` channels-last.
        offset: ``[N, OH, OW, 2 * offset_groups * KH * KW]``; the last axis is
            ordered ``(dy, dx)`` per kernel tap, taps row-major — the
            channels-last transpose of the reference layout.
        weight: ``[KH, KW, C_in // groups, C_out]`` (HWIO).
        mask: optional ``[N, OH, OW, offset_groups * KH * KW]`` (v2 modulation).
    Returns ``[N, OH, OW, C_out]``.
    """
    stride_h, stride_w = _pair(stride)
    pad_h, pad_w = _pair(padding)
    dil_h, dil_w = _pair(dilation)

    n, height, width, c_in = inp.shape
    kh, kw, c_in_per_group, c_out = weight.shape
    groups = c_in // c_in_per_group
    k2 = kh * kw

    out_h = (height + 2 * pad_h - (dil_h * (kh - 1) + 1)) // stride_h + 1
    out_w = (width + 2 * pad_w - (dil_w * (kw - 1) + 1)) // stride_w + 1

    n_off_grps = offset.shape[-1] // (2 * k2)
    if offset.shape != (n, out_h, out_w, 2 * n_off_grps * k2):
        raise ValueError(
            f"offset shape {offset.shape} incompatible with output "
            f"({n},{out_h},{out_w},2*og*{k2})"
        )
    c_per_off_grp = c_in // n_off_grps

    orig_dtype = inp.dtype
    inp = inp.astype(jnp.float32)
    offset = offset.astype(jnp.float32)

    # base sampling grid: [OH, KH] and [OW, KW]
    base_y = (
        jnp.arange(out_h, dtype=jnp.float32)[:, None] * stride_h
        - pad_h
        + jnp.arange(kh, dtype=jnp.float32)[None, :] * dil_h
    )
    base_x = (
        jnp.arange(out_w, dtype=jnp.float32)[:, None] * stride_w
        - pad_w
        + jnp.arange(kw, dtype=jnp.float32)[None, :] * dil_w
    )

    # offsets: [N, OH, OW, og, K2, 2] with [..., 0] = dy, [..., 1] = dx
    off = offset.reshape(n, out_h, out_w, n_off_grps, k2, 2)
    y = (
        base_y[None, :, None, None, :, None]  # broadcast over kw
        .repeat(kw, axis=5)
        .reshape(1, out_h, 1, 1, k2)
    ) + off[..., 0]
    x = (
        base_x[None, None, :, None, None, :]
        .repeat(kh, axis=4)
        .reshape(1, 1, out_w, 1, k2)
    ) + off[..., 1]
    # y, x: [N, OH, OW, og, K2]

    # bilinear with zero outside (-1, size) and per-corner validity
    inside = (y > -1.0) & (y < height) & (x > -1.0) & (x < width)
    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)
    y_high = y_low + 1
    x_high = x_low + 1
    ly = y - y_low
    lx = x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx

    v_yl = (y_low >= 0) & (y_low <= height - 1)
    v_yh = (y_high >= 0) & (y_high <= height - 1)
    v_xl = (x_low >= 0) & (x_low <= width - 1)
    v_xh = (x_high >= 0) & (x_high <= width - 1)

    yl = jnp.clip(y_low, 0, height - 1)
    yh = jnp.clip(y_high, 0, height - 1)
    xl = jnp.clip(x_low, 0, width - 1)
    xh = jnp.clip(x_high, 0, width - 1)

    # grouped input: [N, H*W, og, Cg]
    inp_g = inp.reshape(n, height * width, n_off_grps, c_per_off_grp)

    def gather(yy, xx, valid):
        # yy, xx: [N, OH, OW, og, K2]
        flat = yy * width + xx
        flat = flat.transpose(0, 3, 1, 2, 4).reshape(n, n_off_grps, -1)  # [N,og,S]
        src = inp_g.transpose(0, 2, 1, 3)  # [N, og, H*W, Cg]
        out = jnp.take_along_axis(src, flat[..., None], axis=2)  # [N,og,S,Cg]
        out = out.reshape(n, n_off_grps, out_h, out_w, k2, c_per_off_grp)
        out = out.transpose(0, 2, 3, 1, 4, 5)  # [N,OH,OW,og,K2,Cg]
        w_valid = (valid & inside).astype(jnp.float32)[..., None]
        return out * w_valid

    w1 = (hy * hx)[..., None]
    w2 = (hy * lx)[..., None]
    w3 = (ly * hx)[..., None]
    w4 = (ly * lx)[..., None]
    cols = (
        w1 * gather(yl, xl, v_yl & v_xl)
        + w2 * gather(yl, xh, v_yl & v_xh)
        + w3 * gather(yh, xl, v_yh & v_xl)
        + w4 * gather(yh, xh, v_yh & v_xh)
    )  # [N, OH, OW, og, K2, Cg]

    if mask is not None:
        m = mask.astype(jnp.float32).reshape(n, out_h, out_w, n_off_grps, k2)
        cols = cols * m[..., None]

    # [N, OH, OW, K2, C_in]: channel c = og_idx * Cg + cg
    cols = cols.transpose(0, 1, 2, 4, 3, 5).reshape(n, out_h, out_w, k2, c_in)

    # grouped GEMM on the MXU
    cols = cols.reshape(n, out_h, out_w, k2, groups, c_in_per_group)
    w_g = weight.astype(jnp.float32).reshape(k2, c_in_per_group, groups, c_out // groups)
    out = jnp.einsum(
        "nhwkgc,kcgo->nhwgo",
        cols,
        w_g,
        preferred_element_type=jnp.float32,
    ).reshape(n, out_h, out_w, c_out)

    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
