"""Pallas TPU RoIAlign kernel — separable contraction, intermediate in VMEM.

The XLA einsum path (``ops/roi_align.py:roi_align_mxu``) computes the
separable bilinear pool in two device-wide contractions:

    rows = w_y @ feat          # [K, PH, W, C] -> ~1 GB HBM at the FRCNN
    out  = w_x @ rows          # P2 box-head config (512 rois, 200x272x256)

and is HBM-bound on the ``rows`` intermediate (written + re-read). This
kernel tiles the roi axis (BK) and the feature width (BW) and fuses both
contractions per tile, so ``rows`` only ever exists as a
``[BK*PH, BW*C]`` VMEM block:

* grid ``(K/BK, W/BW)``; the W axis is innermost. Accumulation across W
  tiles happens in an f32 VMEM scratch; the output block is written once,
  on the last W step (an f32 out block inside ``fori_loop`` bodies was
  observed to blow XLA's 16 MB scoped-vmem stack — the bf16 final store
  halves both that and the store traffic). For f32 inputs the out block
  is still f32; at large configs (e.g. the FRCNN P2 shape inside a
  ``fori_loop``) the same scoped-vmem limit may bind — the f32 TPU
  default dispatch is "mxu", so the exposure is the opt-in pallas path
  only.
* stage 1 (MXU): ``rows_tile = w_y_blk @ feat_blk`` — one large matmul
  per step ([BK*PH, H'] x [H', BW*C]). f32 inputs run as an
  error-compensated 3-pass bf16 split (hi@hi + hi@lo + lo@hi, f32
  accumulation — the ``precision="high"`` recipe, ~1e-6 parity);
  bf16 inputs take a single pass.
* stage 2 (VPU): per pooled column q, ``out[:, :, q, :] += sum_w
  w_x[:, q, w] * rows[:, :, w, :]`` — a broadcast multiply and a sublane
  reduction; only ~2*SR*PW of the W positions are nonzero per roi, so
  this stays far off the critical path.
* all sampling semantics (CUDA edge rules, batch-index folding, sr
  averaging) live in the precomputed ``w_y``/``w_x`` from
  ``ops.roi_align._separable_weights`` — the kernel is a pure
  contraction, which keeps parity exactly as testable as the einsum path.

Reference kernel being replaced: ``torchvision/csrc/ops/cuda/
roi_align_kernel.cu`` (forward); the separable formulation has no CUDA
analog — it exists because the MXU makes dense one-hot contractions
cheaper than scattered gathers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["roi_align_pallas"]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(
    n_passes: int, bk: int, ph: int, pw: int, bw: int, c: int, n_wt: int
):
    def kernel(*refs):
        if n_passes == 3:
            wy_hi, wy_lo, feat_hi, feat_lo, wx_ref, out_ref, acc_ref = refs
        else:
            wy_hi, feat_hi, wx_ref, out_ref, acc_ref = refs
        j = pl.program_id(1)

        # stage 1 (MXU): [BK*PH, H'] @ [H', BW*C] -> f32 rows tile
        rows = jnp.dot(
            wy_hi[:], feat_hi[:], preferred_element_type=jnp.float32
        )
        if n_passes == 3:
            rows += jnp.dot(
                wy_hi[:], feat_lo[:], preferred_element_type=jnp.float32
            )
            rows += jnp.dot(
                wy_lo[:], feat_hi[:], preferred_element_type=jnp.float32
            )

        rows4 = rows.reshape(bk, ph, bw, c)
        # wx block is [1, BK*PW, 128] (BW zero-padded to a full lane tile
        # to satisfy Mosaic's 128-divisible minor-dim rule); use :bw
        wx3 = wx_ref[0][:, :bw].reshape(bk, pw, bw)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # stage 2 (VPU): contract the W tile into each pooled column.
        # Accumulate in f32 scratch; the output block is only written on
        # the last W step, so it can carry the input dtype (bf16 out
        # halves the store traffic AND keeps the custom-call result small
        # enough that XLA's scoped-vmem placement inside fori_loop bodies
        # doesn't blow the 16 MB stack limit — observed with f32 out).
        for q in range(pw):
            wxq = wx3[:, q, :]  # [BK, BW]
            outq = jnp.sum(rows4 * wxq[:, None, :, None], axis=2)
            acc_ref[:, q * c : (q + 1) * c] += outq.reshape(bk * ph, c)

        @pl.when(j == n_wt - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size", "spatial_scale", "sampling_ratio", "aligned",
        "interpret",
    ),
)
def roi_align_pallas(
    inp: jax.Array,
    rois: jax.Array,
    output_size: Tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """RoIAlign forward via the fused-separable Pallas kernel.

    Same contract as :func:`vision_tpu.ops.roi_align.roi_align_mxu`
    (requires ``sampling_ratio > 0``); f32 inputs match the einsum path's
    ``precision="high"`` accuracy (~1e-6), bf16 inputs its single-pass
    accuracy. ``interpret=True`` runs the Pallas interpreter (CPU parity
    tests)."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    if sampling_ratio <= 0:
        raise ValueError("roi_align_pallas requires sampling_ratio > 0")
    ph, pw = output_size
    n, height, width, c = inp.shape
    k = rois.shape[0]
    orig_dtype = inp.dtype
    sr = sampling_ratio

    bk = 64 if k >= 64 else _ceil_to(k, 8)
    kp = _ceil_to(k, bk)
    bw = 16 if width >= 16 else _ceil_to(width, 8)
    wp = _ceil_to(width, bw)
    cp = _ceil_to(c, 128)
    ht = n * height

    from vision_tpu.ops.roi_align import _separable_weights

    w_y, w_x = _separable_weights(
        rois, (ph, pw), spatial_scale, sr, aligned, n, height, width,
        width_ohsize=wp,
    )  # [K, PH, HT] / [K, PW, WP] f32
    if kp != k:
        w_y = jnp.pad(w_y, ((0, kp - k), (0, 0), (0, 0)))
        w_x = jnp.pad(w_x, ((0, kp - k), (0, 0), (0, 0)))
    wy2 = w_y.reshape(kp * ph, ht)
    # wx pre-tiled per W block: [nT, K*PW, 128] with BW zero-padded to a
    # full lane tile (Mosaic requires the blocked minor dim be a multiple
    # of 128 or the whole axis)
    n_wt = wp // bw
    wx_t = w_x.reshape(kp * pw, n_wt, bw).transpose(1, 0, 2)
    wx_t = jnp.pad(wx_t, ((0, 0), (0, 0), (0, 128 - bw)))

    feat = inp
    if wp != width or cp != c:
        feat = jnp.pad(
            feat, ((0, 0), (0, 0), (0, wp - width), (0, cp - c))
        )
    feat2 = feat.reshape(ht, wp * cp)

    if orig_dtype == jnp.bfloat16:
        n_passes = 1
        operands = [wy2.astype(jnp.bfloat16), feat2]
    else:
        n_passes = 3
        feat2 = feat2.astype(jnp.float32)
        wy_hi = wy2.astype(jnp.bfloat16)
        wy_lo = (wy2 - wy_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        f_hi = feat2.astype(jnp.bfloat16)
        f_lo = (feat2 - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        operands = [wy_hi, wy_lo, f_hi, f_lo]

    wy_spec = pl.BlockSpec(
        (bk * ph, ht), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    feat_spec = pl.BlockSpec(
        (ht, bw * cp), lambda i, j: (0, j), memory_space=pltpu.VMEM
    )
    in_specs = (
        [wy_spec, wy_spec, feat_spec, feat_spec]
        if n_passes == 3
        else [wy_spec, feat_spec]
    )
    in_specs.append(
        pl.BlockSpec(
            (1, bk * pw, 128), lambda i, j: (j, i, 0),
            memory_space=pltpu.VMEM,
        )
    )

    out_dtype = jnp.bfloat16 if orig_dtype == jnp.bfloat16 else jnp.float32
    out = pl.pallas_call(
        _make_kernel(n_passes, bk, ph, pw, bw, cp, n_wt),
        grid=(kp // bk, wp // bw),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bk * ph, pw * cp), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((kp * ph, pw * cp), out_dtype),
        scratch_shapes=[pltpu.VMEM((bk * ph, pw * cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_passes * kp * ph * ht * wp * cp
            + 2 * kp * ph * pw * wp * cp,
            bytes_accessed=(
                (kp // bk) * ht * wp * cp * (2 * n_passes if n_passes == 3 else 2)
                + kp * ph * ht * 4
                + kp * ph * pw * cp * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands, wx_t)

    out = out.reshape(kp, ph, pw, cp)[:k, :, :, :c]
    return (out / float(sr * sr)).astype(orig_dtype)
