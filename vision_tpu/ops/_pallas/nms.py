"""Pallas TPU NMS kernel.

The XLA fallback (``vision_tpu/ops/nms.py``) materializes the full N x N
IoU matrix in HBM and walks it with a ``fori_loop``. This kernel keeps the
whole state in VMEM and re-derives each kept box's IoU row on the fly (the
reference CUDA bitmask kernel's work pattern,
``csrc/ops/cuda/nms_kernel.cu:57-105``, mapped to the VPU):

* box coordinates are passed twice: coordinate-major (5, N) in VMEM for
  the vectorized row math, and in SMEM for arbitrary scalar indexing
  (Mosaic cannot load a single unaligned lane from VMEM)
* one sequential pass over boxes; a box's "still alive" check is one
  masked reduction; suppressed boxes skip their row entirely (``pl.when``)
  — at IoU 0.5 most rows never compute
* each kept box suppresses all later boxes with one (1, N) VPU update

Inputs must be score-sorted; padding rows are marked via ``valid``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nms_pallas_sorted"]


def _nms_kernel(smem_ref, thr_ref, data_ref, keep_ref):
    # smem_ref: (5, N) f32 SMEM (x1, y1, x2, y2, area) for scalar reads
    # data_ref: (8, N) f32 VMEM (x1, y1, x2, y2, area, valid, _, _)
    # keep_ref: (1, N) f32 out
    n = data_ref.shape[1]
    thr = thr_ref[0]

    x1 = data_ref[0:1, :]
    y1 = data_ref[1:2, :]
    x2 = data_ref[2:3, :]
    y2 = data_ref[3:4, :]
    area = data_ref[4:5, :]
    valid = data_ref[5:6, :]

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    keep_ref[:, :] = valid

    def body(j, _):
        onehot = (idx == j).astype(jnp.float32)
        still_alive = jnp.sum(keep_ref[:, :] * onehot) > 0.0

        @pl.when(still_alive)
        def _():
            x1j = smem_ref[0, j]
            y1j = smem_ref[1, j]
            x2j = smem_ref[2, j]
            y2j = smem_ref[3, j]
            aj = smem_ref[4, j]
            ix1 = jnp.maximum(x1, x1j)
            iy1 = jnp.maximum(y1, y1j)
            ix2 = jnp.minimum(x2, x2j)
            iy2 = jnp.minimum(y2, y2j)
            inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
            union = area + aj - inter
            iou = jnp.where(union > 0.0, inter / union, 0.0)
            kill = (iou > thr) & (idx > j)
            keep_ref[:, :] = jnp.where(kill, 0.0, keep_ref[:, :])

        return 0

    jax.lax.fori_loop(0, n, body, 0, unroll=False)


def nms_pallas_sorted(
    boxes: jax.Array,
    valid: jax.Array,
    iou_threshold: float,
    interpret: bool = False,
) -> jax.Array:
    """Greedy NMS over score-sorted boxes.

    boxes: [N, 4] float32 sorted by descending score; valid: [N] bool.
    Returns keep mask [N] bool in the sorted order. ``interpret=True`` runs
    the kernel in the Pallas interpreter (CPU parity tests).
    """
    n = boxes.shape[0]
    pad = (-n) % 128
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    np_ = n + pad

    boxes = boxes.astype(jnp.float32)
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    area = (x2 - x1) * (y2 - y1)
    zeros = jnp.zeros_like(area)
    smem_data = jnp.stack([x1, y1, x2, y2, area], axis=0)  # (5, N)
    vmem_data = jnp.stack(
        [x1, y1, x2, y2, area, valid.astype(jnp.float32), zeros, zeros], axis=0
    )  # (8, N)

    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, np_), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(smem_data, jnp.asarray([iou_threshold], jnp.float32), vmem_data)
    return keep[0, :n] > 0.0
