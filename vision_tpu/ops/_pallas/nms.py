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

__all__ = ["nms_pallas_sorted", "nms_pallas_bitmask_sorted"]


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


def _nms_block_kernel(thr_ref, data_ref, blockT_ref, invalid_ref,
                      keep_ref, iou_scratch, removed_ref, *, col_w):
    """One grid step = one 128-box block (grid steps run sequentially on
    a TPU core, so VMEM scratch carries greedy state between blocks).

    The reference CUDA kernel (``csrc/ops/cuda/nms_kernel.cu:57-105``)
    builds the whole NxN suppression bitmask in parallel 64x64 tiles and
    leaves a cheap sequential scan. Same shape here, fused per block:
    (1) a 128-step scan resolves the block against itself on a VMEM
    [128,128] IoU tile with single-vreg (1,128) carries — rows are read
    8 at a time (one aligned sublane load) and resolved with static
    register slices; the alive test stays a (1,1) vector broadcast, never
    a scalar extract (that would stall the pipeline every step);
    (2) the block's kept boxes suppress ALL later boxes in parallel
    (128, col_w) tiles at full 8x128 VPU utilization — the O(N^2) half is
    tile-parallel, only the O(N) scan is sequential.

    thr_ref: (1,) SMEM; data_ref: (8, Np) VMEM coordinate-major
    (x1,y1,x2,y2,area,...); blockT_ref: (128, 8) VMEM block slice
    (row-major: [K,1] column broadcasts without transposes);
    invalid_ref: (1, Np) VMEM (1.0 = padding/invalid row);
    keep_ref: (1, 128) out block; iou_scratch: (128, 128) VMEM;
    removed_ref: (1, Np) VMEM scratch (greedy suppression state).
    """
    b = pl.program_id(0)
    k = 128
    npad = data_ref.shape[1]
    thr = thr_ref[0]

    @pl.when(b == 0)
    def _():
        # invalid rows start dead: never kept, never suppress
        removed_ref[:, :] = invalid_ref[:, :]

    start = b * k
    bx1 = blockT_ref[:, 0:1]
    by1 = blockT_ref[:, 1:2]
    bx2 = blockT_ref[:, 2:3]
    by2 = blockT_ref[:, 3:4]
    barea = blockT_ref[:, 4:5]

    def iou_vs_cols(cstart, width):
        cx1 = data_ref[0:1, pl.ds(cstart, width)]
        cy1 = data_ref[1:2, pl.ds(cstart, width)]
        cx2 = data_ref[2:3, pl.ds(cstart, width)]
        cy2 = data_ref[3:4, pl.ds(cstart, width)]
        carea = data_ref[4:5, pl.ds(cstart, width)]
        ix1 = jnp.maximum(bx1, cx1)
        iy1 = jnp.maximum(by1, cy1)
        ix2 = jnp.minimum(bx2, cx2)
        iy2 = jnp.minimum(by2, cy2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = barea + carea - inter
        return jnp.where(union > 0.0, inter / union, 0.0)

    # ---- phase 1: within-block greedy scan on the [128, 128] tile
    iou_scratch[:, :] = iou_vs_cols(pl.multiple_of(start, k), k)
    removed0 = removed_ref[0:1, pl.ds(pl.multiple_of(start, k), k)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    u_rows = 8

    def scan_body(c, removed):
        base = c * u_rows
        rows = iou_scratch[pl.ds(pl.multiple_of(base, u_rows), u_rows), :]
        for u in range(u_rows):
            i = base + u
            onehot = (lane == i).astype(jnp.float32)
            dead_i = jnp.sum(removed * onehot, axis=1, keepdims=True)
            kill = (rows[u : u + 1, :] > thr) & (lane > i) & (dead_i == 0.0)
            removed = jnp.where(kill, 1.0, removed)
        return removed

    removed_b = jax.lax.fori_loop(0, k // u_rows, scan_body, removed0)
    # a box can only be killed by steps before its own (lane > j guard),
    # so post-loop removed IS the keep complement
    keep_row = 1.0 - jnp.minimum(
        removed_b + invalid_ref[0:1, pl.ds(pl.multiple_of(start, k), k)],
        1.0,
    )
    keep_ref[:, :] = keep_row

    # ---- phase 2: kept boxes suppress every later box, in wide tiles
    @pl.when(jnp.sum(keep_row) > 0.0)
    def _():
        nb_w = npad // col_w
        t0 = start // col_w  # first col tile overlapping/after the block
        # one relayout per block; the reduce-over-kept-rows stays on the
        # VPU (an M=1 MXU matmul benchmarked slower — the systolic array
        # hates 1-row LHS)
        keep_col = jnp.transpose(keep_row, (1, 0))

        def col_body(t, _):
            cstart = pl.multiple_of(t * col_w, col_w)
            iou_bt = iou_vs_cols(cstart, col_w)
            # only columns strictly after the block (scan handled within)
            col_pos = (
                jax.lax.broadcasted_iota(jnp.int32, (1, col_w), 1)
                + t * col_w
            )
            sup = jnp.max(
                keep_col * (iou_bt > thr).astype(jnp.float32),
                axis=0,
                keepdims=True,
            )
            sup = jnp.where(col_pos >= start + k, sup, 0.0)
            removed_ref[0:1, pl.ds(cstart, col_w)] = jnp.maximum(
                removed_ref[0:1, pl.ds(cstart, col_w)], sup
            )
            return 0

        jax.lax.fori_loop(t0, nb_w, col_body, 0)


def nms_pallas_bitmask_sorted(
    boxes: jax.Array,
    valid: jax.Array,
    iou_threshold: float,
    block: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Block-parallel greedy NMS over score-sorted boxes (exact greedy
    parity with :func:`nms_pallas_sorted` / the reference kernels).

    boxes: [N, 4] f32 sorted by descending score; valid: [N] bool.
    Returns keep mask [N] bool in sorted order. ``block`` is fixed at
    128 (kept as a parameter for A/B experiments).
    """
    import functools

    n = boxes.shape[0]
    k = 128
    col_w = min(1024, -(-n // k) * k)  # wide phase-2 tiles, Np-divisible
    pad = (-n) % col_w
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    np_ = n + pad
    nb = np_ // k

    boxes = boxes.astype(jnp.float32)
    # invalid rows can carry arbitrary coords (batched-NMS offsets on
    # padding, possibly inf): zero them so they cannot suppress anything
    boxes = jnp.where(valid[:, None], boxes, 0.0)
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    area = (x2 - x1) * (y2 - y1)
    zeros = jnp.zeros_like(area)
    data = jnp.stack([x1, y1, x2, y2, area, zeros, zeros, zeros], axis=0)
    data_t = data.T  # (Np, 8) row-major for [K,1] block columns
    invalid = (~valid).astype(jnp.float32).reshape(1, np_)

    keep = pl.pallas_call(
        functools.partial(_nms_block_kernel, col_w=col_w),
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((1, np_), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, np_), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, np_), lambda b: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, k), lambda b: (0, b), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((k, k), jnp.float32),
            pltpu.VMEM((1, np_), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray([iou_threshold], jnp.float32),
        data,
        data_t,
        invalid,
    )
    return keep[0, :n] > 0.0


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
