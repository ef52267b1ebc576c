"""Non-maximum suppression — TPU-native, static-shape formulations.

The reference implements NMS natively: a CPU greedy loop
(``csrc/ops/cpu/nms_kernel.cpp:18-95``) and a CUDA 64x64 bitmask-tile kernel
(``csrc/ops/cuda/nms_kernel.cu:57-105``). Both return a dynamically-sized
int64 index list — a shape XLA cannot express under jit.

TPU design: every result is fixed-size.

* :func:`nms_mask` — the jit-native primitive: boolean keep mask over the
  *original* box order. Greedy-equivalent to the reference (same sort order,
  stable ties, strict ``>`` threshold comparison like the CUDA kernel).
* :func:`nms` — reference-API-shaped wrapper: ``-1``-padded int32 index
  vector in descending-score order (prefix = kept indices).
* :func:`batched_nms` — the coordinate-offset trick
  (reference ``ops/boxes.py:93``), always vectorized (no per-class loop).

The sequential greedy dependence is expressed as a ``lax.fori_loop`` over
score-sorted rows of the IoU matrix — O(N) iterations of O(N) VPU work.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["nms", "nms_mask", "batched_nms", "batched_nms_mask"]


def _pallas_nms_enabled() -> bool:
    """Pallas kernel rides the hot path on TPU; env-gated for A/B and
    debugging. Default = the block-parallel bitmask kernel
    (``_pallas/nms.py:nms_pallas_bitmask_sorted``, the CUDA tile shape);
    ``VISION_TPU_NMS_KERNEL=rowscan`` selects the r2 row-serial kernel.
    Measured v5e boxes/s, best-of-3 amortized (r4 methodology — earlier
    rounds' numbers were ~5x understated by per-call dispatch overhead):
    bitmask/rowscan/XLA-chunked = 3.6M/3.6M/3.1M @4k and
    3.1M/2.4M/1.9M @20k; all three converge at <=1k boxes where the
    ~0.3 ms kernel-dispatch floor dominates."""
    if os.environ.get("VISION_TPU_DISABLE_PALLAS_NMS", "0") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _iou_matrix(boxes: jax.Array) -> jax.Array:
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    # Guard 0/0 (degenerate boxes): reference CPU kernel computes
    # inter/union with union>0 always for valid boxes; degenerate boxes get
    # iou 0 so they never suppress each other.
    return jnp.where(union > 0, inter / union, 0.0)


def nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    valid: jax.Array | None = None,
    presorted: bool = False,
) -> jax.Array:
    """Greedy NMS; returns boolean keep mask aligned with the input order.

    ``valid`` optionally marks padding rows (False = ignore): padded entries
    are never kept and never suppress — this is how dynamic box counts are
    expressed on TPU.

    ``presorted=True`` is a caller contract that rows already sit in
    descending-score order with ties in index order (e.g. straight out of
    a ``top_k``): the argsort and the two [N, 4] permutation gathers it
    implies — which run at poor lane utilization on TPU (4-wide rows) and
    measured ~3 ms at N=5x1024 in the RPN filter stage — are skipped.
    Invalid rows may sit anywhere: their coords are zeroed (zero-area
    boxes never suppress) and they are masked out of the result.
    """
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=bool)
    boxes = boxes.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)

    if presorted:
        vmask = scores > -jnp.inf
        sboxes = jnp.where(vmask[:, None], boxes, 0.0)
        if _pallas_nms_enabled():
            if (
                os.environ.get("VISION_TPU_NMS_KERNEL", "bitmask")
                == "rowscan"
            ):
                from vision_tpu.ops._pallas.nms import nms_pallas_sorted

                keep = nms_pallas_sorted(sboxes, vmask, iou_threshold)
            else:
                from vision_tpu.ops._pallas.nms import (
                    nms_pallas_bitmask_sorted,
                )

                keep = nms_pallas_bitmask_sorted(
                    sboxes, vmask, iou_threshold
                )
        else:
            keep = _nms_sorted_chunked(sboxes, iou_threshold)
        return keep & vmask

    order = jnp.argsort(-scores, stable=True)
    sboxes = boxes[order]
    if _pallas_nms_enabled():
        valid_sorted = (
            (scores[order] > -jnp.inf)
            if valid is not None
            else jnp.ones((n,), dtype=bool)
        )
        if os.environ.get("VISION_TPU_NMS_KERNEL", "bitmask") == "rowscan":
            from vision_tpu.ops._pallas.nms import nms_pallas_sorted

            keep_sorted = nms_pallas_sorted(
                sboxes, valid_sorted, iou_threshold
            )
        else:
            from vision_tpu.ops._pallas.nms import nms_pallas_bitmask_sorted

            keep_sorted = nms_pallas_bitmask_sorted(
                sboxes, valid_sorted, iou_threshold
            )
    else:
        keep_sorted = _nms_sorted_chunked(sboxes, iou_threshold)
    if valid is not None:
        keep_sorted = keep_sorted & (scores[order] > -jnp.inf)
    # scatter back to original order
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


def _nms_sorted_chunked(
    sboxes: jax.Array, iou_threshold: float, chunk: int = 128
) -> jax.Array:
    """Greedy NMS on score-sorted boxes, chunked for TPU.

    A naive ``fori_loop`` does N sequential steps of O(N) VPU work each.
    Chunking (the CUDA bitmask tiling, ``csrc/ops/cuda/nms_kernel.cu``,
    recast for XLA) keeps the greedy order exact while making the O(N) part
    batched: per 128-chunk, the within-chunk resolve is 128 steps of O(128)
    work on a VMEM-resident 128x128 IoU tile, and the chunk's suppression of
    all later boxes is one masked (128, N) matrix reduce.
    """
    n = sboxes.shape[0]
    pad = (-n) % chunk
    if pad:
        sboxes = jnp.pad(sboxes, ((0, pad), (0, 0)))
    np_ = n + pad
    n_chunks = np_ // chunk

    area = (sboxes[:, 2] - sboxes[:, 0]) * (sboxes[:, 3] - sboxes[:, 1])
    idx = jnp.arange(np_)
    keep = idx < n  # padding rows dead from the start

    def chunk_iou(cb, ca):
        # cb: (chunk, 4) vs all boxes -> (chunk, N)
        lt = jnp.maximum(cb[:, None, :2], sboxes[None, :, :2])
        rb = jnp.minimum(cb[:, None, 2:], sboxes[None, :, 2:])
        wh = jnp.clip(rb - lt, 0)
        inter = wh[..., 0] * wh[..., 1]
        union = ca[:, None] + area[None, :] - inter
        return jnp.where(union > 0, inter / union, 0.0)

    for ci in range(n_chunks):
        s = ci * chunk
        cb = jax.lax.dynamic_slice(sboxes, (s, 0), (chunk, 4))
        ca = jax.lax.dynamic_slice(area, (s,), (chunk,))
        iou_row = chunk_iou(cb, ca)  # (chunk, N)
        iou_cc = jax.lax.dynamic_slice(
            iou_row, (0, s), (chunk, chunk)
        )  # within-chunk tile
        ck = jax.lax.dynamic_slice(keep, (s,), (chunk,))
        cidx = jnp.arange(chunk)

        def inner(j, ck):
            kill = ck[j] & (iou_cc[j] > iou_threshold) & (cidx > j)
            return ck & ~kill

        ck = jax.lax.fori_loop(0, chunk, inner, ck)
        keep = jax.lax.dynamic_update_slice(keep, ck, (s,))
        # one batched update: kept chunk rows kill all later boxes
        sup_later = jnp.any(
            ck[:, None] & (iou_row > iou_threshold), axis=0
        ) & (idx >= s + chunk)
        keep = keep & ~sup_later

    return keep[:n]


def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float) -> jax.Array:
    """Reference-shaped NMS (``torchvision.ops.nms``, ``ops/boxes.py:20``):
    kept indices in descending score order — padded with ``-1`` to length N
    so the shape is static. ``result[result >= 0]`` outside jit reproduces
    the reference exactly."""
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=jnp.int32)
    order = jnp.argsort(-scores.astype(jnp.float32), stable=True)
    keep = nms_mask(boxes, scores, iou_threshold)
    keep_sorted = keep[order]
    # stable-compact kept indices to the front, -1 padding behind
    # (suppressed rows scatter to index n, dropped out of bounds)
    rank = jnp.cumsum(keep_sorted) - 1
    out = jnp.full((n,), -1, dtype=jnp.int32).at[
        jnp.where(keep_sorted, rank, n)
    ].set(order.astype(jnp.int32), mode="drop")
    return out


def batched_nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    idxs: jax.Array,
    iou_threshold: float,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Category-aware NMS keep mask via the coordinate-offset trick
    (reference ``ops/boxes.py:93-111``): boxes of different ``idxs`` are
    translated to disjoint regions so they never overlap."""
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool)
    boxes = boxes.astype(jnp.float32)
    # offset from the max coordinate of VALID boxes only: padded garbage
    # rows must not inflate it toward inf (reference ops/boxes.py:93-111
    # computes boxes.max() post-filter)
    if valid is not None:
        max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    else:
        max_coord = jnp.max(boxes)
    offsets = idxs.astype(jnp.float32) * (max_coord + 1.0)
    boxes_for_nms = boxes + offsets[:, None]
    return nms_mask(boxes_for_nms, scores, iou_threshold, valid=valid)


def batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    idxs: jax.Array,
    iou_threshold: float,
) -> jax.Array:
    """Reference-shaped batched NMS (``ops/boxes.py:57``): ``-1``-padded kept
    indices in descending score order."""
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=jnp.int32)
    keep = batched_nms_mask(boxes, scores, idxs, iou_threshold)
    order = jnp.argsort(-scores.astype(jnp.float32), stable=True)
    keep_sorted = keep[order]
    rank = jnp.cumsum(keep_sorted) - 1
    out = jnp.full((n,), -1, dtype=jnp.int32).at[
        jnp.where(keep_sorted, rank, n)
    ].set(order.astype(jnp.int32), mode="drop")
    return out
