"""Pallas TPU fused window-pool kernel for the windowed MultiScaleRoIAlign.

The XLA windowed path (``ops/poolers.py:_windowed_multiscale``) gathers a
``[K, win, win+8, C]`` window tensor with ``vmap(dynamic_slice)`` and
contracts it with two einsums — at the Faster R-CNN box-head config
(K=1000, C=256) that materializes ~0.7 GB (bf16) of windows in HBM, reads
them back for the row contraction, and round-trips a ``[K, PH, win+8, C]``
f32 intermediate: ~2.3 GB of HBM traffic for a 25 MB result. This kernel
streams each roi's window HBM->VMEM exactly once and writes only the
pooled output (~0.7 GB total), the stage the r4 verdict priced at ~4 ms
and a ~1.5 ms traffic bound.

Design:

* the stacked level pyramid is viewed 2-D as ``[R, WMAX*C]`` so a roi's
  ``winy x winx x C`` window is a ``[winy, winx*C]`` slice — the W axis
  folds into lanes, so *any* x-origin is 128-lane aligned (C % 128 == 0)
  and the x-window widening the XLA path needs for sublane alignment
  disappears. The alignment burden moves to the row axis instead: Mosaic
  requires DMA row offsets divisible by the sublane tiling (8), so the
  caller aligns the *global* window row origin down to a multiple of 8
  and widens the y-window to ``win + 8``, folding the shift into the
  y-weights (``poolers._windowed_multiscale``).
* grid over roi blocks of BK; ``row0``/``x0`` window origins arrive via
  scalar prefetch and drive manual ``make_async_copy`` DMAs. TPU grid
  steps run sequentially on the core and scratch persists across them, so
  block i+1's BK window DMAs are issued before block i's compute —
  classic two-slot double buffering, with per-(slot, roi) semaphores.
* stage 1 (MXU): one block-diagonal matmul ``[BK*PH, BK*winy] @
  [BK*winy, winx*C]`` — the host lays each roi's y-weights on the
  diagonal so cross-roi terms vanish; batching the BK rois into one
  matmul keeps the systolic array fed (M=BK*PH instead of 7).
* stage 2 (VPU): identical pattern to ``_pallas/roi_align.py`` — lane
  split ``rows -> [BK, PH, winx, C]`` and per-pooled-column masked
  reduction; each output column is written once (no W tiling here, the
  whole window is resident).
* sampling semantics live entirely in the precomputed separable weights
  (CUDA edge rules, level-extent masking, sr averaging), identical to the
  XLA path; out-of-window rois are patched by the caller's dense fallback
  exactly as before.

Reference being replaced: ``torchvision/ops/poolers.py:147-229`` +
``csrc/ops/cuda/roi_align_kernel.cu`` (the multi-level pool); the windowed
formulation has no CUDA analog — it exists because FPN's level rule makes
every roi's sample span ~14 px at its assigned level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_pool_pallas"]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(
    bk: int, ph: int, pw: int, winy: int, winx: int, c: int, n_blocks: int
):
    wc = winx * c

    def kernel(row0_ref, x0_ref, stacked_ref, wy_ref, wx_ref, out_ref,
               windows, sems):
        i = pl.program_id(0)

        def dma(block, slot, r):
            row0 = pl.multiple_of(row0_ref[block * bk + r], 8)
            x0c = pl.multiple_of(x0_ref[block * bk + r] * c, c)
            return pltpu.make_async_copy(
                stacked_ref.at[pl.ds(row0, winy), pl.ds(x0c, wc)],
                windows.at[slot, pl.ds(r * winy, winy), :],
                sems.at[slot, r],
            )

        def issue(block, slot):
            for r in range(bk):
                dma(block, slot, r).start()

        slot = jax.lax.rem(i, 2)

        @pl.when(i == 0)
        def _():
            issue(0, 0)

        @pl.when(i + 1 < n_blocks)
        def _():
            issue(i + 1, jax.lax.rem(i + 1, 2))

        for r in range(bk):
            dma(i, slot, r).wait()

        wins = windows[slot]  # [BK*winy, winx*C]
        wy = wy_ref[0]  # [BK*PH, BK*winy] block-diagonal
        # bf16 inputs: single MXU pass. f32 inputs: HIGHEST precision so
        # Mosaic emits the multi-pass f32 matmul (a bare f32 dot lowers to
        # one bf16 pass — measured 1e-2 relative error vs the f32 oracle).
        precision = (
            None if wins.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        )
        rows = jnp.dot(
            wy, wins, preferred_element_type=jnp.float32, precision=precision
        )
        rows4 = rows.reshape(bk, ph, winx, c)
        wx3 = wx_ref[0][:, :winx].reshape(bk, pw, winx)
        for q in range(pw):
            outq = jnp.sum(rows4 * wx3[:, q, :][:, None, :, None], axis=2)
            out_ref[0, :, q * c : (q + 1) * c] = outq.reshape(
                bk * ph, c
            ).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def window_pool_pallas(
    stacked: jax.Array,  # [R, WMAX, C] zero-padded level pyramid
    row0: jax.Array,  # [K] int32 global window row origin (8-aligned)
    x0: jax.Array,  # [K] int32 window column origin (elements)
    w_y: jax.Array,  # [K, PH, winy] f32 local row weights
    w_x: jax.Array,  # [K, PW, winx] f32 local column weights
    *,
    interpret: bool = False,
) -> jax.Array:
    """Fused windowed multi-scale pool: returns ``[K, PH, PW, C]`` in the
    input dtype. Window extents come from the weight shapes (winy =
    ``w_y.shape[2]``, winx = ``w_x.shape[2]``). Requires ``C % 128 == 0``,
    ``winy % 8 == 0``, 8-aligned ``row0``, and ``row0 + winy`` in bounds
    (the caller pads ``winy`` zero rows below the pyramid)."""
    r_rows, wmax, c = stacked.shape
    if c % 128 != 0:
        raise ValueError(f"window_pool_pallas requires C % 128 == 0, got {c}")
    k, ph, winy = w_y.shape
    _, pw, winx = w_x.shape
    if winy % 8 != 0:
        raise ValueError(f"winy must be a multiple of 8, got {winy}")
    orig_dtype = stacked.dtype

    # BK sizes the double-buffered window scratch (2*BK*winy*winx*C) and
    # the per-block out/rows buffers; halve it for the big mask-head
    # blocks (PH=14) — the 16 MB scoped-vmem stack inside fori_loop
    # bodies is the binding constraint (same limit the dense kernel hit).
    import os

    bk = int(os.environ.get("VISION_TPU_WP_BK", "0")) or (
        4 if orig_dtype == jnp.bfloat16 else 2
    )
    if ph > 8:
        bk = max(1, bk // 2)
    bk = min(bk, max(1, k))
    kp = _ceil_to(k, bk)
    g = kp // bk
    if kp != k:
        pad = kp - k
        w_y = jnp.pad(w_y, ((0, pad), (0, 0), (0, 0)))
        w_x = jnp.pad(w_x, ((0, pad), (0, 0), (0, 0)))
        row0 = jnp.pad(row0, (0, pad))
        x0 = jnp.pad(x0, (0, pad))

    # block-diagonal y-weights: roi r of each block occupies rows
    # [r*PH, (r+1)*PH) x cols [r*winy, (r+1)*winy)
    eye = jnp.eye(bk, dtype=w_y.dtype)
    wy_bd = (
        w_y.reshape(g, bk, ph, 1, winy) * eye[None, :, None, :, None]
    ).reshape(g, bk * ph, bk * winy)
    wx_blk = w_x.reshape(g, bk * pw, winx)
    if winx < 128:
        wx_blk = jnp.pad(wx_blk, ((0, 0), (0, 0), (0, 128 - winx)))

    compute_dtype = (
        jnp.bfloat16 if orig_dtype == jnp.bfloat16 else jnp.float32
    )
    wy_bd = wy_bd.astype(compute_dtype)
    wx_blk = wx_blk.astype(jnp.float32)
    stacked2d = stacked.reshape(r_rows, wmax * c)

    # When the whole pyramid fits comfortably in VMEM (b1 bf16 FRCNN is
    # ~46 MB on a 128 MB v5e), keep it resident there for the entire
    # grid: the per-roi window copies become VMEM->VMEM DMAs (TB/s-class)
    # and total HBM traffic collapses to one 46 MB pyramid read + the
    # 25 MB output — the HBM-window-DMA mode measured 2.3 ms (280 GB/s
    # aggregate on 1000 strided window reads), far off the traffic bound.
    stacked_bytes = stacked2d.size * jnp.dtype(orig_dtype).itemsize
    vmem_resident = stacked_bytes <= 64 * 1024 * 1024
    stacked_spec = (
        pl.BlockSpec(
            (r_rows, wmax * c), lambda i, *_: (0, 0),
            memory_space=pltpu.VMEM,
        )
        if vmem_resident
        else pl.BlockSpec(memory_space=pltpu.ANY)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[
            stacked_spec,
            pl.BlockSpec(
                (1, bk * ph, bk * winy), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bk * pw, max(winx, 128)), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bk * ph, pw * c), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bk * winy, winx * c), orig_dtype),
            pltpu.SemaphoreType.DMA((2, bk)),
        ],
    )

    out = pl.pallas_call(
        _make_kernel(bk, ph, pw, winy, winx, c, g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, bk * ph, pw * c), orig_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(100 if vmem_resident else 64) * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * kp * ph * bk * winy * winx * c
            + 2 * kp * ph * pw * winx * c,
            bytes_accessed=kp * winy * winx * c
            * jnp.dtype(orig_dtype).itemsize
            + kp * ph * pw * c * jnp.dtype(orig_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(row0.astype(jnp.int32), x0.astype(jnp.int32), stacked2d, wy_bd, wx_blk)

    return out.reshape(kp, ph, pw, c)[:k]
