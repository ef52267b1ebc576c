"""Multi-scale RoIAlign pooling with FPN level assignment
(reference ``torchvision/ops/poolers.py``).

TPU design (SURVEY.md §7 step 2): the reference scatters rois to levels
with boolean indexing and per-level roi_align on dynamically-sized subsets
(``poolers.py:147-229``). Two static-shape formulations:

* **dense** (the r2 path, CPU/test default): run roi_align for the full
  (static K) roi set against *every* level, then select per-roi rows by
  the LevelMapper assignment with a masked sum. Compile-friendly but pays
  K x PH x (sum_l H_l*W_l) x C MXU work — at the Faster R-CNN eval config
  (K=1000, P2 208x208x256) this alone is ~10 ms/step, ~half the model.
* **window** (the TPU default from r5): the FPN-paper level rule
  (``floor(4 + log2(sqrt(area)/224))``) exists precisely so each roi
  spans ~canonical_scale/2^canonical_level = 14 px at its assigned
  level, so the pooled samples live in a small window. Stack the levels
  along H (widths zero-padded), slice one ``win x win`` window per roi
  (``vmap(dynamic_slice)``) and contract with *local* separable bilinear
  weights — K x PH x win^2 x C FLOPs, ~40x less than dense. Rois whose
  sample span exceeds the window (extreme aspect ratios: span <
  28*sqrt(AR), so win=32 covers AR <~ 1.3 worst-case and ~5 typical) are
  detected exactly from their corner indices and recomputed through the
  dense path at a small static capacity, keeping bit-identical semantics
  for every realistic box; capacity overflow degrades gracefully (the
  windowed result simply drops out-of-window samples).
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.ops.roi_align import roi_align

__all__ = ["LevelMapper", "MultiScaleRoIAlign"]


def _window_pool_xla(
    stacked: jax.Array,  # [rows, wmax, C] padded level pyramid
    row0: jax.Array,  # [K] global window row origin
    x0: jax.Array,  # [K] window column origin
    w_y: jax.Array,  # [K, PH, win] f32
    w_x: jax.Array,  # [K, PW, winx] f32
) -> jax.Array:
    """Window gather + separable einsum contraction (the XLA windowed
    path, and the differentiation rule for the fused Pallas kernel)."""
    win = w_y.shape[2]
    winx = w_x.shape[2]
    c = stacked.shape[2]
    orig_dtype = stacked.dtype
    windows = jax.vmap(
        lambda r, q: jax.lax.dynamic_slice(stacked, (r, q, 0), (win, winx, c))
    )(row0, x0).astype(jnp.float32)  # [K, win, winx, C]
    precision = "default" if orig_dtype == jnp.bfloat16 else "high"
    rows = jnp.einsum("kpy,kyxc->kpxc", w_y, windows, precision=precision)
    out = jnp.einsum("kqx,kpxc->kpqc", w_x, rows, precision=precision)
    return out.astype(orig_dtype)


@jax.custom_vjp
def _window_pool_fused(stacked, row0, x0, w_y, w_x):
    """Fused Pallas window pool; differentiates via the XLA path (same
    semantics — vjp of dynamic_slice is XLA's native window scatter-add,
    which the Mosaic kernel has no cheaper analog for)."""
    from vision_tpu.ops._pallas.window_pool import window_pool_pallas

    return window_pool_pallas(stacked, row0, x0, w_y, w_x)


def _window_pool_fused_fwd(stacked, row0, x0, w_y, w_x):
    return (
        _window_pool_fused(stacked, row0, x0, w_y, w_x),
        (stacked, row0, x0, w_y, w_x),
    )


def _window_pool_fused_bwd(res, g):
    _, vjp = jax.vjp(_window_pool_xla, *res)
    return vjp(g.astype(res[0].dtype))


_window_pool_fused.defvjp(_window_pool_fused_fwd, _window_pool_fused_bwd)


class LevelMapper:
    """FPN-paper heuristic mapping box area -> pyramid level
    (reference ``ops/poolers.py:47-86``)."""

    def __init__(
        self,
        k_min: int,
        k_max: int,
        canonical_scale: int = 224,
        canonical_level: int = 4,
        eps: float = 1e-6,
    ):
        self.k_min = k_min
        self.k_max = k_max
        self.s0 = canonical_scale
        self.lvl0 = canonical_level
        self.eps = eps

    def __call__(self, boxes: jax.Array) -> jax.Array:
        """boxes: [K, 4] xyxy -> int32 level index in [0, k_max - k_min]."""
        s = jnp.sqrt(
            (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        )
        target_lvls = jnp.floor(
            self.lvl0 + jnp.log2(s / self.s0) + self.eps
        )
        target_lvls = jnp.clip(target_lvls, self.k_min, self.k_max)
        return (target_lvls - self.k_min).astype(jnp.int32)


def _windowed_multiscale(
    feats: List[jax.Array],  # per-level [N, H_l, W_l, C]
    scales: Sequence[float],
    levels: jax.Array,  # [K] int32 assigned level per roi
    rois: jax.Array,  # [K, 5] (batch, x1, y1, x2, y2) image coords
    output_size: Tuple[int, int],
    sampling_ratio: int,
    win: int = 32,
    overflow_capacity: int = 64,
    dense_fallback=None,  # callable (rois [M,5]) -> [M, PH, PW, C]
    fused: bool = False,  # fused Pallas window kernel (TPU, C % 128 == 0)
) -> jax.Array:
    """Windowed single-level pooling (see module docstring).

    Semantics per roi match ``roi_align(feats[lvl], roi, output_size,
    scales[lvl], sampling_ratio)`` exactly (CUDA edge rules included)
    whenever the roi's bilinear corner rows/cols fit a ``win``-sized
    window at its assigned level; oversized rois are recomputed via
    ``dense_fallback`` up to ``overflow_capacity`` per call.
    """
    ph, pw = output_size
    sr = sampling_ratio
    n, _, _, c = feats[0].shape
    heights = [f.shape[1] for f in feats]
    widths = [f.shape[2] for f in feats]
    wmax = max(max(widths), win + 8)  # winx below never outgrows the pad
    sumh = sum(heights)

    orig_dtype = feats[0].dtype
    # stack levels along H per image; pad W to wmax; `win` zero rows at the
    # bottom keep the last window slice in-bounds (dynamic_slice clamps the
    # start otherwise, which would silently shift the window off its
    # weights)
    stacked = jnp.concatenate(
        [
            jnp.pad(f, ((0, 0), (0, 0), (0, wmax - f.shape[2]), (0, 0)))
            for f in feats
        ],
        axis=1,
    ).reshape(n * sumh, wmax, c)
    stacked = jnp.pad(stacked, ((0, win + 8), (0, 0), (0, 0)))

    row_off = jnp.asarray(
        np.cumsum([0] + heights[:-1]).astype(np.int32)
    )  # [L]
    h_tbl = jnp.asarray(heights, jnp.int32)
    w_tbl = jnp.asarray(widths, jnp.int32)
    scale_tbl = jnp.asarray(scales, jnp.float32)

    rois = rois.astype(jnp.float32)
    batch_ind = rois[:, 0].astype(jnp.int32)
    lvl = jnp.clip(levels, 0, len(feats) - 1)
    scale_k = scale_tbl[lvl]  # [K]
    h_k = h_tbl[lvl]
    w_k = w_tbl[lvl]

    # sample coordinates at the assigned level (aligned=False semantics,
    # matching the reference pooler's roi_align call)
    start_w = rois[:, 1] * scale_k
    start_h = rois[:, 2] * scale_k
    roi_w = jnp.clip(rois[:, 3] * scale_k - start_w, 1.0)
    roi_h = jnp.clip(rois[:, 4] * scale_k - start_h, 1.0)
    bin_h = roi_h / ph
    bin_w = roi_w / pw
    ii = jnp.arange(sr, dtype=jnp.float32)
    grid_p = jnp.arange(ph, dtype=jnp.float32)
    grid_q = jnp.arange(pw, dtype=jnp.float32)
    y = (
        start_h[:, None, None]
        + grid_p[None, :, None] * bin_h[:, None, None]
        + (ii[None, None, :] + 0.5) * (bin_h[:, None, None] / sr)
    )  # [K, PH, SR]
    x = (
        start_w[:, None, None]
        + grid_q[None, :, None] * bin_w[:, None, None]
        + (ii[None, None, :] + 0.5) * (bin_w[:, None, None] / sr)
    )  # [K, PW, SR]

    def local_weights(coord, size_k, origin, width=win):
        """[K, P, SR] coords -> ([K, P, width] local bilinear row weights,
        [K] exact overflow flag). ``size_k`` [K] is the level extent;
        ``origin`` [K] the window start. CUDA edge rules: samples outside
        [-1, size] contribute zero; corners clamp to size-1."""
        size_f = size_k.astype(jnp.float32)[:, None, None]
        zmask = (coord >= -1.0) & (coord <= size_f)
        cc = jnp.clip(coord, 0.0)
        lo = cc.astype(jnp.int32)
        hi = jnp.where(lo >= size_k[:, None, None] - 1,
                       size_k[:, None, None] - 1, lo + 1)
        lo = jnp.minimum(lo, size_k[:, None, None] - 1)
        cc = jnp.where(
            lo >= size_k[:, None, None] - 1, lo.astype(cc.dtype), cc
        )
        frac = cc - lo
        w_lo = jnp.where(zmask, 1.0 - frac, 0.0)
        w_hi = jnp.where(zmask, frac, 0.0)
        lo_loc = lo - origin[:, None, None]
        hi_loc = hi - origin[:, None, None]
        overflow = jnp.max(hi_loc, axis=(1, 2)) >= width
        oh = (
            jax.nn.one_hot(lo_loc, width) * w_lo[..., None]
            + jax.nn.one_hot(hi_loc, width) * w_hi[..., None]
        )
        return oh.sum(2), overflow

    # window origin: first corner row/col, clamped so the window stays
    # inside the level (origin in LEVEL-local coordinates).
    #
    # XLA gather path: the x-origin is additionally rounded DOWN to a
    # multiple of 8 and the x-window widened by 8 — the W axis is the
    # second-minor (sublane-tiled) dim of ``stacked``, and 8-aligned
    # dynamic-slice starts keep the per-roi window gather on the aligned
    # fast path (semantics unchanged — tap validity is judged against the
    # level extent, and the widened window still covers every tap:
    # origin_aligned <= origin, span <= win + 7).
    #
    # Fused Pallas path: the kernel folds W into the lane axis (W*C), so
    # any x-origin is 128-lane aligned when C % 128 == 0 — the exact
    # origin and a ``win``-wide x-window are used, saving the widening.
    y0 = jnp.clip(
        jnp.clip(y[:, 0, 0], 0.0).astype(jnp.int32),
        0,
        jnp.maximum(h_k - win, 0),
    )
    x0 = jnp.clip(
        jnp.clip(x[:, 0, 0], 0.0).astype(jnp.int32),
        0,
        jnp.maximum(w_k - win, 0),
    )
    base = batch_ind * sumh + row_off[lvl]  # [K] global row of level start
    if fused:
        # Mosaic DMA row offsets must be sublane (8) aligned: align the
        # GLOBAL window row down and widen the y-window by 8, folding the
        # shift into the y-weights (y_origin may go below the level start;
        # taps are still judged against the level extent, so any rows read
        # from the previous level carry zero weight).
        winx, winy = win, win + 8
        row0 = ((base + y0) // 8) * 8  # [K] global, 8-aligned
        y_origin = row0 - base  # level-local origin for the weights
    else:
        winx, winy = win + 8, win
        x0 = (x0 // 8) * 8
        row0 = base + y0
        y_origin = y0
    x0 = jnp.minimum(x0, max(wmax - winx, 0))
    w_y, of_y = local_weights(y, h_k, y_origin, width=winy)  # [K, PH, winy]
    w_x, of_x = local_weights(x, w_k, x0, width=winx)  # [K, PW, winx]
    overflow = of_y | of_x

    if fused:
        out = _window_pool_fused(stacked, row0, x0, w_y, w_x)
    else:
        out = _window_pool_xla(stacked, row0, x0, w_y, w_x)
    out = (out.astype(jnp.float32) / float(sr * sr)).astype(orig_dtype)

    if overflow_capacity > 0 and dense_fallback is not None:
        cap = min(overflow_capacity, rois.shape[0])
        _, ov_idx = jax.lax.top_k(overflow.astype(jnp.float32), cap)
        ov_real = overflow[ov_idx]  # selected rows that truly overflow
        dense = dense_fallback(rois[ov_idx])  # [cap, PH, PW, C]
        patched = jnp.where(
            ov_real[:, None, None, None], dense, out[ov_idx]
        )
        out = out.at[ov_idx].set(patched)
    return out


def _infer_scale(feature_size: int, original_size: int) -> float:
    """reference ``ops/poolers.py:98-112``: snap the size ratio to a
    power of two."""
    approx_scale = feature_size / original_size
    scale = 2 ** float(round(math.log2(approx_scale)))
    return scale


class MultiScaleRoIAlign:
    """reference ``ops/poolers.py:230``. Stateless (no parameters).

    Args:
        featmap_names: which keys of the feature dict to use.
        output_size: (PH, PW).
        sampling_ratio: as roi_align.
        canonical_scale/level: LevelMapper knobs.
    """

    def __init__(
        self,
        featmap_names: Sequence[str],
        output_size: int | Tuple[int, int],
        sampling_ratio: int,
        *,
        canonical_scale: int = 224,
        canonical_level: int = 4,
        backend: Optional[str] = None,
        window: int = 32,
        overflow_capacity: int = 64,
    ):
        self.featmap_names = list(featmap_names)
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        self.output_size = tuple(output_size)
        self.sampling_ratio = sampling_ratio
        self.canonical_scale = canonical_scale
        self.canonical_level = canonical_level
        # backend: None = auto ("window" on TPU, "dense" elsewhere);
        # VISION_TPU_MSROI overrides auto. "window" itself auto-selects
        # the fused Pallas kernel on TPU when C % 128 == 0 (else the XLA
        # gather+einsum formulation); "window_xla" / "window_pallas" pin
        # one explicitly.
        if backend not in (None, "dense", "window", "window_xla",
                           "window_pallas"):
            raise ValueError(f"unknown MultiScaleRoIAlign backend {backend!r}")
        self.backend = backend
        self.window = window
        self.overflow_capacity = overflow_capacity

    def _pick_backend(self) -> str:
        if self.backend is not None:
            return self.backend
        env = os.environ.get("VISION_TPU_MSROI")
        if env in ("dense", "window", "window_xla", "window_pallas"):
            return env
        return "window" if jax.default_backend() == "tpu" else "dense"

    def __call__(
        self,
        x: Dict[str, jax.Array],
        rois: jax.Array,
        image_size: Tuple[int, int],
    ) -> jax.Array:
        """x: dict of NHWC features; rois: [K, 5] (batch, x1, y1, x2, y2) in
        input-image coordinates; image_size: (H, W) of the model input.
        Returns [K, PH, PW, C]."""
        feats = [x[k] for k in self.featmap_names]
        scales = [
            _infer_scale(f.shape[1], image_size[0]) for f in feats
        ]
        if len(feats) == 1:
            return roi_align(
                feats[0], rois, self.output_size, scales[0], self.sampling_ratio
            )

        lvl_min = int(-math.log2(scales[0]))
        lvl_max = int(-math.log2(scales[-1]))
        mapper = LevelMapper(
            lvl_min,
            lvl_max,
            canonical_scale=self.canonical_scale,
            canonical_level=self.canonical_level,
        )
        levels = mapper(rois[:, 1:5])  # [K]

        def dense(sub_rois: jax.Array) -> jax.Array:
            sub_levels = mapper(sub_rois[:, 1:5])
            out = None
            for lvl, (feat, scale) in enumerate(zip(feats, scales)):
                pooled = roi_align(
                    feat, sub_rois, self.output_size, scale,
                    self.sampling_ratio,
                )  # [M, PH, PW, C]
                sel = (sub_levels == lvl).astype(pooled.dtype)[
                    :, None, None, None
                ]
                out = pooled * sel if out is None else out + pooled * sel
            return out

        picked = self._pick_backend()
        if picked.startswith("window"):
            c = feats[0].shape[3]
            if picked == "window":
                fused = jax.default_backend() == "tpu" and c % 128 == 0
            else:
                fused = picked == "window_pallas"
            return _windowed_multiscale(
                feats, scales, levels, rois, self.output_size,
                self.sampling_ratio, win=self.window,
                overflow_capacity=self.overflow_capacity,
                dense_fallback=dense, fused=fused,
            )
        return dense(rois)
