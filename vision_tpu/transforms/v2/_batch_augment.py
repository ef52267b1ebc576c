"""Batched TPU auto-augment engine.

The per-sample jitted auto-augment path (``_auto_augment.py``) vmaps a
``lax.switch`` over ~14 op branches; under ``vmap`` every branch runs for
every sample, and the geometric branches each lower to a per-pixel XLA
gather — measured 84 img/s for the full RandAugment train pipeline on v5e
(gathers are scalar loads on TPU). This module is the TPU-first redesign,
~17x faster, used by the ``--device-augment`` production input pipeline
(``references/classification/train.py``):

* **Geometric ops as shear passes, no gathers.** ShearX/ShearY/TranslateX/
  TranslateY are each ONE 1-D nearest resample whose integer shift is
  constant per row (or per column) — implemented as a log-step "barrel
  shifter": 8 conditional static slices/selects, pure VPU, zero-fill
  exactly like ``grid_sample(padding_mode="zeros")``. Rotate is the Paeth
  three-shear decomposition (x-shear, y-shear, x-shear) after an exact
  ``rot90`` pre-rotation that bounds the residual angle to 45 deg; the
  result samples within +-1 source pixel of the direct nearest warp
  (verified against ``F.rotate`` in ``tests/test_batch_augment.py``). All
  five ops share one three-pass pipeline with per-sample shift maps
  (identity shifts for samples whose op is non-geometric).
* **Color ops bucketed: compute only the samples that drew each op.**
  With K ops and batch N, each color branch is drawn by ~N/K samples, so
  running the functional batch-wide wastes (K-1)/K of its cost (measured
  5.7 ms of the 8.8 ms RandAugment layer at N=128/224px on v5e). Each
  non-trivial branch instead gathers its samples into a static-capacity
  buffer (mean + 4 sigma of Binomial(N, 1/K), ~24 rows at N=128/K=14),
  applies the ordinary functional there, and scatters back with
  ``mode="drop"``. Every color functional is per-sample independent, so
  the gathered compute is semantically identical to the batch-wide one;
  numerically, XLA may contract the float blend chain with FMA
  differently in the gathered program, which can flip a round()/floor()
  boundary by one ulp — measured <=1 uint8 count at ~0.001% of pixels
  for the blend ops (Brightness/Color/Contrast/Sharpness/AutoContrast;
  integer-exact ops — Posterize/Solarize/Invert/Equalize — are bitwise
  unaffected). ``color_bucket=0`` restores the exact batch-wide path.
  In the astronomically rare overflow case (more draws than capacity,
  ~1e-5 per op per batch) a ``lax.cond`` falls back to the batch-wide
  compute. The geometric stage is bucketed the same way (its own
  capacity at p = n_geo_ops/K): the three barrel passes usually run on
  the ~5/14 of the batch that drew a geometric op. Equalize uses the
  MXU nibble-histogram formulation (``_color.py:equalize``).

The per-sample RNG draw structure mirrors the vmapped path exactly, so for
every non-Rotate op the batched output matches ``vmap(transform)`` with
the same key — bit-identical with ``color_bucket=0``, and up to the
<=1-count FMA rounding note above when color bucketing is active.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from vision_tpu.transforms.v2 import functional as F

__all__ = ["apply_ops_batched", "max_shift_bound"]

_GEOMETRIC = ("ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate")


def _barrel_pass(
    xw: jax.Array, t: jax.Array, m: int, interpolation: str = "nearest"
) -> jax.Array:
    """1-D resample along the minor axis with a per-row shift:
    ``out[..., r, j] = x[..., r, j + t[..., r]]`` (zeros outside).
    ``xw`` is [N, C, H, W] (W minor = full vector lanes), ``t`` is [N, H]
    float. Shift is clipped to [-m, m]; |shift| >= W correctly yields an
    empty row.

    nearest: integer shift ``round(t)`` via a log-step barrel of
    conditional static slices — pure VPU selects, no gather.
    bilinear: lerp of the two adjacent integer shifts (``floor(t)`` and
    ``floor(t)+1``) — one barrel + one extra static slice; ``xw`` should
    be float for exact blending."""
    n, c, h, w = xw.shape
    if interpolation == "bilinear":
        t0 = jnp.floor(t)
        frac = (t - t0)[:, None, :, None]
        ti = jnp.clip(t0.astype(jnp.int32), -(m + 1), m)
    else:
        ti = jnp.clip(jnp.round(t).astype(jnp.int32), -m, m)
    mm = m + 1  # headroom for the floor+1 slice in bilinear mode
    pad = jnp.zeros((n, c, h, mm), xw.dtype)
    buf = jnp.concatenate([pad, xw, pad], axis=3)
    s = (ti + mm)[:, None, :]  # [N,1,H] in [0, 2m+1]
    nbits = max(1, int(math.ceil(math.log2(2 * mm + 1))))
    for b in range(nbits):
        step = 1 << b
        bit = ((s >> b) & 1).astype(bool)[..., None]
        shifted = jnp.concatenate(
            [buf[..., step:], jnp.zeros((n, c, h, step), xw.dtype)], axis=3
        )
        buf = jnp.where(bit, shifted, buf)
    if interpolation == "bilinear":
        lo = buf[..., :w].astype(jnp.float32)
        hi = buf[..., 1 : w + 1].astype(jnp.float32)
        return lo * (1.0 - frac) + hi * frac
    return buf[..., :w]


def max_shift_bound(space: Dict, magnitude: int | None, size) -> int:
    """Static bound on any 1-D pass shift for the given augmentation space.
    ``magnitude`` pins the bin (RandAugment); None = any bin
    (TrivialAugmentWide)."""
    h, w = size
    bound = 1.0

    def mag_of(tab):
        if tab.ndim == 0:
            return 0.0
        if magnitude is not None:
            return float(abs(tab[magnitude]))
        return float(np.max(np.abs(tab)))

    for name, (tab, _signed) in space.items():
        m = mag_of(tab)
        if name in ("ShearX", "ShearY"):
            bound = max(bound, m * (max(h, w) + 0.5))
        elif name in ("TranslateX", "TranslateY"):
            bound = max(bound, m)
        elif name == "Rotate":
            r = math.radians(min(m, 45.0) if m <= 45.0 else 45.0)
            bound = max(
                bound,
                math.tan(r / 2.0) * (max(h, w) / 2.0 + 0.5),
                math.sin(r) * (max(h, w) / 2.0 + 0.5),
            )
    return min(int(math.ceil(bound)) + 1, max(h, w))


def _bucket_capacity(n: int, p: float, cut_num: int, cut_den: int) -> int:
    """Static gather capacity for a bucketed stage: mean + 4 sigma of
    Binomial(n, p) draws, rounded up to a multiple of 8 (TPU sublane).
    Returns 0 (bucketing off) when the bound wouldn't beat
    ``cut_num/cut_den`` of the batch (not worth the gather/scatter)."""
    cap = n * p + 4.0 * math.sqrt(n * p * (1.0 - p))
    cap = int(math.ceil(cap / 8.0)) * 8
    if cap >= (cut_num * n) // cut_den:
        return 0
    return cap


def _color_bucket_capacity(n: int, k: int) -> int:
    """Capacity for one color branch (draw probability 1/k); off unless it
    saves at least a quarter of the batch."""
    return _bucket_capacity(n, 1.0 / max(k, 1), 3, 4)


def apply_ops_batched(
    imgs: jax.Array,
    op_idx: jax.Array,
    mags: Dict[str, jax.Array],
    names: List[str],
    max_shift: int,
    rot90_needed: bool = False,
    interpolation: str = "nearest",
    color_bucket: int | None = None,
) -> jax.Array:
    """Apply per-sample auto-augment ops to a uint8 batch.

    Args:
        imgs: [N, H, W, C] uint8.
        op_idx: [N] int32 index into ``names``.
        mags: per-op signed per-sample magnitudes, each [N] float32
            (Posterize bits as float of ints, like the space tables).
        names: op-name order defining ``op_idx``.
        max_shift: static bound from :func:`max_shift_bound`.
        rot90_needed: True when the space's Rotate range exceeds 45 deg
            (TrivialAugmentWide) — requires square images.
        color_bucket: static per-branch gather capacity for the bucketed
            color stage; ``None`` = auto from Binomial(N, 1/K) tail
            (assumes the sampler draws ops uniformly — correctness never
            depends on it, only the overflow-fallback rate), ``0`` =
            disable bucketing (always batch-wide + select).
    """
    if imgs.dtype != jnp.uint8:
        raise NotImplementedError(
            "batched auto-augment runs on uint8 images (pre-ToDtype); "
            "use the per-sample path for float inputs"
        )
    n, h, w, c = imgs.shape
    idx = {nm: i for i, nm in enumerate(names)}

    def mask_of(nm):
        if nm not in idx:
            return None
        return op_idx == idx[nm]

    def m4(v):
        return v[:, None, None, None]

    f32 = jnp.float32
    iy = jnp.arange(h, dtype=f32)
    jx = jnp.arange(w, dtype=f32)
    ci = iy - h / 2 + 0.5  # centered output coords (grid convention)
    cj = jx - w / 2 + 0.5

    # ---- geometric stage: three shared shear passes --------------------
    def geo_stage(s_imgs, s_op, s_mags):
        """Warp any sub-batch (per-sample independent): identity shifts
        for samples whose op is non-geometric -> exact copy."""
        m = s_imgs.shape[0]

        def s_mask(nm):
            if nm not in idx:
                return None
            return s_op == idx[nm]

        tx1 = jnp.zeros((m, h), f32)
        ty = jnp.zeros((m, w), f32)
        tx2 = jnp.zeros((m, h), f32)
        base = s_imgs

        msk = s_mask("ShearX")
        if msk is not None:
            # x_src = j + mag*(i + 0.5)  (shear about corner, center=[0,0])
            tx1 = tx1 + (msk * s_mags["ShearX"])[:, None] * (iy + 0.5)[None, :]
        msk = s_mask("ShearY")
        if msk is not None:
            ty = ty + (msk * s_mags["ShearY"])[:, None] * (jx + 0.5)[None, :]
        msk = s_mask("TranslateX")
        if msk is not None:
            tx1 = tx1 + (msk * -jnp.trunc(s_mags["TranslateX"]))[:, None]
        msk = s_mask("TranslateY")
        if msk is not None:
            ty = ty + (msk * -jnp.trunc(s_mags["TranslateY"]))[:, None]
        rot = s_mask("Rotate")
        if rot is not None:
            ang = s_mags["Rotate"]
            if rot90_needed:
                if h != w:
                    raise ValueError(
                        "Rotate > 45 deg in the space requires square images"
                    )
                k90 = jnp.round(ang / 90.0)
                resid = jnp.radians(ang - k90 * 90.0)
                k90i = (k90.astype(jnp.int32) % 4 + 4) % 4
                # F.rotate is counterclockwise; rot90(axes=(1,2)) after
                # calibration (tests/test_batch_augment.py pins direction)
                k4 = m4(k90i)
                sel = s_imgs
                for kk in (1, 2, 3):
                    sel = jnp.where(
                        kk == k4, jnp.rot90(s_imgs, kk, axes=(1, 2)), sel
                    )
                base = jnp.where(m4(rot), sel, s_imgs)
            else:
                resid = jnp.radians(ang)
            a = -jnp.tan(resid / 2.0)
            b = jnp.sin(resid)
            tx1 = tx1 + (rot * a)[:, None] * ci[None, :]
            ty = ty + (rot * b)[:, None] * cj[None, :]
            tx2 = tx2 + (rot * a)[:, None] * ci[None, :]

        xw = jnp.moveaxis(base, -1, 1)  # [M, C, H, W]
        if interpolation == "bilinear":
            # f32 through the three passes, one round at stage exit — like
            # the direct warp: blends in f32 and rounds once per op
            xw = xw.astype(jnp.float32)
        xw = _barrel_pass(xw, tx1, max_shift, interpolation)
        xw = jnp.swapaxes(xw, 2, 3)  # now [M, C, W, H]: shift along H
        xw = _barrel_pass(xw, ty, max_shift, interpolation)
        xw = jnp.swapaxes(xw, 2, 3)
        xw = _barrel_pass(xw, tx2, max_shift, interpolation)
        if interpolation == "bilinear":
            xw = jnp.clip(jnp.round(xw), 0, 255).astype(s_imgs.dtype)
        return jnp.moveaxis(xw, 1, -1)

    # bucket the geometric stage like the color branches: ~5/14 of the
    # batch draws a geometric op, so the three barrel passes usually only
    # need the gathered subset (the warp is per-sample independent; the
    # non-geo rows of the full-batch stage are exact copies of `imgs`)
    geo_names = [nm for nm in _GEOMETRIC if nm in idx]
    geo_cap = 0
    if geo_names and color_bucket != 0:
        geo_cap = _bucket_capacity(n, len(geo_names) / len(names), 7, 8)
    if geo_names and 0 < geo_cap < n:
        gmsk = jnp.zeros((n,), bool)
        for nm in geo_names:
            gmsk = gmsk | (op_idx == idx[nm])
        gcnt = jnp.sum(gmsk)

        def geo_cheap(o):
            sel = jnp.argsort(~gmsk)[:geo_cap]
            rows = geo_stage(
                jnp.take(imgs, sel, axis=0),
                jnp.take(op_idx, sel),
                {k: v[sel] for k, v in mags.items()},
            )
            tgt = jnp.where(jnp.arange(geo_cap) < gcnt, sel, n)
            return o.at[tgt].set(rows, mode="drop")

        out = jax.lax.cond(
            gcnt <= geo_cap,
            geo_cheap,
            lambda o: geo_stage(imgs, op_idx, mags),
            imgs,
        )
    elif geo_names:
        out = geo_stage(imgs, op_idx, mags)
    else:
        out = imgs

    # ---- color stage: bucketed branches (see module docstring) ---------
    cap = (
        _color_bucket_capacity(n, len(names))
        if color_bucket is None
        else color_bucket
    )

    def put_bucketed(nm, branch_fn):
        """``branch_fn(rows, sel)``: apply the op to ``rows`` ([M,H,W,C],
        the samples at batch indices ``sel``; ``sel=None`` = whole batch).
        Every color functional is per-sample independent, so the gathered
        compute is bit-identical to the batch-wide one."""
        nonlocal out
        msk = mask_of(nm)
        if msk is None:
            return
        if not cap or cap >= n:
            out = jnp.where(m4(msk), branch_fn(imgs, None), out)
            return
        cnt = jnp.sum(msk)

        def cheap(o):
            # stable argsort puts this op's samples first, in index order
            sel = jnp.argsort(~msk)[:cap]
            res = branch_fn(jnp.take(imgs, sel, axis=0), sel)
            # rows past cnt belong to other samples: drop their scatter
            tgt = jnp.where(jnp.arange(cap) < cnt, sel, n)
            return o.at[tgt].set(res, mode="drop")

        def full(o):
            return jnp.where(m4(msk), branch_fn(imgs, None), o)

        out = jax.lax.cond(cnt <= cap, cheap, full, out)

    def _fac(v):
        def pick(rows, sel):
            f = v if sel is None else v[sel]
            return f[:, None, None, None]

        return pick

    if "Brightness" in idx:
        fac = _fac(1.0 + mags["Brightness"])
        put_bucketed(
            "Brightness", lambda r, s, fac=fac: F.adjust_brightness(r, fac(r, s))
        )
    if "Color" in idx:
        fac = _fac(1.0 + mags["Color"])
        put_bucketed(
            "Color", lambda r, s, fac=fac: F.adjust_saturation(r, fac(r, s))
        )
    if "Contrast" in idx:
        fac = _fac(1.0 + mags["Contrast"])
        put_bucketed(
            "Contrast", lambda r, s, fac=fac: F.adjust_contrast(r, fac(r, s))
        )
    if "Sharpness" in idx:
        fac = _fac(1.0 + mags["Sharpness"])
        put_bucketed(
            "Sharpness", lambda r, s, fac=fac: F.adjust_sharpness(r, fac(r, s))
        )
    if "Posterize" in idx:

        def _posterize(r, s):
            v = mags["Posterize"] if s is None else mags["Posterize"][s]
            bits = v.astype(jnp.int32)
            mask = (256 - jnp.left_shift(1, jnp.clip(8 - bits, 0, 8))) & 0xFF
            return r & mask[:, None, None, None].astype(r.dtype)

        put_bucketed("Posterize", _posterize)
    if "Solarize" in idx:

        def _solarize(r, s):
            v = mags["Solarize"] if s is None else mags["Solarize"][s]
            inverted = (255 - r.astype(jnp.int32)).astype(r.dtype)
            return jnp.where(r >= v[:, None, None, None], inverted, r)

        put_bucketed("Solarize", _solarize)
    if "AutoContrast" in idx:
        put_bucketed("AutoContrast", lambda r, s: F.autocontrast(r))
    if "Equalize" in idx:
        put_bucketed("Equalize", lambda r, s: F.equalize(r))
    if "Invert" in idx:
        put_bucketed("Invert", lambda r, s: F.invert(r))
    return out
