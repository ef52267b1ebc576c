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
* **Color ops batched + per-sample select.** Each color branch calls the
  ordinary functional on the whole batch with a per-sample factor array
  ``[N,1,1,1]`` (bit-identical to the per-sample path by construction);
  XLA fuses the branch chain + selects into one traversal. Equalize uses
  the MXU nibble-histogram formulation (``_color.py:equalize``).

The per-sample RNG draw structure mirrors the vmapped path exactly, so for
every non-Rotate op the batched output is bit-identical to
``vmap(transform)`` with the same key.
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


def apply_ops_batched(
    imgs: jax.Array,
    op_idx: jax.Array,
    mags: Dict[str, jax.Array],
    names: List[str],
    max_shift: int,
    rot90_needed: bool = False,
    interpolation: str = "nearest",
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

    # ---- geometric stage: three shared shear passes -------------------
    tx1 = jnp.zeros((n, h), f32)
    ty = jnp.zeros((n, w), f32)
    tx2 = jnp.zeros((n, h), f32)
    base = imgs

    msk = mask_of("ShearX")
    if msk is not None:
        # x_src = j + mag*(i + 0.5)  (shear about corner, center=[0,0])
        tx1 = tx1 + (msk * mags["ShearX"])[:, None] * (iy + 0.5)[None, :]
    msk = mask_of("ShearY")
    if msk is not None:
        ty = ty + (msk * mags["ShearY"])[:, None] * (jx + 0.5)[None, :]
    msk = mask_of("TranslateX")
    if msk is not None:
        tx1 = tx1 + (msk * -jnp.trunc(mags["TranslateX"]))[:, None]
    msk = mask_of("TranslateY")
    if msk is not None:
        ty = ty + (msk * -jnp.trunc(mags["TranslateY"]))[:, None]
    rot = mask_of("Rotate")
    if rot is not None:
        ang = mags["Rotate"]
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
            sel = imgs
            for kk in (1, 2, 3):
                sel = jnp.where(kk == k4, jnp.rot90(imgs, kk, axes=(1, 2)), sel)
            base = jnp.where(m4(rot), sel, imgs)
        else:
            resid = jnp.radians(ang)
        a = -jnp.tan(resid / 2.0)
        b = jnp.sin(resid)
        tx1 = tx1 + (rot * a)[:, None] * ci[None, :]
        ty = ty + (rot * b)[:, None] * cj[None, :]
        tx2 = tx2 + (rot * a)[:, None] * ci[None, :]

    xw = jnp.moveaxis(base, -1, 1)  # [N, C, H, W]
    if interpolation == "bilinear":
        # f32 through the three passes, one round at stage exit — like the
        # direct warp, which blends in f32 and rounds once per op
        xw = xw.astype(jnp.float32)
    xw = _barrel_pass(xw, tx1, max_shift, interpolation)
    xw = jnp.swapaxes(xw, 2, 3)  # now [N, C, W, H]: shift along H
    xw = _barrel_pass(xw, ty, max_shift, interpolation)
    xw = jnp.swapaxes(xw, 2, 3)
    xw = _barrel_pass(xw, tx2, max_shift, interpolation)
    if interpolation == "bilinear":
        xw = jnp.clip(jnp.round(xw), 0, 255).astype(imgs.dtype)
    out = jnp.moveaxis(xw, 1, -1)
    # non-geometric samples have all-zero shifts -> exact copy of `imgs`
    # (bilinear: frac 0 -> lerp degenerates to the exact copy too)

    # ---- color stage: batched branches + per-sample select ------------
    def put(nm, branch):
        nonlocal out
        msk = mask_of(nm)
        if msk is not None:
            out = jnp.where(m4(msk), branch, out)

    if "Brightness" in idx:
        put("Brightness", F.adjust_brightness(imgs, m4(1.0 + mags["Brightness"])))
    if "Color" in idx:
        put("Color", F.adjust_saturation(imgs, m4(1.0 + mags["Color"])))
    if "Contrast" in idx:
        put("Contrast", F.adjust_contrast(imgs, m4(1.0 + mags["Contrast"])))
    if "Sharpness" in idx:
        put("Sharpness", F.adjust_sharpness(imgs, m4(1.0 + mags["Sharpness"])))
    if "Posterize" in idx:
        bits = mags["Posterize"].astype(jnp.int32)
        mask = (256 - jnp.left_shift(1, jnp.clip(8 - bits, 0, 8))) & 0xFF
        put("Posterize", imgs & m4(mask).astype(imgs.dtype))
    if "Solarize" in idx:
        thr = m4(mags["Solarize"])
        inverted = (255 - imgs.astype(jnp.int32)).astype(imgs.dtype)
        put("Solarize", jnp.where(imgs >= thr, inverted, imgs))
    if "AutoContrast" in idx:
        put("AutoContrast", F.autocontrast(imgs))
    if "Equalize" in idx:
        put("Equalize", F.equalize(imgs))
    if "Invert" in idx:
        put("Invert", F.invert(imgs))
    return out
