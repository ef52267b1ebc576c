"""Stereo-matching training utilities (counterpart of the reference's
``references/depth/stereo/utils/`` package — metrics.py, losses.py,
padder.py — as one jittable JAX module).

Disparity maps are (..., H, W, 1) or (..., H, W); images are NHWC."""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

AVAILABLE_METRICS = [
    "mae", "rmse", "epe", "bad1", "bad2", "1px", "3px", "5px", "fl-all",
    "relepe",
]

__all__ = [
    "AVAILABLE_METRICS",
    "compute_metrics",
    "make_gaussian_kernel",
    "sequence_loss",
    "ssim_loss",
    "smoothness_loss",
    "flow_sequence_consistency_loss",
    "psnr_loss",
    "InputPadder",
]


def compute_metrics(
    pred, gt, valid_mask=None, metrics: Sequence[str] = ("epe", "bad1"),
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """reference utils/metrics.py:8. Returns ({metric: scalar}, n_pixels).
    Masked pixels are excluded via weighting (static shapes)."""
    for m in metrics:
        if m not in AVAILABLE_METRICS:
            raise ValueError(
                f"Invalid metric: {m}. Valid metrics are: {AVAILABLE_METRICS}"
            )
    diffs = jnp.abs(pred - gt)
    norm = jnp.abs(gt)
    if valid_mask is not None:
        w = jnp.broadcast_to(valid_mask, diffs.shape).astype(jnp.float32)
    else:
        w = jnp.ones_like(diffs)
    n = jnp.maximum(jnp.sum(w), 1.0)

    def wmean(x):
        return jnp.sum(x * w) / n

    out = {}
    if "bad1" in metrics:
        out["bad1"] = wmean(diffs > 1)
    if "bad2" in metrics:
        out["bad2"] = wmean(diffs > 2)
    if "mae" in metrics:
        out["mae"] = wmean(diffs)
    if "rmse" in metrics:
        out["rmse"] = jnp.sqrt(wmean(diffs**2))
    if "epe" in metrics:
        out["epe"] = wmean(diffs)
    if "1px" in metrics:
        out["1px"] = wmean(diffs < 1)
    if "3px" in metrics:
        out["3px"] = wmean(diffs < 3)
    if "5px" in metrics:
        out["5px"] = wmean(diffs < 5)
    if "fl-all" in metrics:
        rel = diffs / jnp.maximum(norm, 1e-6)
        out["fl-all"] = wmean((diffs < 3) & (rel < 0.05)) * 100
    if "relepe" in metrics:
        out["relepe"] = wmean(diffs / jnp.maximum(norm, 1e-6))
    return out, jnp.sum(w)


def make_gaussian_kernel(kernel_size: int, sigma: float) -> jnp.ndarray:
    """reference utils/losses.py:9: normalized 2D gaussian."""
    x = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    k = jnp.outer(g, g)
    return k / jnp.sum(k)


def sequence_loss(
    preds: Sequence[jnp.ndarray],
    gt: jnp.ndarray,
    valid_mask=None,
    gamma: float = 0.8,
    max_flow: float = 256.0,
    exclude_large: bool = False,
) -> jnp.ndarray:
    """reference utils/losses.py SequenceLoss: gamma^(N-1-i)-weighted L1
    over refinement iterations."""
    valid = jnp.ones(gt.shape, bool)
    if exclude_large:
        valid &= jnp.abs(gt) < max_flow
    if valid_mask is not None:
        valid &= jnp.broadcast_to(valid_mask, gt.shape)
    w = valid.astype(jnp.float32)
    n = len(preds)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    total = 0.0
    for i, p in enumerate(preds):
        total = total + gamma ** (n - 1 - i) * jnp.sum(
            jnp.abs(p - gt) * w
        ) / denom
    return total


def _avg_pool2d(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1), "VALID"
    ) / (k * k)


def ssim_loss(
    source: jnp.ndarray,
    reference: jnp.ndarray,
    kernel_size: int = 7,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
    use_padding: bool = False,
) -> jnp.ndarray:
    """reference utils/losses.py SSIM (uniform window): returns the
    DSSIM-style loss (1 - ssim) / 2 averaged over pixels. NHWC inputs."""
    if use_padding:
        p = kernel_size // 2
        source = jnp.pad(
            source, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge"
        )
        reference = jnp.pad(
            reference, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge"
        )
    mu_x = _avg_pool2d(source, kernel_size)
    mu_y = _avg_pool2d(reference, kernel_size)
    sx = _avg_pool2d(source**2, kernel_size) - mu_x**2
    sy = _avg_pool2d(reference**2, kernel_size) - mu_y**2
    sxy = _avg_pool2d(source * reference, kernel_size) - mu_x * mu_y
    ssim = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (sx + sy + c2)
    )
    return jnp.mean(jnp.clip((1.0 - ssim) / 2.0, 0.0, 1.0))


def smoothness_loss(images: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """reference utils/losses.py SmoothnessLoss: edge-aware first-order
    smoothness of ``vals`` (e.g. disparity) weighted by exp(-|dI|)."""
    def gx(x):
        return x[:, :, 1:] - x[:, :, :-1]

    def gy(x):
        return x[:, 1:] - x[:, :-1]

    wx = jnp.exp(-jnp.mean(jnp.abs(gx(images)), axis=-1, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(gy(images)), axis=-1, keepdims=True))
    return jnp.mean(jnp.abs(gx(vals)) * wx) + jnp.mean(
        jnp.abs(gy(vals)) * wy
    )


def flow_sequence_consistency_loss(
    preds: Sequence[jnp.ndarray],
    gamma: float = 0.8,
    resize_factor: float = 0.25,
) -> jnp.ndarray:
    """reference utils/losses.py FlowSequenceConsistencyLoss: successive
    refinement iterations should agree at low resolution."""
    if len(preds) < 2:
        return jnp.float32(0.0)
    small = []
    for p in preds:
        b, h, w = p.shape[:3]
        nh = max(int(h * resize_factor), 1)
        nw = max(int(w * resize_factor), 1)
        small.append(
            jax.image.resize(p, (b, nh, nw) + p.shape[3:], "bilinear")
        )
    n = len(small)
    total = 0.0
    for i in range(n - 1):
        total = total + gamma ** (n - 2 - i) * jnp.mean(
            jnp.abs(small[i + 1] - small[i])
        )
    return total


def psnr_loss(source: jnp.ndarray, target: jnp.ndarray,
              max_val: float = 256.0) -> jnp.ndarray:
    """reference utils/losses.py PSNRLoss (negated PSNR, to minimize)."""
    mse = jnp.mean((source - target) ** 2)
    return -10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


class InputPadder:
    """reference utils/padder.py: pad NHWC inputs so H and W are
    divisible by 8 (replicate edges), and unpad predictions."""

    def __init__(self, dims, mode: str = "sintel"):
        self.ht, self.wd = dims[-3:-1] if len(dims) >= 3 else dims
        pad_ht = (((self.ht // 8) + 1) * 8 - self.ht) % 8
        pad_wd = (((self.wd // 8) + 1) * 8 - self.wd) % 8
        if mode == "sintel":
            self._pad = [
                pad_wd // 2, pad_wd - pad_wd // 2,
                pad_ht // 2, pad_ht - pad_ht // 2,
            ]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    def pad(self, *inputs):
        left, right, top, bottom = self._pad
        return [
            jnp.pad(
                x,
                ((0, 0), (top, bottom), (left, right), (0, 0)),
                mode="edge",
            )
            for x in inputs
        ]

    def unpad(self, x):
        left, right, top, bottom = self._pad
        h, w = x.shape[1:3]
        return x[:, top : h - bottom, left : w - right]
