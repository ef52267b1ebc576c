"""Flow-aware augmentation pipeline for RAFT training (counterpart of
reference ``references/optical_flow/transforms.py``), operating on numpy
HWC images, (H, W, 2) flow and an optional (H, W) validity mask — the
host half of the input pipeline; the jitted train step consumes the
resulting fixed-size crops.

Every transform is ``t(img1, img2, flow, valid, rng)`` with an explicit
``np.random.RandomState`` (JAX-style explicit randomness instead of the
reference's global torch RNG).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "Compose",
    "ValidateModelInput",
    "MakeValidFlowMask",
    "ConvertImageDtype",
    "Normalize",
    "AsymmetricColorJitter",
    "RandomErasing",
    "RandomHorizontalFlip",
    "RandomVerticalFlip",
    "RandomResizeAndCrop",
]


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, img1, img2, flow, valid, rng):
        for t in self.transforms:
            img1, img2, flow, valid = t(img1, img2, flow, valid, rng)
        return img1, img2, flow, valid


class ValidateModelInput:
    """reference transforms.py:6: shape/dtype contract check."""

    def __call__(self, img1, img2, flow, valid, rng):
        if img1.shape != img2.shape:
            raise ValueError("img1 and img2 should have the same shape")
        h, w = img1.shape[:2]
        if flow is not None and flow.shape != (h, w, 2):
            raise ValueError(f"flow.shape should be ({h}, {w}, 2)")
        if valid is not None and valid.shape != (h, w):
            raise ValueError(f"valid_flow_mask.shape should be ({h}, {w})")
        for a in (img1, img2, flow):
            if a is not None and a.dtype != np.float32:
                raise TypeError("img1/img2/flow must be float32")
        return img1, img2, flow, valid


class MakeValidFlowMask:
    """reference transforms.py:29: valid wherever |flow| < threshold."""

    def __init__(self, threshold: float = 1000.0):
        self.threshold = threshold

    def __call__(self, img1, img2, flow, valid, rng):
        if flow is not None and valid is None:
            valid = (np.abs(flow) < self.threshold).all(axis=-1)
        return img1, img2, flow, valid


class ConvertImageDtype:
    def __init__(self, dtype=np.float32):
        self.dtype = dtype

    def __call__(self, img1, img2, flow, valid, rng):
        if np.issubdtype(np.dtype(self.dtype), np.floating):
            scale = 1.0 / 255.0 if img1.dtype == np.uint8 else 1.0
            img1 = (img1 * scale).astype(self.dtype)
            img2 = (img2 * scale).astype(self.dtype)
        return img1, img2, flow, valid


class Normalize:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img1, img2, flow, valid, rng):
        img1 = (img1 - self.mean) / self.std
        img2 = (img2 - self.mean) / self.std
        return img1, img2, flow, valid


def _jitter_once(img, rng, brightness, contrast, saturation, hue):
    """ColorJitter factors applied in a random order (v2 semantics) on a
    float image in [0, 1]."""
    ops = []
    if brightness:
        f = rng.uniform(max(0, 1 - brightness), 1 + brightness)
        ops.append(lambda x: x * f)
    if contrast:
        f = rng.uniform(max(0, 1 - contrast), 1 + contrast)
        ops.append(
            lambda x: (x - x.mean(axis=(0, 1), keepdims=True)) * f
            + x.mean(axis=(0, 1), keepdims=True)
        )
    if saturation:
        f = rng.uniform(max(0, 1 - saturation), 1 + saturation)

        def _sat(x, f=f):
            g = x @ np.asarray([0.299, 0.587, 0.114], np.float32)
            return g[..., None] + (x - g[..., None]) * f

        ops.append(_sat)
    if hue:
        # cheap hue rotation around the gray axis
        theta = rng.uniform(-hue, hue) * 2 * np.pi

        def _hue(x, theta=theta):
            c, s = np.cos(theta), np.sin(theta)
            m = (
                np.asarray(
                    [[0.299, 0.587, 0.114]] * 3, np.float32
                )
                + c
                * (np.eye(3, dtype=np.float32) - [[0.299, 0.587, 0.114]] * 3)
                + s
                * np.asarray(
                    [[0.0, -0.589, 0.589], [0.589, 0, -0.589],
                     [-0.589, 0.589, 0]],
                    np.float32,
                )
            )
            return x @ m.T

        ops.append(_hue)
    rng.shuffle(ops)
    for op in ops:
        img = op(img)
    return np.clip(img, 0.0, 1.0)


class AsymmetricColorJitter:
    """reference transforms.py:86: with prob p jitter each frame
    independently, otherwise jitter both with shared parameters."""

    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0,
                 hue=0.0, p=0.2):
        self.args = (brightness, contrast, saturation, hue)
        self.p = p

    def __call__(self, img1, img2, flow, valid, rng):
        if rng.rand() < self.p:
            img1 = _jitter_once(img1, rng, *self.args)
            img2 = _jitter_once(img2, rng, *self.args)
        else:
            state = rng.get_state()
            img1 = _jitter_once(img1, rng, *self.args)
            rng.set_state(state)
            img2 = _jitter_once(img2, rng, *self.args)
        return img1, img2, flow, valid


class RandomErasing:
    """reference transforms.py:107: erase up to max_erase random boxes in
    img2 ONLY with the image mean (occlusion simulation)."""

    def __init__(self, p=0.5, scale=(0.02, 0.33), ratio=(0.3, 3.3),
                 max_erase=1):
        self.p = p
        self.scale = scale
        self.ratio = ratio
        self.max_erase = max_erase

    def __call__(self, img1, img2, flow, valid, rng):
        if rng.rand() >= self.p:
            return img1, img2, flow, valid
        img2 = img2.copy()
        h, w = img2.shape[:2]
        mean = img2.mean(axis=(0, 1))
        for _ in range(rng.randint(1, self.max_erase + 1)):
            for _attempt in range(10):
                area = rng.uniform(*self.scale) * h * w
                ratio = np.exp(rng.uniform(*np.log(self.ratio)))
                eh = int(round(np.sqrt(area * ratio)))
                ew = int(round(np.sqrt(area / ratio)))
                if eh < h and ew < w and eh > 0 and ew > 0:
                    y0 = rng.randint(0, h - eh)
                    x0 = rng.randint(0, w - ew)
                    img2[y0 : y0 + eh, x0 : x0 + ew] = mean
                    break
        return img1, img2, flow, valid


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img1, img2, flow, valid, rng):
        if rng.rand() >= self.p:
            return img1, img2, flow, valid
        img1, img2 = img1[:, ::-1], img2[:, ::-1]
        if flow is not None:
            flow = flow[:, ::-1] * np.asarray([-1.0, 1.0], np.float32)
        if valid is not None:
            valid = valid[:, ::-1]
        return img1, img2, flow, valid


class RandomVerticalFlip:
    def __init__(self, p=0.1):
        self.p = p

    def __call__(self, img1, img2, flow, valid, rng):
        if rng.rand() >= self.p:
            return img1, img2, flow, valid
        img1, img2 = img1[::-1], img2[::-1]
        if flow is not None:
            flow = flow[::-1] * np.asarray([1.0, -1.0], np.float32)
        if valid is not None:
            valid = valid[::-1]
        return img1, img2, flow, valid


def _resize_bilinear(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    import jax

    return np.asarray(
        jax.image.resize(
            img, (size[0], size[1]) + img.shape[2:], method="bilinear"
        )
    )


class RandomResizeAndCrop:
    """reference transforms.py:157: log-uniform scale (with independent
    x/y stretch at stretch_prob), dense-flow rescale * (sx, sy) or
    sparse-flow scatter resize, then a random fixed-size crop."""

    def __init__(self, crop_size: Tuple[int, int], min_scale=-0.2,
                 max_scale=0.5, stretch_prob=0.8):
        self.crop_size = tuple(crop_size)
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.stretch_prob = stretch_prob
        self.resize_prob = 0.8
        self.max_stretch = 0.2

    def __call__(self, img1, img2, flow, valid, rng):
        h, w = img1.shape[:2]
        min_scale = max(
            (self.crop_size[0] + 8) / h, (self.crop_size[1] + 8) / w
        )
        scale = 2.0 ** rng.uniform(self.min_scale, self.max_scale)
        sx = sy = scale
        if rng.rand() < self.stretch_prob:
            sx *= 2.0 ** rng.uniform(-self.max_stretch, self.max_stretch)
            sy *= 2.0 ** rng.uniform(-self.max_stretch, self.max_stretch)
        sx, sy = max(sx, min_scale), max(sy, min_scale)
        new_h, new_w = int(round(h * sy)), int(round(w * sx))

        if rng.rand() < self.resize_prob:
            img1 = _resize_bilinear(img1, (new_h, new_w))
            img2 = _resize_bilinear(img2, (new_h, new_w))
            if valid is None:
                flow = _resize_bilinear(flow, (new_h, new_w)) * np.asarray(
                    [sx, sy], np.float32
                )
            else:
                flow, valid = self._resize_sparse_flow(flow, valid, sx, sy)

        ch, cw = self.crop_size
        y0 = rng.randint(0, img1.shape[0] - ch)
        x0 = rng.randint(0, img1.shape[1] - cw)
        img1 = img1[y0 : y0 + ch, x0 : x0 + cw]
        img2 = img2[y0 : y0 + ch, x0 : x0 + cw]
        flow = flow[y0 : y0 + ch, x0 : x0 + cw]
        if valid is not None:
            valid = valid[y0 : y0 + ch, x0 : x0 + cw]
        return img1, img2, flow, valid

    @staticmethod
    def _resize_sparse_flow(flow, valid, sx, sy):
        """reference transforms.py:227: move each valid flow vector to its
        rounded scaled location (no interpolation across sparse samples)."""
        h, w = flow.shape[:2]
        new_h, new_w = int(round(h * sy)), int(round(w * sx))
        ii, jj = np.nonzero(valid)
        ii_new = np.round(ii * sy).astype(np.int64)
        jj_new = np.round(jj * sx).astype(np.int64)
        inb = (ii_new >= 0) & (ii_new < new_h) & (jj_new >= 0) & (
            jj_new < new_w
        )
        flow_new = np.zeros((new_h, new_w, 2), flow.dtype)
        valid_new = np.zeros((new_h, new_w), valid.dtype)
        vals = flow[ii[inb], jj[inb]] * np.asarray([sx, sy], flow.dtype)
        flow_new[ii_new[inb], jj_new[inb]] = vals
        valid_new[ii_new[inb], jj_new[inb]] = True
        return flow_new, valid_new
