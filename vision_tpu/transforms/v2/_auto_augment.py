"""AutoAugment family (reference
``torchvision/transforms/v2/_auto_augment.py``, 646 LoC): AutoAugment,
RandAugment, TrivialAugmentWide, AugMix.

The policy tables are the published constants from the respective papers
(AutoAugment: Cubuk et al. 2018; RandAugment: Cubuk et al. 2019;
TrivialAugment: Müller & Hutter 2021; AugMix: Hendrycks et al. 2020).
"""

from __future__ import annotations

import enum
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import tv_tensors
from vision_tpu.transforms.v2 import functional as F
from vision_tpu.transforms.v2._transform import Transform

__all__ = [
    "AutoAugment",
    "AutoAugmentPolicy",
    "RandAugment",
    "TrivialAugmentWide",
    "AugMix",
]


class AutoAugmentPolicy(str, enum.Enum):
    """reference ``transforms/autoaugment.py:93``; str subclass so members
    pass anywhere a policy string is accepted."""

    IMAGENET = "imagenet"
    CIFAR10 = "cifar10"
    SVHN = "svhn"

_IMG_TYPES = (tv_tensors.Image, tv_tensors.Video, jax.Array, np.ndarray)


class _AutoAugmentBase(Transform):
    _transformed_types = _IMG_TYPES

    def __init__(self, interpolation: str = "nearest", fill=None):
        super().__init__()
        self.interpolation = interpolation
        self.fill = fill

    def _apply_op(self, img, op_name: str, magnitude: float):
        """reference ``_auto_augment.py`` ``_apply_image_or_video_transform``.
        ``magnitude`` may be a traced scalar (jitted RandAugment): the shear
        trig moves to jnp and translate truncates with jnp.trunc, matching
        the eager int()/math.* semantics."""
        interp, fill = self.interpolation, self.fill
        traced = isinstance(magnitude, jax.core.Tracer)
        if traced:
            deg_atan = lambda m: jnp.degrees(jnp.arctan(m))  # noqa: E731
            trunc = jnp.trunc
        else:
            deg_atan = lambda m: math.degrees(math.atan(m))  # noqa: E731
            trunc = int
        if op_name == "ShearX":
            return F.affine(
                img, 0.0, [0, 0], 1.0,
                [deg_atan(magnitude), 0.0],
                interp, fill, center=[0, 0],
            )
        if op_name == "ShearY":
            return F.affine(
                img, 0.0, [0, 0], 1.0,
                [0.0, deg_atan(magnitude)],
                interp, fill, center=[0, 0],
            )
        if op_name == "TranslateX":
            return F.affine(
                img, 0.0, [trunc(magnitude), 0], 1.0, [0.0, 0.0], interp, fill
            )
        if op_name == "TranslateY":
            return F.affine(
                img, 0.0, [0, trunc(magnitude)], 1.0, [0.0, 0.0], interp, fill
            )
        if op_name == "Rotate":
            return F.rotate(img, magnitude, interp, fill=fill)
        if op_name == "Brightness":
            return F.adjust_brightness(img, 1.0 + magnitude)
        if op_name == "Color":
            return F.adjust_saturation(img, 1.0 + magnitude)
        if op_name == "Contrast":
            return F.adjust_contrast(img, 1.0 + magnitude)
        if op_name == "Sharpness":
            return F.adjust_sharpness(img, 1.0 + magnitude)
        if op_name == "Posterize":
            bits = magnitude if traced else int(magnitude)
            return F.posterize(img, bits)
        if op_name == "Solarize":
            arr = img.data if isinstance(img, tv_tensors.TVTensor) else img
            bound = 255.0 if jnp.issubdtype(arr.dtype, jnp.integer) else 1.0
            return F.solarize(img, magnitude * bound / 255.0 if bound == 1.0 else magnitude)
        if op_name == "AutoContrast":
            return F.autocontrast(img)
        if op_name == "Equalize":
            return F.equalize(img)
        if op_name == "Invert":
            return F.invert(img)
        if op_name == "Identity":
            return img
        raise ValueError(f"unknown op {op_name}")


def _imagenet_policy():
    """reference ``_auto_augment.py`` AutoAugmentPolicy.IMAGENET table."""
    return [
        (("Posterize", 0.4, 8), ("Rotate", 0.6, 9)),
        (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
        (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
        (("Posterize", 0.6, 7), ("Posterize", 0.6, 6)),
        (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
        (("Equalize", 0.4, None), ("Rotate", 0.8, 8)),
        (("Solarize", 0.6, 3), ("Equalize", 0.6, None)),
        (("Posterize", 0.8, 5), ("Equalize", 1.0, None)),
        (("Rotate", 0.2, 3), ("Solarize", 0.6, 8)),
        (("Equalize", 0.6, None), ("Posterize", 0.4, 6)),
        (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
        (("Rotate", 0.4, 9), ("Equalize", 0.6, None)),
        (("Equalize", 0.0, None), ("Equalize", 0.8, None)),
        (("Invert", 0.6, None), ("Equalize", 1.0, None)),
        (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
        (("Rotate", 0.8, 8), ("Color", 1.0, 2)),
        (("Color", 0.8, 8), ("Solarize", 0.8, 7)),
        (("Sharpness", 0.4, 7), ("Invert", 0.6, None)),
        (("ShearX", 0.6, 5), ("Equalize", 1.0, None)),
        (("Color", 0.4, 0), ("Equalize", 0.6, None)),
        (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
        (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
        (("Invert", 0.6, None), ("Equalize", 1.0, None)),
        (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
        (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
    ]


def _cifar10_policy():
    return [
        (("Invert", 0.1, None), ("Contrast", 0.2, 6)),
        (("Rotate", 0.7, 2), ("TranslateX", 0.3, 9)),
        (("Sharpness", 0.8, 1), ("Sharpness", 0.9, 3)),
        (("ShearY", 0.5, 8), ("TranslateY", 0.7, 9)),
        (("AutoContrast", 0.5, None), ("Equalize", 0.9, None)),
        (("ShearY", 0.2, 7), ("Posterize", 0.3, 7)),
        (("Color", 0.4, 3), ("Brightness", 0.6, 7)),
        (("Sharpness", 0.3, 9), ("Brightness", 0.7, 9)),
        (("Equalize", 0.6, None), ("Equalize", 0.5, None)),
        (("Contrast", 0.6, 7), ("Sharpness", 0.6, 5)),
        (("Color", 0.7, 7), ("TranslateX", 0.5, 8)),
        (("Equalize", 0.3, None), ("AutoContrast", 0.4, None)),
        (("TranslateY", 0.4, 3), ("Sharpness", 0.2, 6)),
        (("Brightness", 0.9, 6), ("Color", 0.2, 8)),
        (("Solarize", 0.5, 2), ("Invert", 0.0, None)),
        (("Equalize", 0.2, None), ("AutoContrast", 0.6, None)),
        (("Equalize", 0.2, None), ("Equalize", 0.6, None)),
        (("Color", 0.9, 9), ("Equalize", 0.6, None)),
        (("AutoContrast", 0.8, None), ("Solarize", 0.2, 8)),
        (("Brightness", 0.1, 3), ("Color", 0.7, 0)),
        (("Solarize", 0.4, 5), ("AutoContrast", 0.9, None)),
        (("TranslateY", 0.9, 9), ("TranslateY", 0.7, 9)),
        (("AutoContrast", 0.9, None), ("Solarize", 0.8, 3)),
        (("Equalize", 0.8, None), ("Invert", 0.1, None)),
        (("TranslateY", 0.7, 9), ("AutoContrast", 0.9, None)),
    ]


def _svhn_policy():
    return [
        (("ShearX", 0.9, 4), ("Invert", 0.2, None)),
        (("ShearY", 0.9, 8), ("Invert", 0.7, None)),
        (("Equalize", 0.6, None), ("Solarize", 0.6, 6)),
        (("Invert", 0.9, None), ("Equalize", 0.6, None)),
        (("Equalize", 0.6, None), ("Rotate", 0.9, 3)),
        (("ShearX", 0.9, 4), ("AutoContrast", 0.8, None)),
        (("ShearY", 0.9, 8), ("Invert", 0.4, None)),
        (("ShearY", 0.9, 5), ("Solarize", 0.2, 6)),
        (("Invert", 0.9, None), ("AutoContrast", 0.8, None)),
        (("Equalize", 0.6, None), ("Rotate", 0.9, 3)),
        (("ShearX", 0.9, 4), ("Solarize", 0.3, 3)),
        (("ShearY", 0.8, 8), ("Invert", 0.7, None)),
        (("Equalize", 0.9, None), ("TranslateY", 0.6, 6)),
        (("ShearX", 0.9, 4), ("AutoContrast", 0.8, None)),
        (("ShearY", 0.8, 8), ("Solarize", 0.7, 2)),
        (("Invert", 0.7, None), ("TranslateY", 0.6, 6)),
        (("ShearY", 0.6, 7), ("Solarize", 0.4, 8)),
        (("Invert", 0.8, None), ("TranslateY", 0.0, 2)),
        (("ShearY", 0.7, 6), ("Solarize", 0.4, 8)),
        (("Invert", 0.6, None), ("Rotate", 0.8, 4)),
        (("ShearY", 0.3, 7), ("TranslateX", 0.9, 3)),
        (("ShearX", 0.1, 6), ("Invert", 0.6, None)),
        (("Solarize", 0.7, 2), ("TranslateY", 0.6, 7)),
        (("ShearY", 0.8, 4), ("Invert", 0.8, None)),
        (("ShearX", 0.7, 9), ("TranslateY", 0.8, 3)),
    ]


class AutoAugment(_AutoAugmentBase):
    """reference ``_auto_augment.py:229``."""

    def __init__(self, policy: str = "imagenet", interpolation="nearest", fill=None):
        super().__init__(interpolation, fill)
        self.policy = policy
        self._policies = {
            "imagenet": _imagenet_policy,
            "cifar10": _cifar10_policy,
            "svhn": _svhn_policy,
        }[policy]()

    def _augmentation_space(self, num_bins: int, image_size):
        h, w = image_size
        return {
            "ShearX": (np.linspace(0.0, 0.3, num_bins), True),
            "ShearY": (np.linspace(0.0, 0.3, num_bins), True),
            "TranslateX": (np.linspace(0.0, 150.0 / 331.0 * w, num_bins), True),
            "TranslateY": (np.linspace(0.0, 150.0 / 331.0 * h, num_bins), True),
            "Rotate": (np.linspace(0.0, 30.0, num_bins), True),
            "Brightness": (np.linspace(0.0, 0.9, num_bins), True),
            "Color": (np.linspace(0.0, 0.9, num_bins), True),
            "Contrast": (np.linspace(0.0, 0.9, num_bins), True),
            "Sharpness": (np.linspace(0.0, 0.9, num_bins), True),
            "Posterize": (
                8 - (np.arange(num_bins) / ((num_bins - 1) / 4)).round(),
                False,
            ),
            "Solarize": (np.linspace(255.0, 0.0, num_bins), False),
            "AutoContrast": (np.array(0.0), False),
            "Equalize": (np.array(0.0), False),
            "Invert": (np.array(0.0), False),
        }

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        if key is None:
            key = self._next_key()
        from vision_tpu.transforms.v2._geometry import _query_size

        flat, spec = jax.tree_util.tree_flatten(
            sample, is_leaf=lambda x: isinstance(x, tv_tensors.TVTensor)
        )
        needs = self._needs_transform_list(flat)
        size = _query_size(flat)
        k1, *op_keys = jax.random.split(key, 6)
        policy_idx = int(jax.random.randint(k1, (), 0, len(self._policies)))
        policy = self._policies[policy_idx]
        space = self._augmentation_space(10, size)

        out = []
        for x, n in zip(flat, needs):
            if not n:
                out.append(x)
                continue
            img = x
            for (op_name, p, magnitude_id), kp, ks in zip(
                policy, op_keys[:2], op_keys[2:4]
            ):
                if float(jax.random.uniform(kp)) > p:
                    continue
                magnitudes, signed = space[op_name]
                if magnitude_id is not None and magnitudes.ndim > 0:
                    magnitude = float(magnitudes[magnitude_id])
                else:
                    magnitude = 0.0
                if signed and float(jax.random.uniform(ks)) > 0.5:
                    magnitude = -magnitude
                img = self._apply_op(img, op_name, magnitude)
            out.append(img)
        return jax.tree_util.tree_unflatten(spec, out)


class RandAugment(_AutoAugmentBase):
    """reference ``_auto_augment.py:410``."""

    def __init__(
        self,
        num_ops: int = 2,
        magnitude: int = 9,
        num_magnitude_bins: int = 31,
        interpolation="nearest",
        fill=None,
    ):
        super().__init__(interpolation, fill)
        self.num_ops = num_ops
        self.magnitude = magnitude
        self.num_magnitude_bins = num_magnitude_bins

    def _augmentation_space(self, num_bins: int, image_size):
        h, w = image_size
        return {
            "Identity": (np.array(0.0), False),
            "ShearX": (np.linspace(0.0, 0.3, num_bins), True),
            "ShearY": (np.linspace(0.0, 0.3, num_bins), True),
            "TranslateX": (np.linspace(0.0, 150.0 / 331.0 * w, num_bins), True),
            "TranslateY": (np.linspace(0.0, 150.0 / 331.0 * h, num_bins), True),
            "Rotate": (np.linspace(0.0, 30.0, num_bins), True),
            "Brightness": (np.linspace(0.0, 0.9, num_bins), True),
            "Color": (np.linspace(0.0, 0.9, num_bins), True),
            "Contrast": (np.linspace(0.0, 0.9, num_bins), True),
            "Sharpness": (np.linspace(0.0, 0.9, num_bins), True),
            "Posterize": (
                8 - (np.arange(num_bins) / ((num_bins - 1) / 4)).round(),
                False,
            ),
            "Solarize": (np.linspace(255.0, 0.0, num_bins), False),
            "AutoContrast": (np.array(0.0), False),
            "Equalize": (np.array(0.0), False),
        }

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        if key is None:
            key = self._next_key()
        from vision_tpu.transforms.v2._geometry import _query_size

        flat, spec = jax.tree_util.tree_flatten(
            sample, is_leaf=lambda x: isinstance(x, tv_tensors.TVTensor)
        )
        needs = self._needs_transform_list(flat)
        size = _query_size(flat)
        space = self._augmentation_space(self.num_magnitude_bins, size)
        names = list(space.keys())

        traced = isinstance(key, jax.core.Tracer)
        out = []
        for x, n in zip(flat, needs):
            if not n:
                out.append(x)
                continue
            img = x
            for k in jax.random.split(key, self.num_ops):
                k1, k2 = jax.random.split(k)
                op_idx = jax.random.randint(k1, (), 0, len(names))
                sign = jnp.where(jax.random.uniform(k2) > 0.5, -1.0, 1.0)
                if traced:
                    # jitted path: op choice via lax.switch; per-op bin
                    # magnitudes are concrete, only the sign is traced
                    branches = []
                    for name in names:
                        magnitudes, signed = space[name]
                        mag = (
                            float(magnitudes[self.magnitude])
                            if magnitudes.ndim > 0
                            else 0.0
                        )

                        def branch(im, name=name, mag=mag, signed=signed):
                            m = mag * sign if signed else mag
                            if name in ("Posterize",):
                                m = int(mag)  # concrete bits
                            return self._apply_op(im, name, m)

                        branches.append(branch)
                    img = jax.lax.switch(op_idx, branches, img)
                else:
                    op_name = names[int(op_idx)]
                    magnitudes, signed = space[op_name]
                    magnitude = (
                        float(magnitudes[self.magnitude])
                        if magnitudes.ndim > 0
                        else 0.0
                    )
                    if signed and float(sign) < 0:
                        magnitude = -magnitude
                    img = self._apply_op(img, op_name, magnitude)
            out.append(img)
        return jax.tree_util.tree_unflatten(spec, out)

    def batched(self, imgs: jax.Array, key: jax.Array) -> jax.Array:
        """Per-sample RandAugment on a uint8 batch [N,H,W,C] via the
        batched TPU engine (``_batch_augment.py``) — the production
        ``--device-augment`` path, ~17x faster than ``vmap(__call__)``.
        The RNG draw structure mirrors the vmapped path: integer ops are
        bit-identical to ``vmap`` with the same key; the float-blend
        color ops (Brightness/Color/Contrast/Sharpness/AutoContrast) may
        differ by <=1 uint8 count under the default color bucketing
        (XLA FMA contraction differs across fusion contexts — pass
        ``color_bucket=0`` through the engine for the exact path);
        Rotate samples within +-1 source pixel (three-shear)."""
        from vision_tpu.transforms.v2._batch_augment import (
            apply_ops_batched,
            max_shift_bound,
        )

        n, h, w, _ = imgs.shape
        space = self._augmentation_space(self.num_magnitude_bins, (h, w))
        names = list(space.keys())
        bound = max_shift_bound(space, self.magnitude, (h, w))

        def draws(k):
            ops, signs = [], []
            for kk in jax.random.split(k, self.num_ops):
                k1, k2 = jax.random.split(kk)
                ops.append(jax.random.randint(k1, (), 0, len(names)))
                signs.append(
                    jnp.where(jax.random.uniform(k2) > 0.5, -1.0, 1.0)
                )
            return jnp.stack(ops), jnp.stack(signs)

        op_idx, signs = jax.vmap(draws)(jax.random.split(key, n))
        x = imgs
        for s in range(self.num_ops):
            mags = {}
            for name, (tab, signed) in space.items():
                mag = float(tab[self.magnitude]) if tab.ndim > 0 else 0.0
                if signed:
                    mags[name] = mag * signs[:, s]
                else:
                    mags[name] = jnp.full((n,), mag, jnp.float32)
            x = apply_ops_batched(
                x, op_idx[:, s], mags, names, bound,
                interpolation=self.interpolation,
            )
        return x


class TrivialAugmentWide(_AutoAugmentBase):
    """reference ``_auto_augment.py:489``."""

    def __init__(self, num_magnitude_bins: int = 31, interpolation="nearest", fill=None):
        super().__init__(interpolation, fill)
        self.num_magnitude_bins = num_magnitude_bins

    def _augmentation_space(self, num_bins: int):
        return {
            "Identity": (np.array(0.0), False),
            "ShearX": (np.linspace(0.0, 0.99, num_bins), True),
            "ShearY": (np.linspace(0.0, 0.99, num_bins), True),
            "TranslateX": (np.linspace(0.0, 32.0, num_bins), True),
            "TranslateY": (np.linspace(0.0, 32.0, num_bins), True),
            "Rotate": (np.linspace(0.0, 135.0, num_bins), True),
            "Brightness": (np.linspace(0.0, 0.99, num_bins), True),
            "Color": (np.linspace(0.0, 0.99, num_bins), True),
            "Contrast": (np.linspace(0.0, 0.99, num_bins), True),
            "Sharpness": (np.linspace(0.0, 0.99, num_bins), True),
            "Posterize": (
                8 - (np.arange(num_bins) / ((num_bins - 1) / 6)).round(),
                False,
            ),
            "Solarize": (np.linspace(255.0, 0.0, num_bins), False),
            "AutoContrast": (np.array(0.0), False),
            "Equalize": (np.array(0.0), False),
        }

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        if key is None:
            key = self._next_key()
        flat, spec = jax.tree_util.tree_flatten(
            sample, is_leaf=lambda x: isinstance(x, tv_tensors.TVTensor)
        )
        needs = self._needs_transform_list(flat)
        space = self._augmentation_space(self.num_magnitude_bins)
        names = list(space.keys())
        k1, k2, k3 = jax.random.split(key, 3)
        op_idx = jax.random.randint(k1, (), 0, len(names))
        bin_idx = jax.random.randint(k2, (), 0, self.num_magnitude_bins)
        sign = jnp.where(jax.random.uniform(k3) > 0.5, -1.0, 1.0)
        if isinstance(key, jax.core.Tracer):
            def one(img):
                branches = []
                for name in names:
                    magnitudes, signed = space[name]

                    def branch(im, name=name, magnitudes=magnitudes,
                               signed=signed):
                        if magnitudes.ndim > 0:
                            m = jnp.asarray(magnitudes, jnp.float32)[
                                jnp.minimum(bin_idx, len(magnitudes) - 1)
                            ]
                        else:
                            m = jnp.float32(0.0)
                        if signed:
                            m = m * sign
                        if name == "Posterize":
                            m = m.astype(jnp.int32)
                        return self._apply_op(im, name, m)

                    branches.append(branch)
                return jax.lax.switch(op_idx, branches, img)

            out = [one(x) if n else x for x, n in zip(flat, needs)]
            return jax.tree_util.tree_unflatten(spec, out)
        op_name = names[int(op_idx)]
        magnitudes, signed = space[op_name]
        if magnitudes.ndim > 0:
            magnitude = float(
                magnitudes[min(int(bin_idx), len(magnitudes) - 1)]
            )
        else:
            magnitude = 0.0
        if signed and float(sign) < 0:
            magnitude = -magnitude
        out = [
            self._apply_op(x, op_name, magnitude) if n else x
            for x, n in zip(flat, needs)
        ]
        return jax.tree_util.tree_unflatten(spec, out)

    def batched(self, imgs: jax.Array, key: jax.Array) -> jax.Array:
        """Per-sample TrivialAugmentWide on a uint8 batch [N,H,W,C] via
        the batched TPU engine; requires square images (the space allows
        Rotate up to 135 deg -> exact rot90 pre-rotation + three-shear
        residual). RNG draw structure mirrors the per-sample path."""
        from vision_tpu.transforms.v2._batch_augment import (
            apply_ops_batched,
            max_shift_bound,
        )

        n = imgs.shape[0]
        space = self._augmentation_space(self.num_magnitude_bins)
        names = list(space.keys())
        bound = max_shift_bound(space, None, imgs.shape[1:3])

        def draws(k):
            k1, k2, k3 = jax.random.split(k, 3)
            op = jax.random.randint(k1, (), 0, len(names))
            b = jax.random.randint(k2, (), 0, self.num_magnitude_bins)
            sign = jnp.where(jax.random.uniform(k3) > 0.5, -1.0, 1.0)
            return op, b, sign

        op_idx, bins, signs = jax.vmap(draws)(jax.random.split(key, n))
        mags = {}
        for name, (tab, signed) in space.items():
            if tab.ndim > 0:
                t = jnp.asarray(tab, jnp.float32)
                m = t[jnp.minimum(bins, len(tab) - 1)]
            else:
                m = jnp.zeros((n,), jnp.float32)
            mags[name] = m * signs if signed else m
        return apply_ops_batched(
            imgs, op_idx, mags, names, bound, rot90_needed=True,
            interpolation=self.interpolation,
        )


class AugMix(_AutoAugmentBase):
    """reference ``_auto_augment.py:570``: mixture of augmentation chains."""

    def __init__(
        self,
        severity: int = 3,
        mixture_width: int = 3,
        chain_depth: int = -1,
        alpha: float = 1.0,
        all_ops: bool = True,
        interpolation: str = "bilinear",
        fill=None,
    ):
        super().__init__(interpolation, fill)
        if not (1 <= severity <= 10):
            raise ValueError(f"severity must be in [1, 10], got {severity}")
        self.severity = severity
        self.mixture_width = mixture_width
        self.chain_depth = chain_depth
        self.alpha = alpha
        self.all_ops = all_ops

    def _augmentation_space(self, num_bins: int, image_size):
        h, w = image_size
        s = {
            "ShearX": (np.linspace(0.0, 0.3, num_bins), True),
            "ShearY": (np.linspace(0.0, 0.3, num_bins), True),
            "TranslateX": (np.linspace(0.0, w / 3.0, num_bins), True),
            "TranslateY": (np.linspace(0.0, h / 3.0, num_bins), True),
            "Rotate": (np.linspace(0.0, 30.0, num_bins), True),
            "Posterize": (
                4 - (np.arange(num_bins) / ((num_bins - 1) / 4)).round(),
                False,
            ),
            "Solarize": (np.linspace(255.0, 0.0, num_bins), False),
            "AutoContrast": (np.array(0.0), False),
            "Equalize": (np.array(0.0), False),
        }
        if self.all_ops:
            s.update(
                {
                    "Brightness": (np.linspace(0.0, 0.9, num_bins), True),
                    "Color": (np.linspace(0.0, 0.9, num_bins), True),
                    "Contrast": (np.linspace(0.0, 0.9, num_bins), True),
                    "Sharpness": (np.linspace(0.0, 0.9, num_bins), True),
                }
            )
        return s

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        if key is None:
            key = self._next_key()
        from vision_tpu.transforms.v2._geometry import _query_size

        flat, spec = jax.tree_util.tree_flatten(
            sample, is_leaf=lambda x: isinstance(x, tv_tensors.TVTensor)
        )
        needs = self._needs_transform_list(flat)
        size = _query_size(flat)
        space = self._augmentation_space(11, size)  # wait: severity bins
        names = list(space.keys())

        kd, km = jax.random.split(key)
        m = jax.random.dirichlet(
            km, jnp.array([self.alpha] * self.mixture_width, jnp.float32)
        )
        if isinstance(key, jax.core.Tracer):
            return self._call_traced(
                flat, spec, needs, space, names, key, kd, m
            )
        mix_weight = float(jax.random.beta(kd, self.alpha, self.alpha))

        out = []
        for x, n in zip(flat, needs):
            if not n:
                out.append(x)
                continue
            arr = x.data if isinstance(x, tv_tensors.TVTensor) else x
            orig_dtype = arr.dtype
            f = arr.astype(jnp.float32)
            mix = mix_weight * f
            kk = key
            for i in range(self.mixture_width):
                kk, kc = jax.random.split(kk)
                # depth and chain-step randomness use independent streams
                # (advisor r2: drawing both from kc correlates them); the
                # traced path mirrors this split exactly so static-depth
                # jit-vs-eager outputs stay identical
                kd_i, kchain = jax.random.split(kc)
                depth = (
                    self.chain_depth
                    if self.chain_depth > 0
                    else int(jax.random.randint(kd_i, (), 1, 4))
                )
                aug = x
                for k in jax.random.split(kchain, depth):
                    k1, k2, k3 = jax.random.split(k, 3)
                    op_name = names[int(jax.random.randint(k1, (), 0, len(names)))]
                    magnitudes, signed = space[op_name]
                    if magnitudes.ndim > 0:
                        magnitude = float(
                            magnitudes[
                                int(jax.random.randint(k2, (), 0, self.severity))
                            ]
                        )
                    else:
                        magnitude = 0.0
                    if signed and float(jax.random.uniform(k3)) > 0.5:
                        magnitude = -magnitude
                    aug = self._apply_op(aug, op_name, magnitude)
                aug_arr = aug.data if isinstance(aug, tv_tensors.TVTensor) else aug
                mix = mix + (1.0 - mix_weight) * float(m[i]) * aug_arr.astype(
                    jnp.float32
                )
            if jnp.issubdtype(orig_dtype, jnp.integer):
                mix = jnp.clip(jnp.round(mix), 0, 255)
            mix = mix.astype(orig_dtype)
            out.append(
                tv_tensors.wrap(mix, like=x)
                if isinstance(x, tv_tensors.TVTensor)
                else mix
            )
        return jax.tree_util.tree_unflatten(spec, out)

    def _call_traced(self, flat, spec, needs, space, names, key, kd, m):
        """Jitted AugMix: op choice via lax.switch (concrete per-bin
        magnitude tables, traced severity-bin index + sign, traced-bits
        posterize), traced chain depth via per-step gating, traced
        Beta/Dirichlet mixing weights."""
        mix_weight = jax.random.beta(kd, self.alpha, self.alpha)
        max_depth = self.chain_depth if self.chain_depth > 0 else 3

        def chain_step(im, k, active):
            k1, k2, k3 = jax.random.split(k, 3)
            op_idx = jax.random.randint(k1, (), 0, len(names))
            bin_idx = jax.random.randint(k2, (), 0, self.severity)
            sign = jnp.where(jax.random.uniform(k3) > 0.5, -1.0, 1.0)
            branches = []
            for name in names:
                magnitudes, signed = space[name]

                def branch(x, name=name, magnitudes=magnitudes,
                           signed=signed):
                    if magnitudes.ndim > 0:
                        mg = jnp.asarray(magnitudes, jnp.float32)[
                            jnp.minimum(bin_idx, len(magnitudes) - 1)
                        ]
                    else:
                        mg = jnp.float32(0.0)
                    if signed:
                        mg = mg * sign
                    if name == "Posterize":
                        mg = mg.astype(jnp.int32)
                    return self._apply_op(x, name, mg)

                branches.append(branch)
            aug = jax.lax.switch(op_idx, branches, im)
            return jnp.where(active, aug, im)

        out = []
        for x, n in zip(flat, needs):
            if not n:
                out.append(x)
                continue
            arr = x.data if isinstance(x, tv_tensors.TVTensor) else x
            orig_dtype = arr.dtype
            f = arr.astype(jnp.float32)
            mix = mix_weight * f
            kk = key
            for i in range(self.mixture_width):
                kk, kc = jax.random.split(kk)
                # independent streams for the depth draw and the chain
                # steps — reusing kc for both correlates the sampled depth
                # with the per-step op/magnitude randomness (advisor r2);
                # the split mirrors the eager path (kd_i, kchain)
                kd_i, kchain = jax.random.split(kc)
                if self.chain_depth > 0:
                    depth = self.chain_depth
                else:
                    depth = jax.random.randint(kd_i, (), 1, 4)
                aug = arr
                for step, k in enumerate(jax.random.split(kchain, max_depth)):
                    aug = chain_step(aug, k, step < depth)
                mix = mix + (1.0 - mix_weight) * m[i] * aug.astype(
                    jnp.float32
                )
            if jnp.issubdtype(orig_dtype, jnp.integer):
                mix = jnp.clip(jnp.round(mix), 0, 255)
            mix = mix.astype(orig_dtype)
            out.append(
                tv_tensors.wrap(mix, like=x)
                if isinstance(x, tv_tensors.TVTensor)
                else mix
            )
        return jax.tree_util.tree_unflatten(spec, out)

    def batched(self, imgs: jax.Array, key: jax.Array) -> jax.Array:
        """Per-sample AugMix on a uint8 batch [N,H,W,C] via the batched
        TPU engine: each of the ``mixture_width x max_depth`` chain steps
        is one engine application; steps beyond a sample's traced depth
        pass ``op_idx = -1`` (no mask matches -> exact copy). RNG draw
        structure mirrors the per-sample path: integer-op chains are
        bit-identical to ``vmap(__call__)`` with the same keys; float-
        blend color ops may differ by <=1 uint8 count under the default
        color bucketing (``color_bucket=0`` restores the exact path);
        Rotate samples within +-1 source pixel."""
        from vision_tpu.transforms.v2._batch_augment import (
            apply_ops_batched,
            max_shift_bound,
        )

        n, h, w, _ = imgs.shape
        space = self._augmentation_space(11, (h, w))
        names = list(space.keys())
        # magnitude bins are drawn in [0, severity); geometric tables
        # ascend, so bin severity-1 bounds the shifts
        bound = max_shift_bound(space, self.severity - 1, (h, w))
        width = self.mixture_width
        max_depth = self.chain_depth if self.chain_depth > 0 else 3

        def draws(k):
            kd, km = jax.random.split(k)
            mix_w = jax.random.beta(kd, self.alpha, self.alpha)
            mw = jax.random.dirichlet(
                km, jnp.array([self.alpha] * width, jnp.float32)
            )
            ops, bins, signs = [], [], []
            kk = k
            for _i in range(width):
                kk, kc = jax.random.split(kk)
                kd_i, kchain = jax.random.split(kc)
                if self.chain_depth > 0:
                    depth = self.chain_depth
                else:
                    depth = jax.random.randint(kd_i, (), 1, 4)
                for step, ks in enumerate(jax.random.split(kchain, max_depth)):
                    k1, k2, k3 = jax.random.split(ks, 3)
                    op = jax.random.randint(k1, (), 0, len(names))
                    b = jax.random.randint(k2, (), 0, self.severity)
                    sg = jnp.where(jax.random.uniform(k3) > 0.5, -1.0, 1.0)
                    ops.append(jnp.where(step < depth, op, -1))
                    bins.append(b)
                    signs.append(sg)
            return mix_w, mw, jnp.stack(ops), jnp.stack(bins), jnp.stack(signs)

        mix_w, mw, ops, bins, signs = jax.vmap(draws)(
            jax.random.split(key, n)
        )
        # ops/bins/signs: [N, width*max_depth] in chain-major order
        tabs = {
            name: (jnp.asarray(tab, jnp.float32) if tab.ndim > 0 else None,
                   signed)
            for name, (tab, signed) in space.items()
        }
        f = imgs.astype(jnp.float32)
        mw4 = mix_w[:, None, None, None]
        mix = mw4 * f
        for i in range(width):
            aug = imgs
            for step in range(max_depth):
                col = i * max_depth + step
                mags = {}
                for name, (tab, signed) in tabs.items():
                    if tab is None:
                        m = jnp.zeros((n,), jnp.float32)
                    else:
                        m = tab[jnp.minimum(bins[:, col], len(tab) - 1)]
                    mags[name] = m * signs[:, col] if signed else m
                aug = apply_ops_batched(
                    aug, ops[:, col], mags, names, bound,
                    interpolation=self.interpolation,
                )
            mix = mix + (1.0 - mw4) * mw[:, i, None, None, None] * aug.astype(
                jnp.float32
            )
        return jnp.clip(jnp.round(mix), 0, 255).astype(imgs.dtype)
