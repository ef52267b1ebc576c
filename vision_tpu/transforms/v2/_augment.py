"""Augmentation class transforms (reference
``torchvision/transforms/v2/_augment.py``, 372 LoC): RandomErasing,
MixUp/CutMix (batch-level), JPEG."""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import tv_tensors
from vision_tpu.transforms.v2 import functional as F
from vision_tpu.transforms.v2._transform import Transform, _RandomApplyTransform

__all__ = ["RandomErasing", "MixUp", "CutMix", "JPEG"]

_IMG_TYPES = (tv_tensors.Image, tv_tensors.Video, jax.Array, np.ndarray)


class RandomErasing(_RandomApplyTransform):
    """reference v2 RandomErasing (``_augment.py:18``)."""

    _transformed_types = _IMG_TYPES

    def __init__(
        self,
        p: float = 0.5,
        scale=(0.02, 0.33),
        ratio=(0.3, 3.3),
        value=0.0,
        inplace: bool = False,
    ):
        super().__init__(p=p)
        if scale[0] > scale[1] or ratio[0] > ratio[1]:
            raise ValueError("scale/ratio must be ordered ranges")
        self.scale = scale
        self.ratio = ratio
        self.value = value

    def make_params(self, flat_inputs, key):
        from vision_tpu.transforms.v2._geometry import _query_size

        img_h, img_w = _query_size(flat_inputs)
        num_channels = 3
        for x in flat_inputs:
            if isinstance(x, (jax.Array, np.ndarray)) and x.ndim >= 3:
                num_channels = x.shape[-1]
                break
        area = img_h * img_w
        log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        if isinstance(key, jax.core.Tracer):
            return self._make_params_traced(
                img_h, img_w, num_channels, key
            )
        for k in jax.random.split(key, 10):
            k1, k2, k3, k4, k5 = jax.random.split(k, 5)
            erase_area = (
                area
                * float(
                    jax.random.uniform(k1, minval=self.scale[0], maxval=self.scale[1])
                )
            )
            aspect = math.exp(
                float(jax.random.uniform(k2, minval=log_ratio[0], maxval=log_ratio[1]))
            )
            h = int(round(math.sqrt(erase_area * aspect)))
            w = int(round(math.sqrt(erase_area / aspect)))
            if not (h < img_h and w < img_w):
                continue
            if self.value is None:
                v = jax.random.normal(k3, (h, w, num_channels))
            else:
                if isinstance(self.value, (list, tuple)):
                    v = jnp.broadcast_to(
                        jnp.asarray(self.value, jnp.float32), (h, w, num_channels)
                    )
                else:
                    v = jnp.full((h, w, num_channels), float(self.value))
            i = int(jax.random.randint(k4, (), 0, img_h - h + 1))
            j = int(jax.random.randint(k5, (), 0, img_w - w + 1))
            return dict(i=i, j=j, h=h, w=w, v=v)
        return dict(i=0, j=0, h=0, w=0, v=None)

    def _make_params_traced(self, img_h, img_w, num_channels, key):
        """Traced erase box (jitted pipelines): vectorized rejection like
        the eager loop; the fill is materialized at FULL image size and
        applied as a rectangle mask in transform()."""
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        u = jax.random.uniform(
            k1, (10,), minval=self.scale[0], maxval=self.scale[1]
        )
        aspect = jnp.exp(
            jax.random.uniform(k2, (10,), minval=log_ratio[0],
                               maxval=log_ratio[1])
        )
        area = img_h * img_w
        hs = jnp.round(jnp.sqrt(area * u * aspect))
        ws = jnp.round(jnp.sqrt(area * u / aspect))
        valid = (hs < img_h) & (ws < img_w)
        idx = jnp.argmax(valid)
        any_valid = valid.any()
        h = jnp.where(any_valid, hs[idx], 0.0)
        w = jnp.where(any_valid, ws[idx], 0.0)
        i = jnp.floor(jax.random.uniform(k4) * (img_h - h + 1.0))
        j = jnp.floor(jax.random.uniform(k5) * (img_w - w + 1.0))
        if self.value is None:
            v = jax.random.normal(k3, (img_h, img_w, num_channels))
        elif isinstance(self.value, (list, tuple)):
            v = jnp.broadcast_to(
                jnp.asarray(self.value, jnp.float32),
                (img_h, img_w, num_channels),
            )
        else:
            v = jnp.full(
                (img_h, img_w, num_channels), float(self.value)
            )
        return dict(i=i, j=j, h=h, w=w, v=v, traced=True)

    def transform(self, inpt, params):
        if params.get("traced"):
            img = inpt.data if hasattr(inpt, "data") else inpt
            rows = jnp.arange(img.shape[-3], dtype=jnp.float32)
            cols = jnp.arange(img.shape[-2], dtype=jnp.float32)
            in_r = (rows >= params["i"]) & (rows < params["i"] + params["h"])
            in_c = (cols >= params["j"]) & (cols < params["j"] + params["w"])
            mask = (in_r[:, None] & in_c[None, :])[..., None]
            out = jnp.where(mask, params["v"].astype(img.dtype), img)
            from vision_tpu import tv_tensors as _tt

            if isinstance(inpt, _tt.TVTensor):
                return _tt.wrap(out, like=inpt)
            return out
        if params["v"] is None or params["h"] == 0:
            return inpt
        return F.erase(
            inpt, params["i"], params["j"], params["h"], params["w"], params["v"]
        )


def _one_hot(labels: jax.Array, num_classes: int) -> jax.Array:
    if labels.ndim == 1:
        return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    return labels.astype(jnp.float32)


class _BaseMixUpCutMix(Transform):
    """reference ``_augment.py:143``: batch-level transforms over
    (images [N,H,W,C], labels [N] or [N,num_classes])."""

    def __init__(self, alpha: float = 1.0, num_classes: Optional[int] = None,
                 labels_getter="default"):
        super().__init__()
        self.alpha = float(alpha)
        self.num_classes = num_classes
        self.labels_getter = labels_getter

    def _get_labels(self, sample):
        if callable(self.labels_getter):
            return self.labels_getter(sample)
        if isinstance(sample, dict) and "labels" in sample:
            return sample["labels"]
        if isinstance(sample, (list, tuple)) and len(sample) == 2:
            return sample[1]
        raise ValueError("could not infer labels; pass labels_getter")

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        if key is None:
            key = self._next_key()
        labels = self._get_labels(sample)
        labels = jnp.asarray(labels)
        if labels.ndim == 1:
            if self.num_classes is None:
                raise ValueError("num_classes required for integer labels")
            labels = _one_hot(labels, self.num_classes)
        params = self._mix_params(sample, key)

        flat, spec = jax.tree_util.tree_flatten(
            sample, is_leaf=lambda x: isinstance(x, tv_tensors.TVTensor)
        )
        out = []
        replaced_labels = False
        for x in flat:
            if isinstance(x, (tv_tensors.Image, tv_tensors.Video)):
                out.append(tv_tensors.wrap(self._mix_image(x.data, params), like=x))
            elif (
                isinstance(x, (jax.Array, np.ndarray))
                and not isinstance(x, tv_tensors.TVTensor)
                and jnp.asarray(x).ndim >= 4
            ):
                out.append(self._mix_image(jnp.asarray(x), params))
            elif (
                isinstance(x, (jax.Array, np.ndarray))
                and not replaced_labels
                and jnp.asarray(x).ndim <= 2
            ):
                out.append(self._mix_label(labels, params))
                replaced_labels = True
            else:
                out.append(x)
        return jax.tree_util.tree_unflatten(spec, out)

    def _mix_label(self, labels, params):
        lam = params["lam_adjusted"]
        return labels * lam + jnp.roll(labels, 1, axis=0) * (1.0 - lam)


class MixUp(_BaseMixUpCutMix):
    """reference ``_augment.py:220``."""

    def _mix_params(self, sample, key):
        lam = jax.random.beta(key, self.alpha, self.alpha)
        if not isinstance(key, jax.core.Tracer):
            lam = float(lam)
        return dict(lam=lam, lam_adjusted=lam)

    def _mix_image(self, img, params):
        lam = params["lam"]
        mixed = img.astype(jnp.float32) * lam + jnp.roll(
            img.astype(jnp.float32), 1, axis=0
        ) * (1.0 - lam)
        return mixed.astype(img.dtype)


class CutMix(_BaseMixUpCutMix):
    """reference ``_augment.py:268``: paste a random box from the rolled
    batch; label weight = box area fraction."""

    def _mix_params(self, sample, key):
        flat, _ = jax.tree_util.tree_flatten(
            sample, is_leaf=lambda x: isinstance(x, tv_tensors.TVTensor)
        )
        from vision_tpu.transforms.v2._geometry import _query_size

        h, w = _query_size(flat)
        k1, k2, k3 = jax.random.split(key, 3)
        if isinstance(key, jax.core.Tracer):
            # traced: box corners stay arrays; the paste becomes a mask
            # select in _mix_image (static shapes)
            lam = jax.random.beta(k1, self.alpha, self.alpha)
            r_x = jax.random.randint(k2, (), 0, w)
            r_y = jax.random.randint(k3, (), 0, h)
            r = 0.5 * jnp.sqrt(1.0 - lam)
            r_w_half = jnp.floor(r * w).astype(jnp.int32)
            r_h_half = jnp.floor(r * h).astype(jnp.int32)
            x1 = jnp.maximum(r_x - r_w_half, 0)
            y1 = jnp.maximum(r_y - r_h_half, 0)
            x2 = jnp.minimum(r_x + r_w_half, w)
            y2 = jnp.minimum(r_y + r_h_half, h)
            lam_adjusted = 1.0 - ((x2 - x1) * (y2 - y1) / (w * h))
            return dict(
                box=(x1, y1, x2, y2), size=(h, w), lam_adjusted=lam_adjusted
            )
        lam = float(jax.random.beta(k1, self.alpha, self.alpha))
        r_x = int(jax.random.randint(k2, (), 0, w))
        r_y = int(jax.random.randint(k3, (), 0, h))
        r = 0.5 * math.sqrt(1.0 - lam)
        r_w_half = int(r * w)
        r_h_half = int(r * h)
        x1 = max(r_x - r_w_half, 0)
        y1 = max(r_y - r_h_half, 0)
        x2 = min(r_x + r_w_half, w)
        y2 = min(r_y + r_h_half, h)
        lam_adjusted = 1.0 - ((x2 - x1) * (y2 - y1) / (w * h))
        return dict(box=(x1, y1, x2, y2), size=(h, w), lam_adjusted=lam_adjusted)

    def _mix_image(self, img, params):
        x1, y1, x2, y2 = params["box"]
        rolled = jnp.roll(img, 1, axis=0)
        if isinstance(x1, jax.Array) and isinstance(
            params["lam_adjusted"], jax.core.Tracer
        ):
            h, w = params["size"]
            ys = jnp.arange(h)
            xs = jnp.arange(w)
            mask = ((ys >= y1) & (ys < y2))[:, None] & (
                (xs >= x1) & (xs < x2)
            )[None, :]
            return jnp.where(mask[..., None], rolled, img)
        return img.at[..., y1:y2, x1:x2, :].set(rolled[..., y1:y2, x1:x2, :])


class JPEG(Transform):
    """reference ``_augment.py:337``: random-quality JPEG round trip
    (host-side)."""

    _transformed_types = _IMG_TYPES

    def __init__(self, quality: Union[int, Sequence[int]]):
        super().__init__()
        if isinstance(quality, int):
            quality = [quality, quality]
        if not (1 <= quality[0] <= quality[1] <= 100):
            raise ValueError(f"quality must be in [1, 100], got {quality}")
        self.quality = quality

    def make_params(self, flat_inputs, key):
        q = int(jax.random.randint(key, (), self.quality[0], self.quality[1] + 1))
        return dict(quality=q)

    def transform(self, inpt, params):
        return F.jpeg(inpt, params["quality"])
