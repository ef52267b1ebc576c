"""Geometry class transforms (reference
``torchvision/transforms/v2/_geometry.py``, 1463 LoC): param sampling here,
math in ``functional._geometry``."""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import tv_tensors
from vision_tpu.transforms.v2 import functional as F
from vision_tpu.transforms.v2._transform import Transform, _RandomApplyTransform
from vision_tpu.transforms.v2.functional._geometry import (
    _compute_resized_output_size,
)
from vision_tpu.transforms.v2.functional._meta import get_size

__all__ = [
    "Resize",
    "CenterCrop",
    "RandomCrop",
    "RandomResizedCrop",
    "RandomHorizontalFlip",
    "RandomVerticalFlip",
    "Pad",
    "RandomRotation",
    "RandomAffine",
    "RandomPerspective",
    "ElasticTransform",
    "ScaleJitter",
    "RandomShortestSize",
    "RandomResize",
    "RandomZoomOut",
    "RandomIoUCrop",
    "FiveCrop",
    "TenCrop",
]


def _query_size(flat_inputs) -> Tuple[int, int]:
    for x in flat_inputs:
        if isinstance(
            x, (tv_tensors.Image, tv_tensors.Video, tv_tensors.Mask,
                tv_tensors.BoundingBoxes, tv_tensors.KeyPoints)
        ):
            return tuple(get_size(x))
        if isinstance(x, (jax.Array, np.ndarray)) and x.ndim >= 3:
            return (x.shape[-3], x.shape[-2])
    raise TypeError("no image/video/mask/boxes found to query size")


class Resize(Transform):
    """reference v2 Resize."""

    def __init__(self, size, interpolation="bilinear", max_size=None, antialias=True):
        super().__init__()
        self.size = size
        self.interpolation = interpolation
        self.max_size = max_size
        self.antialias = antialias

    def transform(self, inpt, params):
        return F.resize(
            inpt, self.size, self.interpolation, self.max_size, self.antialias
        )


class CenterCrop(Transform):
    def __init__(self, size):
        super().__init__()
        self.size = size

    def transform(self, inpt, params):
        return F.center_crop(inpt, self.size)


class RandomHorizontalFlip(_RandomApplyTransform):
    """Horizontal flip with probability ``p``.

    ``keypoint_flip_indices`` (e.g. the 17-entry COCO-person left/right
    map) re-indexes KeyPoints rows after mirroring so chiral joints swap —
    mirroring alone would label a flipped person's left shoulder as
    "right_shoulder" (reference keypoint recipe:
    ``references/detection/transforms.py`` ``_flip_coco_person_keypoints``).
    """

    def __init__(
        self,
        p: float = 0.5,
        keypoint_flip_indices: Optional[Sequence[int]] = None,
    ):
        super().__init__(p)
        self.keypoint_flip_indices = (
            None
            if keypoint_flip_indices is None
            else tuple(int(i) for i in keypoint_flip_indices)
        )

    def transform(self, inpt, params):
        out = F.horizontal_flip(inpt)
        if self.keypoint_flip_indices is not None and isinstance(
            out, tv_tensors.KeyPoints
        ):
            idx = np.asarray(self.keypoint_flip_indices)
            out = tv_tensors.KeyPoints(
                out.data[..., idx, :], canvas_size=out.canvas_size
            )
        return out


class RandomVerticalFlip(_RandomApplyTransform):
    def transform(self, inpt, params):
        return F.vertical_flip(inpt)


class Pad(Transform):
    def __init__(self, padding, fill=0, padding_mode="constant"):
        super().__init__()
        self.padding = padding
        self.fill = fill
        self.padding_mode = padding_mode

    def transform(self, inpt, params):
        return F.pad(inpt, self.padding, self.fill, self.padding_mode)


class RandomCrop(Transform):
    """reference v2 RandomCrop incl. padding / pad_if_needed."""

    def __init__(
        self,
        size,
        padding=None,
        pad_if_needed: bool = False,
        fill=0,
        padding_mode: str = "constant",
    ):
        super().__init__()
        if isinstance(size, int):
            size = (size, size)
        self.size = tuple(size)
        self.padding = padding
        self.pad_if_needed = pad_if_needed
        self.fill = fill
        self.padding_mode = padding_mode

    def make_params(self, flat_inputs, key):
        h, w = _query_size(flat_inputs)
        if self.padding is not None:
            from vision_tpu.transforms.v2.functional._geometry import _parse_pad

            left, top, right, bottom = _parse_pad(self.padding)
            h, w = h + top + bottom, w + left + right
        th, tw = self.size
        pad_extra = [0, 0, 0, 0]  # l, t, r, b
        if self.pad_if_needed:
            if w < tw:
                pad_extra[0] = pad_extra[2] = tw - w
                w = w + 2 * (tw - w)
            if h < th:
                pad_extra[1] = pad_extra[3] = th - h
                h = h + 2 * (th - h)
        if h < th or w < tw:
            raise ValueError(f"crop size {self.size} larger than input ({h}, {w})")
        k1, k2 = jax.random.split(key)
        top = int(jax.random.randint(k1, (), 0, h - th + 1))
        left = int(jax.random.randint(k2, (), 0, w - tw + 1))
        return dict(top=top, left=left, pad_extra=pad_extra)

    def transform(self, inpt, params):
        out = inpt
        if self.padding is not None:
            out = F.pad(out, self.padding, self.fill, self.padding_mode)
        if any(params["pad_extra"]):
            out = F.pad(out, params["pad_extra"], self.fill, self.padding_mode)
        return F.crop(out, params["top"], params["left"], *self.size)


class RandomResizedCrop(Transform):
    """reference v2 RandomResizedCrop: sample area + log-uniform ratio,
    10 attempts, center-crop fallback."""

    def __init__(
        self,
        size,
        scale=(0.08, 1.0),
        ratio=(3.0 / 4.0, 4.0 / 3.0),
        interpolation="bilinear",
        antialias=True,
    ):
        super().__init__()
        if isinstance(size, int):
            size = (size, size)
        self.size = tuple(size)
        self.scale = scale
        self.ratio = ratio
        self.interpolation = interpolation
        self.antialias = antialias

    def make_params(self, flat_inputs, key):
        height, width = _query_size(flat_inputs)
        area = height * width
        log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        if isinstance(key, jax.core.Tracer):
            # under jit: vectorized rejection sampling with traced params
            # (static OUTPUT size; the crop rect stays a traced quantity and
            # the resample becomes a coordinate gather in transform())
            return self._make_params_traced(height, width, key)
        keys = jax.random.split(key, 10)
        for k in keys:
            k1, k2, k3, k4 = jax.random.split(k, 4)
            target_area = area * float(
                jax.random.uniform(k1, minval=self.scale[0], maxval=self.scale[1])
            )
            aspect = math.exp(
                float(jax.random.uniform(k2, minval=log_ratio[0], maxval=log_ratio[1]))
            )
            w = int(round(math.sqrt(target_area * aspect)))
            h = int(round(math.sqrt(target_area / aspect)))
            if 0 < w <= width and 0 < h <= height:
                top = int(jax.random.randint(k3, (), 0, height - h + 1))
                left = int(jax.random.randint(k4, (), 0, width - w + 1))
                return dict(top=top, left=left, height=h, width=w)
        # fallback: center crop at in-range aspect
        in_ratio = width / height
        if in_ratio < self.ratio[0]:
            w, h = width, int(round(width / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            h, w = height, int(round(height * self.ratio[1]))
        else:
            w, h = width, height
        top = (height - h) // 2
        left = (width - w) // 2
        return dict(top=top, left=left, height=h, width=w)

    def _make_params_traced(self, height, width, key):
        import jax.numpy as jnp

        log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        k1, k2, k3, k4 = jax.random.split(key, 4)
        u_scale = jax.random.uniform(
            k1, (10,), minval=self.scale[0], maxval=self.scale[1]
        )
        aspect = jnp.exp(
            jax.random.uniform(k2, (10,), minval=log_ratio[0], maxval=log_ratio[1])
        )
        target_area = height * width * u_scale
        ws = jnp.round(jnp.sqrt(target_area * aspect))
        hs = jnp.round(jnp.sqrt(target_area / aspect))
        valid = (ws > 0) & (ws <= width) & (hs > 0) & (hs <= height)
        idx = jnp.argmax(valid)  # first accepted candidate
        # center-crop fallback at an in-range aspect (mirrors the eager path)
        in_ratio = width / height
        if in_ratio < self.ratio[0]:
            fw, fh = width, round(width / self.ratio[0])
        elif in_ratio > self.ratio[1]:
            fh, fw = height, round(height * self.ratio[1])
        else:
            fw, fh = width, height
        any_valid = valid.any()
        w = jnp.where(any_valid, ws[idx], float(fw))
        h = jnp.where(any_valid, hs[idx], float(fh))
        top_rand = jnp.floor(
            jax.random.uniform(k3) * (height - h + 1.0)
        )
        left_rand = jnp.floor(jax.random.uniform(k4) * (width - w + 1.0))
        top = jnp.where(any_valid, top_rand, (height - h) // 2)
        left = jnp.where(any_valid, left_rand, (width - w) // 2)
        return dict(top=top, left=left, height=h, width=w)

    def transform(self, inpt, params):
        if isinstance(params["height"], jax.core.Tracer):
            return F.resized_crop_dynamic(
                inpt,
                params["top"],
                params["left"],
                params["height"],
                params["width"],
                self.size,
            )
        return F.resized_crop(
            inpt,
            params["top"],
            params["left"],
            params["height"],
            params["width"],
            self.size,
            self.interpolation,
            self.antialias,
        )

    def batched(self, imgs: jax.Array, key: jax.Array, flip_p=None):
        """Whole-batch RandomResizedCrop (+ optional fused horizontal
        flip) on the MXU — the production ``--device-augment`` form.

        Mirrors the RNG draw structure of the vmapped per-sample path:
        with ``flip_p=None`` each sample's key feeds
        ``_make_params_traced`` directly (``vmap(self)(imgs, keys)``
        parity); with ``flip_p`` set it reproduces
        ``Compose([self, RandomHorizontalFlip(p=flip_p)])`` — the
        Compose-level 2-way split, then the flip's gate/params split —
        so draws are bit-identical to that pipeline. The resample runs
        as two batched einsums (``F.resized_crop_flip_batch``), ~7x the
        vmapped gather path at 128x256x256 on v5e; pixels match it to
        f32 accumulation order (<=1 uint8 count at round boundaries).
        Like the vmapped jit path this skips antialiasing (kernel widths
        would be data-dependent)."""
        n, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]

        def draw(k):
            if flip_p is None:
                p = self._make_params_traced(h, w, k)
                return p, jnp.bool_(False)
            k_rrc, k_flip = jax.random.split(k)
            p = self._make_params_traced(h, w, k_rrc)
            gate, _params = jax.random.split(k_flip)
            return p, jax.random.uniform(gate) < flip_p

        params, flip = jax.vmap(draw)(jax.random.split(key, n))
        return F.resized_crop_flip_batch(
            imgs,
            params["top"],
            params["left"],
            params["height"],
            params["width"],
            self.size,
            flip=None if flip_p is None else flip,
        )


def _setup_range(value, name, center=0.0):
    if isinstance(value, (int, float)):
        if value < 0:
            raise ValueError(f"{name} must be non-negative if scalar")
        return (center - value, center + value)
    return tuple(float(v) for v in value)


class RandomRotation(Transform):
    def __init__(
        self, degrees, interpolation="nearest", expand=False, center=None, fill=0
    ):
        super().__init__()
        self.degrees = _setup_range(degrees, "degrees")
        self.interpolation = interpolation
        self.expand = expand
        self.center = center
        self.fill = fill

    def make_params(self, flat_inputs, key):
        angle = float(
            jax.random.uniform(key, minval=self.degrees[0], maxval=self.degrees[1])
        )
        return dict(angle=angle)

    def transform(self, inpt, params):
        return F.rotate(
            inpt,
            params["angle"],
            self.interpolation,
            self.expand,
            self.center,
            self.fill,
        )


class RandomAffine(Transform):
    def __init__(
        self,
        degrees,
        translate=None,
        scale=None,
        shear=None,
        interpolation="nearest",
        fill=0,
        center=None,
    ):
        super().__init__()
        self.degrees = _setup_range(degrees, "degrees")
        self.translate = translate
        self.scale_range = scale
        self.shear = shear
        self.interpolation = interpolation
        self.fill = fill
        self.center = center

    def make_params(self, flat_inputs, key):
        height, width = _query_size(flat_inputs)
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        angle = float(
            jax.random.uniform(k1, minval=self.degrees[0], maxval=self.degrees[1])
        )
        if self.translate is not None:
            max_dx = self.translate[0] * width
            max_dy = self.translate[1] * height
            tx = int(round(float(jax.random.uniform(k2, minval=-max_dx, maxval=max_dx))))
            ty = int(round(float(jax.random.uniform(k3, minval=-max_dy, maxval=max_dy))))
            translations = [tx, ty]
        else:
            translations = [0, 0]
        if self.scale_range is not None:
            scale = float(
                jax.random.uniform(
                    k4, minval=self.scale_range[0], maxval=self.scale_range[1]
                )
            )
        else:
            scale = 1.0
        shear_x = shear_y = 0.0
        if self.shear is not None:
            shear = self.shear
            if isinstance(shear, (int, float)):
                shear = (-shear, shear)
            shear_x = float(jax.random.uniform(k5, minval=shear[0], maxval=shear[1]))
            if len(shear) == 4:
                shear_y = float(
                    jax.random.uniform(k6, minval=shear[2], maxval=shear[3])
                )
        return dict(
            angle=angle, translate=translations, scale=scale, shear=[shear_x, shear_y]
        )

    def transform(self, inpt, params):
        return F.affine(
            inpt,
            params["angle"],
            params["translate"],
            params["scale"],
            params["shear"],
            self.interpolation,
            self.fill,
            self.center,
        )


class RandomPerspective(_RandomApplyTransform):
    def __init__(self, distortion_scale=0.5, p=0.5, interpolation="bilinear", fill=0):
        super().__init__(p=p)
        if not 0 <= distortion_scale <= 1:
            raise ValueError("distortion_scale must be in [0, 1]")
        self.distortion_scale = distortion_scale
        self.interpolation = interpolation
        self.fill = fill

    def make_params(self, flat_inputs, key):
        height, width = _query_size(flat_inputs)
        d = self.distortion_scale
        half_h, half_w = height // 2, width // 2
        bound_h = int(d * half_h) + 1
        bound_w = int(d * half_w) + 1
        ks = jax.random.split(key, 8)

        def ri(k, n):
            return int(jax.random.randint(k, (), 0, n))

        topleft = [ri(ks[0], bound_w), ri(ks[1], bound_h)]
        topright = [width - ri(ks[2], bound_w) - 1, ri(ks[3], bound_h)]
        botright = [width - ri(ks[4], bound_w) - 1, height - ri(ks[5], bound_h) - 1]
        botleft = [ri(ks[6], bound_w), height - ri(ks[7], bound_h) - 1]
        startpoints = [[0, 0], [width - 1, 0], [width - 1, height - 1], [0, height - 1]]
        endpoints = [topleft, topright, botright, botleft]
        return dict(startpoints=startpoints, endpoints=endpoints)

    def transform(self, inpt, params):
        return F.perspective(
            inpt,
            params["startpoints"],
            params["endpoints"],
            self.interpolation,
            self.fill,
        )


class ElasticTransform(Transform):
    """reference v2 ElasticTransform: smoothed random displacement field."""

    def __init__(self, alpha=50.0, sigma=5.0, interpolation="bilinear", fill=0):
        super().__init__()
        self.alpha = (alpha, alpha) if isinstance(alpha, (int, float)) else tuple(alpha)
        self.sigma = (sigma, sigma) if isinstance(sigma, (int, float)) else tuple(sigma)
        self.interpolation = interpolation
        self.fill = fill

    def make_params(self, flat_inputs, key):
        size = _query_size(flat_inputs)
        h, w = size
        kx, ky = jax.random.split(key)
        dx = jax.random.uniform(kx, (1, h, w, 1), minval=-1.0, maxval=1.0)
        dy = jax.random.uniform(ky, (1, h, w, 1), minval=-1.0, maxval=1.0)
        if self.sigma[0] > 0.0:
            ksx = int(8 * self.sigma[0] + 1)
            ksx += 1 - ksx % 2
            dx = F.gaussian_blur_image(dx, ksx, self.sigma[0])
        if self.sigma[1] > 0.0:
            ksy = int(8 * self.sigma[1] + 1)
            ksy += 1 - ksy % 2
            dy = F.gaussian_blur_image(dy, ksy, self.sigma[1])
        dx = dx * self.alpha[0] / w
        dy = dy * self.alpha[1] / h
        displacement = jnp.concatenate([dx, dy], axis=-1)  # (1, H, W, 2)
        return dict(displacement=displacement)

    def transform(self, inpt, params):
        return F.elastic(
            inpt, params["displacement"], self.interpolation, self.fill
        )


class ScaleJitter(Transform):
    """reference v2 ScaleJitter (detection training)."""

    def __init__(
        self, target_size, scale_range=(0.1, 2.0), interpolation="bilinear",
        antialias=True,
    ):
        super().__init__()
        self.target_size = target_size
        self.scale_range = scale_range
        self.interpolation = interpolation
        self.antialias = antialias

    def make_params(self, flat_inputs, key):
        orig_h, orig_w = _query_size(flat_inputs)
        scale = self.scale_range[0] + float(jax.random.uniform(key)) * (
            self.scale_range[1] - self.scale_range[0]
        )
        r = (
            min(self.target_size[1] / orig_h, self.target_size[0] / orig_w)
            * scale
        )
        return dict(size=(int(orig_h * r), int(orig_w * r)))

    def transform(self, inpt, params):
        return F.resize(
            inpt, params["size"], self.interpolation, antialias=self.antialias
        )


class RandomShortestSize(Transform):
    """reference v2 RandomShortestSize."""

    def __init__(
        self, min_size, max_size=None, interpolation="bilinear", antialias=True
    ):
        super().__init__()
        self.min_size = [min_size] if isinstance(min_size, int) else list(min_size)
        self.max_size = max_size
        self.interpolation = interpolation
        self.antialias = antialias

    def make_params(self, flat_inputs, key):
        orig_h, orig_w = _query_size(flat_inputs)
        min_size = self.min_size[
            int(jax.random.randint(key, (), 0, len(self.min_size)))
        ]
        r = min_size / min(orig_h, orig_w)
        if self.max_size is not None:
            r = min(r, self.max_size / max(orig_h, orig_w))
        return dict(size=(int(orig_h * r), int(orig_w * r)))

    def transform(self, inpt, params):
        return F.resize(
            inpt, params["size"], self.interpolation, antialias=self.antialias
        )


class RandomResize(Transform):
    """reference v2 RandomResize: uniform square-ish resize."""

    def __init__(
        self, min_size: int, max_size: int, interpolation="bilinear", antialias=True
    ):
        super().__init__()
        self.min_size = min_size
        self.max_size = max_size
        self.interpolation = interpolation
        self.antialias = antialias

    def make_params(self, flat_inputs, key):
        size = int(jax.random.randint(key, (), self.min_size, self.max_size))
        return dict(size=[size])

    def transform(self, inpt, params):
        return F.resize(
            inpt, params["size"], self.interpolation, antialias=self.antialias
        )


class RandomZoomOut(_RandomApplyTransform):
    """reference v2 RandomZoomOut: place the image on a larger canvas."""

    def __init__(self, fill=0, side_range=(1.0, 4.0), p=0.5):
        super().__init__(p=p)
        self.fill = fill
        self.side_range = side_range
        if side_range[0] < 1.0 or side_range[0] > side_range[1]:
            raise ValueError(f"invalid side range {side_range}")

    def make_params(self, flat_inputs, key):
        orig_h, orig_w = _query_size(flat_inputs)
        k1, k2, k3 = jax.random.split(key, 3)
        r = self.side_range[0] + float(jax.random.uniform(k1)) * (
            self.side_range[1] - self.side_range[0]
        )
        canvas_width = int(orig_w * r)
        canvas_height = int(orig_h * r)
        lr = float(jax.random.uniform(k2))
        left = int(lr * (canvas_width - orig_w))
        right = canvas_width - (left + orig_w)
        tb = float(jax.random.uniform(k3))
        top = int(tb * (canvas_height - orig_h))
        bottom = canvas_height - (top + orig_h)
        return dict(padding=[left, top, right, bottom])

    def transform(self, inpt, params):
        return F.pad(inpt, params["padding"], self.fill)


class RandomIoUCrop(Transform):
    """SSD-style IoU crop (reference v2 RandomIoUCrop). Requires boxes in
    the sample; apply SanitizeBoundingBoxes afterwards (like the
    reference)."""

    def __init__(
        self,
        min_scale: float = 0.3,
        max_scale: float = 1.0,
        min_aspect_ratio: float = 0.5,
        max_aspect_ratio: float = 2.0,
        sampler_options: Optional[List[float]] = None,
        trials: int = 40,
    ):
        super().__init__()
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.min_aspect_ratio = min_aspect_ratio
        self.max_aspect_ratio = max_aspect_ratio
        self.options = sampler_options or [0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 1.0]
        self.trials = trials

    def make_params(self, flat_inputs, key):
        from vision_tpu.ops.boxes import box_iou

        orig_h, orig_w = _query_size(flat_inputs)
        boxes = next(
            (x for x in flat_inputs if isinstance(x, tv_tensors.BoundingBoxes)), None
        )
        if boxes is None:
            return dict()  # no-op

        xyxy = np.asarray(
            F.convert_bounding_box_format(boxes, new_format="XYXY").data
        )
        while True:
            key, kidx = jax.random.split(key)
            idx = int(jax.random.randint(kidx, (), 0, len(self.options)))
            min_jaccard_overlap = self.options[idx]
            if min_jaccard_overlap >= 1.0:
                return dict()
            for _ in range(self.trials):
                key, k1, k2, k3, k4 = jax.random.split(key, 5)
                r = self.min_scale + float(jax.random.uniform(k1)) * (
                    self.max_scale - self.min_scale
                )
                new_w = int(orig_w * r)
                new_h = int(orig_h * r)
                aspect_ratio = new_w / max(new_h, 1)
                if not (
                    self.min_aspect_ratio <= aspect_ratio <= self.max_aspect_ratio
                ):
                    continue
                left = int(float(jax.random.uniform(k2)) * (orig_w - new_w))
                top = int(float(jax.random.uniform(k3)) * (orig_h - new_h))
                right, bottom = left + new_w, top + new_h
                cx = 0.5 * (xyxy[:, 0] + xyxy[:, 2])
                cy = 0.5 * (xyxy[:, 1] + xyxy[:, 3])
                is_within = (
                    (left < cx) & (cx < right) & (top < cy) & (cy < bottom)
                )
                if not is_within.any():
                    continue
                crop_box = jnp.asarray([[left, top, right, bottom]], jnp.float32)
                ious = np.asarray(box_iou(crop_box, jnp.asarray(xyxy[is_within])))
                if ious.max() < min_jaccard_overlap:
                    continue
                return dict(
                    top=top, left=left, height=new_h, width=new_w,
                    is_within_crop_area=jnp.asarray(is_within),
                )

    def transform(self, inpt, params):
        if not params:
            return inpt
        out = F.crop(inpt, params["top"], params["left"], params["height"], params["width"])
        return out


class FiveCrop(Transform):
    """Returns a 5-tuple (reference v2 FiveCrop). Only image-like inputs."""

    _transformed_types = (tv_tensors.Image, tv_tensors.Video, jax.Array, np.ndarray)

    def __init__(self, size):
        super().__init__()
        self.size = size

    def transform(self, inpt, params):
        return F.five_crop(inpt, self.size)


class TenCrop(Transform):
    _transformed_types = (tv_tensors.Image, tv_tensors.Video, jax.Array, np.ndarray)

    def __init__(self, size, vertical_flip=False):
        super().__init__()
        self.size = size
        self.vertical_flip = vertical_flip

    def transform(self, inpt, params):
        return F.ten_crop(inpt, self.size, self.vertical_flip)
