"""Misc class transforms (reference
``torchvision/transforms/v2/_misc.py``, 570 LoC)."""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import tv_tensors
from vision_tpu.transforms.v2 import functional as F
from vision_tpu.transforms.v2._transform import Transform

__all__ = [
    "Identity",
    "Lambda",
    "LinearTransformation",
    "Normalize",
    "ToDtype",
    "ConvertBoundingBoxFormat",
    "ClampBoundingBoxes",
    "ClampKeyPoints",
    "SanitizeBoundingBoxes",
    "SanitizeKeyPoints",
    "SetClampingMode",
]

_IMG_TYPES = (tv_tensors.Image, tv_tensors.Video, jax.Array, np.ndarray)


class Identity(Transform):
    def transform(self, inpt, params):
        return inpt


class Lambda(Transform):
    def __init__(self, lambd: Callable, *types):
        super().__init__()
        self.lambd = lambd
        if types:
            self._transformed_types = types

    def transform(self, inpt, params):
        return self.lambd(inpt)


class LinearTransformation(Transform):
    """Whitening transform (reference v2 LinearTransformation)."""

    _transformed_types = _IMG_TYPES

    def __init__(self, transformation_matrix, mean_vector):
        super().__init__()
        self.transformation_matrix = jnp.asarray(transformation_matrix)
        self.mean_vector = jnp.asarray(mean_vector)
        d = self.transformation_matrix.shape[0]
        if self.transformation_matrix.shape != (d, d):
            raise ValueError("transformation_matrix must be square")
        if self.mean_vector.shape != (d,):
            raise ValueError("mean_vector size must match matrix")

    def transform(self, inpt, params):
        arr = inpt.data if isinstance(inpt, tv_tensors.TVTensor) else inpt
        shape = arr.shape
        n = int(np.prod(shape[-3:]))
        if n != self.transformation_matrix.shape[0]:
            raise ValueError(
                f"input flat size {n} != matrix dim "
                f"{self.transformation_matrix.shape[0]}"
            )
        flat = arr.reshape(-1, n) - self.mean_vector
        out = (flat @ self.transformation_matrix).reshape(shape)
        if isinstance(inpt, tv_tensors.TVTensor):
            return tv_tensors.wrap(out, like=inpt)
        return out


class Normalize(Transform):
    _transformed_types = _IMG_TYPES

    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        super().__init__()
        self.mean = list(mean)
        self.std = list(std)

    def transform(self, inpt, params):
        return F.normalize(inpt, self.mean, self.std)


class ToDtype(Transform):
    """reference v2 ToDtype: dtype can be a single dtype (applies to
    image-like leaves) or a dict keyed by type."""

    def __init__(self, dtype, scale: bool = False):
        super().__init__()
        self.dtype = dtype
        self.scale = scale

    def transform(self, inpt, params):
        if isinstance(self.dtype, dict):
            for cls, dt in self.dtype.items():
                if cls == "others":
                    continue
                if isinstance(inpt, cls):
                    if dt is None:
                        return inpt
                    return F.to_dtype(inpt, dt, self.scale)
            dt = self.dtype.get("others")
            return inpt if dt is None else F.to_dtype(inpt, dt, self.scale)
        if isinstance(
            inpt, (tv_tensors.Image, tv_tensors.Video)
        ) or not isinstance(inpt, tv_tensors.TVTensor):
            return F.to_dtype(inpt, self.dtype, self.scale)
        return inpt  # boxes/masks keep their dtype unless dict says otherwise


class ConvertBoundingBoxFormat(Transform):
    _transformed_types = (tv_tensors.BoundingBoxes,)

    def __init__(self, format):
        super().__init__()
        self.format = format

    def transform(self, inpt, params):
        return F.convert_bounding_box_format(inpt, new_format=self.format)


class ClampBoundingBoxes(Transform):
    _transformed_types = (tv_tensors.BoundingBoxes,)

    def __init__(self, clamping_mode: str = "auto"):
        super().__init__()
        self.clamping_mode = clamping_mode

    def transform(self, inpt, params):
        return F.clamp_bounding_boxes(inpt, clamping_mode=self.clamping_mode)


class ClampKeyPoints(Transform):
    _transformed_types = (tv_tensors.KeyPoints,)

    def transform(self, inpt, params):
        return F.clamp_keypoints(inpt)


class SanitizeBoundingBoxes(Transform):
    """Remove degenerate boxes and their labels (reference v2
    SanitizeBoundingBoxes).

    TPU note: this runs on host (numpy indexing) because the output size is
    data-dependent; it belongs to the input pipeline, not the jitted step.
    """

    def __init__(
        self,
        min_size: float = 1.0,
        min_area: float = 1.0,
        labels_getter: Union[Callable, str, None] = "default",
    ):
        super().__init__()
        self.min_size = min_size
        self.min_area = min_area
        self.labels_getter = labels_getter

    def _get_labels(self, sample):
        if callable(self.labels_getter):
            return self.labels_getter(sample)
        if self.labels_getter == "default":
            if isinstance(sample, dict) and "labels" in sample:
                return sample["labels"]
            if (
                isinstance(sample, (list, tuple))
                and len(sample) == 2
                and isinstance(sample[1], dict)
                and "labels" in sample[1]
            ):
                return sample[1]["labels"]
        return None

    def __call__(self, *inputs, key=None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        labels = self._get_labels(sample)

        boxes = None
        flat, spec = jax.tree_util.tree_flatten(
            sample, is_leaf=lambda x: isinstance(x, tv_tensors.TVTensor)
        )
        for x in flat:
            if isinstance(x, tv_tensors.BoundingBoxes):
                boxes = x
                break
        if boxes is None:
            return sample
        _, valid = F.sanitize_bounding_boxes(
            boxes, min_size=self.min_size, min_area=self.min_area
        )
        valid = np.asarray(valid)

        def fixup(x):
            if isinstance(x, tv_tensors.BoundingBoxes):
                return tv_tensors.wrap(x.data[valid], like=x)
            if labels is not None and x is labels:
                return x[valid]
            if isinstance(x, tv_tensors.Mask) and x.shape[0] == len(valid):
                return tv_tensors.Mask(x.data[valid])
            if isinstance(x, tv_tensors.KeyPoints) and x.shape[0] == len(valid):
                return tv_tensors.KeyPoints(x.data[valid], canvas_size=x.canvas_size)
            return x

        flat_out = [fixup(x) for x in flat]
        return jax.tree_util.tree_unflatten(spec, flat_out)


class SanitizeKeyPoints(Transform):
    """Remove keypoints (or whole keypoint groups) outside the canvas and
    their labels (reference v2 ``_misc.py:483`` SanitizeKeyPoints).

    Host-side like SanitizeBoundingBoxes: output size is data-dependent,
    so it belongs to the input pipeline, not the jitted step."""

    def __init__(self, labels_getter: Union[Callable, str, None] = None):
        super().__init__()
        self.labels_getter = labels_getter

    def _get_labels(self, sample):
        if callable(self.labels_getter):
            return self.labels_getter(sample)
        if self.labels_getter == "default":
            if isinstance(sample, dict) and "labels" in sample:
                return sample["labels"]
            if (
                isinstance(sample, (list, tuple))
                and len(sample) == 2
                and isinstance(sample[1], dict)
                and "labels" in sample[1]
            ):
                return sample[1]["labels"]
        return None

    def __call__(self, *inputs, key=None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        labels = self._get_labels(sample)
        flat, spec = jax.tree_util.tree_flatten(
            sample, is_leaf=lambda x: isinstance(x, tv_tensors.TVTensor)
        )
        kps = next(
            (x for x in flat if isinstance(x, tv_tensors.KeyPoints)), None
        )
        if kps is None:
            return sample
        h, w = kps.canvas_size
        pts = np.asarray(kps.data)
        inside = (
            (pts[..., 0] >= 0) & (pts[..., 0] < w)
            & (pts[..., 1] >= 0) & (pts[..., 1] < h)
        )
        # groups (ndim > 2): drop a group only if ANY member is outside
        valid = inside.reshape(inside.shape[0], -1).all(axis=-1)

        def fixup(x):
            if isinstance(x, tv_tensors.KeyPoints) and x.shape[0] == len(valid):
                return tv_tensors.KeyPoints(
                    x.data[valid], canvas_size=x.canvas_size
                )
            if labels is not None and x is labels:
                return x[valid]
            return x

        return jax.tree_util.tree_unflatten(spec, [fixup(x) for x in flat])


class SetClampingMode(Transform):
    """Set ``clamping_mode`` on bounding boxes for downstream transforms
    (reference v2 ``_meta.py:58``)."""

    _transformed_types = (tv_tensors.BoundingBoxes,)

    def __init__(self, clamping_mode):
        super().__init__()
        if clamping_mode not in (None, "soft", "hard"):
            raise ValueError(
                f"clamping_mode must be soft, hard or None, got {clamping_mode}"
            )
        self.clamping_mode = clamping_mode

    def transform(self, inpt, params):
        return tv_tensors.BoundingBoxes(
            inpt.data, format=inpt.format, canvas_size=inpt.canvas_size,
            clamping_mode=self.clamping_mode,
        )
