"""Query helpers over flattened transform inputs (reference
``torchvision/transforms/v2/_utils.py:156-240``)."""

from __future__ import annotations

from typing import Any, Callable, List, Tuple, Union

import jax
import numpy as np

from vision_tpu import tv_tensors

__all__ = [
    "check_type",
    "get_bounding_boxes",
    "get_keypoints",
    "has_all",
    "has_any",
    "query_chw",
    "query_size",
]


def _is_array(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray, tv_tensors.TVTensor))


def check_type(obj: Any, types_or_checks) -> bool:
    """reference ``_utils.py:221``: isinstance-or-predicate match."""
    for t in types_or_checks:
        if isinstance(obj, t) if isinstance(t, type) else t(obj):
            return True
    return False


def has_any(flat_inputs: List[Any], *types_or_checks) -> bool:
    return any(check_type(x, types_or_checks) for x in flat_inputs)


def has_all(flat_inputs: List[Any], *types_or_checks) -> bool:
    return all(
        any(check_type(x, (t,)) for x in flat_inputs) for t in types_or_checks
    )


def get_bounding_boxes(flat_inputs: List[Any]) -> tv_tensors.BoundingBoxes:
    """reference ``_utils.py:156``: exactly one BoundingBoxes expected."""
    boxes = [
        x for x in flat_inputs if isinstance(x, tv_tensors.BoundingBoxes)
    ]
    if len(boxes) != 1:
        raise ValueError(
            f"expected exactly one BoundingBoxes, found {len(boxes)}"
        )
    return boxes[0]


def get_keypoints(flat_inputs: List[Any]) -> tv_tensors.KeyPoints:
    kps = [x for x in flat_inputs if isinstance(x, tv_tensors.KeyPoints)]
    if len(kps) != 1:
        raise ValueError(f"expected exactly one KeyPoints, found {len(kps)}")
    return kps[0]


def query_size(flat_inputs: List[Any]) -> Tuple[int, int]:
    """reference ``_utils.py:195``: the unique (H, W) across inputs.
    NHWC here: images/videos are (..., H, W, C); masks (..., H, W);
    boxes/keypoints carry canvas_size."""
    sizes = set()
    for x in flat_inputs:
        if isinstance(x, (tv_tensors.BoundingBoxes, tv_tensors.KeyPoints)):
            sizes.add(tuple(x.canvas_size))
        elif isinstance(x, tv_tensors.Mask):
            sizes.add(tuple(x.shape[-2:]))
        elif _is_array(x) and getattr(x, "ndim", 0) >= 3:
            sizes.add(tuple(x.shape[-3:-1]))
    if not sizes:
        raise TypeError("no image/video/mask/boxes/keypoints found")
    if len(sizes) > 1:
        raise ValueError(f"inconsistent sizes: {sorted(sizes)}")
    return sizes.pop()


def query_chw(flat_inputs: List[Any]) -> Tuple[int, int, int]:
    """reference ``_utils.py:180``; returns (C, H, W) for parity with the
    reference even though storage is HWC."""
    chws = set()
    for x in flat_inputs:
        if isinstance(x, (tv_tensors.Image, tv_tensors.Video)) or (
            _is_array(x)
            and not isinstance(
                x,
                (tv_tensors.Mask, tv_tensors.BoundingBoxes, tv_tensors.KeyPoints),
            )
            and getattr(x, "ndim", 0) >= 3
        ):
            h, w, c = x.shape[-3:]
            chws.add((c, h, w))
    if not chws:
        raise TypeError("no image or video found")
    if len(chws) > 1:
        raise ValueError(f"inconsistent shapes: {sorted(chws)}")
    return chws.pop()
