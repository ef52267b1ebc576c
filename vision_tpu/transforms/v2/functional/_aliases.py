"""Per-type kernel aliases + small remaining functionals (reference
``transforms/v2/functional/__init__.py`` exports one ``<op>_<type>``
kernel per tv-tensor type; our dispatchers are shape-polymorphic — a
video is just extra leading batch dims in NHWC — so the per-type names
delegate to the dispatcher)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import tv_tensors
from vision_tpu.transforms.v2.functional import _color, _geometry, _misc
from vision_tpu.transforms.v2.functional._augment import erase, jpeg
from vision_tpu.transforms.v2.functional._misc import to_dtype

__all__ = [
    "convert_image_dtype",
    "elastic_transform",
    "get_dimensions",
    "get_image_num_channels",
    "get_image_size",
    "grayscale_to_rgb_image",
    "hflip",
    "pil_to_tensor",
    "sanitize_keypoints",
    "to_grayscale",
    "to_image",
    "to_pil_image",
    "to_tensor",
    "uniform_temporal_subsample",
    "uniform_temporal_subsample_video",
    "vflip",
]

# -- aliases of existing dispatchers (v1 names / per-type kernels) -------
hflip = _geometry.horizontal_flip
vflip = _geometry.vertical_flip
elastic_transform = _geometry.elastic


def convert_image_dtype(image, dtype=jnp.float32):
    """reference v1 ``convert_image_dtype`` == to_dtype(scale=True)."""
    return to_dtype(image, dtype, scale=True)


def get_dimensions(inpt) -> Tuple[int, int, int]:
    """reference ``get_dimensions``: [C, H, W] (storage is HWC here)."""
    h, w, c = inpt.shape[-3:]
    return [c, h, w]


def get_image_size(inpt) -> Tuple[int, int]:
    """reference v1 ``get_image_size``: [W, H]."""
    h, w = inpt.shape[-3:-1]
    return [w, h]


def get_image_num_channels(inpt) -> int:
    return int(inpt.shape[-1])


def to_image(inpt) -> tv_tensors.Image:
    """reference ``to_image``: wrap array/PIL as an Image tv-tensor."""
    if isinstance(inpt, tv_tensors.Image):
        return inpt
    try:
        import PIL.Image

        if isinstance(inpt, PIL.Image.Image):
            inpt = np.asarray(inpt)
            if inpt.ndim == 2:
                inpt = inpt[..., None]
    except ImportError:
        pass
    return tv_tensors.Image(jnp.asarray(inpt))


def pil_to_tensor(pic):
    """reference ``pil_to_tensor``: PIL -> uint8 array (HWC here)."""
    arr = np.asarray(pic)
    if arr.ndim == 2:
        arr = arr[..., None]
    return jnp.asarray(arr)


def to_pil_image(pic):
    """reference ``to_pil_image``: HWC array -> PIL.Image."""
    import PIL.Image

    arr = np.asarray(pic)
    if arr.dtype != np.uint8:
        arr = np.clip(np.asarray(arr) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    return PIL.Image.fromarray(arr)


def to_tensor(pic):
    """reference v1 ``to_tensor``: uint8 -> float32 [0, 1] (HWC kept)."""
    arr = jnp.asarray(np.asarray(pic))
    if arr.ndim == 2:
        arr = arr[..., None]
    if jnp.issubdtype(arr.dtype, jnp.integer):
        return arr.astype(jnp.float32) / 255.0
    return arr.astype(jnp.float32)


def to_grayscale(inpt, num_output_channels: int = 1):
    """reference v1 ``to_grayscale``."""
    return _color.rgb_to_grayscale(inpt, num_output_channels)


grayscale_to_rgb_image = _color.grayscale_to_rgb


def uniform_temporal_subsample(video, num_samples: int):
    """reference ``_temporal.py`` uniform_temporal_subsample: evenly spaced
    frame indices incl. first and last; video is (..., T, H, W, C)."""
    t = video.shape[-4]
    idx = jnp.linspace(0, t - 1, num_samples).round().astype(jnp.int32)
    return jnp.take(video, idx, axis=-4)


uniform_temporal_subsample_video = uniform_temporal_subsample


def sanitize_keypoints(keypoints, canvas_size=None):
    """Valid mask for keypoints inside the canvas (reference
    ``sanitize_keypoints``); returns (keypoints, valid)."""
    if canvas_size is None:
        canvas_size = keypoints.canvas_size
    h, w = canvas_size
    pts = jnp.asarray(
        keypoints.data
        if isinstance(keypoints, tv_tensors.KeyPoints)
        else keypoints
    )
    inside = (
        (pts[..., 0] >= 0) & (pts[..., 0] < w)
        & (pts[..., 1] >= 0) & (pts[..., 1] < h)
    )
    valid = inside.reshape(inside.shape[0], -1).all(axis=-1)
    return keypoints, valid


def _alias_per_type(ns):
    """Export ``<op>_<suffix>`` names that delegate to the dispatcher —
    the reference has one registered kernel per tv-tensor type; our
    dispatchers are type- and batch-dim-polymorphic."""
    ops_by_suffix = {
        "image": [
            "adjust_brightness", "adjust_contrast", "adjust_gamma",
            "adjust_hue", "adjust_saturation", "adjust_sharpness",
            "autocontrast", "equalize", "erase", "five_crop", "gaussian_noise",
            "rgb_to_grayscale",
            "invert", "jpeg", "permute_channels", "posterize", "solarize",
            "ten_crop",
        ],
        "video": [
            "adjust_brightness", "adjust_contrast", "adjust_gamma",
            "adjust_hue", "adjust_saturation", "adjust_sharpness", "affine",
            "autocontrast", "center_crop", "crop", "elastic", "equalize",
            "erase", "five_crop", "gaussian_blur", "gaussian_noise",
            "horizontal_flip", "invert", "jpeg", "normalize",
            "pad", "permute_channels", "perspective", "posterize", "resize",
            "resized_crop", "rotate", "solarize", "ten_crop", "to_dtype",
            "vertical_flip",
        ],
        "mask": ["center_crop", "elastic", "pad", "resized_crop"],
        # pad_video / rgb_to_grayscale_image handled below
        "bounding_boxes": ["center_crop", "elastic", "pad", "resized_crop"],
        "keypoints": [
            "center_crop", "elastic", "pad", "perspective", "resized_crop",
            "rotate",
        ],
    }
    from vision_tpu.transforms.v2 import functional as F

    for suffix, ops in ops_by_suffix.items():
        for op in ops:
            name = f"{op}_{suffix}"
            if name not in ns and hasattr(F, op):
                ns[name] = getattr(F, op)
                __all__.append(name)


def _get_size_aliases(ns):
    from vision_tpu.transforms.v2.functional._meta import (
        get_num_channels,
        get_num_frames,
        get_size,
    )

    for name in (
        "get_size_image", "get_size_video", "get_size_mask",
        "get_size_bounding_boxes", "get_size_keypoints",
    ):
        ns[name] = get_size
        __all__.append(name)
    ns["get_num_channels_image"] = get_num_channels
    ns["get_num_channels_video"] = get_num_channels
    ns["get_num_frames_video"] = get_num_frames
    ns["get_dimensions_image"] = get_dimensions
    ns["get_dimensions_video"] = get_dimensions
    __all__.extend([
        "get_num_channels_image", "get_num_channels_video",
        "get_num_frames_video", "get_dimensions_image",
        "get_dimensions_video",
    ])
