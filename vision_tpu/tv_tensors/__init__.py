import contextlib

from vision_tpu.tv_tensors._containers import (
    BoundingBoxes,
    BoundingBoxFormat,
    Image,
    KeyPoints,
    Mask,
    TVTensor,
    Video,
    _is_rotated,
    wrap,
)

__all__ = [
    "BoundingBoxes",
    "BoundingBoxFormat",
    "Image",
    "KeyPoints",
    "Mask",
    "TVTensor",
    "Video",
    "is_rotated_bounding_format",
    "set_return_type",
    "wrap",
]


def is_rotated_bounding_format(format) -> bool:
    """reference ``tv_tensors/_bounding_boxes.py:46``."""
    if isinstance(format, BoundingBoxFormat):
        return _is_rotated(format)
    if isinstance(format, str):
        return format.upper() in ("XYWHR", "CXCYWHR", "XYXYXYXY")
    raise ValueError(
        f"format should be str or BoundingBoxFormat, got {type(format)}"
    )


@contextlib.contextmanager
def set_return_type(return_type: str):
    """reference ``tv_tensors/_torch_function_helpers.py`` set_return_type.

    In torch this toggles whether ops on TVTensors return the subclass or
    a plain Tensor. Our containers always unwrap to plain arrays under jax
    ops (the reference's default), so both settings are already the
    observable behavior — this is a compatibility no-op context manager."""
    if return_type not in ("TVTensor", "Tensor", "tensor", "tvtensor"):
        raise ValueError(f"unknown return_type {return_type!r}")
    yield
