from vision_tpu.tv_tensors._containers import (
    BoundingBoxes,
    BoundingBoxFormat,
    Image,
    KeyPoints,
    Mask,
    TVTensor,
    Video,
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
    "wrap",
]
