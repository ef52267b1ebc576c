"""Transforms package. The v2 API is the primary surface (the reference's
v1 API is legacy; SURVEY.md §2.5: "the rebuild only needs the v2 surface").
"""

from vision_tpu.transforms import v2  # noqa: F401
from vision_tpu.transforms._presets import (  # noqa: F401
    ImageClassification,
    ObjectDetection,
    OpticalFlow,
    SemanticSegmentation,
    VideoClassification,
)
