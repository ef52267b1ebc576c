"""Transforms package. The v2 API is the primary surface (the reference's
v1 API is legacy; SURVEY.md §2.5: "the rebuild only needs the v2 surface").
For import compatibility, the v1 names (``transforms.Resize`` etc.) alias
their v2 implementations, plus the v1-only ``ToTensor`` /
``ConvertImageDtype`` / ``InterpolationMode``.
"""

from vision_tpu.transforms import v2  # noqa: F401
from vision_tpu.transforms._compat import (  # noqa: F401
    ConvertImageDtype,
    InterpolationMode,
    ToTensor,
)
from vision_tpu.transforms._presets import (  # noqa: F401
    ImageClassification,
    ObjectDetection,
    OpticalFlow,
    SemanticSegmentation,
    VideoClassification,
)
from vision_tpu.transforms.v2 import functional  # noqa: F401

# Make the v1 module path importable (``import
# vision_tpu.transforms.functional as F`` — the reference's most common
# import form). The v2 module carries every v1 functional name (hflip,
# to_tensor, get_image_size, ...), so one module serves both paths.
import sys as _sys

_sys.modules[__name__ + ".functional"] = functional

# v1 class names alias the v2 implementations (reference
# ``torchvision/transforms/transforms.py`` public classes)
from vision_tpu.transforms.v2 import (  # noqa: F401
    AugMix,
    AutoAugment,
    CenterCrop,
    ColorJitter,
    Compose,
    ElasticTransform,
    FiveCrop,
    GaussianBlur,
    GaussianNoise,
    Grayscale,
    Lambda,
    LinearTransformation,
    Normalize,
    Pad,
    PILToTensor,
    RandAugment,
    RandomAdjustSharpness,
    RandomAffine,
    RandomApply,
    RandomAutocontrast,
    RandomChoice,
    RandomCrop,
    RandomEqualize,
    RandomErasing,
    RandomGrayscale,
    RandomHorizontalFlip,
    RandomInvert,
    RandomOrder,
    RandomPerspective,
    RandomPosterize,
    RandomResizedCrop,
    RandomRotation,
    RandomSolarize,
    RandomVerticalFlip,
    Resize,
    TenCrop,
    ToPILImage,
    TrivialAugmentWide,
)
