from vision_tpu.transforms.v2 import functional  # noqa: F401
from vision_tpu.transforms.v2._augment import JPEG, CutMix, MixUp, RandomErasing
from vision_tpu.transforms.v2._auto_augment import (
    AutoAugmentPolicy,
    AugMix,
    AutoAugment,
    RandAugment,
    TrivialAugmentWide,
)
from vision_tpu.transforms.v2._color import (
    RGB,
    ColorJitter,
    GaussianBlur,
    GaussianNoise,
    Grayscale,
    RandomAdjustSharpness,
    RandomAutocontrast,
    RandomChannelPermutation,
    RandomEqualize,
    RandomGrayscale,
    RandomInvert,
    RandomPhotometricDistort,
    RandomPosterize,
    RandomSolarize,
)
from vision_tpu.transforms.v2._container import (
    Compose,
    RandomApply,
    RandomChoice,
    RandomOrder,
)
from vision_tpu.transforms.v2._geometry import (
    CenterCrop,
    ElasticTransform,
    FiveCrop,
    Pad,
    RandomAffine,
    RandomCrop,
    RandomHorizontalFlip,
    RandomIoUCrop,
    RandomPerspective,
    RandomResize,
    RandomResizedCrop,
    RandomRotation,
    RandomShortestSize,
    RandomVerticalFlip,
    RandomZoomOut,
    Resize,
    ScaleJitter,
    TenCrop,
)
from vision_tpu.transforms.v2._misc import (
    ClampBoundingBoxes,
    ClampKeyPoints,
    ConvertBoundingBoxFormat,
    Identity,
    Lambda,
    LinearTransformation,
    Normalize,
    SanitizeBoundingBoxes,
    SanitizeKeyPoints,
    SetClampingMode,
    ToDtype,
)
from vision_tpu.transforms.v2._temporal import UniformTemporalSubsample
from vision_tpu.transforms.v2._transform import Transform
from vision_tpu.transforms.v2._type_conversion import (
    PILToTensor,
    ToImage,
    ToPILImage,
    ToPureTensor,
)

from vision_tpu.transforms._compat import (  # noqa: E402,F401
    ConvertImageDtype,
    InterpolationMode,
    ToTensor,
)
from vision_tpu.transforms.v2._utils import (  # noqa: E402,F401
    check_type,
    get_bounding_boxes,
    get_keypoints,
    has_all,
    has_any,
    query_chw,
    query_size,
)
