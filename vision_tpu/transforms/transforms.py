"""v1 module path (reference ``torchvision/transforms/transforms.py``).

The class surface lives on the package (aliasing the v2 implementations);
this module re-exports it so ``from vision_tpu.transforms.transforms
import Compose`` keeps working for code written against the v1 layout.
"""

from vision_tpu.transforms import *  # noqa: F401,F403
from vision_tpu.transforms import (  # noqa: F401
    ConvertImageDtype,
    InterpolationMode,
    ToTensor,
)
