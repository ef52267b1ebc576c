"""v1 module path (reference ``torchvision/transforms/autoaugment.py``).

Re-exports the v2 auto-augment implementations under the v1 layout
(``from vision_tpu.transforms.autoaugment import AutoAugmentPolicy``).
"""

from vision_tpu.transforms.v2._auto_augment import (  # noqa: F401
    AugMix,
    AutoAugment,
    AutoAugmentPolicy,
    RandAugment,
    TrivialAugmentWide,
)
