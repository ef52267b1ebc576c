"""LR-ASPP (reference ``torchvision/models/segmentation/lraspp.py``,
178 LoC)."""

from __future__ import annotations

import functools
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.models.segmentation._backbones import DilatedMobileNetV3Trunk
from vision_tpu.transforms._presets import SemanticSegmentation
from vision_tpu.transforms.v2.functional._resample import resize_2d

__all__ = [
    "LRASPP",
    "LRASPP_MobileNet_V3_Large_Weights",
    "lraspp_mobilenet_v3_large",
]


class LRASPPHead(nn.Module):
    """reference ``lraspp.py:60``."""

    num_classes: int
    inter_channels: int = 128

    @nn.compact
    def __call__(self, low, high, train=False):
        x = nn.Conv(self.inter_channels, (1, 1), use_bias=False, name="cbr.0")(high)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="cbr.1"
        )(x)
        x = nn.relu(x)
        s = jnp.mean(high, axis=(-3, -2), keepdims=True)
        s = nn.Conv(self.inter_channels, (1, 1), use_bias=False, name="scale.1")(s)
        s = nn.sigmoid(s)
        x = x * s
        x = resize_2d(
            x, (low.shape[-3], low.shape[-2]), mode="bilinear", antialias=False
        )
        return (
            nn.Conv(self.num_classes, (1, 1), name="low_classifier")(low)
            + nn.Conv(self.num_classes, (1, 1), name="high_classifier")(x)
        )


class LRASPP(nn.Module):
    num_classes: int = 21

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        input_size = (x.shape[-3], x.shape[-2])
        feats = DilatedMobileNetV3Trunk(name="backbone")(x, train)
        out = LRASPPHead(self.num_classes, name="classifier")(
            feats["low"], feats["out"], train
        )
        out = resize_2d(out, input_size, mode="bilinear", antialias=False)
        return {"out": out}


class LRASPP_MobileNet_V3_Large_Weights(WeightsEnum):
    COCO_WITH_VOC_LABELS_V1 = Weights(
        url="https://download.pytorch.org/models/lraspp_mobilenet_v3_large-d234d4ea.pth",
        transforms=functools.partial(SemanticSegmentation, resize_size=520),
        meta={
            "num_params": 3221538,
            "_metrics": {
                "COCO-val2017-VOC-labels": {"miou": 57.9, "pixel_acc": 91.2}
            },
        },
    )
    DEFAULT = COCO_WITH_VOC_LABELS_V1


@register_model()
def lraspp_mobilenet_v3_large(
    *, weights: Optional[LRASPP_MobileNet_V3_Large_Weights] = None,
    num_classes=21, **kwargs,
):
    weights = LRASPP_MobileNet_V3_Large_Weights.verify(weights)
    module = LRASPP(num_classes=num_classes, **kwargs)
    return build_model(module, weights, input_shape=(1, 64, 64, 3))
