"""DeepLabV3 (reference ``torchvision/models/segmentation/deeplabv3.py``,
391 LoC): ASPP head on dilated ResNet / MobileNetV3."""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.models.segmentation._backbones import (
    DilatedMobileNetV3Trunk,
    DilatedResNetTrunk,
)
from vision_tpu.models.segmentation.fcn import FCNHead
from vision_tpu.transforms._presets import SemanticSegmentation
from vision_tpu.transforms.v2.functional._resample import resize_2d

__all__ = [
    "DeepLabV3",
    "DeepLabHead",
    "ASPP",
    "DeepLabV3_ResNet50_Weights",
    "DeepLabV3_ResNet101_Weights",
    "DeepLabV3_MobileNet_V3_Large_Weights",
    "deeplabv3_resnet50",
    "deeplabv3_resnet101",
    "deeplabv3_mobilenet_v3_large",
]


def _bn(train, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class ASPP(nn.Module):
    """reference ``deeplabv3.py:85``: 1x1 + three atrous convs + global
    pooling branch, concat, project."""

    atrous_rates: Tuple[int, ...]
    out_channels: int = 256

    @nn.compact
    def __call__(self, x, train=False):
        res = []
        # convs.0: 1x1
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="convs.0.0")(x)
        y = _bn(train, "convs.0.1")(y)
        res.append(nn.relu(y))
        # convs.1..3: atrous 3x3
        for i, rate in enumerate(self.atrous_rates, start=1):
            y = nn.Conv(
                self.out_channels, (3, 3), padding=[(rate, rate)] * 2,
                kernel_dilation=(rate, rate), use_bias=False,
                name=f"convs.{i}.0",
            )(x)
            y = _bn(train, f"convs.{i}.1")(y)
            res.append(nn.relu(y))
        # pooling branch
        i = len(self.atrous_rates) + 1
        y = jnp.mean(x, axis=(-3, -2), keepdims=True)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, name=f"convs.{i}.1")(y)
        y = _bn(train, f"convs.{i}.2")(y)
        y = nn.relu(y)
        y = jnp.broadcast_to(y, x.shape[:-1] + (self.out_channels,))
        res.append(y)

        out = jnp.concatenate(res, axis=-1)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="project.0")(out)
        out = _bn(train, "project.1")(out)
        out = nn.relu(out)
        return nn.Dropout(0.5, deterministic=not train)(out)


class DeepLabHead(nn.Module):
    """reference ``deeplabv3.py:49``: ASPP -> conv3x3 -> BN -> ReLU -> 1x1."""

    num_classes: int
    atrous_rates: Tuple[int, ...] = (12, 24, 36)

    @nn.compact
    def __call__(self, x, train=False):
        x = ASPP(self.atrous_rates, name="0")(x, train)
        x = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2, use_bias=False, name="1")(x)
        x = _bn(train, "2")(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), name="4")(x)


class DeepLabV3(nn.Module):
    backbone_type: str = "resnet"  # "resnet" | "mobilenet"
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    num_classes: int = 21
    aux_loss: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        input_size = (x.shape[-3], x.shape[-2])
        if self.backbone_type == "resnet":
            feats = DilatedResNetTrunk(self.layers, name="backbone")(x, train)
        else:
            feats = DilatedMobileNetV3Trunk(name="backbone")(x, train)
        out = DeepLabHead(self.num_classes, name="classifier")(feats["out"], train)
        out = resize_2d(out, input_size, mode="bilinear", antialias=False)
        result = {"out": out}
        if self.aux_loss:
            aux = FCNHead(self.num_classes, name="aux_classifier")(
                feats["aux"], train
            )
            result["aux"] = resize_2d(aux, input_size, mode="bilinear", antialias=False)
        return result


def _w(url, miou, pixel_acc, num_params):
    return Weights(
        url=url,
        transforms=functools.partial(SemanticSegmentation, resize_size=520),
        meta={
            "num_params": num_params,
            "_metrics": {
                "COCO-val2017-VOC-labels": {"miou": miou, "pixel_acc": pixel_acc}
            },
        },
    )


class DeepLabV3_ResNet50_Weights(WeightsEnum):
    COCO_WITH_VOC_LABELS_V1 = _w(
        "https://download.pytorch.org/models/deeplabv3_resnet50_coco-cd0a2569.pth",
        66.4, 92.4, 42004074,
    )
    DEFAULT = COCO_WITH_VOC_LABELS_V1


class DeepLabV3_ResNet101_Weights(WeightsEnum):
    COCO_WITH_VOC_LABELS_V1 = _w(
        "https://download.pytorch.org/models/deeplabv3_resnet101_coco-586e9e4e.pth",
        67.4, 92.4, 60996202,
    )
    DEFAULT = COCO_WITH_VOC_LABELS_V1


class DeepLabV3_MobileNet_V3_Large_Weights(WeightsEnum):
    COCO_WITH_VOC_LABELS_V1 = _w(
        "https://download.pytorch.org/models/deeplabv3_mobilenet_v3_large-fc3c493d.pth",
        60.3, 91.2, 11029328,
    )
    DEFAULT = COCO_WITH_VOC_LABELS_V1


@register_model()
def deeplabv3_resnet50(
    *, weights: Optional[DeepLabV3_ResNet50_Weights] = None, num_classes=21, **kwargs
):
    module = DeepLabV3(layers=(3, 4, 6, 3), num_classes=num_classes, **kwargs)
    return build_model(
        module, DeepLabV3_ResNet50_Weights.verify(weights),
        input_shape=(1, 64, 64, 3),
    )


@register_model()
def deeplabv3_resnet101(
    *, weights: Optional[DeepLabV3_ResNet101_Weights] = None, num_classes=21, **kwargs
):
    module = DeepLabV3(layers=(3, 4, 23, 3), num_classes=num_classes, **kwargs)
    return build_model(
        module, DeepLabV3_ResNet101_Weights.verify(weights),
        input_shape=(1, 64, 64, 3),
    )


@register_model()
def deeplabv3_mobilenet_v3_large(
    *, weights: Optional[DeepLabV3_MobileNet_V3_Large_Weights] = None,
    num_classes=21, **kwargs,
):
    module = DeepLabV3(
        backbone_type="mobilenet", num_classes=num_classes, **kwargs
    )
    return build_model(
        module, DeepLabV3_MobileNet_V3_Large_Weights.verify(weights),
        input_shape=(1, 64, 64, 3),
    )
