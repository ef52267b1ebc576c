"""FCN (reference ``torchvision/models/segmentation/fcn.py``, 232 LoC)."""

from __future__ import annotations

import functools
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.models.segmentation._backbones import DilatedResNetTrunk
from vision_tpu.transforms._presets import SemanticSegmentation
from vision_tpu.transforms.v2.functional._resample import resize_2d

__all__ = [
    "FCN",
    "FCNHead",
    "FCN_ResNet50_Weights",
    "FCN_ResNet101_Weights",
    "fcn_resnet50",
    "fcn_resnet101",
]


class FCNHead(nn.Module):
    """reference ``fcn.py:36``: conv3x3 -> BN -> ReLU -> dropout -> 1x1."""

    channels: int

    @nn.compact
    def __call__(self, x, train=False):
        inter = x.shape[-1] // 4
        x = nn.Conv(inter, (3, 3), padding=[(1, 1)] * 2, use_bias=False, name="0")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="1"
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return nn.Conv(self.channels, (1, 1), name="4")(x)


class FCN(nn.Module):
    """reference ``segmentation/_utils.py:14`` _SimpleSegmentationModel:
    backbone -> classifier (+aux) -> bilinear upsample to input size.
    Output dict {"out", "aux"}."""

    layers: tuple = (3, 4, 6, 3)
    num_classes: int = 21
    aux_loss: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        input_size = (x.shape[-3], x.shape[-2])
        feats = DilatedResNetTrunk(self.layers, name="backbone")(x, train)
        out = FCNHead(self.num_classes, name="classifier")(feats["out"], train)
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
            "_metrics": {"COCO-val2017-VOC-labels": {"miou": miou, "pixel_acc": pixel_acc}},
        },
    )


class FCN_ResNet50_Weights(WeightsEnum):
    COCO_WITH_VOC_LABELS_V1 = _w(
        "https://download.pytorch.org/models/fcn_resnet50_coco-1167a1af.pth",
        60.5, 91.4, 35322218,
    )
    DEFAULT = COCO_WITH_VOC_LABELS_V1


class FCN_ResNet101_Weights(WeightsEnum):
    COCO_WITH_VOC_LABELS_V1 = _w(
        "https://download.pytorch.org/models/fcn_resnet101_coco-7ecb50ca.pth",
        63.7, 91.9, 54314346,
    )
    DEFAULT = COCO_WITH_VOC_LABELS_V1


def _fcn(layers, weights, num_classes=21, **kwargs):
    module = FCN(layers=layers, num_classes=num_classes, **kwargs)
    return build_model(module, weights, input_shape=(1, 64, 64, 3))


@register_model()
def fcn_resnet50(*, weights: Optional[FCN_ResNet50_Weights] = None, **kwargs):
    return _fcn((3, 4, 6, 3), FCN_ResNet50_Weights.verify(weights), **kwargs)


@register_model()
def fcn_resnet101(*, weights: Optional[FCN_ResNet101_Weights] = None, **kwargs):
    return _fcn((3, 4, 23, 3), FCN_ResNet101_Weights.verify(weights), **kwargs)
