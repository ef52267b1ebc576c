"""VGG family (reference ``torchvision/models/vgg.py``, 511 LoC):
vgg11/13/16/19 with and without batch norm."""

from __future__ import annotations

import functools
from typing import List, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.transforms._presets import ImageClassification

__all__ = [
    "VGG",
    "VGG11_Weights",
    "VGG11_BN_Weights",
    "VGG13_Weights",
    "VGG13_BN_Weights",
    "VGG16_Weights",
    "VGG16_BN_Weights",
    "VGG19_Weights",
    "VGG19_BN_Weights",
    "vgg11",
    "vgg11_bn",
    "vgg13",
    "vgg13_bn",
    "vgg16",
    "vgg16_bn",
    "vgg19",
    "vgg19_bn",
]

# reference ``vgg.py:90`` cfgs
_CFGS = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
          512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512,
          512, "M", 512, 512, 512, 512, "M"],
}


class VGG(nn.Module):
    cfg: str
    batch_norm: bool = False
    num_classes: int = 1000
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, return_features: bool = False
    ) -> jax.Array:
        feats = {}
        idx = 0
        for v in _CFGS[self.cfg]:
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
                feats[f"features.{idx}"] = x
                idx += 1
            else:
                x = nn.Conv(
                    v, (3, 3), padding=[(1, 1)] * 2, name=f"features.{idx}"
                )(x)
                idx += 1
                if self.batch_norm:
                    x = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=f"features.{idx}",
                    )(x)
                    idx += 1
                x = nn.relu(x)
                idx += 1
        if x.shape[-3] != 7 or x.shape[-2] != 7:
            from vision_tpu.transforms.v2.functional._resample import resize_2d

            x = resize_2d(x, (7, 7), mode="area")
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, name="classifier.0")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, name="classifier.3")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="classifier.6")(x)
        if return_features:
            return x, feats
        return x


def _vgg_hooks(sd):
    from vision_tpu.models.alexnet import _chw_to_hwc_linear

    return _chw_to_hwc_linear(sd, "classifier.0.weight", 512, 7, 7)


def _w(url, acc1, acc5, num_params, crop=224):
    return Weights(
        url=url,
        transforms=functools.partial(ImageClassification, crop_size=crop),
        meta={
            "num_params": num_params,
            "_metrics": {"ImageNet-1K": {"acc@1": acc1, "acc@5": acc5}},
        },
    )


class VGG11_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/vgg11-8a719046.pth",
        69.020, 88.628, 132863336,
    )
    DEFAULT = IMAGENET1K_V1


class VGG11_BN_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/vgg11_bn-6002323d.pth",
        70.370, 89.810, 132868840,
    )
    DEFAULT = IMAGENET1K_V1


class VGG13_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/vgg13-19584684.pth",
        69.928, 89.246, 133047848,
    )
    DEFAULT = IMAGENET1K_V1


class VGG13_BN_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/vgg13_bn-abd245e5.pth",
        71.586, 90.374, 133053736,
    )
    DEFAULT = IMAGENET1K_V1


class VGG16_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/vgg16-397923af.pth",
        71.592, 90.382, 138357544,
    )
    DEFAULT = IMAGENET1K_V1


class VGG16_BN_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/vgg16_bn-6c64b313.pth",
        73.360, 91.516, 138365992,
    )
    DEFAULT = IMAGENET1K_V1


class VGG19_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/vgg19-dcbb9e9d.pth",
        72.376, 90.876, 143667240,
    )
    DEFAULT = IMAGENET1K_V1


class VGG19_BN_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/vgg19_bn-c79401a0.pth",
        74.218, 91.842, 143678248,
    )
    DEFAULT = IMAGENET1K_V1


def _vgg(cfg, batch_norm, weights, **kwargs) -> VisionModel:
    module = VGG(cfg=cfg, batch_norm=batch_norm, **kwargs)
    return build_model(module, weights, hooks=_vgg_hooks)


@register_model()
def vgg11(*, weights: Optional[VGG11_Weights] = None, **kwargs) -> VisionModel:
    return _vgg("A", False, VGG11_Weights.verify(weights), **kwargs)


@register_model()
def vgg11_bn(*, weights: Optional[VGG11_BN_Weights] = None, **kwargs) -> VisionModel:
    return _vgg("A", True, VGG11_BN_Weights.verify(weights), **kwargs)


@register_model()
def vgg13(*, weights: Optional[VGG13_Weights] = None, **kwargs) -> VisionModel:
    return _vgg("B", False, VGG13_Weights.verify(weights), **kwargs)


@register_model()
def vgg13_bn(*, weights: Optional[VGG13_BN_Weights] = None, **kwargs) -> VisionModel:
    return _vgg("B", True, VGG13_BN_Weights.verify(weights), **kwargs)


@register_model()
def vgg16(*, weights: Optional[VGG16_Weights] = None, **kwargs) -> VisionModel:
    return _vgg("D", False, VGG16_Weights.verify(weights), **kwargs)


@register_model()
def vgg16_bn(*, weights: Optional[VGG16_BN_Weights] = None, **kwargs) -> VisionModel:
    return _vgg("D", True, VGG16_BN_Weights.verify(weights), **kwargs)


@register_model()
def vgg19(*, weights: Optional[VGG19_Weights] = None, **kwargs) -> VisionModel:
    return _vgg("E", False, VGG19_Weights.verify(weights), **kwargs)


@register_model()
def vgg19_bn(*, weights: Optional[VGG19_BN_Weights] = None, **kwargs) -> VisionModel:
    return _vgg("E", True, VGG19_BN_Weights.verify(weights), **kwargs)
