"""ConvNeXt tiny/small/base/large (reference
``torchvision/models/convnext.py``, 415 LoC). In NHWC the reference's
Permute sandwich inside CNBlock is a no-op — the block is pure
channels-last math (dwconv -> LN -> MLP) feeding the MXU directly."""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.ops.stochastic_depth import stochastic_depth
from vision_tpu.transforms._presets import ImageClassification

__all__ = [
    "ConvNeXt",
    "ConvNeXt_Tiny_Weights",
    "ConvNeXt_Small_Weights",
    "ConvNeXt_Base_Weights",
    "ConvNeXt_Large_Weights",
    "convnext_tiny",
    "convnext_small",
    "convnext_base",
    "convnext_large",
]


@dataclasses.dataclass(frozen=True)
class CNBlockConfig:
    input_channels: int
    out_channels: Optional[int]
    num_layers: int


class CNBlock(nn.Module):
    """reference CNBlock; torch child indices block.0/2/3/5."""

    dim: int
    layer_scale: float
    sd_prob: float

    @nn.compact
    def __call__(self, x, train=False):
        out = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3)] * 2, feature_group_count=self.dim,
            name="block.0",
        )(x)
        out = nn.LayerNorm(epsilon=1e-6, name="block.2")(out)
        out = nn.Dense(4 * self.dim, name="block.3")(out)
        out = nn.gelu(out, approximate=False)
        out = nn.Dense(self.dim, name="block.5")(out)
        gamma = self.param(
            "layer_scale",
            lambda k: jnp.full((self.dim,), self.layer_scale, jnp.float32),
        )
        out = out * gamma
        if train and self.sd_prob > 0:
            out = stochastic_depth(
                out, self.sd_prob, "row", True, key=self.make_rng("dropout")
            )
        return x + out


class ConvNeXt(nn.Module):
    block_setting: Tuple[CNBlockConfig, ...]
    stochastic_depth_prob: float = 0.0
    layer_scale: float = 1e-6
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        first = self.block_setting[0].input_channels
        x = nn.Conv(first, (4, 4), (4, 4), padding="VALID", name="features.0.0")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="features.0.1")(x)

        total = sum(c.num_layers for c in self.block_setting)
        block_id = 0
        idx = 1
        for cnf in self.block_setting:
            for j in range(cnf.num_layers):
                sd = self.stochastic_depth_prob * block_id / max(total - 1.0, 1.0)
                x = CNBlock(
                    cnf.input_channels, self.layer_scale, sd,
                    name=f"features.{idx}.{j}",
                )(x, train)
                block_id += 1
            feats[f"features.{idx}"] = x
            idx += 1
            if cnf.out_channels is not None:
                x = nn.LayerNorm(epsilon=1e-6, name=f"features.{idx}.0")(x)
                x = nn.Conv(
                    cnf.out_channels, (2, 2), (2, 2), padding="VALID",
                    name=f"features.{idx}.1",
                )(x)
                idx += 1

        x = jnp.mean(x, axis=(-3, -2))
        x = nn.LayerNorm(epsilon=1e-6, name="classifier.0")(x)
        x = nn.Dense(self.num_classes, name="classifier.2")(x)
        if return_features:
            return x, feats
        return x


def _w(url, acc1, acc5, num_params, resize=236):
    return Weights(
        url=url,
        transforms=functools.partial(
            ImageClassification, crop_size=224, resize_size=resize
        ),
        meta={
            "num_params": num_params,
            "_metrics": {"ImageNet-1K": {"acc@1": acc1, "acc@5": acc5}},
        },
    )


class ConvNeXt_Tiny_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/convnext_tiny-983f1562.pth",
        82.520, 96.146, 28589128, 236,
    )
    DEFAULT = IMAGENET1K_V1


class ConvNeXt_Small_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/convnext_small-0c510722.pth",
        83.616, 96.650, 50223688, 230,
    )
    DEFAULT = IMAGENET1K_V1


class ConvNeXt_Base_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/convnext_base-6075fbad.pth",
        84.062, 96.870, 88591464, 232,
    )
    DEFAULT = IMAGENET1K_V1


class ConvNeXt_Large_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/convnext_large-ea097f82.pth",
        84.414, 96.976, 197767336, 232,
    )
    DEFAULT = IMAGENET1K_V1


def _convnext(setting, sd_prob, weights, **kwargs):
    module = ConvNeXt(
        block_setting=tuple(setting), stochastic_depth_prob=sd_prob, **kwargs
    )
    return build_model(module, weights, input_shape=(1, 64, 64, 3))


@register_model()
def convnext_tiny(*, weights: Optional[ConvNeXt_Tiny_Weights] = None, **kwargs):
    setting = [
        CNBlockConfig(96, 192, 3),
        CNBlockConfig(192, 384, 3),
        CNBlockConfig(384, 768, 9),
        CNBlockConfig(768, None, 3),
    ]
    return _convnext(setting, 0.1, ConvNeXt_Tiny_Weights.verify(weights), **kwargs)


@register_model()
def convnext_small(*, weights: Optional[ConvNeXt_Small_Weights] = None, **kwargs):
    setting = [
        CNBlockConfig(96, 192, 3),
        CNBlockConfig(192, 384, 3),
        CNBlockConfig(384, 768, 27),
        CNBlockConfig(768, None, 3),
    ]
    return _convnext(setting, 0.4, ConvNeXt_Small_Weights.verify(weights), **kwargs)


@register_model()
def convnext_base(*, weights: Optional[ConvNeXt_Base_Weights] = None, **kwargs):
    setting = [
        CNBlockConfig(128, 256, 3),
        CNBlockConfig(256, 512, 3),
        CNBlockConfig(512, 1024, 27),
        CNBlockConfig(1024, None, 3),
    ]
    return _convnext(setting, 0.5, ConvNeXt_Base_Weights.verify(weights), **kwargs)


@register_model()
def convnext_large(*, weights: Optional[ConvNeXt_Large_Weights] = None, **kwargs):
    setting = [
        CNBlockConfig(192, 384, 3),
        CNBlockConfig(384, 768, 3),
        CNBlockConfig(768, 1536, 27),
        CNBlockConfig(1536, None, 3),
    ]
    return _convnext(setting, 0.5, ConvNeXt_Large_Weights.verify(weights), **kwargs)
