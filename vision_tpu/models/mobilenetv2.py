"""MobileNetV2 (reference ``torchvision/models/mobilenetv2.py``, 260 LoC)."""

from __future__ import annotations

import functools
from typing import Callable, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, _make_divisible, build_model
from vision_tpu.transforms._presets import ImageClassification

__all__ = ["MobileNetV2", "MobileNet_V2_Weights", "mobilenet_v2"]


def _bn(train, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class _CNA(nn.Module):
    """Conv2dNormActivation with torch child names 0 (conv), 1 (bn).

    ``norm``: optional ``(features, name) -> nn.Module`` factory replacing
    the default BatchNorm (detection backbones pass FrozenBatchNorm)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: Optional[str] = "relu6"
    dilation: int = 1
    norm: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train=False):
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            (self.stride, self.stride),
            padding=[(pad, pad)] * 2,
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            name="0",
        )(x)
        if self.norm is not None:
            x = self.norm(self.features, "1")(x)
        else:
            x = _bn(train, "1")(x)
        if self.act == "relu6":
            x = jnp.minimum(nn.relu(x), 6.0)
        elif self.act == "hardswish":
            x = nn.hard_swish(x)
        elif self.act == "relu":
            x = nn.relu(x)
        return x


class InvertedResidual(nn.Module):
    """reference ``mobilenetv2.py:19``."""

    inp: int
    oup: int
    stride: int
    expand_ratio: int

    @nn.compact
    def __call__(self, x, train=False):
        hidden_dim = int(round(self.inp * self.expand_ratio))
        use_res = self.stride == 1 and self.inp == self.oup
        out = x
        i = 0
        if self.expand_ratio != 1:
            out = _CNA(hidden_dim, 1, name=f"conv.{i}")(out, train)
            i += 1
        out = _CNA(
            hidden_dim, 3, self.stride, groups=hidden_dim, name=f"conv.{i}"
        )(out, train)
        i += 1
        out = nn.Conv(self.oup, (1, 1), use_bias=False, name=f"conv.{i}")(out)
        i += 1
        out = _bn(train, f"conv.{i}")(out)
        return x + out if use_res else out


_SETTING = [
    # t, c, n, s  (reference mobilenetv2.py:104)
    [1, 16, 1, 1],
    [6, 24, 2, 2],
    [6, 32, 3, 2],
    [6, 64, 4, 2],
    [6, 96, 3, 1],
    [6, 160, 3, 2],
    [6, 320, 1, 1],
]


class MobileNetV2(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    round_nearest: int = 8
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        input_channel = _make_divisible(32 * self.width_mult, self.round_nearest)
        last_channel = _make_divisible(
            1280 * max(1.0, self.width_mult), self.round_nearest
        )
        x = _CNA(input_channel, 3, 2, name="features.0")(x, train)
        feats["features.0"] = x
        idx = 1
        for t, c, n, s in _SETTING:
            out_c = _make_divisible(c * self.width_mult, self.round_nearest)
            for i in range(n):
                x = InvertedResidual(
                    input_channel, out_c, s if i == 0 else 1, t,
                    name=f"features.{idx}",
                )(x, train)
                input_channel = out_c
                feats[f"features.{idx}"] = x
                idx += 1
        x = _CNA(last_channel, 1, name=f"features.{idx}")(x, train)
        feats[f"features.{idx}"] = x
        x = jnp.mean(x, axis=(-3, -2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="classifier.1")(x)
        if return_features:
            return x, feats
        return x


class MobileNet_V2_Weights(WeightsEnum):
    IMAGENET1K_V1 = Weights(
        url="https://download.pytorch.org/models/mobilenet_v2-b0353104.pth",
        transforms=functools.partial(ImageClassification, crop_size=224),
        meta={
            "num_params": 3504872,
            "_metrics": {"ImageNet-1K": {"acc@1": 71.878, "acc@5": 90.286}},
        },
    )
    IMAGENET1K_V2 = Weights(
        url="https://download.pytorch.org/models/mobilenet_v2-7ebf99e0.pth",
        transforms=functools.partial(
            ImageClassification, crop_size=224, resize_size=232
        ),
        meta={
            "num_params": 3504872,
            "_metrics": {"ImageNet-1K": {"acc@1": 72.154, "acc@5": 90.822}},
        },
    )
    DEFAULT = IMAGENET1K_V2


@register_model()
def mobilenet_v2(
    *, weights: Optional[MobileNet_V2_Weights] = None, **kwargs
) -> VisionModel:
    weights = MobileNet_V2_Weights.verify(weights)
    module = MobileNetV2(**kwargs)
    return build_model(module, weights)
