"""MobileNetV3 large/small (reference ``torchvision/models/mobilenetv3.py``,
424 LoC): hardswish + squeeze-excite inverted residuals."""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, _make_divisible, build_model
from vision_tpu.models.mobilenetv2 import _CNA, _bn
from vision_tpu.transforms._presets import ImageClassification

__all__ = [
    "MobileNetV3",
    "MobileNet_V3_Large_Weights",
    "MobileNet_V3_Small_Weights",
    "mobilenet_v3_large",
    "mobilenet_v3_small",
]


@dataclasses.dataclass(frozen=True)
class IRConf:
    """reference ``mobilenetv3.py:25`` InvertedResidualConfig."""

    input_channels: int
    kernel: int
    expanded_channels: int
    out_channels: int
    use_se: bool
    use_hs: bool
    stride: int
    dilation: int

    @staticmethod
    def adjust(ch: int, width_mult: float) -> int:
        return _make_divisible(ch * width_mult, 8)


def _conf(i, k, e, o, se, act, s, d, width_mult=1.0):
    a = lambda c: IRConf.adjust(c, width_mult)
    return IRConf(a(i), k, a(e), a(o), se, act == "HS", s, d)


class _SE(nn.Module):
    """SElayer = SqueezeExcitation with hardsigmoid scale
    (reference ``mobilenetv3.py:59``); torch child names fc1/fc2."""

    input_channels: int
    squeeze_channels: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.relu(nn.Conv(self.squeeze_channels, (1, 1), name="fc1")(s))
        s = nn.Conv(self.input_channels, (1, 1), name="fc2")(s)
        return x * jax.nn.hard_sigmoid(s)


class InvertedResidualV3(nn.Module):
    """reference ``mobilenetv3.py:56``; torch child path ``block.N``.
    ``norm`` forwards to each _CNA (FrozenBatchNorm for detection)."""

    cnf: IRConf
    norm: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train=False):
        cnf = self.cnf
        use_res = cnf.stride == 1 and cnf.input_channels == cnf.out_channels
        act = "hardswish" if cnf.use_hs else "relu"
        out = x
        i = 0
        if cnf.expanded_channels != cnf.input_channels:
            out = _CNA(
                cnf.expanded_channels, 1, act=act, norm=self.norm,
                name=f"block.{i}",
            )(out, train)
            i += 1
        stride = 1 if cnf.dilation > 1 else cnf.stride
        out = _CNA(
            cnf.expanded_channels,
            cnf.kernel,
            stride,
            groups=cnf.expanded_channels,
            act=act,
            dilation=cnf.dilation,
            norm=self.norm,
            name=f"block.{i}",
        )(out, train)
        i += 1
        if cnf.use_se:
            squeeze = _make_divisible(cnf.expanded_channels // 4, 8)
            out = _SE(cnf.expanded_channels, squeeze, name=f"block.{i}")(out)
            i += 1
        out = _CNA(
            cnf.out_channels, 1, act=None, norm=self.norm, name=f"block.{i}"
        )(out, train)
        return x + out if use_res else out


def _large_setting(width_mult=1.0, reduced_tail=False, dilated=False):
    rd = 2 if reduced_tail else 1
    d = 2 if dilated else 1
    c = functools.partial(_conf, width_mult=width_mult)
    setting = [
        c(16, 3, 16, 16, False, "RE", 1, 1),
        c(16, 3, 64, 24, False, "RE", 2, 1),
        c(24, 3, 72, 24, False, "RE", 1, 1),
        c(24, 5, 72, 40, True, "RE", 2, 1),
        c(40, 5, 120, 40, True, "RE", 1, 1),
        c(40, 5, 120, 40, True, "RE", 1, 1),
        c(40, 3, 240, 80, False, "HS", 2, 1),
        c(80, 3, 200, 80, False, "HS", 1, 1),
        c(80, 3, 184, 80, False, "HS", 1, 1),
        c(80, 3, 184, 80, False, "HS", 1, 1),
        c(80, 3, 480, 112, True, "HS", 1, 1),
        c(112, 3, 672, 112, True, "HS", 1, 1),
        c(112, 5, 672, 160 // rd, True, "HS", 2, d),
        c(160 // rd, 5, 960 // rd, 160 // rd, True, "HS", 1, d),
        c(160 // rd, 5, 960 // rd, 160 // rd, True, "HS", 1, d),
    ]
    last_channel = IRConf.adjust(1280 // rd, width_mult)
    return setting, last_channel


def _small_setting(width_mult=1.0, reduced_tail=False, dilated=False):
    rd = 2 if reduced_tail else 1
    d = 2 if dilated else 1
    c = functools.partial(_conf, width_mult=width_mult)
    setting = [
        c(16, 3, 16, 16, True, "RE", 2, 1),
        c(16, 3, 72, 24, False, "RE", 2, 1),
        c(24, 3, 88, 24, False, "RE", 1, 1),
        c(24, 5, 96, 40, True, "HS", 2, 1),
        c(40, 5, 240, 40, True, "HS", 1, 1),
        c(40, 5, 240, 40, True, "HS", 1, 1),
        c(40, 5, 120, 48, True, "HS", 1, 1),
        c(48, 5, 144, 48, True, "HS", 1, 1),
        c(48, 5, 288, 96 // rd, True, "HS", 2, d),
        c(96 // rd, 5, 576 // rd, 96 // rd, True, "HS", 1, d),
        c(96 // rd, 5, 576 // rd, 96 // rd, True, "HS", 1, d),
    ]
    last_channel = IRConf.adjust(1024 // rd, width_mult)
    return setting, last_channel


class MobileNetV3(nn.Module):
    setting: Tuple[IRConf, ...]
    last_channel: int
    num_classes: int = 1000
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        first = self.setting[0].input_channels
        x = _CNA(first, 3, 2, act="hardswish", name="features.0")(x, train)
        idx = 1
        for cnf in self.setting:
            x = InvertedResidualV3(cnf, name=f"features.{idx}")(x, train)
            feats[f"features.{idx}"] = x
            idx += 1
        lastconv_out = 6 * self.setting[-1].out_channels
        x = _CNA(lastconv_out, 1, act="hardswish", name=f"features.{idx}")(x, train)
        feats[f"features.{idx}"] = x
        x = jnp.mean(x, axis=(-3, -2))
        x = nn.hard_swish(nn.Dense(self.last_channel, name="classifier.0")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="classifier.3")(x)
        if return_features:
            return x, feats
        return x


def _w(url, acc1, acc5, num_params, resize=256):
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


class MobileNet_V3_Large_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/mobilenet_v3_large-8738ca79.pth",
        74.042, 91.340, 5483032,
    )
    IMAGENET1K_V2 = _w(
        "https://download.pytorch.org/models/mobilenet_v3_large-5c1a4163.pth",
        75.274, 92.566, 5483032, resize=232,
    )
    DEFAULT = IMAGENET1K_V2


class MobileNet_V3_Small_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/mobilenet_v3_small-047dcff4.pth",
        67.668, 87.402, 2542856,
    )
    DEFAULT = IMAGENET1K_V1


@register_model()
def mobilenet_v3_large(
    *, weights: Optional[MobileNet_V3_Large_Weights] = None, **kwargs
) -> VisionModel:
    weights = MobileNet_V3_Large_Weights.verify(weights)
    setting, last_channel = _large_setting()
    module = MobileNetV3(setting=tuple(setting), last_channel=last_channel, **kwargs)
    return build_model(module, weights)


@register_model()
def mobilenet_v3_small(
    *, weights: Optional[MobileNet_V3_Small_Weights] = None, **kwargs
) -> VisionModel:
    weights = MobileNet_V3_Small_Weights.verify(weights)
    setting, last_channel = _small_setting()
    module = MobileNetV3(setting=tuple(setting), last_channel=last_channel, **kwargs)
    return build_model(module, weights)
