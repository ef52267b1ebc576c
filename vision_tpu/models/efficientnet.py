"""EfficientNet B0-B7 + V2 S/M/L (reference
``torchvision/models/efficientnet.py``, 1132 LoC)."""

from __future__ import annotations

import copy
import dataclasses
import functools
import math
from typing import List, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, _make_divisible, build_model
from vision_tpu.ops.stochastic_depth import stochastic_depth
from vision_tpu.transforms._presets import ImageClassification

__all__ = [
    "EfficientNet",
    "EfficientNet_B0_Weights",
    "EfficientNet_B1_Weights",
    "EfficientNet_B2_Weights",
    "EfficientNet_B3_Weights",
    "EfficientNet_B4_Weights",
    "EfficientNet_B5_Weights",
    "EfficientNet_B6_Weights",
    "EfficientNet_B7_Weights",
    "EfficientNet_V2_S_Weights",
    "EfficientNet_V2_M_Weights",
    "EfficientNet_V2_L_Weights",
    "efficientnet_b0",
    "efficientnet_b1",
    "efficientnet_b2",
    "efficientnet_b3",
    "efficientnet_b4",
    "efficientnet_b5",
    "efficientnet_b6",
    "efficientnet_b7",
    "efficientnet_v2_s",
    "efficientnet_v2_m",
    "efficientnet_v2_l",
]


@dataclasses.dataclass
class _BlockConf:
    expand_ratio: float
    kernel: int
    stride: int
    input_channels: int
    out_channels: int
    num_layers: int
    fused: bool = False

    @staticmethod
    def adjust_channels(ch, width_mult):
        return _make_divisible(ch * width_mult, 8)


def _mbconf(e, k, s, i, o, n, width_mult=1.0, depth_mult=1.0):
    return _BlockConf(
        e, k, s,
        _BlockConf.adjust_channels(i, width_mult),
        _BlockConf.adjust_channels(o, width_mult),
        int(math.ceil(n * depth_mult)),
        fused=False,
    )


def _fusedconf(e, k, s, i, o, n):
    return _BlockConf(e, k, s, i, o, n, fused=True)


class _CNA(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train=False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=[(pad, pad)] * 2, feature_group_count=self.groups,
            use_bias=False, name="0",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=self.bn_eps, name="1",
        )(x)
        if self.act:
            x = nn.silu(x)
        return x


class _SE(nn.Module):
    input_channels: int
    squeeze_channels: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.silu(nn.Conv(self.squeeze_channels, (1, 1), name="fc1")(s))
        s = nn.Conv(self.input_channels, (1, 1), name="fc2")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    cnf: _BlockConf
    sd_prob: float
    bn_eps: float
    bn_momentum: float

    @nn.compact
    def __call__(self, x, train=False):
        cnf = self.cnf
        use_res = cnf.stride == 1 and cnf.input_channels == cnf.out_channels
        expanded = _BlockConf.adjust_channels(cnf.input_channels, cnf.expand_ratio)
        out = x
        i = 0
        if expanded != cnf.input_channels:
            out = _CNA(expanded, 1, bn_eps=self.bn_eps,
                       bn_momentum=self.bn_momentum, name=f"block.{i}")(out, train)
            i += 1
        out = _CNA(
            expanded, cnf.kernel, cnf.stride, groups=expanded,
            bn_eps=self.bn_eps, bn_momentum=self.bn_momentum, name=f"block.{i}",
        )(out, train)
        i += 1
        squeeze = max(1, cnf.input_channels // 4)
        out = _SE(expanded, squeeze, name=f"block.{i}")(out)
        i += 1
        out = _CNA(cnf.out_channels, 1, act=False, bn_eps=self.bn_eps,
                   bn_momentum=self.bn_momentum, name=f"block.{i}")(out, train)
        if use_res:
            if train and self.sd_prob > 0:
                key = self.make_rng("dropout")
                out = stochastic_depth(out, self.sd_prob, "row", True, key=key)
            out = out + x
        return out


class FusedMBConv(nn.Module):
    cnf: _BlockConf
    sd_prob: float
    bn_eps: float
    bn_momentum: float

    @nn.compact
    def __call__(self, x, train=False):
        cnf = self.cnf
        use_res = cnf.stride == 1 and cnf.input_channels == cnf.out_channels
        expanded = _BlockConf.adjust_channels(cnf.input_channels, cnf.expand_ratio)
        out = x
        if expanded != cnf.input_channels:
            out = _CNA(expanded, cnf.kernel, cnf.stride, bn_eps=self.bn_eps,
                       bn_momentum=self.bn_momentum, name="block.0")(out, train)
            out = _CNA(cnf.out_channels, 1, act=False, bn_eps=self.bn_eps,
                       bn_momentum=self.bn_momentum, name="block.1")(out, train)
        else:
            out = _CNA(cnf.out_channels, cnf.kernel, cnf.stride,
                       bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                       name="block.0")(out, train)
        if use_res:
            if train and self.sd_prob > 0:
                key = self.make_rng("dropout")
                out = stochastic_depth(out, self.sd_prob, "row", True, key=key)
            out = out + x
        return out


class EfficientNet(nn.Module):
    setting: Tuple[_BlockConf, ...]
    dropout: float
    last_channel: Optional[int] = None
    num_classes: int = 1000
    stochastic_depth_prob: float = 0.2
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        first = self.setting[0].input_channels
        x = _CNA(first, 3, 2, bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                 name="features.0")(x, train)
        feats["features.0"] = x

        total_blocks = sum(c.num_layers for c in self.setting)
        block_id = 0
        for stage_idx, cnf in enumerate(self.setting, start=1):
            for j in range(cnf.num_layers):
                bc = copy.copy(cnf)
                if j > 0:
                    bc.input_channels = bc.out_channels
                    bc.stride = 1
                sd = self.stochastic_depth_prob * block_id / total_blocks
                cls = FusedMBConv if bc.fused else MBConv
                x = cls(bc, sd, self.bn_eps, self.bn_momentum,
                        name=f"features.{stage_idx}.{j}")(x, train)
                block_id += 1
            feats[f"features.{stage_idx}"] = x

        last_in = self.setting[-1].out_channels
        last_out = self.last_channel if self.last_channel else 4 * last_in
        x = _CNA(last_out, 1, bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                 name=f"features.{len(self.setting) + 1}")(x, train)
        feats[f"features.{len(self.setting) + 1}"] = x
        x = jnp.mean(x, axis=(-3, -2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="classifier.1")(x)
        if return_features:
            return x, feats
        return x


def _b_setting(width_mult, depth_mult):
    c = functools.partial(_mbconf, width_mult=width_mult, depth_mult=depth_mult)
    return [
        c(1, 3, 1, 32, 16, 1),
        c(6, 3, 2, 16, 24, 2),
        c(6, 5, 2, 24, 40, 2),
        c(6, 3, 2, 40, 80, 3),
        c(6, 5, 1, 80, 112, 3),
        c(6, 5, 2, 112, 192, 4),
        c(6, 3, 1, 192, 320, 1),
    ]


_V2_SETTINGS = {
    "s": (
        [
            _fusedconf(1, 3, 1, 24, 24, 2),
            _fusedconf(4, 3, 2, 24, 48, 4),
            _fusedconf(4, 3, 2, 48, 64, 4),
            _mbconf(4, 3, 2, 64, 128, 6),
            _mbconf(6, 3, 1, 128, 160, 9),
            _mbconf(6, 3, 2, 160, 256, 15),
        ],
        1280,
    ),
    "m": (
        [
            _fusedconf(1, 3, 1, 24, 24, 3),
            _fusedconf(4, 3, 2, 24, 48, 5),
            _fusedconf(4, 3, 2, 48, 80, 5),
            _mbconf(4, 3, 2, 80, 160, 7),
            _mbconf(6, 3, 1, 160, 176, 14),
            _mbconf(6, 3, 2, 176, 304, 18),
            _mbconf(6, 3, 1, 304, 512, 5),
        ],
        1280,
    ),
    "l": (
        [
            _fusedconf(1, 3, 1, 32, 32, 4),
            _fusedconf(4, 3, 2, 32, 64, 7),
            _fusedconf(4, 3, 2, 64, 96, 7),
            _mbconf(4, 3, 2, 96, 192, 10),
            _mbconf(6, 3, 1, 192, 224, 19),
            _mbconf(6, 3, 2, 224, 384, 25),
            _mbconf(6, 3, 1, 384, 640, 7),
        ],
        1280,
    ),
}


def _w(url, acc1, acc5, num_params, crop, resize, interp="bicubic"):
    return Weights(
        url=url,
        transforms=functools.partial(
            ImageClassification,
            crop_size=crop,
            resize_size=resize,
            interpolation=interp,
        ),
        meta={
            "num_params": num_params,
            "_metrics": {"ImageNet-1K": {"acc@1": acc1, "acc@5": acc5}},
        },
    )


class EfficientNet_B0_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/efficientnet_b0_rwightman-7f5810bc.pth",
        77.692, 93.532, 5288548, 224, 256,
    )
    DEFAULT = IMAGENET1K_V1


class EfficientNet_B1_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/efficientnet_b1_rwightman-bac287d4.pth",
        78.642, 94.186, 7794184, 240, 256,
    )
    IMAGENET1K_V2 = _w(
        "https://download.pytorch.org/models/efficientnet_b1-c27df63c.pth",
        79.838, 94.934, 7794184, 240, 255, "bilinear",
    )
    DEFAULT = IMAGENET1K_V2


class EfficientNet_B2_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/efficientnet_b2_rwightman-c35c1473.pth",
        80.608, 95.310, 9109994, 288, 288,
    )
    DEFAULT = IMAGENET1K_V1


class EfficientNet_B3_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/efficientnet_b3_rwightman-b3899882.pth",
        82.008, 96.054, 12233232, 300, 320,
    )
    DEFAULT = IMAGENET1K_V1


class EfficientNet_B4_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/efficientnet_b4_rwightman-23ab8bcd.pth",
        83.384, 96.594, 19341616, 380, 384,
    )
    DEFAULT = IMAGENET1K_V1


class EfficientNet_B5_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/efficientnet_b5_lukemelas-1a07897c.pth",
        83.444, 96.628, 30389784, 456, 456,
    )
    DEFAULT = IMAGENET1K_V1


class EfficientNet_B6_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/efficientnet_b6_lukemelas-24a108a5.pth",
        84.008, 96.916, 43040704, 528, 528,
    )
    DEFAULT = IMAGENET1K_V1


class EfficientNet_B7_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/efficientnet_b7_lukemelas-c5b4e57e.pth",
        84.122, 96.908, 66347960, 600, 600,
    )
    DEFAULT = IMAGENET1K_V1


class EfficientNet_V2_S_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/efficientnet_v2_s-dd5fe13b.pth",
        84.228, 96.878, 21458488, 384, 384, "bilinear",
    )
    DEFAULT = IMAGENET1K_V1


class EfficientNet_V2_M_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/efficientnet_v2_m-dc08266a.pth",
        85.112, 97.156, 54139356, 480, 480, "bilinear",
    )
    DEFAULT = IMAGENET1K_V1


class EfficientNet_V2_L_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/efficientnet_v2_l-59c71312.pth",
        85.808, 97.788, 118515272, 480, 480, "bicubic",
    )
    DEFAULT = IMAGENET1K_V1


def _build_b(width_mult, depth_mult, dropout, weights, bn_eps=1e-5,
             bn_momentum=0.9, **kwargs):
    module = EfficientNet(
        setting=tuple(_b_setting(width_mult, depth_mult)),
        dropout=dropout,
        bn_eps=bn_eps,
        bn_momentum=bn_momentum,
        **kwargs,
    )
    return build_model(module, weights, input_shape=(1, 64, 64, 3))


def _build_v2(size, dropout, weights, **kwargs):
    setting, last_channel = _V2_SETTINGS[size]
    module = EfficientNet(
        setting=tuple(setting),
        dropout=dropout,
        last_channel=last_channel,
        bn_eps=1e-3,
        **kwargs,
    )
    return build_model(module, weights, input_shape=(1, 64, 64, 3))


@register_model()
def efficientnet_b0(*, weights: Optional[EfficientNet_B0_Weights] = None, **kwargs):
    return _build_b(1.0, 1.0, 0.2, EfficientNet_B0_Weights.verify(weights), **kwargs)


@register_model()
def efficientnet_b1(*, weights: Optional[EfficientNet_B1_Weights] = None, **kwargs):
    return _build_b(1.0, 1.1, 0.2, EfficientNet_B1_Weights.verify(weights), **kwargs)


@register_model()
def efficientnet_b2(*, weights: Optional[EfficientNet_B2_Weights] = None, **kwargs):
    return _build_b(1.1, 1.2, 0.3, EfficientNet_B2_Weights.verify(weights), **kwargs)


@register_model()
def efficientnet_b3(*, weights: Optional[EfficientNet_B3_Weights] = None, **kwargs):
    return _build_b(1.2, 1.4, 0.3, EfficientNet_B3_Weights.verify(weights), **kwargs)


@register_model()
def efficientnet_b4(*, weights: Optional[EfficientNet_B4_Weights] = None, **kwargs):
    return _build_b(1.4, 1.8, 0.4, EfficientNet_B4_Weights.verify(weights), **kwargs)


@register_model()
def efficientnet_b5(*, weights: Optional[EfficientNet_B5_Weights] = None, **kwargs):
    return _build_b(
        1.6, 2.2, 0.4, EfficientNet_B5_Weights.verify(weights),
        bn_eps=0.001, bn_momentum=0.99, **kwargs,
    )


@register_model()
def efficientnet_b6(*, weights: Optional[EfficientNet_B6_Weights] = None, **kwargs):
    return _build_b(
        1.8, 2.6, 0.5, EfficientNet_B6_Weights.verify(weights),
        bn_eps=0.001, bn_momentum=0.99, **kwargs,
    )


@register_model()
def efficientnet_b7(*, weights: Optional[EfficientNet_B7_Weights] = None, **kwargs):
    return _build_b(
        2.0, 3.1, 0.5, EfficientNet_B7_Weights.verify(weights),
        bn_eps=0.001, bn_momentum=0.99, **kwargs,
    )


@register_model()
def efficientnet_v2_s(*, weights: Optional[EfficientNet_V2_S_Weights] = None, **kwargs):
    return _build_v2("s", 0.2, EfficientNet_V2_S_Weights.verify(weights), **kwargs)


@register_model()
def efficientnet_v2_m(*, weights: Optional[EfficientNet_V2_M_Weights] = None, **kwargs):
    return _build_v2("m", 0.3, EfficientNet_V2_M_Weights.verify(weights), **kwargs)


@register_model()
def efficientnet_v2_l(*, weights: Optional[EfficientNet_V2_L_Weights] = None, **kwargs):
    return _build_v2("l", 0.4, EfficientNet_V2_L_Weights.verify(weights), **kwargs)
