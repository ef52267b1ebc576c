"""MNASNet 0.5/0.75/1.0/1.3 (reference ``torchvision/models/mnasnet.py``,
434 LoC). BN momentum 0.9997 (torch ``_BN_MOMENTUM = 1 - 0.9997``)."""

from __future__ import annotations

import functools
from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.transforms._presets import ImageClassification

__all__ = [
    "MNASNet",
    "MNASNet0_5_Weights",
    "MNASNet0_75_Weights",
    "MNASNet1_0_Weights",
    "MNASNet1_3_Weights",
    "mnasnet0_5",
    "mnasnet0_75",
    "mnasnet1_0",
    "mnasnet1_3",
]

_BN_MOMENTUM_FLAX = 0.9997  # torch momentum 0.0003 -> flax 1 - 0.0003


def _bn(train, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=_BN_MOMENTUM_FLAX,
        epsilon=1e-5, name=name,
    )


def _round_to_multiple_of(val: float, divisor: int, round_up_bias: float = 0.9) -> int:
    new_val = max(divisor, int(val + divisor / 2) // divisor * divisor)
    return new_val if new_val >= round_up_bias * val else new_val + divisor


def _get_depths(alpha: float) -> List[int]:
    depths = [32, 16, 24, 40, 80, 96, 192, 320]
    return [_round_to_multiple_of(d * alpha, 8) for d in depths]


class _InvertedResidual(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    expansion: int
    in_ch: int

    @nn.compact
    def __call__(self, x, train=False):
        mid = self.in_ch * self.expansion
        res = self.in_ch == self.out_ch and self.stride == 1
        out = nn.Conv(mid, (1, 1), use_bias=False, name="layers.0")(x)
        out = nn.relu(_bn(train, "layers.1")(out))
        p = self.kernel // 2
        out = nn.Conv(
            mid, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=[(p, p)] * 2, feature_group_count=mid, use_bias=False,
            name="layers.3",
        )(out)
        out = nn.relu(_bn(train, "layers.4")(out))
        out = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="layers.6")(out)
        out = _bn(train, "layers.7")(out)
        return out + x if res else out


class MNASNet(nn.Module):
    alpha: float
    num_classes: int = 1000
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        d = _get_depths(self.alpha)
        x = nn.Conv(
            d[0], (3, 3), (2, 2), padding=[(1, 1)] * 2, use_bias=False,
            name="layers.0",
        )(x)
        x = nn.relu(_bn(train, "layers.1")(x))
        x = nn.Conv(
            d[0], (3, 3), padding=[(1, 1)] * 2, feature_group_count=d[0],
            use_bias=False, name="layers.3",
        )(x)
        x = nn.relu(_bn(train, "layers.4")(x))
        x = nn.Conv(d[1], (1, 1), use_bias=False, name="layers.6")(x)
        x = _bn(train, "layers.7")(x)

        stacks = [  # in, out, kernel, stride, expansion, repeats
            (d[1], d[2], 3, 2, 3, 3),
            (d[2], d[3], 5, 2, 3, 3),
            (d[3], d[4], 5, 2, 6, 3),
            (d[4], d[5], 3, 1, 6, 2),
            (d[5], d[6], 5, 2, 6, 4),
            (d[6], d[7], 3, 1, 6, 1),
        ]
        for si, (ic, oc, k, s, e, r) in enumerate(stacks, start=8):
            x = _InvertedResidual(oc, k, s, e, ic, name=f"layers.{si}.0")(x, train)
            for j in range(1, r):
                x = _InvertedResidual(oc, k, 1, e, oc, name=f"layers.{si}.{j}")(
                    x, train
                )
            feats[f"layers.{si}"] = x

        x = nn.Conv(1280, (1, 1), use_bias=False, name="layers.14")(x)
        x = nn.relu(_bn(train, "layers.15")(x))
        feats["layers.15"] = x
        x = jnp.mean(x, axis=(-3, -2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="classifier.1")(x)
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


class MNASNet0_5_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/mnasnet0.5_top1_67.823-3ffadce67e.pth",
        67.734, 87.490, 2218512,
    )
    DEFAULT = IMAGENET1K_V1


class MNASNet0_75_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/mnasnet0_75-7090bc5f.pth",
        71.180, 90.496, 3170208, resize=232,
    )
    DEFAULT = IMAGENET1K_V1


class MNASNet1_0_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/mnasnet1.0_top1_73.512-f206786ef8.pth",
        73.456, 91.510, 4383312,
    )
    DEFAULT = IMAGENET1K_V1


class MNASNet1_3_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/mnasnet1_3-a4c69d6f.pth",
        76.506, 93.522, 6282256, resize=232,
    )
    DEFAULT = IMAGENET1K_V1


def _mnasnet(alpha, weights, **kwargs):
    module = MNASNet(alpha=alpha, **kwargs)
    return build_model(module, weights, input_shape=(1, 64, 64, 3))


@register_model()
def mnasnet0_5(*, weights: Optional[MNASNet0_5_Weights] = None, **kwargs):
    return _mnasnet(0.5, MNASNet0_5_Weights.verify(weights), **kwargs)


@register_model()
def mnasnet0_75(*, weights: Optional[MNASNet0_75_Weights] = None, **kwargs):
    return _mnasnet(0.75, MNASNet0_75_Weights.verify(weights), **kwargs)


@register_model()
def mnasnet1_0(*, weights: Optional[MNASNet1_0_Weights] = None, **kwargs):
    return _mnasnet(1.0, MNASNet1_0_Weights.verify(weights), **kwargs)


@register_model()
def mnasnet1_3(*, weights: Optional[MNASNet1_3_Weights] = None, **kwargs):
    return _mnasnet(1.3, MNASNet1_3_Weights.verify(weights), **kwargs)
