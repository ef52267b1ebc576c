"""RegNet X/Y families (reference ``torchvision/models/regnet.py``, 1571
LoC): regnet_x/y 400mf-32gf (+ y_128gf SWAG)."""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, _make_divisible, build_model
from vision_tpu.transforms._presets import ImageClassification

__all__ = [
    "RegNet",
    "regnet_y_400mf", "regnet_y_800mf", "regnet_y_1_6gf", "regnet_y_3_2gf",
    "regnet_y_8gf", "regnet_y_16gf", "regnet_y_32gf", "regnet_y_128gf",
    "regnet_x_400mf", "regnet_x_800mf", "regnet_x_1_6gf", "regnet_x_3_2gf",
    "regnet_x_8gf", "regnet_x_16gf", "regnet_x_32gf",
    "RegNet_Y_400MF_Weights", "RegNet_Y_800MF_Weights",
    "RegNet_Y_1_6GF_Weights", "RegNet_Y_3_2GF_Weights", "RegNet_Y_8GF_Weights",
    "RegNet_Y_16GF_Weights", "RegNet_Y_32GF_Weights", "RegNet_Y_128GF_Weights",
    "RegNet_X_400MF_Weights", "RegNet_X_800MF_Weights",
    "RegNet_X_1_6GF_Weights", "RegNet_X_3_2GF_Weights", "RegNet_X_8GF_Weights",
    "RegNet_X_16GF_Weights", "RegNet_X_32GF_Weights",
]


def _block_params(depth, w_0, w_a, w_m, group_width, se_ratio=None,
                  bottleneck_multiplier=1.0):
    """reference BlockParams.from_init_params (numpy port)."""
    QUANT = 8
    widths_cont = np.arange(depth) * w_a + w_0
    block_capacity = np.round(np.log(widths_cont / w_0) / math.log(w_m))
    block_widths = (
        (np.round(np.divide(w_0 * np.power(w_m, block_capacity), QUANT)) * QUANT)
        .astype(int)
        .tolist()
    )
    num_stages = len(set(block_widths))

    split_helper = zip(
        block_widths + [0], [0] + block_widths, block_widths + [0],
        [0] + block_widths,
    )
    splits = [w != wp or r != rp for w, wp, r, rp in split_helper]
    stage_widths = [w for w, t in zip(block_widths, splits[:-1]) if t]
    stage_depths = np.diff(
        [d for d, t in enumerate(splits) if t]
    ).astype(int).tolist()

    strides = [2] * num_stages
    bms = [bottleneck_multiplier] * num_stages
    gws = [group_width] * num_stages

    # adjust width/group compatibility
    widths = [int(w * b) for w, b in zip(stage_widths, bms)]
    gws_min = [min(g, w_bot) for g, w_bot in zip(gws, widths)]
    ws_bot = [_make_divisible(w_bot, g) for w_bot, g in zip(widths, gws_min)]
    stage_widths = [int(w_bot / b) for w_bot, b in zip(ws_bot, bms)]

    return list(zip(stage_widths, strides, stage_depths, gws_min, bms)), se_ratio


def _bn(train, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class _CNA(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=[(p, p)] * 2, feature_group_count=self.groups,
            use_bias=False, name="0",
        )(x)
        x = _bn(train, "1")(x)
        return nn.relu(x) if self.act else x


class _SE(nn.Module):
    input_channels: int
    squeeze_channels: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.relu(nn.Conv(self.squeeze_channels, (1, 1), name="fc1")(s))
        s = nn.Conv(self.input_channels, (1, 1), name="fc2")(s)
        return x * nn.sigmoid(s)


class ResBottleneckBlock(nn.Module):
    width_in: int
    width_out: int
    stride: int
    group_width: int
    bottleneck_multiplier: float
    se_ratio: Optional[float]

    @nn.compact
    def __call__(self, x, train=False):
        w_b = int(round(self.width_out * self.bottleneck_multiplier))
        g = w_b // self.group_width
        out = _CNA(w_b, 1, name="f.a")(x, train)
        out = _CNA(w_b, 3, self.stride, groups=g, name="f.b")(out, train)
        if self.se_ratio:
            w_se = int(round(self.se_ratio * self.width_in))
            out = _SE(w_b, w_se, name="f.se")(out)
        out = _CNA(self.width_out, 1, act=False, name="f.c")(out, train)
        if self.width_in != self.width_out or self.stride != 1:
            identity = _CNA(self.width_out, 1, self.stride, act=False, name="proj")(
                x, train
            )
        else:
            identity = x
        return nn.relu(identity + out)


class RegNet(nn.Module):
    stage_params: Tuple  # ((width, stride, depth, group_width, bm), ...)
    se_ratio: Optional[float]
    stem_width: int = 32
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        x = _CNA(self.stem_width, 3, 2, name="stem")(x, train)
        feats["stem"] = x
        current = self.stem_width
        for i, (width_out, stride, depth, gw, bm) in enumerate(self.stage_params):
            for j in range(depth):
                x = ResBottleneckBlock(
                    current if j == 0 else width_out,
                    width_out,
                    stride if j == 0 else 1,
                    gw,
                    bm,
                    self.se_ratio,
                    name=f"trunk_output.block{i + 1}.block{i + 1}-{j}",
                )(x, train)
            feats[f"trunk_output.block{i + 1}"] = x
            current = width_out
        x = jnp.mean(x, axis=(-3, -2))
        x = nn.Dense(self.num_classes, name="fc")(x)
        if return_features:
            return x, feats
        return x


def _w(url, acc1, acc5, num_params, crop=224, resize=232, interp="bilinear"):
    return Weights(
        url=url,
        transforms=functools.partial(
            ImageClassification, crop_size=crop, resize_size=resize,
            interpolation=interp,
        ),
        meta={
            "num_params": num_params,
            "_metrics": {"ImageNet-1K": {"acc@1": acc1, "acc@5": acc5}},
        },
    )


class RegNet_Y_400MF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_y_400mf-c65dace8.pth", 74.046, 91.716, 4344144, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_y_400mf-e6988f5f.pth", 75.804, 92.742, 4344144)
    DEFAULT = IMAGENET1K_V2


class RegNet_Y_800MF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_y_800mf-1b27b58c.pth", 76.420, 93.136, 6432512, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_y_800mf-58fc7688.pth", 78.828, 94.502, 6432512)
    DEFAULT = IMAGENET1K_V2


class RegNet_Y_1_6GF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_y_1_6gf-b11a554e.pth", 77.950, 93.966, 11202430, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_y_1_6gf-0d7bc02a.pth", 80.876, 95.444, 11202430)
    DEFAULT = IMAGENET1K_V2


class RegNet_Y_3_2GF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_y_3_2gf-b5a9779c.pth", 78.948, 94.576, 19436338, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_y_3_2gf-9180c971.pth", 81.982, 95.972, 19436338)
    DEFAULT = IMAGENET1K_V2


class RegNet_Y_8GF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_y_8gf-d0d0e4a8.pth", 80.032, 95.048, 39381472, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_y_8gf-dc2b1b54.pth", 82.828, 96.330, 39381472)
    DEFAULT = IMAGENET1K_V2


class RegNet_Y_16GF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_y_16gf-9e6ed7dd.pth", 80.424, 95.240, 83590140, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_y_16gf-3e4a00f9.pth", 82.886, 96.328, 83590140)
    IMAGENET1K_SWAG_E2E_V1 = _w(
        "https://download.pytorch.org/models/regnet_y_16gf_swag-43afe44d.pth",
        86.012, 98.054, 83590140, crop=384, resize=384, interp="bicubic",
    )
    IMAGENET1K_SWAG_LINEAR_V1 = _w(
        "https://download.pytorch.org/models/regnet_y_16gf_lc_swag-f3ec0043.pth",
        83.976, 97.244, 83590140, interp="bicubic", resize=224,
    )
    DEFAULT = IMAGENET1K_V2


class RegNet_Y_32GF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_y_32gf-4dee3f7a.pth", 80.878, 95.340, 145046770, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_y_32gf-8db6d4b5.pth", 83.368, 96.498, 145046770)
    IMAGENET1K_SWAG_E2E_V1 = _w(
        "https://download.pytorch.org/models/regnet_y_32gf_swag-04fdfa75.pth",
        86.838, 98.362, 145046770, crop=384, resize=384, interp="bicubic",
    )
    IMAGENET1K_SWAG_LINEAR_V1 = _w(
        "https://download.pytorch.org/models/regnet_y_32gf_lc_swag-e1583746.pth",
        84.622, 97.480, 145046770, interp="bicubic", resize=224,
    )
    DEFAULT = IMAGENET1K_V2


class RegNet_Y_128GF_Weights(WeightsEnum):
    IMAGENET1K_SWAG_E2E_V1 = _w(
        "https://download.pytorch.org/models/regnet_y_128gf_swag-c8ce3e52.pth",
        88.228, 98.682, 644812894, crop=384, resize=384, interp="bicubic",
    )
    IMAGENET1K_SWAG_LINEAR_V1 = _w(
        "https://download.pytorch.org/models/regnet_y_128gf_lc_swag-cbe8ce12.pth",
        86.068, 97.844, 644812894, interp="bicubic", resize=224,
    )
    DEFAULT = IMAGENET1K_SWAG_E2E_V1


class RegNet_X_400MF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_x_400mf-adf1edd5.pth", 72.834, 90.950, 5495976, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_x_400mf-62229a5f.pth", 74.864, 92.322, 5495976)
    DEFAULT = IMAGENET1K_V2


class RegNet_X_800MF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_x_800mf-ad17e45c.pth", 75.212, 92.348, 7259656, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_x_800mf-94a99ebd.pth", 77.522, 93.826, 7259656)
    DEFAULT = IMAGENET1K_V2


class RegNet_X_1_6GF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_x_1_6gf-e3633e7f.pth", 77.040, 93.440, 9190136, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_x_1_6gf-a12f2b72.pth", 79.668, 94.922, 9190136)
    DEFAULT = IMAGENET1K_V2


class RegNet_X_3_2GF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_x_3_2gf-f342aeae.pth", 78.364, 93.992, 15296552, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_x_3_2gf-7071aa85.pth", 81.196, 95.430, 15296552)
    DEFAULT = IMAGENET1K_V2


class RegNet_X_8GF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_x_8gf-03ceed89.pth", 79.344, 94.686, 39572648, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_x_8gf-2b70d774.pth", 81.682, 95.678, 39572648)
    DEFAULT = IMAGENET1K_V2


class RegNet_X_16GF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_x_16gf-2007eb11.pth", 80.058, 94.944, 54278536, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_x_16gf-ba3796d7.pth", 82.716, 96.196, 54278536)
    DEFAULT = IMAGENET1K_V2


class RegNet_X_32GF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("https://download.pytorch.org/models/regnet_x_32gf-9d47f8d0.pth", 80.622, 95.248, 107811560, resize=256)
    IMAGENET1K_V2 = _w("https://download.pytorch.org/models/regnet_x_32gf-6eb8fdc6.pth", 83.014, 96.288, 107811560)
    DEFAULT = IMAGENET1K_V2


def _regnet(conf, weights, **kwargs):
    stage_params, se_ratio = conf
    module = RegNet(stage_params=tuple(stage_params), se_ratio=se_ratio, **kwargs)
    return build_model(module, weights, input_shape=(1, 64, 64, 3))


@register_model()
def regnet_y_400mf(*, weights: Optional[RegNet_Y_400MF_Weights] = None, **kwargs):
    return _regnet(_block_params(16, 48, 27.89, 2.09, 8, 0.25),
                   RegNet_Y_400MF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_y_800mf(*, weights: Optional[RegNet_Y_800MF_Weights] = None, **kwargs):
    return _regnet(_block_params(14, 56, 38.84, 2.4, 16, 0.25),
                   RegNet_Y_800MF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_y_1_6gf(*, weights: Optional[RegNet_Y_1_6GF_Weights] = None, **kwargs):
    return _regnet(_block_params(27, 48, 20.71, 2.65, 24, 0.25),
                   RegNet_Y_1_6GF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_y_3_2gf(*, weights: Optional[RegNet_Y_3_2GF_Weights] = None, **kwargs):
    return _regnet(_block_params(21, 80, 42.63, 2.66, 24, 0.25),
                   RegNet_Y_3_2GF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_y_8gf(*, weights: Optional[RegNet_Y_8GF_Weights] = None, **kwargs):
    return _regnet(_block_params(17, 192, 76.82, 2.19, 56, 0.25),
                   RegNet_Y_8GF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_y_16gf(*, weights: Optional[RegNet_Y_16GF_Weights] = None, **kwargs):
    return _regnet(_block_params(18, 200, 106.23, 2.48, 112, 0.25),
                   RegNet_Y_16GF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_y_32gf(*, weights: Optional[RegNet_Y_32GF_Weights] = None, **kwargs):
    return _regnet(_block_params(20, 232, 115.89, 2.53, 232, 0.25),
                   RegNet_Y_32GF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_y_128gf(*, weights: Optional[RegNet_Y_128GF_Weights] = None, **kwargs):
    return _regnet(_block_params(27, 456, 160.83, 2.52, 264, 0.25),
                   RegNet_Y_128GF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_x_400mf(*, weights: Optional[RegNet_X_400MF_Weights] = None, **kwargs):
    return _regnet(_block_params(22, 24, 24.48, 2.54, 16),
                   RegNet_X_400MF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_x_800mf(*, weights: Optional[RegNet_X_800MF_Weights] = None, **kwargs):
    return _regnet(_block_params(16, 56, 35.73, 2.28, 16),
                   RegNet_X_800MF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_x_1_6gf(*, weights: Optional[RegNet_X_1_6GF_Weights] = None, **kwargs):
    return _regnet(_block_params(18, 80, 34.01, 2.25, 24),
                   RegNet_X_1_6GF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_x_3_2gf(*, weights: Optional[RegNet_X_3_2GF_Weights] = None, **kwargs):
    return _regnet(_block_params(25, 88, 26.31, 2.25, 48),
                   RegNet_X_3_2GF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_x_8gf(*, weights: Optional[RegNet_X_8GF_Weights] = None, **kwargs):
    return _regnet(_block_params(23, 80, 49.56, 2.88, 120),
                   RegNet_X_8GF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_x_16gf(*, weights: Optional[RegNet_X_16GF_Weights] = None, **kwargs):
    return _regnet(_block_params(22, 216, 55.59, 2.1, 128),
                   RegNet_X_16GF_Weights.verify(weights), **kwargs)


@register_model()
def regnet_x_32gf(*, weights: Optional[RegNet_X_32GF_Weights] = None, **kwargs):
    return _regnet(_block_params(23, 320, 69.86, 2.0, 168),
                   RegNet_X_32GF_Weights.verify(weights), **kwargs)
