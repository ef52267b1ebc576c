"""Video ResNets (reference ``torchvision/models/video/resnet.py``, 504
LoC): r3d_18 (3D convs), mc3_18 (mixed 3D/2D), r2plus1d_18 (factorized
(2+1)D convs). Layout: (N, T, H, W, C)."""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.transforms._presets import VideoClassification

__all__ = [
    "VideoResNet",
    "R3D_18_Weights",
    "MC3_18_Weights",
    "R2Plus1D_18_Weights",
    "r3d_18",
    "mc3_18",
    "r2plus1d_18",
]


def _bn(train, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


def _conv3d(feat, kernel, stride, name):
    pads = [((k - 1) // 2,) * 2 for k in kernel]
    return nn.Conv(
        feat, kernel, stride, padding=pads, use_bias=False, name=name
    )


def _midplanes(inp, planes):
    return (inp * planes * 3 * 3 * 3) // (inp * 3 * 3 + 3 * planes)


class _Block(nn.Module):
    """BasicBlock with a pluggable conv maker (reference
    ``video/resnet.py:87``)."""

    planes: int
    conv_type: str  # "3d" | "no_temporal" | "2plus1d"
    in_planes: int
    stride: int = 1
    downsample: bool = False

    def _conv(self, x, planes, stride, name, train):
        if self.conv_type == "3d":
            return _conv3d(planes, (3, 3, 3), (stride,) * 3, name)(x)
        if self.conv_type == "no_temporal":
            return _conv3d(
                planes, (1, 3, 3), (1, stride, stride), name
            )(x)
        # 2plus1d: spatial then temporal; torch computes midplanes ONCE from
        # the block's (inplanes, planes) and reuses it for conv2
        mid = _midplanes(self.in_planes, planes)
        y = _conv3d(mid, (1, 3, 3), (1, stride, stride), f"{name}.0")(x)
        y = _bn(train, f"{name}.1")(y)
        y = nn.relu(y)
        return _conv3d(planes, (3, 1, 1), (stride, 1, 1), f"{name}.3")(y)

    def _ds_stride(self):
        s = self.stride
        return (1, s, s) if self.conv_type == "no_temporal" else (s, s, s)

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        out = self._conv(x, self.planes, self.stride, "conv1.0", train)
        out = _bn(train, "conv1.1")(out)
        out = nn.relu(out)
        out = self._conv(out, self.planes, 1, "conv2.0", train)
        out = _bn(train, "conv2.1")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes, (1, 1, 1), self._ds_stride(), use_bias=False,
                name="downsample.0",
            )(x)
            identity = _bn(train, "downsample.1")(identity)
        return nn.relu(out + identity)


class VideoResNet(nn.Module):
    conv_makers: Tuple[str, str, str, str]
    layers: Tuple[int, int, int, int] = (2, 2, 2, 2)
    stem_type: str = "basic"  # "basic" | "r2plus1d"
    num_classes: int = 400

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        if self.stem_type == "basic":
            x = _conv3d(64, (3, 7, 7), (1, 2, 2), "stem.0")(x)
            x = _bn(train, "stem.1")(x)
            x = nn.relu(x)
        else:
            x = _conv3d(45, (1, 7, 7), (1, 2, 2), "stem.0")(x)
            x = _bn(train, "stem.1")(x)
            x = nn.relu(x)
            x = _conv3d(64, (3, 1, 1), (1, 1, 1), "stem.3")(x)
            x = _bn(train, "stem.4")(x)
            x = nn.relu(x)

        features = {"stem": x}
        in_planes = 64
        for i, (planes, blocks, conv_type) in enumerate(
            zip((64, 128, 256, 512), self.layers, self.conv_makers)
        ):
            stride = 1 if i == 0 else 2
            for j in range(blocks):
                needs_ds = j == 0 and (stride != 1 or in_planes != planes)
                x = _Block(
                    planes=planes,
                    conv_type=conv_type,
                    in_planes=in_planes,
                    stride=stride if j == 0 else 1,
                    downsample=needs_ds,
                    name=f"layer{i + 1}.{j}",
                )(x, train)
                in_planes = planes
            features[f"layer{i + 1}"] = x
        x = jnp.mean(x, axis=(-4, -3, -2))
        x = nn.Dense(self.num_classes, name="fc")(x)
        if return_features:
            return x, features
        return x


def _w(url, acc1, acc5, num_params):
    return Weights(
        url=url,
        transforms=functools.partial(
            VideoClassification, crop_size=(112, 112), resize_size=(128, 171)
        ),
        meta={
            "num_params": num_params,
            "_metrics": {"Kinetics-400": {"acc@1": acc1, "acc@5": acc5}},
        },
    )


class R3D_18_Weights(WeightsEnum):
    KINETICS400_V1 = _w(
        "https://download.pytorch.org/models/r3d_18-b3b3357e.pth",
        63.200, 83.479, 33371472,
    )
    DEFAULT = KINETICS400_V1


class MC3_18_Weights(WeightsEnum):
    KINETICS400_V1 = _w(
        "https://download.pytorch.org/models/mc3_18-a90a0ba3.pth",
        63.960, 84.130, 11695440,
    )
    DEFAULT = KINETICS400_V1


class R2Plus1D_18_Weights(WeightsEnum):
    KINETICS400_V1 = _w(
        "https://download.pytorch.org/models/r2plus1d_18-91a641e6.pth",
        67.463, 86.175, 31505325,
    )
    DEFAULT = KINETICS400_V1


def _video_resnet(conv_makers, stem, weights, **kwargs):
    module = VideoResNet(conv_makers=conv_makers, stem_type=stem, **kwargs)
    return build_model(module, weights, input_shape=(1, 4, 64, 64, 3))


@register_model()
def r3d_18(*, weights: Optional[R3D_18_Weights] = None, **kwargs):
    return _video_resnet(
        ("3d",) * 4, "basic", R3D_18_Weights.verify(weights), **kwargs
    )


@register_model()
def mc3_18(*, weights: Optional[MC3_18_Weights] = None, **kwargs):
    return _video_resnet(
        ("3d",) + ("no_temporal",) * 3, "basic", MC3_18_Weights.verify(weights),
        **kwargs,
    )


@register_model()
def r2plus1d_18(*, weights: Optional[R2Plus1D_18_Weights] = None, **kwargs):
    return _video_resnet(
        ("2plus1d",) * 4, "r2plus1d", R2Plus1D_18_Weights.verify(weights),
        **kwargs,
    )
