"""ShuffleNetV2 x0.5/1.0/1.5/2.0 (reference
``torchvision/models/shufflenetv2.py``, 408 LoC)."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.transforms._presets import ImageClassification

__all__ = [
    "ShuffleNetV2",
    "ShuffleNet_V2_X0_5_Weights",
    "ShuffleNet_V2_X1_0_Weights",
    "ShuffleNet_V2_X1_5_Weights",
    "ShuffleNet_V2_X2_0_Weights",
    "shufflenet_v2_x0_5",
    "shufflenet_v2_x1_0",
    "shufflenet_v2_x1_5",
    "shufflenet_v2_x2_0",
]


def _bn(train, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    """reference ``shufflenetv2.py:28`` in channels-last."""
    *lead, c = x.shape
    x = x.reshape(*lead, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(*lead, c)


class InvertedResidual(nn.Module):
    """reference ``shufflenetv2.py:43``."""

    inp: int
    oup: int
    stride: int

    @nn.compact
    def __call__(self, x, train=False):
        branch_features = self.oup // 2

        def branch1(t):
            t = nn.Conv(
                self.inp, (3, 3), (self.stride, self.stride),
                padding=[(1, 1)] * 2, feature_group_count=self.inp,
                use_bias=False, name="branch1.0",
            )(t)
            t = _bn(train, "branch1.1")(t)
            t = nn.Conv(branch_features, (1, 1), use_bias=False, name="branch1.2")(t)
            t = _bn(train, "branch1.3")(t)
            return nn.relu(t)

        def branch2(t):
            t = nn.Conv(branch_features, (1, 1), use_bias=False, name="branch2.0")(t)
            t = _bn(train, "branch2.1")(t)
            t = nn.relu(t)
            t = nn.Conv(
                branch_features, (3, 3), (self.stride, self.stride),
                padding=[(1, 1)] * 2, feature_group_count=branch_features,
                use_bias=False, name="branch2.3",
            )(t)
            t = _bn(train, "branch2.4")(t)
            t = nn.Conv(branch_features, (1, 1), use_bias=False, name="branch2.5")(t)
            t = _bn(train, "branch2.6")(t)
            return nn.relu(t)

        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            out = jnp.concatenate([x1, branch2(x2)], axis=-1)
        else:
            out = jnp.concatenate([branch1(x), branch2(x)], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2(nn.Module):
    stages_repeats: Tuple[int, int, int]
    stages_out_channels: Tuple[int, int, int, int, int]
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        out_c = self.stages_out_channels
        x = nn.Conv(
            out_c[0], (3, 3), (2, 2), padding=[(1, 1)] * 2, use_bias=False,
            name="conv1.0",
        )(x)
        x = _bn(train, "conv1.1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        input_c = out_c[0]
        for stage_i, (repeats, output_c) in enumerate(
            zip(self.stages_repeats, out_c[1:]), start=2
        ):
            x = InvertedResidual(input_c, output_c, 2, name=f"stage{stage_i}.0")(
                x, train
            )
            for j in range(repeats - 1):
                x = InvertedResidual(
                    output_c, output_c, 1, name=f"stage{stage_i}.{j + 1}"
                )(x, train)
            feats[f"stage{stage_i}"] = x
            input_c = output_c

        x = nn.Conv(out_c[-1], (1, 1), use_bias=False, name="conv5.0")(x)
        x = _bn(train, "conv5.1")(x)
        x = nn.relu(x)
        feats["conv5"] = x
        x = jnp.mean(x, axis=(-3, -2))
        x = nn.Dense(self.num_classes, name="fc")(x)
        if return_features:
            return x, feats
        return x


def _w(url, acc1, acc5, num_params):
    return Weights(
        url=url,
        transforms=functools.partial(ImageClassification, crop_size=224),
        meta={
            "num_params": num_params,
            "_metrics": {"ImageNet-1K": {"acc@1": acc1, "acc@5": acc5}},
        },
    )


class ShuffleNet_V2_X0_5_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/shufflenetv2_x0.5-f707e7126e.pth",
        60.552, 81.746, 1366792,
    )
    DEFAULT = IMAGENET1K_V1


class ShuffleNet_V2_X1_0_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/shufflenetv2_x1-5666bf0f80.pth",
        69.362, 88.316, 2278604,
    )
    DEFAULT = IMAGENET1K_V1


class ShuffleNet_V2_X1_5_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/shufflenetv2_x1_5-3c479a10.pth",
        72.996, 91.086, 3503624,
    )
    DEFAULT = IMAGENET1K_V1


class ShuffleNet_V2_X2_0_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/shufflenetv2_x2_0-8be3c8ee.pth",
        76.230, 93.006, 7393996,
    )
    DEFAULT = IMAGENET1K_V1


def _shufflenet(repeats, channels, weights, **kwargs):
    module = ShuffleNetV2(
        stages_repeats=tuple(repeats), stages_out_channels=tuple(channels), **kwargs
    )
    return build_model(module, weights, input_shape=(1, 64, 64, 3))


@register_model()
def shufflenet_v2_x0_5(*, weights: Optional[ShuffleNet_V2_X0_5_Weights] = None, **kwargs):
    return _shufflenet(
        [4, 8, 4], [24, 48, 96, 192, 1024],
        ShuffleNet_V2_X0_5_Weights.verify(weights), **kwargs,
    )


@register_model()
def shufflenet_v2_x1_0(*, weights: Optional[ShuffleNet_V2_X1_0_Weights] = None, **kwargs):
    return _shufflenet(
        [4, 8, 4], [24, 116, 232, 464, 1024],
        ShuffleNet_V2_X1_0_Weights.verify(weights), **kwargs,
    )


@register_model()
def shufflenet_v2_x1_5(*, weights: Optional[ShuffleNet_V2_X1_5_Weights] = None, **kwargs):
    return _shufflenet(
        [4, 8, 4], [24, 176, 352, 704, 1024],
        ShuffleNet_V2_X1_5_Weights.verify(weights), **kwargs,
    )


@register_model()
def shufflenet_v2_x2_0(*, weights: Optional[ShuffleNet_V2_X2_0_Weights] = None, **kwargs):
    return _shufflenet(
        [4, 8, 4], [24, 244, 488, 976, 2048],
        ShuffleNet_V2_X2_0_Weights.verify(weights), **kwargs,
    )
