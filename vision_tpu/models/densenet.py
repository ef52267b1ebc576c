"""DenseNet 121/161/169/201 (reference ``torchvision/models/densenet.py``,
448 LoC)."""

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
    "DenseNet",
    "DenseNet121_Weights",
    "DenseNet161_Weights",
    "DenseNet169_Weights",
    "DenseNet201_Weights",
    "densenet121",
    "densenet161",
    "densenet169",
    "densenet201",
]


def _bn(train, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class _DenseLayer(nn.Module):
    """reference ``densenet.py:31``: BN-ReLU-Conv1x1-BN-ReLU-Conv3x3."""

    growth_rate: int
    bn_size: int
    drop_rate: float

    @nn.compact
    def __call__(self, x, train=False):
        out = _bn(train, "norm1")(x)
        out = nn.relu(out)
        out = nn.Conv(
            self.bn_size * self.growth_rate, (1, 1), use_bias=False, name="conv1"
        )(out)
        out = _bn(train, "norm2")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.growth_rate, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
            name="conv2",
        )(out)
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        return out


class DenseNet(nn.Module):
    """reference ``densenet.py:135``."""

    growth_rate: int = 32
    block_config: Tuple[int, int, int, int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    drop_rate: float = 0.0
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        x = nn.Conv(
            self.num_init_features, (7, 7), (2, 2), padding=[(3, 3)] * 2,
            use_bias=False, name="features.conv0",
        )(x)
        x = _bn(train, "features.norm0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            for j in range(num_layers):
                new = _DenseLayer(
                    self.growth_rate, self.bn_size, self.drop_rate,
                    name=f"features.denseblock{i + 1}.denselayer{j + 1}",
                )(x, train)
                x = jnp.concatenate([x, new], axis=-1)
            num_features += num_layers * self.growth_rate
            feats[f"features.denseblock{i + 1}"] = x
            if i != len(self.block_config) - 1:
                x = _bn(train, f"features.transition{i + 1}.norm")(x)
                x = nn.relu(x)
                x = nn.Conv(
                    num_features // 2, (1, 1), use_bias=False,
                    name=f"features.transition{i + 1}.conv",
                )(x)
                x = nn.avg_pool(x, (2, 2), (2, 2))
                num_features //= 2

        x = _bn(train, "features.norm5")(x)
        x = nn.relu(x)
        feats["features.norm5"] = x
        x = jnp.mean(x, axis=(-3, -2))
        x = nn.Dense(self.num_classes, name="classifier")(x)
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


class DenseNet121_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/densenet121-a639ec97.pth",
        74.434, 91.972, 7978856,
    )
    DEFAULT = IMAGENET1K_V1


class DenseNet161_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/densenet161-8d451a50.pth",
        77.138, 93.560, 28681000,
    )
    DEFAULT = IMAGENET1K_V1


class DenseNet169_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/densenet169-b2777c0a.pth",
        75.600, 92.806, 14149480,
    )
    DEFAULT = IMAGENET1K_V1


class DenseNet201_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/densenet201-c1103571.pth",
        76.896, 93.370, 20013928,
    )
    DEFAULT = IMAGENET1K_V1


def _densenet_hooks(sd):
    """Old densenet checkpoints use ``.1`` / ``.2`` suffixes inside
    denselayers (norm.1 etc.); current ones don't. Strip if present."""
    import re

    out = {}
    pat = re.compile(
        r"^(.*denselayer\d+\.(?:norm|relu|conv))\.((?:[12])\..*)$"
    )
    for k, v in sd.items():
        m = pat.match(k)
        if m:
            out[m.group(1) + m.group(2)] = v
        else:
            out[k] = v
    return out


def _densenet(growth, config, init_feat, weights, **kwargs):
    module = DenseNet(
        growth_rate=growth, block_config=tuple(config),
        num_init_features=init_feat, **kwargs,
    )
    return build_model(module, weights, input_shape=(1, 64, 64, 3))


@register_model()
def densenet121(*, weights: Optional[DenseNet121_Weights] = None, **kwargs):
    return _densenet(32, (6, 12, 24, 16), 64, DenseNet121_Weights.verify(weights), **kwargs)


@register_model()
def densenet161(*, weights: Optional[DenseNet161_Weights] = None, **kwargs):
    return _densenet(48, (6, 12, 36, 24), 96, DenseNet161_Weights.verify(weights), **kwargs)


@register_model()
def densenet169(*, weights: Optional[DenseNet169_Weights] = None, **kwargs):
    return _densenet(32, (6, 12, 32, 32), 64, DenseNet169_Weights.verify(weights), **kwargs)


@register_model()
def densenet201(*, weights: Optional[DenseNet201_Weights] = None, **kwargs):
    return _densenet(32, (6, 12, 48, 32), 64, DenseNet201_Weights.verify(weights), **kwargs)
