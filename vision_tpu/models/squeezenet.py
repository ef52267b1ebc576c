"""SqueezeNet 1.0/1.1 (reference ``torchvision/models/squeezenet.py``)."""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.transforms._presets import ImageClassification

__all__ = [
    "SqueezeNet",
    "SqueezeNet1_0_Weights",
    "SqueezeNet1_1_Weights",
    "squeezenet1_0",
    "squeezenet1_1",
]


def _max_pool_ceil(x, window=3, stride=2):
    """torch MaxPool2d(ceil_mode=True) equivalent: pad bottom/right with
    -inf so partial windows are kept."""
    h, w = x.shape[-3], x.shape[-2]
    out_h = -(-(h - window) // stride) + 1
    out_w = -(-(w - window) // stride) + 1
    need_h = (out_h - 1) * stride + window - h
    need_w = (out_w - 1) * stride + window - w
    if need_h > 0 or need_w > 0:
        pad = [(0, 0)] * (x.ndim - 3) + [(0, max(need_h, 0)), (0, max(need_w, 0)), (0, 0)]
        x = jnp.pad(x, pad, constant_values=-jnp.inf)
    return nn.max_pool(x, (window, window), (stride, stride))


class Fire(nn.Module):
    """reference ``squeezenet.py:18``."""

    squeeze_planes: int
    expand1x1_planes: int
    expand3x3_planes: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.squeeze_planes, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand1x1_planes, (1, 1), name="expand1x1")(x))
        e3 = nn.relu(
            nn.Conv(self.expand3x3_planes, (3, 3), padding=[(1, 1)] * 2,
                    name="expand3x3")(x)
        )
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNet(nn.Module):
    version: str = "1_0"
    num_classes: int = 1000
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        f = lambda i, s, e1, e3: Fire(s, e1, e3, name=f"features.{i}")
        if self.version == "1_0":
            x = nn.relu(
                nn.Conv(96, (7, 7), (2, 2), padding="VALID", name="features.0")(x)
            )
            x = _max_pool_ceil(x)
            x = f(3, 16, 64, 64)(x)
            x = f(4, 16, 64, 64)(x)
            x = f(5, 32, 128, 128)(x)
            x = _max_pool_ceil(x)
            x = f(7, 32, 128, 128)(x)
            x = f(8, 48, 192, 192)(x)
            x = f(9, 48, 192, 192)(x)
            x = f(10, 64, 256, 256)(x)
            feats["features.10"] = x
            x = _max_pool_ceil(x)
            x = f(12, 64, 256, 256)(x)
            feats["features.12"] = x
        else:
            x = nn.relu(
                nn.Conv(64, (3, 3), (2, 2), padding="VALID", name="features.0")(x)
            )
            x = _max_pool_ceil(x)
            x = f(3, 16, 64, 64)(x)
            x = f(4, 16, 64, 64)(x)
            x = _max_pool_ceil(x)
            x = f(6, 32, 128, 128)(x)
            x = f(7, 32, 128, 128)(x)
            feats["features.7"] = x
            x = _max_pool_ceil(x)
            x = f(9, 48, 192, 192)(x)
            x = f(10, 48, 192, 192)(x)
            x = f(11, 64, 256, 256)(x)
            x = f(12, 64, 256, 256)(x)
            feats["features.12"] = x

        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Conv(self.num_classes, (1, 1), name="classifier.1")(x))
        x = jnp.mean(x, axis=(-3, -2))
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


class SqueezeNet1_0_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/squeezenet1_0-b66bff10.pth",
        58.092, 80.420, 1248424,
    )
    DEFAULT = IMAGENET1K_V1


class SqueezeNet1_1_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/squeezenet1_1-b8a52dc0.pth",
        58.178, 80.624, 1235496,
    )
    DEFAULT = IMAGENET1K_V1


@register_model()
def squeezenet1_0(*, weights: Optional[SqueezeNet1_0_Weights] = None, **kwargs):
    module = SqueezeNet(version="1_0", **kwargs)
    return build_model(module, SqueezeNet1_0_Weights.verify(weights))


@register_model()
def squeezenet1_1(*, weights: Optional[SqueezeNet1_1_Weights] = None, **kwargs):
    module = SqueezeNet(version="1_1", **kwargs)
    return build_model(module, SqueezeNet1_1_Weights.verify(weights))
