"""Inception v3 (reference ``torchvision/models/inception.py``, 478 LoC)."""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.transforms._presets import ImageClassification

__all__ = ["Inception3", "InceptionOutputs", "Inception_V3_Weights", "inception_v3"]


class InceptionOutputs(NamedTuple):
    logits: jax.Array
    aux_logits: Optional[jax.Array]


class BasicConv2d(nn.Module):
    features: int
    kernel: Union[int, Tuple[int, int]] = 1
    stride: int = 1
    padding: Union[int, Tuple[int, int]] = 0

    @nn.compact
    def __call__(self, x, train=False):
        k = (self.kernel, self.kernel) if isinstance(self.kernel, int) else self.kernel
        p = (
            (self.padding, self.padding)
            if isinstance(self.padding, int)
            else self.padding
        )
        x = nn.Conv(
            self.features, k, (self.stride, self.stride),
            padding=[(p[0], p[0]), (p[1], p[1])], use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=0.001, name="bn"
        )(x)
        return nn.relu(x)


def _avgp(x):
    return nn.avg_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(64, 1, name="branch1x1")(x, train)
        b5 = BasicConv2d(48, 1, name="branch5x5_1")(x, train)
        b5 = BasicConv2d(64, 5, padding=2, name="branch5x5_2")(b5, train)
        b3 = BasicConv2d(64, 1, name="branch3x3dbl_1")(x, train)
        b3 = BasicConv2d(96, 3, padding=1, name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv2d(96, 3, padding=1, name="branch3x3dbl_3")(b3, train)
        bp = BasicConv2d(self.pool_features, 1, name="branch_pool")(_avgp(x), train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(384, 3, 2, name="branch3x3")(x, train)
        bd = BasicConv2d(64, 1, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(96, 3, padding=1, name="branch3x3dbl_2")(bd, train)
        bd = BasicConv2d(96, 3, 2, name="branch3x3dbl_3")(bd, train)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, 1, name="branch1x1")(x, train)
        b7 = BasicConv2d(c7, 1, name="branch7x7_1")(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7, train)
        bd = BasicConv2d(c7, 1, name="branch7x7dbl_1")(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd, train)
        bp = BasicConv2d(192, 1, name="branch_pool")(_avgp(x), train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(192, 1, name="branch3x3_1")(x, train)
        b3 = BasicConv2d(320, 3, 2, name="branch3x3_2")(b3, train)
        b7 = BasicConv2d(192, 1, name="branch7x7x3_1")(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7, train)
        b7 = BasicConv2d(192, 3, 2, name="branch7x7x3_4")(b7, train)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(320, 1, name="branch1x1")(x, train)
        b3 = BasicConv2d(384, 1, name="branch3x3_1")(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, 1, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(384, 3, padding=1, name="branch3x3dbl_2")(bd, train)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd, train)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = BasicConv2d(192, 1, name="branch_pool")(_avgp(x), train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionAux(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.avg_pool(x, (5, 5), (3, 3))
        x = BasicConv2d(128, 1, name="conv0")(x, train)
        x = BasicConv2d(768, 5, name="conv1")(x, train)
        x = jnp.mean(x, axis=(-3, -2))
        return nn.Dense(self.num_classes, name="fc")(x)


class Inception3(nn.Module):
    """reference ``inception.py:28``. Input 299x299."""

    num_classes: int = 1000
    aux_logits: bool = True
    transform_input: bool = False
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        if self.transform_input:
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)

        x = BasicConv2d(32, 3, 2, name="Conv2d_1a_3x3")(x, train)
        x = BasicConv2d(32, 3, name="Conv2d_2a_3x3")(x, train)
        x = BasicConv2d(64, 3, padding=1, name="Conv2d_2b_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = BasicConv2d(80, 1, name="Conv2d_3b_1x1")(x, train)
        x = BasicConv2d(192, 3, name="Conv2d_4a_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32, name="Mixed_5b")(x, train)
        x = InceptionA(64, name="Mixed_5c")(x, train)
        x = InceptionA(64, name="Mixed_5d")(x, train)
        feats["Mixed_5d"] = x
        x = InceptionB(name="Mixed_6a")(x, train)
        x = InceptionC(128, name="Mixed_6b")(x, train)
        x = InceptionC(160, name="Mixed_6c")(x, train)
        x = InceptionC(160, name="Mixed_6d")(x, train)
        x = InceptionC(192, name="Mixed_6e")(x, train)
        feats["Mixed_6e"] = x
        aux = None
        if self.aux_logits:
            aux = InceptionAux(self.num_classes, name="AuxLogits")(x, train)
        x = InceptionD(name="Mixed_7a")(x, train)
        x = InceptionE(name="Mixed_7b")(x, train)
        x = InceptionE(name="Mixed_7c")(x, train)
        feats["Mixed_7c"] = x
        x = jnp.mean(x, axis=(-3, -2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, name="fc")(x)
        if self.aux_logits and train:
            return InceptionOutputs(logits, aux)
        if return_features:
            return logits, feats
        return logits


class Inception_V3_Weights(WeightsEnum):
    IMAGENET1K_V1 = Weights(
        url="https://download.pytorch.org/models/inception_v3_google-0cc3c7bd.pth",
        transforms=functools.partial(
            ImageClassification, crop_size=299, resize_size=342
        ),
        meta={
            "num_params": 27161264,
            "_metrics": {"ImageNet-1K": {"acc@1": 77.294, "acc@5": 93.450}},
        },
    )
    DEFAULT = IMAGENET1K_V1


@register_model()
def inception_v3(*, weights: Optional[Inception_V3_Weights] = None, **kwargs):
    weights = Inception_V3_Weights.verify(weights)
    if weights is not None:
        kwargs.setdefault("transform_input", True)
    module = Inception3(**kwargs)
    return build_model(module, weights, input_shape=(1, 299, 299, 3))
