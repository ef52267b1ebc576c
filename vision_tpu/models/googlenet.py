"""GoogLeNet (reference ``torchvision/models/googlenet.py``, 345 LoC)."""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.models.squeezenet import _max_pool_ceil
from vision_tpu.transforms._presets import ImageClassification

__all__ = ["GoogLeNet", "GoogLeNet_Weights", "GoogLeNetOutputs", "googlenet"]


class GoogLeNetOutputs(NamedTuple):
    logits: jax.Array
    aux_logits2: Optional[jax.Array]
    aux_logits1: Optional[jax.Array]


class BasicConv2d(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2, use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=0.001, name="bn"
        )(x)
        return nn.relu(x)


class Inception(nn.Module):
    ch1x1: int
    ch3x3red: int
    ch3x3: int
    ch5x5red: int
    ch5x5: int
    pool_proj: int

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(self.ch1x1, 1, name="branch1")(x, train)
        b2 = BasicConv2d(self.ch3x3red, 1, name="branch2.0")(x, train)
        b2 = BasicConv2d(self.ch3x3, 3, padding=1, name="branch2.1")(b2, train)
        b3 = BasicConv2d(self.ch5x5red, 1, name="branch3.0")(x, train)
        # kernel 3 (not 5) replicates the reference's known quirk
        b3 = BasicConv2d(self.ch5x5, 3, padding=1, name="branch3.1")(b3, train)
        b4 = nn.max_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))
        b4 = BasicConv2d(self.pool_proj, 1, name="branch4.1")(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionAux(nn.Module):
    num_classes: int
    dropout: float = 0.7

    @nn.compact
    def __call__(self, x, train=False):
        from vision_tpu.transforms.v2.functional._resample import resize_2d

        x = resize_2d(x, (4, 4), mode="area")
        x = BasicConv2d(128, 1, name="conv")(x, train)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(1024, name="fc1")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="fc2")(x)


class GoogLeNet(nn.Module):
    num_classes: int = 1000
    aux_logits: bool = False
    transform_input: bool = False
    dropout: float = 0.2
    dropout_aux: float = 0.7

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        if self.transform_input:
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)

        x = BasicConv2d(64, 7, 2, 3, name="conv1")(x, train)
        x = _max_pool_ceil(x, 3, 2)
        x = BasicConv2d(64, 1, name="conv2")(x, train)
        x = BasicConv2d(192, 3, padding=1, name="conv3")(x, train)
        x = _max_pool_ceil(x, 3, 2)
        x = Inception(64, 96, 128, 16, 32, 32, name="inception3a")(x, train)
        x = Inception(128, 128, 192, 32, 96, 64, name="inception3b")(x, train)
        feats["inception3b"] = x
        x = _max_pool_ceil(x, 3, 2)
        x = Inception(192, 96, 208, 16, 48, 64, name="inception4a")(x, train)
        aux1 = None
        if self.aux_logits:
            # computed in eval too so params always exist (discarded below)
            aux1 = InceptionAux(self.num_classes, self.dropout_aux, name="aux1")(
                x, train
            )
        x = Inception(160, 112, 224, 24, 64, 64, name="inception4b")(x, train)
        x = Inception(128, 128, 256, 24, 64, 64, name="inception4c")(x, train)
        x = Inception(112, 144, 288, 32, 64, 64, name="inception4d")(x, train)
        aux2 = None
        if self.aux_logits:
            aux2 = InceptionAux(self.num_classes, self.dropout_aux, name="aux2")(
                x, train
            )
        x = Inception(256, 160, 320, 32, 128, 128, name="inception4e")(x, train)
        feats["inception4e"] = x
        x = _max_pool_ceil(x, 2, 2)
        x = Inception(256, 160, 320, 32, 128, 128, name="inception5a")(x, train)
        x = Inception(384, 192, 384, 48, 128, 128, name="inception5b")(x, train)
        feats["inception5b"] = x

        x = jnp.mean(x, axis=(-3, -2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, name="fc")(x)
        if self.aux_logits and train:
            return GoogLeNetOutputs(logits, aux2, aux1)
        if return_features:
            return logits, feats
        return logits


def _googlenet_hooks(aux_logits):
    from vision_tpu.models.alexnet import _chw_to_hwc_linear

    def hooks(sd):
        if not aux_logits:
            # pretrained checkpoint carries aux heads; torchvision drops
            # them on load (googlenet builder), meta num_params excludes them
            sd = {k: v for k, v in sd.items() if not k.startswith(("aux1.", "aux2."))}
        else:
            sd = _chw_to_hwc_linear(dict(sd), "aux1.fc1.weight", 128, 4, 4)
            sd = _chw_to_hwc_linear(sd, "aux2.fc1.weight", 128, 4, 4)
        return sd

    return hooks


class GoogLeNet_Weights(WeightsEnum):
    IMAGENET1K_V1 = Weights(
        url="https://download.pytorch.org/models/googlenet-1378be20.pth",
        transforms=functools.partial(ImageClassification, crop_size=224),
        meta={
            "num_params": 6624904,
            "_metrics": {"ImageNet-1K": {"acc@1": 69.778, "acc@5": 89.530}},
        },
    )
    DEFAULT = IMAGENET1K_V1


@register_model()
def googlenet(*, weights: Optional[GoogLeNet_Weights] = None, **kwargs):
    weights = GoogLeNet_Weights.verify(weights)
    if weights is not None:
        kwargs.setdefault("transform_input", True)
    module = GoogLeNet(**kwargs)
    return build_model(
        module,
        weights,
        hooks=_googlenet_hooks(kwargs.get("aux_logits", False)),
        input_shape=(1, 224, 224, 3),
    )
