"""AlexNet (reference ``torchvision/models/alexnet.py``)."""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.transforms._presets import ImageClassification

__all__ = ["AlexNet", "AlexNet_Weights", "alexnet"]


class AlexNet(nn.Module):
    num_classes: int = 1000
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, return_features: bool = False
    ) -> jax.Array:
        feats = {}
        conv = lambda f, k, s, p, name: nn.Conv(
            f, (k, k), (s, s), padding=[(p, p)] * 2, name=name
        )
        x = nn.relu(conv(64, 11, 4, 2, "features.0")(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        feats["features.2"] = x
        x = nn.relu(conv(192, 5, 1, 2, "features.3")(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        feats["features.5"] = x
        x = nn.relu(conv(384, 3, 1, 1, "features.6")(x))
        x = nn.relu(conv(256, 3, 1, 1, "features.8")(x))
        x = nn.relu(conv(256, 3, 1, 1, "features.10")(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        feats["features.12"] = x
        # adaptive avg pool to 6x6: inputs are 224 -> 6x6 already; general
        # case uses the area resample matrix
        if x.shape[-3] != 6 or x.shape[-2] != 6:
            from vision_tpu.transforms.v2.functional._resample import resize_2d

            x = resize_2d(x, (6, 6), mode="area")
        x = x.reshape(x.shape[0], -1)  # HWC flatten (hook reorders weights)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, name="classifier.1")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, name="classifier.4")(x))
        x = nn.Dense(self.num_classes, name="classifier.6")(x)
        if return_features:
            return x, feats
        return x


def _chw_to_hwc_linear(sd, key, c, h, w):
    """Reorder a Linear weight whose input was a CHW flatten to HWC order."""
    if key in sd:
        wgt = np.asarray(sd[key])
        out = wgt.reshape(wgt.shape[0], c, h, w).transpose(0, 2, 3, 1)
        sd[key] = out.reshape(wgt.shape[0], -1)
    return sd


def _alexnet_hooks(sd):
    return _chw_to_hwc_linear(sd, "classifier.1.weight", 256, 6, 6)


class AlexNet_Weights(WeightsEnum):
    IMAGENET1K_V1 = Weights(
        url="https://download.pytorch.org/models/alexnet-owt-7be5be79.pth",
        transforms=functools.partial(ImageClassification, crop_size=224),
        meta={
            "num_params": 61100840,
            "_metrics": {"ImageNet-1K": {"acc@1": 56.522, "acc@5": 79.066}},
        },
    )
    DEFAULT = IMAGENET1K_V1


@register_model()
def alexnet(*, weights: Optional[AlexNet_Weights] = None, **kwargs) -> VisionModel:
    weights = AlexNet_Weights.verify(weights)
    module = AlexNet(**kwargs)
    return build_model(module, weights, hooks=_alexnet_hooks)
