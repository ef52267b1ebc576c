"""S3D (reference ``torchvision/models/video/s3d.py``, 219 LoC)."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.transforms._presets import VideoClassification

__all__ = ["S3D", "S3D_Weights", "s3d"]

_BN_EPS = 1e-3
_BN_MOM = 0.999  # torch momentum 0.001


def _cna3d(feat, kernel, stride, name, train):
    pads = [((k - 1) // 2,) * 2 for k in kernel]

    def apply(x):
        x = nn.Conv(
            feat, kernel, stride, padding=pads, use_bias=False, name=f"{name}.0"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=_BN_MOM, epsilon=_BN_EPS,
            name=f"{name}.1",
        )(x)
        return nn.relu(x)

    return apply


def _sep_conv(feat, k, s, name, train):
    def apply(x):
        x = _cna3d(feat, (1, k, k), (1, s, s), f"{name}.0", train)(x)
        return _cna3d(feat, (k, 1, 1), (s, 1, 1), f"{name}.1", train)(x)

    return apply


def _maxpool3d(x, kernel, stride, pad):
    pads = [(p, p) for p in pad]
    return nn.max_pool(x, kernel, stride, padding=tuple(pads))


class _SepInception(nn.Module):
    b0_out: int
    b1_mid: int
    b1_out: int
    b2_mid: int
    b2_out: int
    b3_out: int

    @nn.compact
    def __call__(self, x, train=False):
        x0 = _cna3d(self.b0_out, (1, 1, 1), (1, 1, 1), "branch0", train)(x)
        x1 = _cna3d(self.b1_mid, (1, 1, 1), (1, 1, 1), "branch1.0", train)(x)
        x1 = _sep_conv(self.b1_out, 3, 1, "branch1.1", train)(x1)
        x2 = _cna3d(self.b2_mid, (1, 1, 1), (1, 1, 1), "branch2.0", train)(x)
        x2 = _sep_conv(self.b2_out, 3, 1, "branch2.1", train)(x2)
        x3 = _maxpool3d(x, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        x3 = _cna3d(self.b3_out, (1, 1, 1), (1, 1, 1), "branch3.1", train)(x3)
        return jnp.concatenate([x0, x1, x2, x3], axis=-1)


class S3D(nn.Module):
    num_classes: int = 400
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        x = _sep_conv(64, 7, 2, "features.0", train)(x)
        x = _maxpool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        x = _cna3d(64, (1, 1, 1), (1, 1, 1), "features.2", train)(x)
        x = _sep_conv(192, 3, 1, "features.3", train)(x)
        x = _maxpool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        features = {"stem": x}
        blocks = [
            (64, 96, 128, 16, 32, 32),
            (128, 128, 192, 32, 96, 64),
            "M2",
            (192, 96, 208, 16, 48, 64),
            (160, 112, 224, 24, 64, 64),
            (128, 128, 256, 24, 64, 64),
            (112, 144, 288, 32, 64, 64),
            (256, 160, 320, 32, 128, 128),
            "M3",
            (256, 160, 320, 32, 128, 128),
            (384, 192, 384, 48, 128, 128),
        ]
        idx = 5
        for b in blocks:
            if b == "M2":
                x = _maxpool3d(x, (3, 3, 3), (2, 2, 2), (1, 1, 1))
            elif b == "M3":
                x = _maxpool3d(x, (2, 2, 2), (2, 2, 2), (0, 0, 0))
            else:
                x = _SepInception(*b, name=f"features.{idx}")(x, train)
            features[f"features.{idx}"] = x
            idx += 1
        # avg pool (2,7,7) stride 1 then mean == global mean for 224 input;
        # use global mean like the reference's final reduction
        x = jnp.mean(x, axis=(-4, -3, -2), keepdims=True)[:, 0]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.num_classes, (1, 1), name="classifier.1")(x)
        x = jnp.mean(x, axis=(-3, -2))
        if return_features:
            return x, features
        return x


class S3D_Weights(WeightsEnum):
    KINETICS400_V1 = Weights(
        url="https://download.pytorch.org/models/s3d-d76dad2f.pth",
        transforms=functools.partial(
            VideoClassification, crop_size=(224, 224), resize_size=(256, 256)
        ),
        meta={
            "num_params": 8320048,
            "_metrics": {"Kinetics-400": {"acc@1": 68.368, "acc@5": 88.050}},
        },
    )
    DEFAULT = KINETICS400_V1


@register_model()
def s3d(*, weights: Optional[S3D_Weights] = None, **kwargs):
    weights = S3D_Weights.verify(weights)
    module = S3D(**kwargs)
    return build_model(module, weights, input_shape=(1, 4, 64, 64, 3))
