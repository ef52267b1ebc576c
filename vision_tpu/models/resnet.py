"""ResNet family (reference ``torchvision/models/resnet.py``, 985 LoC):
resnet18/34/50/101/152, resnext50_32x4d/101_32x8d/101_64x4d,
wide_resnet50_2/101_2.

flax.linen, NHWC. Module names mirror the torch module paths
(``layer1.0.conv1`` …) so ``vision_tpu._torch_convert`` maps reference
checkpoints mechanically.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Optional, Tuple, Type

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.transforms._presets import ImageClassification

__all__ = [
    "ResNet",
    "ResNet18_Weights",
    "ResNet34_Weights",
    "ResNet50_Weights",
    "ResNet101_Weights",
    "ResNet152_Weights",
    "ResNeXt50_32X4D_Weights",
    "ResNeXt101_32X8D_Weights",
    "ResNeXt101_64X4D_Weights",
    "Wide_ResNet50_2_Weights",
    "Wide_ResNet101_2_Weights",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "resnext50_32x4d",
    "resnext101_32x8d",
    "resnext101_64x4d",
    "wide_resnet50_2",
    "wide_resnet101_2",
]


def _bn(train: bool, name: str) -> nn.Module:
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class _Kernel1x1(nn.Module):
    """Parameter holder with ``nn.Conv``'s exact variable tree (path
    ``<name>/kernel``, lecun-normal init, ``[1, 1, in, out]``) so the
    fused-BN path below shares checkpoints bit-for-bit with the unfused
    modules."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features),
        )


class _BNAffine(nn.Module):
    """BatchNorm bookkeeping for externally computed batch statistics.

    Identical variable tree to ``nn.BatchNorm`` (params ``scale``/``bias``,
    batch_stats ``mean``/``var``); consumes (mean, var) produced by the
    fused conv kernel's stats epilogue, applies the running-average
    update with flax's exact expression, and returns the per-channel
    affine ``(inv, shift)`` with ``y_norm = y * inv + shift``.
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, mean: jax.Array, var: jax.Array):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,)
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )
        ra_mean = self.variable(
            "batch_stats",
            "mean",
            lambda s: jnp.zeros(s, jnp.float32),
            (self.features,),
        )
        ra_var = self.variable(
            "batch_stats",
            "var",
            lambda s: jnp.ones(s, jnp.float32),
            (self.features,),
        )
        if not self.is_initializing():
            ra_mean.value = (
                self.momentum * ra_mean.value + (1 - self.momentum) * mean
            )
            ra_var.value = (
                self.momentum * ra_var.value + (1 - self.momentum) * var
            )
        inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        shift = bias.astype(jnp.float32) - mean * inv
        return inv, shift, jnp.promote_types(scale.dtype, bias.dtype)


def _mean_var(s1: jax.Array, s2: jax.Array, count: int):
    """flax ``use_fast_variance`` stats from the kernel's f32 sums."""
    mean = s1 / count
    return mean, jnp.maximum(0.0, s2 / count - mean * mean)


def _conv(
    features: int,
    kernel: int,
    stride: int = 1,
    groups: int = 1,
    dilation: int = 1,
    name: str = None,
) -> nn.Module:
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        feature_group_count=groups,
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        name=name,
    )


class BasicBlock(nn.Module):
    """reference ``resnet.py`` BasicBlock; expansion 1."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    expansion: int = 1
    fused_bn: bool = False  # accepted for tree-uniformity; 3x3-only
    # blocks have no 1x1 convs to fuse, so the flag is a no-op here

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        out = _conv(self.planes, 3, self.stride, dilation=self.dilation, name="conv1")(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, dilation=self.dilation, name="conv2")(out)
        out = _bn(train, "bn2")(out)
        if self.downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride, name="downsample.0")(x)
            identity = _bn(train, "downsample.1")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """reference ``resnet.py`` Bottleneck; expansion 4; stride on conv2
    (torch places stride at 3x3, the "ResNet V1.5" variant).

    ``fused_bn=True`` routes training-mode calls through the fused
    1x1-conv + BN-stats Pallas path (``ops/_pallas/conv1x1_bn.py``): the
    1x1 convs compute their BN statistics in a VMEM epilogue and the
    expand conv folds bn2's normalize+ReLU into its input read, cutting
    the train-mode BatchNorm bandwidth XLA cannot fuse away. Same
    variable tree, same semantics (flax fast-variance stats, momentum
    update) to f32 round-off; eval-mode calls always take the standard
    path.
    """

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    expansion: int = 4
    fused_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        if self.fused_bn and train:
            return self._fused_train(x, width)
        identity = x
        out = _conv(width, 1, name="conv1")(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        out = _conv(width, 3, self.stride, groups=self.groups, dilation=self.dilation, name="conv2")(out)
        out = _bn(train, "bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * self.expansion, 1, name="conv3")(out)
        out = _bn(train, "bn3")(out)
        if self.downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride, name="downsample.0")(x)
            identity = _bn(train, "downsample.1")(identity)
        return nn.relu(out + identity)

    def _fused_train(self, x: jax.Array, width: int) -> jax.Array:
        from vision_tpu.ops._pallas.conv1x1_bn import matmul_stats

        b, h, w_, cin = x.shape
        cout = self.planes * self.expansion
        xf = x.reshape(-1, cin)

        k1 = _Kernel1x1(cin, width, name="conv1")()
        y1, a1, b1 = matmul_stats(xf, k1.reshape(cin, width))
        inv1, sh1, pdt = _BNAffine(width, name="bn1")(
            *_mean_var(a1, b1, y1.shape[0])
        )
        odt = jnp.promote_types(y1.dtype, pdt)
        y1n = nn.relu(y1.astype(jnp.float32) * inv1 + sh1).astype(odt)

        y2 = _conv(
            width, 3, self.stride, groups=self.groups,
            dilation=self.dilation, name="conv2",
        )(y1n.reshape(b, h, w_, width))
        # bn2 stats: flax-style fused single pass over the 3x3 output;
        # its normalize+ReLU never materializes — it rides conv3's
        # prologue below
        y2f = y2.astype(jnp.float32)
        mu2 = jnp.mean(y2f, axis=(0, 1, 2))
        var2 = jnp.maximum(
            0.0, jnp.mean(y2f * y2f, axis=(0, 1, 2)) - mu2 * mu2
        )
        inv2, sh2, _ = _BNAffine(width, name="bn2")(mu2, var2)

        h2, w2 = y2.shape[1], y2.shape[2]
        k3 = _Kernel1x1(width, cout, name="conv3")()
        y3, a3, b3 = matmul_stats(
            y2.reshape(-1, width), k3.reshape(width, cout), inv2, sh2
        )
        inv3, sh3, _ = _BNAffine(cout, name="bn3")(
            *_mean_var(a3, b3, y3.shape[0])
        )

        if self.downsample:
            xd = x[:, :: self.stride, :: self.stride, :].reshape(-1, cin)
            kd = _Kernel1x1(cin, cout, name="downsample.0")()
            yd, ad, bd = matmul_stats(xd, kd.reshape(cin, cout))
            invd, shd, _ = _BNAffine(cout, name="downsample.1")(
                *_mean_var(ad, bd, yd.shape[0])
            )
            idn = yd.astype(jnp.float32) * invd + shd
        else:
            idn = x.reshape(-1, cout).astype(jnp.float32)

        out = nn.relu(y3.astype(jnp.float32) * inv3 + sh3 + idn).astype(odt)
        return out.reshape(b, h2, w2, cout)


class _ResLayer(nn.Module):
    block: Type[nn.Module]
    planes: int
    num_blocks: int
    stride: int
    groups: int
    base_width: int
    dilation: int
    prev_dilation: int
    in_planes: int
    fused_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        expansion = self.block.expansion
        needs_ds = self.stride != 1 or self.in_planes != self.planes * expansion
        x = self.block(
            planes=self.planes,
            stride=self.stride,
            downsample=needs_ds,
            groups=self.groups,
            base_width=self.base_width,
            dilation=self.prev_dilation,
            fused_bn=self.fused_bn,
            name="0",
        )(x, train=train)
        for i in range(1, self.num_blocks):
            x = self.block(
                planes=self.planes,
                groups=self.groups,
                base_width=self.base_width,
                dilation=self.dilation,
                fused_bn=self.fused_bn,
                name=str(i),
            )(x, train=train)
        return x


class ResNet(nn.Module):
    """reference ``resnet.py`` ResNet (builder ~:250)."""

    block: Type[nn.Module]
    layers: Tuple[int, int, int, int]
    num_classes: int = 1000
    groups: int = 1
    width_per_group: int = 64
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (False, False, False)
    fused_bn: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        return_features: bool = False,
    ):
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            name="conv1",
        )(x)
        x = _bn(train, "bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(
            x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )

        features = {}
        expansion = self.block.expansion
        in_planes = 64
        dilation = 1
        for i, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            stride = 1 if i == 0 else 2
            prev_dilation = dilation
            if i > 0 and self.replace_stride_with_dilation[i - 1]:
                dilation *= stride
                stride = 1
            x = _ResLayer(
                block=self.block,
                planes=planes,
                num_blocks=blocks,
                stride=stride,
                groups=self.groups,
                base_width=self.width_per_group,
                dilation=dilation,
                prev_dilation=prev_dilation,
                in_planes=in_planes,
                fused_bn=self.fused_bn,
                name=f"layer{i + 1}",
            )(x, train=train)
            in_planes = planes * expansion
            features[f"layer{i + 1}"] = x

        x = jnp.mean(x, axis=(-3, -2))  # global avg pool
        x = nn.Dense(self.num_classes, name="fc")(x)
        if return_features:
            return x, features
        return x


_COMMON_META = {"min_size": (1, 1), "categories": "imagenet-1k"}


def _cls_weights(url, crop, resize, metrics, num_params, recipe="",
                 ops=None, file_size=None):
    meta = {
        **_COMMON_META,
        "num_params": num_params,
        "recipe": recipe,
        "_metrics": {"ImageNet-1K": metrics},
    }
    if ops is not None:
        meta["_ops"] = ops  # GMACs at 224x224 (reference _ops meta)
    if file_size is not None:
        meta["_file_size"] = file_size  # checkpoint MB (reference meta)
    return Weights(
        url=url,
        transforms=functools.partial(
            ImageClassification, crop_size=crop, resize_size=resize
        ),
        meta=meta,
    )


class ResNet18_Weights(WeightsEnum):
    IMAGENET1K_V1 = _cls_weights(
        "https://download.pytorch.org/models/resnet18-f37072fd.pth",
        224, 256, {"acc@1": 69.758, "acc@5": 89.078}, 11689512,
        ops=1.814, file_size=44.661,
    )
    DEFAULT = IMAGENET1K_V1


class ResNet34_Weights(WeightsEnum):
    IMAGENET1K_V1 = _cls_weights(
        "https://download.pytorch.org/models/resnet34-b627a593.pth",
        224, 256, {"acc@1": 73.314, "acc@5": 91.420}, 21797672,
        ops=3.664, file_size=83.275,
    )
    DEFAULT = IMAGENET1K_V1


class ResNet50_Weights(WeightsEnum):
    IMAGENET1K_V1 = _cls_weights(
        "https://download.pytorch.org/models/resnet50-0676ba61.pth",
        224, 256, {"acc@1": 76.130, "acc@5": 92.862}, 25557032,
        ops=4.089, file_size=97.781,
    )
    IMAGENET1K_V2 = _cls_weights(
        "https://download.pytorch.org/models/resnet50-11ad3fa6.pth",
        224, 232, {"acc@1": 80.858, "acc@5": 95.434}, 25557032,
        ops=4.089, file_size=97.79,
    )
    DEFAULT = IMAGENET1K_V2


class ResNet101_Weights(WeightsEnum):
    IMAGENET1K_V1 = _cls_weights(
        "https://download.pytorch.org/models/resnet101-63fe2227.pth",
        224, 256, {"acc@1": 77.374, "acc@5": 93.546}, 44549160,
        ops=7.801, file_size=170.511,
    )
    IMAGENET1K_V2 = _cls_weights(
        "https://download.pytorch.org/models/resnet101-cd907fc2.pth",
        224, 232, {"acc@1": 81.886, "acc@5": 95.780}, 44549160,
        ops=7.801, file_size=170.53,
    )
    DEFAULT = IMAGENET1K_V2


class ResNet152_Weights(WeightsEnum):
    IMAGENET1K_V1 = _cls_weights(
        "https://download.pytorch.org/models/resnet152-394f9c45.pth",
        224, 256, {"acc@1": 78.312, "acc@5": 94.046}, 60192808,
        ops=11.514, file_size=230.434,
    )
    IMAGENET1K_V2 = _cls_weights(
        "https://download.pytorch.org/models/resnet152-f82ba261.pth",
        224, 232, {"acc@1": 82.284, "acc@5": 96.002}, 60192808,
        ops=11.514, file_size=230.474,
    )
    DEFAULT = IMAGENET1K_V2


class ResNeXt50_32X4D_Weights(WeightsEnum):
    IMAGENET1K_V1 = _cls_weights(
        "https://download.pytorch.org/models/resnext50_32x4d-7cdf4587.pth",
        224, 256, {"acc@1": 77.618, "acc@5": 93.698}, 25028904,
        ops=4.23, file_size=95.789,
    )
    IMAGENET1K_V2 = _cls_weights(
        "https://download.pytorch.org/models/resnext50_32x4d-1a0047aa.pth",
        224, 232, {"acc@1": 81.198, "acc@5": 95.340}, 25028904,
        ops=4.23, file_size=95.833,
    )
    DEFAULT = IMAGENET1K_V2


class ResNeXt101_32X8D_Weights(WeightsEnum):
    IMAGENET1K_V1 = _cls_weights(
        "https://download.pytorch.org/models/resnext101_32x8d-8ba56ff5.pth",
        224, 256, {"acc@1": 79.312, "acc@5": 94.526}, 88791336,
        ops=16.414, file_size=339.586,
    )
    IMAGENET1K_V2 = _cls_weights(
        "https://download.pytorch.org/models/resnext101_32x8d-110c445d.pth",
        224, 232, {"acc@1": 82.834, "acc@5": 96.228}, 88791336,
        ops=16.414, file_size=339.673,
    )
    DEFAULT = IMAGENET1K_V2


class ResNeXt101_64X4D_Weights(WeightsEnum):
    IMAGENET1K_V1 = _cls_weights(
        "https://download.pytorch.org/models/resnext101_64x4d-173b62eb.pth",
        224, 232, {"acc@1": 83.246, "acc@5": 96.454}, 83455272,
        ops=15.46, file_size=319.318,
    )
    DEFAULT = IMAGENET1K_V1


class Wide_ResNet50_2_Weights(WeightsEnum):
    IMAGENET1K_V1 = _cls_weights(
        "https://download.pytorch.org/models/wide_resnet50_2-95faca4d.pth",
        224, 256, {"acc@1": 78.468, "acc@5": 94.086}, 68883240,
        ops=11.398, file_size=131.82,
    )
    IMAGENET1K_V2 = _cls_weights(
        "https://download.pytorch.org/models/wide_resnet50_2-9ba9bcbe.pth",
        224, 232, {"acc@1": 81.602, "acc@5": 95.758}, 68883240,
        ops=11.398, file_size=263.124,
    )
    DEFAULT = IMAGENET1K_V2


class Wide_ResNet101_2_Weights(WeightsEnum):
    IMAGENET1K_V1 = _cls_weights(
        "https://download.pytorch.org/models/wide_resnet101_2-32ee1156.pth",
        224, 256, {"acc@1": 78.848, "acc@5": 94.284}, 126886696,
        ops=22.753, file_size=242.896,
    )
    IMAGENET1K_V2 = _cls_weights(
        "https://download.pytorch.org/models/wide_resnet101_2-d733dc28.pth",
        224, 232, {"acc@1": 82.510, "acc@5": 96.020}, 126886696,
        ops=22.753, file_size=484.747,
    )
    DEFAULT = IMAGENET1K_V2


def _resnet(block, layers, weights, num_classes=1000, init=True, **kwargs) -> VisionModel:
    module = ResNet(block=block, layers=tuple(layers), num_classes=num_classes, **kwargs)
    if not init:
        return VisionModel(module=module, variables={})
    return build_model(module, weights)


@register_model()
def resnet18(*, weights: Optional[ResNet18_Weights] = None, **kwargs) -> VisionModel:
    """reference ``models/resnet.py`` resnet18 builder."""
    weights = ResNet18_Weights.verify(weights)
    return _resnet(BasicBlock, [2, 2, 2, 2], weights, **kwargs)


@register_model()
def resnet34(*, weights: Optional[ResNet34_Weights] = None, **kwargs) -> VisionModel:
    weights = ResNet34_Weights.verify(weights)
    return _resnet(BasicBlock, [3, 4, 6, 3], weights, **kwargs)


@register_model()
def resnet50(*, weights: Optional[ResNet50_Weights] = None, **kwargs) -> VisionModel:
    weights = ResNet50_Weights.verify(weights)
    return _resnet(Bottleneck, [3, 4, 6, 3], weights, **kwargs)


@register_model()
def resnet101(*, weights: Optional[ResNet101_Weights] = None, **kwargs) -> VisionModel:
    weights = ResNet101_Weights.verify(weights)
    return _resnet(Bottleneck, [3, 4, 23, 3], weights, **kwargs)


@register_model()
def resnet152(*, weights: Optional[ResNet152_Weights] = None, **kwargs) -> VisionModel:
    weights = ResNet152_Weights.verify(weights)
    return _resnet(Bottleneck, [3, 8, 36, 3], weights, **kwargs)


@register_model()
def resnext50_32x4d(
    *, weights: Optional[ResNeXt50_32X4D_Weights] = None, **kwargs
) -> VisionModel:
    weights = ResNeXt50_32X4D_Weights.verify(weights)
    return _resnet(
        Bottleneck, [3, 4, 6, 3], weights, groups=32, width_per_group=4, **kwargs
    )


@register_model()
def resnext101_32x8d(
    *, weights: Optional[ResNeXt101_32X8D_Weights] = None, **kwargs
) -> VisionModel:
    weights = ResNeXt101_32X8D_Weights.verify(weights)
    return _resnet(
        Bottleneck, [3, 4, 23, 3], weights, groups=32, width_per_group=8, **kwargs
    )


@register_model()
def resnext101_64x4d(
    *, weights: Optional[ResNeXt101_64X4D_Weights] = None, **kwargs
) -> VisionModel:
    weights = ResNeXt101_64X4D_Weights.verify(weights)
    return _resnet(
        Bottleneck, [3, 4, 23, 3], weights, groups=64, width_per_group=4, **kwargs
    )


@register_model()
def wide_resnet50_2(
    *, weights: Optional[Wide_ResNet50_2_Weights] = None, **kwargs
) -> VisionModel:
    weights = Wide_ResNet50_2_Weights.verify(weights)
    return _resnet(Bottleneck, [3, 4, 6, 3], weights, width_per_group=128, **kwargs)


@register_model()
def wide_resnet101_2(
    *, weights: Optional[Wide_ResNet101_2_Weights] = None, **kwargs
) -> VisionModel:
    weights = Wide_ResNet101_2_Weights.verify(weights)
    return _resnet(Bottleneck, [3, 4, 23, 3], weights, width_per_group=128, **kwargs)
