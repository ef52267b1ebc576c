"""Backbone + FPN assembly (reference
``torchvision/models/detection/backbone_utils.py``)."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models.resnet import Bottleneck, ResNet, _ResLayer, _bn, _conv
from vision_tpu.ops.feature_pyramid_network import (
    ExtraFPNBlock,
    FeaturePyramidNetwork,
    LastLevelMaxPool,
)

__all__ = ["BackboneWithFPN", "resnet_fpn_backbone_module"]


class _FrozenBN(nn.Module):
    """FrozenBatchNorm2d (reference ``ops/misc.py:14``): detection backbones
    freeze BN; the four tensors live in the non-trainable ``frozen``
    collection so they're excluded from num_params and the optimizer, like
    the reference's buffers."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.variable(
            "frozen", "weight", lambda: jnp.ones((self.features,), jnp.float32)
        ).value
        bias = self.variable(
            "frozen", "bias", lambda: jnp.zeros((self.features,), jnp.float32)
        ).value
        mean = self.variable(
            "frozen", "running_mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        ).value
        var = self.variable(
            "frozen", "running_var",
            lambda: jnp.ones((self.features,), jnp.float32),
        ).value
        scale = weight * jax.lax.rsqrt(var + self.eps)
        return x * scale + (bias - mean * scale)


class _FrozenBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        out = _conv(self.planes, 3, self.stride, name="conv1")(x)
        out = _FrozenBN(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, name="conv2")(out)
        out = _FrozenBN(self.planes, name="bn2")(out)
        if self.downsample:
            identity = _conv(self.planes, 1, self.stride, name="downsample.0")(x)
            identity = _FrozenBN(self.planes, name="downsample.1")(identity)
        return nn.relu(out + identity)


class _FrozenBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        out = _conv(self.planes, 1, name="conv1")(x)
        out = _FrozenBN(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, name="conv2")(out)
        out = _FrozenBN(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, name="conv3")(out)
        out = _FrozenBN(self.planes * 4, name="bn3")(out)
        if self.downsample:
            identity = _conv(self.planes * 4, 1, self.stride, name="downsample.0")(x)
            identity = _FrozenBN(self.planes * 4, name="downsample.1")(identity)
        return nn.relu(out + identity)


class _ConvKernel(nn.Module):
    """HWIO kernel param with nn.Conv's param naming (checkpoint-mapped
    identically to a ``conv2`` nn.Conv, bias-free)."""

    features: int
    ksize: int = 3

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel",
            nn.initializers.he_normal(),
            (self.ksize, self.ksize, in_features, self.features),
        )


class _DeformFrozenBottleneck(nn.Module):
    """Bottleneck with the 3x3 conv2 replaced by ``deform_conv2d``
    (detectron2's DeformBottleneckBlock shape over the reference op,
    ``torchvision/ops/deform_conv.py:14-110``): a zero-initialized 3x3
    conv predicts per-tap (dy, dx) offsets (and, when ``modulated``,
    sigmoid modulation masks — DCNv2). Zero init means the block equals
    a plain ``_FrozenBottleneck`` at construction, so ImageNet trunk
    weights convert losslessly (``maskrcnn_resnet50_fpn_deform``'s
    shared-trunk parity)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    modulated: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train=False):
        from vision_tpu.ops.deform_conv import deform_conv2d

        identity = x
        out = _conv(self.planes, 1, name="conv1")(x)
        out = _FrozenBN(self.planes, name="bn1")(out)
        out = nn.relu(out)
        # offset/mask predictor: zero-init kernel AND bias (detectron2
        # zero-fills both so the deform conv starts as a plain conv)
        k2 = 9
        off_ch = (3 if self.modulated else 2) * k2
        pred = nn.Conv(
            off_ch, (3, 3), (self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv2_offset",
        )(out)
        if self.modulated:
            offset, m = pred[..., : 2 * k2], pred[..., 2 * k2 :]
            mask = jax.nn.sigmoid(m)
        else:
            offset, mask = pred, None
        # param path layer*.*/conv2/kernel — identical to nn.Conv's, so
        # ImageNet trunk checkpoints convert without a special case
        kernel = _ConvKernel(self.planes, name="conv2")(out.shape[-1])
        out = deform_conv2d(
            out, offset, kernel,
            stride=(self.stride, self.stride), padding=(1, 1), mask=mask,
        )
        out = _FrozenBN(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, name="conv3")(out)
        out = _FrozenBN(self.planes * 4, name="bn3")(out)
        if self.downsample:
            identity = _conv(self.planes * 4, 1, self.stride, name="downsample.0")(x)
            identity = _FrozenBN(self.planes * 4, name="downsample.1")(identity)
        return nn.relu(out + identity)


class _ResNetTrunk(nn.Module):
    """ResNet body without the classification head, emitting {c2..c5};
    module names match ``ResNet`` so reference backbone weights map
    (``backbone.body.*`` in detection checkpoints). ``frozen_bn=True``
    (the v1 recipes' FrozenBatchNorm2d) keeps BN affine out of params;
    v2 recipes train BN normally. ``deform_stages`` lists 1-based stage
    indices (2..4 = C3..C5) whose bottlenecks use deformable 3x3s
    (frozen-BN path only)."""

    block: type
    layers: Tuple[int, int, int, int]
    frozen_bn: bool = True
    deform_stages: Tuple[int, ...] = ()
    deform_modulated: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        x = nn.Conv(
            64, (7, 7), (2, 2), padding=[(3, 3)] * 2, use_bias=False, name="conv1"
        )(x)
        if self.frozen_bn:
            x = _FrozenBN(64, name="bn1")(x)
        else:
            x = _bn(train, "bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        feats = {}
        in_planes = 64
        if self.frozen_bn:
            block = (
                _FrozenBottleneck if self.block is Bottleneck else _FrozenBasicBlock
            )
            expansion = block.expansion
            if self.deform_stages and self.block is not Bottleneck:
                raise ValueError("deform_stages requires a Bottleneck trunk")
            for i, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)
            ):
                stride = 1 if i == 0 else 2
                stage_block = block
                extra = {}
                if (i + 1) in self.deform_stages:
                    stage_block = _DeformFrozenBottleneck
                    extra = {"modulated": self.deform_modulated}
                for j in range(blocks):
                    needs_ds = j == 0 and (
                        stride != 1 or in_planes != planes * expansion
                    )
                    x = stage_block(
                        planes=planes,
                        stride=stride if j == 0 else 1,
                        downsample=needs_ds,
                        name=f"layer{i + 1}.{j}",
                        **extra,
                    )(x, train=train)
                    in_planes = planes * expansion
                feats[str(i)] = x  # reference returned_layers names "0".."3"
        else:
            expansion = self.block.expansion
            for i, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)
            ):
                stride = 1 if i == 0 else 2
                x = _ResLayer(
                    block=self.block,
                    planes=planes,
                    num_blocks=blocks,
                    stride=stride,
                    groups=1,
                    base_width=64,
                    dilation=1,
                    prev_dilation=1,
                    in_planes=in_planes,
                    name=f"layer{i + 1}",
                )(x, train=train)
                in_planes = planes * expansion
                feats[str(i)] = x
        return feats


def _fpn_checkpoint_renames(sd):
    """Reference-checkpoint FPN names -> the torch-name space our flax
    trees mirror.

    The reference (>= 0.12, ``ops/feature_pyramid_network.py``) wraps each
    lateral/smooth conv in a Conv2dNormActivation, so checkpoints say
    ``backbone.fpn.inner_blocks.{i}.0.weight``; our flax FPN names the conv
    directly (``inner_blocks_{i}``). P6/P7 extra blocks live inside the
    reference FPN (``backbone.fpn.extra_blocks.p6``) but beside it here.
    Pre-0.12 checkpoints (no ``.0`` wrapper) pass through unchanged."""
    out = {}
    for k, v in sd.items():
        parts = k.split(".")
        for j, p in enumerate(parts):
            if (
                p in ("inner_blocks", "layer_blocks")
                and j + 2 < len(parts)
                and parts[j + 1].isdigit()
            ):
                i, rest = parts[j + 1], parts[j + 2 :]
                stem = f"{p}_{i}"
                if rest and rest[0] == "0":  # the conv inside the wrapper
                    rest = rest[1:]
                elif rest and rest[0] == "1":  # the v2 norm layer
                    stem = p.replace("blocks", "norm") + f"_{i}"
                    rest = rest[1:]
                parts = parts[:j] + [stem] + rest
                break
        k = ".".join(parts)
        k = k.replace("fpn.extra_blocks.", "extra_blocks.")
        out[k] = v
    return out


class BackboneWithFPN(nn.Module):
    """reference ``backbone_utils.py`` BackboneWithFPN: trunk -> FPN.
    Child names ``body`` / ``fpn`` match the reference checkpoints."""

    block: type
    layers: Tuple[int, int, int, int]
    out_channels: int = 256
    extra_blocks: Optional[ExtraFPNBlock] = None
    returned_layers: Tuple[int, ...] = (1, 2, 3, 4)
    norm_layer: Optional[Callable] = None
    frozen_bn: bool = True
    deform_stages: Tuple[int, ...] = ()
    deform_modulated: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        feats = _ResNetTrunk(
            self.block, self.layers, frozen_bn=self.frozen_bn,
            deform_stages=self.deform_stages,
            deform_modulated=self.deform_modulated, name="body"
        )(x, train)
        selected = {
            str(i): feats[str(layer - 1)]
            for i, layer in enumerate(self.returned_layers)
        }
        extra = self.extra_blocks if self.extra_blocks is not None else LastLevelMaxPool()
        out = FeaturePyramidNetwork(
            out_channels=self.out_channels,
            extra_blocks=extra,
            norm_layer=self.norm_layer,
            name="fpn",
        )(selected)
        return out


class MobileNetV3FPNBackbone(nn.Module):
    """reference ``backbone_utils.py:199`` _mobilenet_extractor (fpn=True):
    mobilenet v3 large features tapped at C4 (features[13], 160ch) and C5
    (features[16], 960ch), FPN out 256 + LastLevelMaxPool -> {"0","1",
    "pool"}. BN is FrozenBatchNorm (reference: is_trained -> frozen); torch
    checkpoint keys are ``backbone.body.N...``."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        from vision_tpu.models.mobilenetv2 import _CNA
        from vision_tpu.models.mobilenetv3 import InvertedResidualV3, _large_setting

        frozen = lambda feats, name: _FrozenBN(feats, name=name)
        setting, _ = _large_setting()
        x = _CNA(16, 3, 2, act="hardswish", norm=frozen, name="body.0")(x, train)
        taps: Dict[str, jax.Array] = {}
        for i, cnf in enumerate(setting, start=1):
            x = InvertedResidualV3(cnf, norm=frozen, name=f"body.{i}")(x, train)
            if i == 13:  # C4
                taps["0"] = x
        lastconv_out = 6 * setting[-1].out_channels
        x = _CNA(
            lastconv_out, 1, act="hardswish", norm=frozen,
            name=f"body.{len(setting) + 1}",
        )(x, train)
        taps["1"] = x
        return FeaturePyramidNetwork(
            out_channels=self.out_channels,
            extra_blocks=LastLevelMaxPool(),
            name="fpn",
        )(taps)


def resnet_fpn_backbone_module(
    depth: int = 50,
    out_channels: int = 256,
    extra_blocks: Optional[ExtraFPNBlock] = None,
    returned_layers: Tuple[int, ...] = (1, 2, 3, 4),
) -> BackboneWithFPN:
    """reference ``backbone_utils.py`` resnet_fpn_backbone."""
    from vision_tpu.models.resnet import BasicBlock

    layers = {
        18: (BasicBlock, (2, 2, 2, 2)),
        34: (BasicBlock, (3, 4, 6, 3)),
        50: (Bottleneck, (3, 4, 6, 3)),
        101: (Bottleneck, (3, 4, 23, 3)),
    }[depth]
    return BackboneWithFPN(
        block=layers[0],
        layers=layers[1],
        out_channels=out_channels,
        extra_blocks=extra_blocks,
        returned_layers=returned_layers,
    )


def load_backbone_state_dict(
    variables,
    sd,
    trunk_map=None,
    body_key: str = "body",
):
    """Load a CLASSIFICATION torch ``state_dict`` into a detection model's
    backbone trunk (the reference's ``weights_backbone`` path,
    ``backbone_utils.py _resnet_fpn_extractor``: the trunk IS the torch
    classification model, so its checkpoint keys transfer 1:1 once
    remapped into the detection name space; the classifier head drops).

    ``trunk_map(cls_key) -> detection_torch_key | None`` renames each
    classification key; the default prefixes ``backbone.body.`` (resnet
    FPN trunks). BatchNorm entries land wherever the detection model keeps
    them (FrozenBatchNorm ``frozen`` buffers or live ``batch_stats``).
    Asserts the trunk was substantially covered so a key-space drift can't
    silently produce a random backbone. Returns new variables."""
    from vision_tpu._torch_convert import (
        _flatten,
        _torch_key,
        convert_torch_state_dict,
    )

    drop = ("fc.", "classifier.")  # classification heads
    if trunk_map is None:
        trunk_map = lambda k: f"backbone.body.{k}"  # noqa: E731
    sd = {
        trunk_map(k): v
        for k, v in sd.items()
        if not k.startswith(drop)
        and not k.endswith("num_batches_tracked")
        and trunk_map(k) is not None
    }
    # the torch keys the trunk leaves expect, via the converter's own map
    expected = set()
    for coll, tree in variables.items():
        for path in _flatten(tree if isinstance(tree, dict) else dict(tree)):
            if len(path) >= 2 and path[0] == "backbone" and (
                path[1] == body_key or path[1].startswith(body_key + ".")
            ):
                expected.add(_torch_key(coll, path)[0])
    missing = expected - set(sd)
    if expected and len(missing) > 0.2 * len(expected):
        raise ValueError(
            f"weights_backbone covers only {len(expected) - len(missing)} of "
            f"{len(expected)} trunk tensors (e.g. missing "
            f"{sorted(missing)[:5]}) — checkpoint key space does not match "
            "this backbone"
        )
    return convert_torch_state_dict(sd, dict(variables), strict=False)


def _ssdlite_trunk_map(k):
    """Full-tail MobileNetV3-Large classification keys into the ssdlite
    split extractor (reference ssdlite.py:131-135): the C4 block
    (classification features.13) is split at its expansion layer —
    block.0 joins features.0, block.1.. become the re-indexed children of
    features.1.0; later blocks shift to features.1.(K-13)."""
    if not k.startswith("features."):
        return None
    parts = k.split(".")
    ki = int(parts[1])
    rest = ".".join(parts[2:])
    c4 = 13
    if ki < c4:
        return f"backbone.features.0.{ki}.{rest}"
    if ki == c4:
        if parts[2] != "block":
            return None
        b = int(parts[3])
        tail = ".".join(parts[4:])
        if b == 0:
            return f"backbone.features.0.{c4}.{tail}"
        return f"backbone.features.1.0.{b - 1}.{tail}"
    return f"backbone.features.1.{ki - c4}.{rest}"


def apply_weights_backbone(variables, weights_backbone, backbone_type="resnet"):
    """Resolve a ``weights_backbone`` spec (enum member or
    ``"ResNet50_Weights.IMAGENET1K_V1"`` string) and load it into
    ``variables``; reference builders' ``weights_backbone=`` parameter."""
    if isinstance(weights_backbone, str):
        from vision_tpu.models._api import get_weight

        weights_backbone = get_weight(weights_backbone)
    sd = weights_backbone.get_state_dict()
    if backbone_type == "resnet":
        return load_backbone_state_dict(variables, sd)
    if backbone_type == "mobilenet_v3_large":
        # classification "features.N.rest" -> detection "backbone.body.N.rest"
        def mmap(k):
            return (
                "backbone.body." + k[len("features."):]
                if k.startswith("features.")
                else None
            )

        return load_backbone_state_dict(variables, sd, trunk_map=mmap)
    if backbone_type == "ssdlite":
        return load_backbone_state_dict(
            variables, sd, trunk_map=_ssdlite_trunk_map, body_key="features"
        )
    if backbone_type == "vgg":
        # ssd: classification "features.N.rest" -> "backbone.features.N.rest"
        def vmap(k):
            return "backbone." + k if k.startswith("features.") else None

        return load_backbone_state_dict(
            variables, sd, trunk_map=vmap, body_key="features"
        )
    raise ValueError(f"unknown backbone_type {backbone_type!r}")
