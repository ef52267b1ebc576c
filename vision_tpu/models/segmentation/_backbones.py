"""Segmentation backbones: dilated ResNet trunk and dilated MobileNetV3
feature list, named to match the reference checkpoints
(``IntermediateLayerGetter`` naming)."""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models.mobilenetv2 import _CNA, _bn
from vision_tpu.models.mobilenetv3 import InvertedResidualV3, _large_setting
from vision_tpu.models.resnet import Bottleneck, _ResLayer


class DilatedResNetTrunk(nn.Module):
    """ResNet-50/101 body with stride->dilation in layer3/4 (the reference
    segmentation backbones use ``replace_stride_with_dilation=[False, True,
    True]``); emits {"aux": layer3, "out": layer4}."""

    layers: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        x = nn.Conv(
            64, (7, 7), (2, 2), padding=[(3, 3)] * 2, use_bias=False, name="conv1"
        )(x)
        x = _bn(train, "bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        feats = {}
        in_planes = 64
        dilation = 1
        replace = (False, True, True)
        for i, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if i == 0 else 2
            prev_dilation = dilation
            if i > 0 and replace[i - 1]:
                dilation *= stride
                stride = 1
            x = _ResLayer(
                block=Bottleneck,
                planes=planes,
                num_blocks=blocks,
                stride=stride,
                groups=1,
                base_width=64,
                dilation=dilation,
                prev_dilation=prev_dilation,
                in_planes=in_planes,
                name=f"layer{i + 1}",
            )(x, train=train)
            in_planes = planes * 4
            if i == 2:
                feats["aux"] = x
        feats["out"] = x
        return feats


class DilatedMobileNetV3Trunk(nn.Module):
    """MobileNetV3-Large (dilated) feature list for segmentation; children
    named "0".."16" like ``IntermediateLayerGetter(model.features)``.
    Emits low (C2, index 4) / aux (index 13... reference uses stage C4) /
    out (index 16) features."""

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        setting, _ = _large_setting(dilated=True)
        feats = {}
        x = _CNA(16, 3, 2, act="hardswish", name="0")(x, train)
        for j, cnf in enumerate(setting, start=1):
            x = InvertedResidualV3(cnf, name=str(j))(x, train)
            if j == 4:
                # C2 (stage_indices[-4] in the reference builders): both the
                # LRASPP "low" features and the deeplab/fcn aux head input
                feats["low"] = x  # 40 channels
                feats["aux"] = x
        last = 6 * setting[-1].out_channels
        x = _CNA(last, 1, act="hardswish", name=str(len(setting) + 1))(x, train)
        feats["out"] = x  # 960 channels
        return feats
