"""SSDLite320-MobileNetV3-Large (reference
``torchvision/models/detection/ssdlite.py``, 331 LoC)."""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, _make_divisible, init_variables
from vision_tpu.models.detection import _utils as det_utils
from vision_tpu.models.detection.anchor_utils import DefaultBoxGenerator
from vision_tpu.models.detection.ssd import SSD
from vision_tpu.models.mobilenetv3 import (
    IRConf,
    InvertedResidualV3,
    _large_setting,
)
from vision_tpu.models.mobilenetv2 import _CNA
from vision_tpu.transforms._presets import ObjectDetection

__all__ = ["SSDLite320_MobileNet_V3_Large_Weights", "ssdlite320_mobilenet_v3_large"]

# torch norm: BatchNorm2d(eps=0.001, momentum=0.03) -> flax momentum 0.97
_BN_EPS = 1e-3
_BN_MOM = 0.97


class _LiteCNA(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=[(p, p)] * 2, feature_group_count=self.groups,
            use_bias=False, name="0",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=_BN_MOM, epsilon=_BN_EPS,
            name="1",
        )(x)
        if self.act:
            x = jnp.minimum(nn.relu(x), 6.0)
        return x


class _LiteIR(nn.Module):
    """InvertedResidualV3 with the ssdlite BN hyperparameters."""

    cnf: IRConf

    @nn.compact
    def __call__(self, x, train=False):
        import jax.nn as jnn

        cnf = self.cnf
        use_res = cnf.stride == 1 and cnf.input_channels == cnf.out_channels
        out = x
        i = 0

        def cna(feat, k, s, g, act, name):
            def apply(t):
                p = (k - 1) // 2
                t = nn.Conv(
                    feat, (k, k), (s, s), padding=[(p, p)] * 2,
                    feature_group_count=g, use_bias=False, name=f"{name}.0",
                )(t)
                t = nn.BatchNorm(
                    use_running_average=not train, momentum=_BN_MOM,
                    epsilon=_BN_EPS, name=f"{name}.1",
                )(t)
                if act == "HS":
                    t = nn.hard_swish(t)
                elif act == "RE":
                    t = nn.relu(t)
                return t

            return apply

        act = "HS" if cnf.use_hs else "RE"
        if cnf.expanded_channels != cnf.input_channels:
            out = cna(cnf.expanded_channels, 1, 1, 1, act, f"block.{i}")(out)
            i += 1
        out = cna(
            cnf.expanded_channels, cnf.kernel, cnf.stride,
            cnf.expanded_channels, act, f"block.{i}",
        )(out)
        i += 1
        if cnf.use_se:
            squeeze = _make_divisible(cnf.expanded_channels // 4, 8)
            s = jnp.mean(out, axis=(-3, -2), keepdims=True)
            s = nn.relu(nn.Conv(squeeze, (1, 1), name=f"block.{i}.fc1")(s))
            s = nn.Conv(cnf.expanded_channels, (1, 1), name=f"block.{i}.fc2")(s)
            out = out * jax.nn.hard_sigmoid(s)
            i += 1
        out = cna(cnf.out_channels, 1, 1, 1, None, f"block.{i}")(out)
        return x + out if use_res else out


class SSDLiteFeatureExtractor(nn.Module):
    """reference ``ssdlite.py:117``: mobilenet v3 large split at the C4
    expansion, + 4 extra blocks. ``reduced_tail=True`` (MobileNetV3 paper
    §6.3) is the from-scratch / COCO-checkpoint configuration; the
    reference builds the FULL tail when an ImageNet ``weights_backbone``
    is given (``ssdlite.py:282`` reduce_tail = weights_backbone is None)."""

    reduced_tail: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jax.Array]:
        setting, _ = _large_setting(reduced_tail=self.reduced_tail)
        c4_idx = 12  # bneck index of the C4 block (features index 13)

        # features.0: stem + bnecks 0..11 + C4 expansion CNA
        x = _LiteCNA(16, 3, 2, name="features.0.0")(x, train)
        for j in range(c4_idx):
            x = _LiteIR(setting[j], name=f"features.0.{j + 1}")(x, train)
        c4 = setting[c4_idx]
        act = "HS" if c4.use_hs else "RE"
        # expansion CNA of the C4 block
        x = nn.Conv(
            c4.expanded_channels, (1, 1), use_bias=False,
            name=f"features.0.{c4_idx + 1}.0",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=_BN_MOM, epsilon=_BN_EPS,
            name=f"features.0.{c4_idx + 1}.1",
        )(x)
        x = nn.hard_swish(x)
        outputs = [x]

        # features.1: rest of the C4 block + bnecks 13.. + last CNA
        # child 0: Sequential(block[1:]) = dw CNA (0), SE (1), project (2)
        p = (c4.kernel - 1) // 2
        y = nn.Conv(
            c4.expanded_channels, (c4.kernel, c4.kernel), (c4.stride, c4.stride),
            padding=[(p, p)] * 2, feature_group_count=c4.expanded_channels,
            use_bias=False, name="features.1.0.0.0",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=_BN_MOM, epsilon=_BN_EPS,
            name="features.1.0.0.1",
        )(y)
        y = nn.hard_swish(y)
        squeeze = _make_divisible(c4.expanded_channels // 4, 8)
        s = jnp.mean(y, axis=(-3, -2), keepdims=True)
        s = nn.relu(nn.Conv(squeeze, (1, 1), name="features.1.0.1.fc1")(s))
        s = nn.Conv(c4.expanded_channels, (1, 1), name="features.1.0.1.fc2")(s)
        y = y * jax.nn.hard_sigmoid(s)
        y = nn.Conv(
            c4.out_channels, (1, 1), use_bias=False, name="features.1.0.2.0"
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=_BN_MOM, epsilon=_BN_EPS,
            name="features.1.0.2.1",
        )(y)
        for k, j in enumerate(range(c4_idx + 1, len(setting)), start=1):
            y = _LiteIR(setting[j], name=f"features.1.{k}")(y, train)
        last_ch = 6 * setting[-1].out_channels
        idx_last = len(setting) - c4_idx
        y = nn.Conv(
            last_ch, (1, 1), use_bias=False, name=f"features.1.{idx_last}.0"
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=_BN_MOM, epsilon=_BN_EPS,
            name=f"features.1.{idx_last}.1",
        )(y)
        y = nn.hard_swish(y)
        outputs.append(y)

        # extra blocks: 1x1 half -> dw 3x3 s2 -> 1x1 (all ReLU6 CNAs)
        chans = [512, 256, 256, 128]
        for e, out_c in enumerate(chans):
            mid = out_c // 2
            y = _LiteCNA(mid, 1, name=f"extra.{e}.0")(y, train)
            y = _LiteCNA(mid, 3, 2, groups=mid, name=f"extra.{e}.1")(y, train)
            y = _LiteCNA(out_c, 1, name=f"extra.{e}.2")(y, train)
            outputs.append(y)
        return outputs


class SSDLiteHead(nn.Module):
    """reference ``ssdlite.py:81``: depthwise CNA + 1x1 per level."""

    num_anchors: Tuple[int, ...]
    num_classes: int

    @nn.compact
    def __call__(self, features: List[jax.Array], train: bool = False):
        cls_out, reg_out = [], []
        for i, (f, a) in enumerate(zip(features, self.num_anchors)):
            ch = f.shape[-1]

            def pred(out_c, prefix):
                t = _LiteCNA(ch, 3, groups=ch, name=f"{prefix}.0")(f, train)
                return nn.Conv(out_c, (1, 1), name=f"{prefix}.1")(t)

            c = pred(
                self.num_classes * a, f"classification_head.module_list.{i}"
            )
            r = pred(4 * a, f"regression_head.module_list.{i}")
            n, h, w, _ = c.shape
            cls_out.append(c.reshape(n, h * w * a, self.num_classes))
            reg_out.append(r.reshape(n, h * w * a, 4))
        return jnp.concatenate(cls_out, 1), jnp.concatenate(reg_out, 1)


class SSDLite(SSD):
    """SSD with the mobilenet extractor + lite head."""

    reduced_tail: bool = True

    def setup(self):
        self.backbone = SSDLiteFeatureExtractor(
            reduced_tail=self.reduced_tail, name="backbone"
        )
        self.anchor_generator = DefaultBoxGenerator(
            [[2, 3] for _ in range(6)], min_ratio=0.2, max_ratio=0.95
        )
        self.head = SSDLiteHead(
            num_anchors=tuple(self.anchor_generator.num_anchors_per_location()),
            num_classes=self.num_classes,
            name="head",
        )
        self.box_coder = det_utils.BoxCoder(weights=(10.0, 10.0, 5.0, 5.0))
        self.proposal_matcher = det_utils.Matcher(
            self.iou_thresh, self.iou_thresh, allow_low_quality_matches=True
        )

    def __call__(
        self,
        images: jax.Array,
        train: bool = False,
        return_features: bool = False,
    ):
        feats = self.backbone(images, train=train)
        cls_logits, bbox_reg = self.head(feats, train=train)
        fm_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = self.anchor_generator(
            (images.shape[1], images.shape[2]), fm_sizes
        )
        if return_features:
            return (cls_logits, bbox_reg, anchors), {
                str(i): f for i, f in enumerate(feats)
            }
        return cls_logits, bbox_reg, anchors


class SSDLite320_MobileNet_V3_Large_Weights(WeightsEnum):
    COCO_V1 = Weights(
        url="https://download.pytorch.org/models/ssdlite320_mobilenet_v3_large_coco-a79551df.pth",
        transforms=ObjectDetection,
        meta={
            "num_params": 3440060,
            "_metrics": {"COCO-val2017": {"box_map": 21.3}},
        },
    )
    DEFAULT = COCO_V1


def _ssdlite_hooks(sd):
    """Reference checkpoint -> flax names for the split C4 block.

    ``SSDLiteFeatureExtractorMobileNet`` (reference ssdlite.py:131-135)
    builds ``features.1.0`` from ``backbone[c4_pos].block[1:]`` — a
    Sequential *slice*, which in torch keeps the original child keys
    ("1" depthwise, "2" SE, "3" project). Our flax Sequential renumbers
    them from 0, so shift those indices down by one."""
    out = {}
    prefix = "backbone.features.1.0."
    for k, v in sd.items():
        if k.startswith(prefix):
            parts = k[len(prefix):].split(".")
            if parts[0].isdigit():
                parts[0] = str(int(parts[0]) - 1)
            k = prefix + ".".join(parts)
        out[k] = v
    return out


@register_model()
def ssdlite320_mobilenet_v3_large(
    *, weights: Optional[SSDLite320_MobileNet_V3_Large_Weights] = None,
    num_classes: int = 91, weights_backbone=None,
    trainable_backbone_layers=None, **kwargs,
) -> VisionModel:
    """Reference ``ssdlite.py:214``. With ``weights_backbone`` the trunk
    is built with the FULL MobileNetV3 tail and the ImageNet classification
    checkpoint loads into the split extractor (the classification
    ``features.13.block.*`` keys remap across the C4 split); without it
    the tail is reduced (MobileNetV3 paper §6.3), matching the COCO
    ``weights=`` checkpoint — the reference's
    ``reduce_tail = weights_backbone is None`` behavior."""
    weights = SSDLite320_MobileNet_V3_Large_Weights.verify(weights)
    if weights is not None:
        weights_backbone = None  # full checkpoint overrides trunk init
    kwargs.setdefault("score_thresh", 0.001)
    kwargs.setdefault("nms_thresh", 0.55)
    kwargs.setdefault("detections_per_img", 300)
    kwargs.setdefault("topk_candidates", 300)
    module = SSDLite(
        num_classes=num_classes,
        reduced_tail=weights_backbone is None,
        **kwargs,
    )
    variables = init_variables(module, 
        jax.random.PRNGKey(0), jnp.zeros((1, 320, 320, 3), jnp.float32)
    )
    preprocess = None
    if weights is not None:
        from vision_tpu._torch_convert import convert_torch_state_dict

        sd = weights.get_state_dict()
        variables = convert_torch_state_dict(
            sd, dict(variables), hooks=_ssdlite_hooks
        )
        preprocess = weights.transforms()
    elif weights_backbone is not None:
        from vision_tpu.models.detection.backbone_utils import (
            apply_weights_backbone,
        )

        variables = apply_weights_backbone(
            dict(variables), weights_backbone, backbone_type="ssdlite"
        )
    meta = ({"trainable_backbone_layers": trainable_backbone_layers}
            if trainable_backbone_layers is not None else None)
    return VisionModel(module=module, variables=variables, preprocess=preprocess,
                       meta=meta)
