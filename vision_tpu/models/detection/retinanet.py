"""RetinaNet (reference ``torchvision/models/detection/retinanet.py``,
903 LoC).

TPU-first redesign of the dynamic-shape reference paths (SURVEY.md §3.4
note): per-level top-k with static k, score/NMS filtering as masks, fixed
``detections_per_img`` padded outputs. The whole eval path (backbone ->
heads -> decode -> NMS) jits as one XLA program — NMS on device, no host
round trip (BASELINE.json config #3).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Dict, List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, init_variables
from vision_tpu.models.detection import _utils as det_utils
from vision_tpu.models.detection.anchor_utils import AnchorGenerator
from vision_tpu.models.detection.backbone_utils import BackboneWithFPN
from vision_tpu.models.detection.transform import GeneralizedRCNNTransform
from vision_tpu.models.resnet import BasicBlock, Bottleneck
from vision_tpu.ops.feature_pyramid_network import LastLevelP6P7
from vision_tpu.ops._topk import top_k_2d
from vision_tpu.ops.losses import sigmoid_focal_loss
from vision_tpu.ops.nms import batched_nms_mask
from vision_tpu.transforms._presets import ObjectDetection

__all__ = [
    "RetinaNet",
    "RetinaNet_ResNet50_FPN_Weights",
    "RetinaNet_ResNet50_FPN_V2_Weights",
    "retinanet_resnet50_fpn",
    "retinanet_resnet50_fpn_v2",
    "Detections",
]


class Detections(NamedTuple):
    """Fixed-size detection results: [N, D, 4] boxes, [N, D] scores/labels,
    [N, D] valid mask (the static-shape replacement for the reference's
    per-image dict lists)."""

    boxes: jax.Array
    scores: jax.Array
    labels: jax.Array
    valid: jax.Array


def _default_anchorgen():
    sizes = tuple(
        (x, int(x * 2 ** (1.0 / 3)), int(x * 2 ** (2.0 / 3)))
        for x in [32, 64, 128, 256, 512]
    )
    return AnchorGenerator(sizes, ((0.5, 1.0, 2.0),) * len(sizes))


class RetinaNetHead(nn.Module):
    """Shared conv towers applied to every level (reference
    ``retinanet.py:113``); names mirror torch (v2 layout: conv.{i}.0)."""

    num_anchors: int
    num_classes: int
    use_norm: bool = False  # v2 uses GroupNorm(32)

    @nn.compact
    def __call__(self, features: List[jax.Array], train: bool = False):
        cls_logits, bbox_reg = [], []
        in_ch = features[0].shape[-1]

        # build shared tower modules ONCE (weights shared across levels,
        # like the reference's single head module applied per level)
        towers = {}
        for prefix in ("classification_head", "regression_head"):
            convs = [
                nn.Conv(
                    in_ch, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=not self.use_norm,
                    name=f"{prefix}.conv.{i}.0",
                )
                for i in range(4)
            ]
            norms = (
                [
                    nn.GroupNorm(
                        num_groups=32, epsilon=1e-5, name=f"{prefix}.conv.{i}.1"
                    )
                    for i in range(4)
                ]
                if self.use_norm
                else [None] * 4
            )
            towers[prefix] = (convs, norms)

        def tower(x, prefix):
            convs, norms = towers[prefix]
            for conv, norm in zip(convs, norms):
                x = conv(x)
                if norm is not None:
                    x = norm(x)
                x = nn.relu(x)
            return x

        cls_final = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding=[(1, 1)] * 2,
            name="classification_head.cls_logits",
            bias_init=nn.initializers.constant(-math.log((1 - 0.01) / 0.01)),
        )
        reg_final = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=[(1, 1)] * 2,
            name="regression_head.bbox_reg",
        )

        for f in features:
            c = tower(f, "classification_head")
            c = cls_final(c)
            n, h, w, _ = c.shape
            cls_logits.append(
                c.reshape(n, h * w * self.num_anchors, self.num_classes)
            )
            r = tower(f, "regression_head")
            r = reg_final(r)
            bbox_reg.append(r.reshape(n, h * w * self.num_anchors, 4))
        return cls_logits, bbox_reg


class RetinaNet(nn.Module):
    """reference RetinaNet assembled module. Input: padded NHWC batch from
    GeneralizedRCNNTransform."""

    backbone_depth: int = 50
    num_classes: int = 91
    use_head_norm: bool = False  # True for v2
    use_p5_for_p6: bool = True  # v2 uses C5 (use_P5=False)
    frozen_backbone_bn: bool = True  # v2 trains BN
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 300
    topk_candidates: int = 1000
    fg_iou_thresh: float = 0.5
    bg_iou_thresh: float = 0.4

    def setup(self):
        block, layers = {
            18: (BasicBlock, (2, 2, 2, 2)),
            50: (Bottleneck, (3, 4, 6, 3)),
        }[self.backbone_depth]
        self.backbone = BackboneWithFPN(
            block=block,
            layers=layers,
            out_channels=256,
            extra_blocks=LastLevelP6P7(256, use_P5=self.use_p5_for_p6),
            returned_layers=(2, 3, 4),
            norm_layer=None,
            frozen_bn=self.frozen_backbone_bn,
            name="backbone",
        )
        self.anchor_generator = _default_anchorgen()
        self.head = RetinaNetHead(
            num_anchors=self.anchor_generator.num_anchors_per_location()[0],
            num_classes=self.num_classes,
            use_norm=self.use_head_norm,
            name="head",
        )
        self.box_coder = det_utils.BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))
        self.proposal_matcher = det_utils.Matcher(
            self.fg_iou_thresh, self.bg_iou_thresh, allow_low_quality_matches=True
        )

    def __call__(
        self,
        images: jax.Array,
        train: bool = False,
        return_features: bool = False,
    ):
        """images: [N, H, W, C] padded batch. Returns (per-level cls logits,
        per-level bbox deltas, per-level anchors); with
        ``return_features=True`` also the backbone FPN feature dict."""
        feats = self.backbone(images, train=train)
        # FPN output order: "0","1","2" then p6, p7
        keys = [k for k in ["0", "1", "2", "p6", "p7"] if k in feats]
        features = [feats[k] for k in keys]
        cls_logits, bbox_reg = self.head(features, train=train)
        fm_sizes = [(f.shape[1], f.shape[2]) for f in features]
        anchors = self.anchor_generator(
            (images.shape[1], images.shape[2]), fm_sizes
        )
        if return_features:
            return (cls_logits, bbox_reg, anchors), feats
        return cls_logits, bbox_reg, anchors

    # ---------------------------------------------------------------- eval
    def postprocess_detections(
        self,
        cls_logits: List[jax.Array],
        bbox_reg: List[jax.Array],
        anchors: List[jax.Array],
        image_size: Tuple[int, int],
    ) -> Detections:
        """Static-shape transcription of reference
        ``postprocess_detections`` (:509): per-level top-k -> decode ->
        clip -> cross-level batched NMS -> top detections_per_img."""
        n = cls_logits[0].shape[0]

        def per_image(per_img_logits, per_img_reg):
            boxes_all, scores_all, labels_all, valid_all = [], [], [], []
            for logits, reg, anch in zip(per_img_logits, per_img_reg, anchors):
                num_classes = logits.shape[-1]
                # [HWA, K] anchor-major scores; the exact two-stage top-k
                # (ops/_topk.py) avoids lax.top_k's full variadic sort over
                # HW*A*K elements (8.9M at P3/832px) — the dominant cost of
                # this postprocess on TPU
                scores2 = jax.nn.sigmoid(logits).reshape(-1, num_classes)
                k = min(self.topk_candidates, scores2.size)
                top_scores, top_idx = top_k_2d(scores2, k)
                valid = top_scores > self.score_thresh
                anchor_idx = top_idx // num_classes
                labels = top_idx % num_classes
                dec = self.box_coder.decode(
                    reg[anchor_idx], anch[anchor_idx]
                )[:, 0, :]
                h, w = image_size
                x = jnp.clip(dec[:, 0::2], 0, w)
                y = jnp.clip(dec[:, 1::2], 0, h)
                dec = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], axis=-1)
                boxes_all.append(dec)
                scores_all.append(top_scores)
                labels_all.append(labels)
                valid_all.append(valid)

            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            labels = jnp.concatenate(labels_all)
            valid = jnp.concatenate(valid_all)

            keep = batched_nms_mask(
                boxes, scores, labels, self.nms_thresh, valid=valid
            )
            kept_scores = jnp.where(keep, scores, -1.0)
            top_scores, top_idx = jax.lax.top_k(
                kept_scores, self.detections_per_img
            )
            return (
                boxes[top_idx],
                jnp.where(top_scores > 0, top_scores, 0.0),
                labels[top_idx],
                top_scores > 0,
            )

        outs = [
            per_image([c[i] for c in cls_logits], [b[i] for b in bbox_reg])
            for i in range(n)
        ]
        return Detections(
            boxes=jnp.stack([o[0] for o in outs]),
            scores=jnp.stack([o[1] for o in outs]),
            labels=jnp.stack([o[2] for o in outs]),
            valid=jnp.stack([o[3] for o in outs]),
        )

    # --------------------------------------------------------------- train
    def compute_loss(
        self,
        cls_logits: List[jax.Array],
        bbox_reg: List[jax.Array],
        anchors: List[jax.Array],
        gt_boxes: jax.Array,
        gt_labels: jax.Array,
        gt_valid: jax.Array,
    ) -> Dict[str, jax.Array]:
        """Batched masked transcription of the reference head losses
        (``retinanet.py:158-300``). gt_*: [N, G, ...] padded with
        gt_valid mask."""
        from vision_tpu.ops.boxes import box_iou

        all_logits = jnp.concatenate(cls_logits, axis=1)  # [N, R, K]
        all_reg = jnp.concatenate(bbox_reg, axis=1)  # [N, R, 4]
        all_anchors = jnp.concatenate(anchors, axis=0)  # [R, 4]

        def per_image(logits, reg, boxes, labels, valid):
            iou = box_iou(boxes, all_anchors)  # [G, R]
            matched = self.proposal_matcher(iou, valid_gt=valid)  # [R]
            fg = matched >= 0
            num_fg = jnp.maximum(jnp.sum(fg), 1)

            gt_cls = jax.nn.one_hot(
                jnp.where(fg, labels[jnp.clip(matched, 0)], 0),
                self.num_classes,
            ) * fg[:, None]
            valid_anchor = matched != det_utils.BETWEEN_THRESHOLDS
            cls_loss = sigmoid_focal_loss(logits, gt_cls, reduction="none")
            cls_loss = jnp.sum(cls_loss * valid_anchor[:, None]) / num_fg

            matched_boxes = boxes[jnp.clip(matched, 0)]
            target_reg = self.box_coder.encode(matched_boxes, all_anchors)
            l1 = jnp.abs(reg - target_reg).sum(-1)
            reg_loss = jnp.sum(l1 * fg) / num_fg
            return cls_loss, reg_loss

        cls_l, reg_l = jax.vmap(per_image)(
            all_logits, all_reg, gt_boxes, gt_labels, gt_valid
        )
        return {
            "classification": jnp.mean(cls_l),
            "bbox_regression": jnp.mean(reg_l),
        }


def _coco_w(url, box_map, num_params):
    return Weights(
        url=url,
        transforms=ObjectDetection,
        meta={
            "num_params": num_params,
            "_metrics": {"COCO-val2017": {"box_map": box_map}},
        },
    )


class RetinaNet_ResNet50_FPN_Weights(WeightsEnum):
    COCO_V1 = _coco_w(
        "https://download.pytorch.org/models/retinanet_resnet50_fpn_coco-eeacb38b.pth",
        36.4, 34014999,
    )
    DEFAULT = COCO_V1


class RetinaNet_ResNet50_FPN_V2_Weights(WeightsEnum):
    COCO_V1 = _coco_w(
        "https://download.pytorch.org/models/retinanet_resnet50_fpn_v2_coco-5905b1c5.pth",
        41.5, 38198935,
    )
    DEFAULT = COCO_V1


def _retinanet_hooks(sd):
    """Map reference checkpoint names: v1 cls/reg towers are
    ``head.*.conv.{i}`` plain convs -> our ``conv.{i}.0``; FPN block
    renames; anchors buffer dropped."""
    from vision_tpu.models.detection.backbone_utils import (
        _fpn_checkpoint_renames,
    )

    sd = _fpn_checkpoint_renames(sd)
    out = {}
    for k, v in sd.items():
        if ".anchors" in k:
            continue
        # v1 layout: head.classification_head.conv.0.weight (conv directly)
        parts = k.split(".")
        if (
            len(parts) >= 5
            and parts[0] == "head"
            and parts[2] == "conv"
            and parts[3].isdigit()
            and parts[4] in ("weight", "bias")
        ):
            k = ".".join(parts[:4] + ["0"] + parts[4:])
        out[k] = v
    return out


def _build_retinanet(weights, v2: bool, num_classes=91, weights_backbone=None,
                     trainable_backbone_layers=None, **kwargs) -> VisionModel:
    module = RetinaNet(
        num_classes=num_classes,
        use_head_norm=v2,
        use_p5_for_p6=not v2,
        frozen_backbone_bn=not v2,
        **kwargs,
    )
    import numpy as np

    variables = init_variables(module, 
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32)
    )
    preprocess = None
    if weights is not None:
        from vision_tpu._torch_convert import convert_torch_state_dict

        sd = weights.get_state_dict()
        variables = convert_torch_state_dict(
            sd, dict(variables), hooks=_retinanet_hooks
        )
        preprocess = weights.transforms()
    elif weights_backbone is not None:
        from vision_tpu.models.detection.backbone_utils import apply_weights_backbone

        variables = apply_weights_backbone(variables, weights_backbone)
    meta = ({"trainable_backbone_layers": trainable_backbone_layers}
            if trainable_backbone_layers is not None else None)
    return VisionModel(module=module, variables=variables, preprocess=preprocess,
                       meta=meta)


@register_model()
def retinanet_resnet50_fpn(
    *, weights: Optional[RetinaNet_ResNet50_FPN_Weights] = None, **kwargs
) -> VisionModel:
    weights = RetinaNet_ResNet50_FPN_Weights.verify(weights)
    return _build_retinanet(weights, v2=False, **kwargs)


@register_model()
def retinanet_resnet50_fpn_v2(
    *, weights: Optional[RetinaNet_ResNet50_FPN_V2_Weights] = None, **kwargs
) -> VisionModel:
    weights = RetinaNet_ResNet50_FPN_V2_Weights.verify(weights)
    return _build_retinanet(weights, v2=True, **kwargs)
