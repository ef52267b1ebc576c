"""FCOS (reference ``torchvision/models/detection/fcos.py``, 775 LoC):
anchor-free detection with centerness head and GIoU regression."""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, init_variables
from vision_tpu.models.detection import _utils as det_utils
from vision_tpu.models.detection.anchor_utils import AnchorGenerator
from vision_tpu.models.detection.backbone_utils import BackboneWithFPN
from vision_tpu.ops._topk import top_k_2d
from vision_tpu.models.resnet import BasicBlock, Bottleneck
from vision_tpu.ops.feature_pyramid_network import LastLevelP6P7
from vision_tpu.ops.losses import generalized_box_iou_loss, sigmoid_focal_loss
from vision_tpu.ops.nms import batched_nms_mask
from vision_tpu.transforms._presets import ObjectDetection

__all__ = ["FCOS", "FCOS_ResNet50_FPN_Weights", "fcos_resnet50_fpn"]

import math


class FCOSHead(nn.Module):
    """reference ``fcos.py:31``: class tower + regression tower (with
    centerness), GroupNorm(32), shared across levels."""

    num_classes: int
    num_convs: int = 4

    @nn.compact
    def __call__(self, features: List[jax.Array]):
        in_ch = features[0].shape[-1]

        def make_tower(prefix):
            # torch tower is [Conv, GroupNorm, ReLU] triples -> conv.{3i},
            # conv.{3i+1}
            convs, norms = [], []
            for i in range(self.num_convs):
                convs.append(
                    nn.Conv(
                        in_ch, (3, 3), padding=[(1, 1)] * 2,
                        name=f"{prefix}.conv.{3 * i}",
                    )
                )
                norms.append(
                    nn.GroupNorm(
                        num_groups=32, epsilon=1e-5,
                        name=f"{prefix}.conv.{3 * i + 1}",
                    )
                )
            return convs, norms

        cls_convs, cls_norms = make_tower("classification_head")
        reg_convs, reg_norms = make_tower("regression_head")
        cls_logits = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1)] * 2,
            name="classification_head.cls_logits",
            bias_init=nn.initializers.constant(-math.log((1 - 0.01) / 0.01)),
        )
        bbox_reg = nn.Conv(
            4, (3, 3), padding=[(1, 1)] * 2, name="regression_head.bbox_reg"
        )
        bbox_ctrness = nn.Conv(
            1, (3, 3), padding=[(1, 1)] * 2, name="regression_head.bbox_ctrness"
        )

        logits_out, reg_out, ctr_out = [], [], []
        for f in features:
            t = f
            for conv, norm in zip(cls_convs, cls_norms):
                t = nn.relu(norm(conv(t)))
            c = cls_logits(t)
            t = f
            for conv, norm in zip(reg_convs, reg_norms):
                t = nn.relu(norm(conv(t)))
            r = nn.relu(bbox_reg(t))
            ct = bbox_ctrness(t)
            n, h, w, _ = c.shape
            logits_out.append(c.reshape(n, h * w, self.num_classes))
            reg_out.append(r.reshape(n, h * w, 4))
            ctr_out.append(ct.reshape(n, h * w, 1))
        return logits_out, reg_out, ctr_out


class FCOS(nn.Module):
    """reference FCOS assembly; one anchor of size == stride per location."""

    backbone_depth: int = 50
    num_classes: int = 91
    score_thresh: float = 0.2
    nms_thresh: float = 0.6
    detections_per_img: int = 100
    topk_candidates: int = 1000
    center_sampling_radius: float = 1.5

    def setup(self):
        block, layers = {
            18: (BasicBlock, (2, 2, 2, 2)),
            50: (Bottleneck, (3, 4, 6, 3)),
        }[self.backbone_depth]
        self.backbone = BackboneWithFPN(
            block=block,
            layers=layers,
            out_channels=256,
            extra_blocks=LastLevelP6P7(256, use_P5=True),
            returned_layers=(2, 3, 4),
            name="backbone",
        )
        sizes = ((8,), (16,), (32,), (64,), (128,))
        self.anchor_generator = AnchorGenerator(sizes, ((1.0,),) * len(sizes))
        self.head = FCOSHead(num_classes=self.num_classes, name="head")
        self.box_coder = det_utils.BoxLinearCoder(normalize_by_size=True)

    def __call__(
        self,
        images: jax.Array,
        train: bool = False,
        return_features: bool = False,
    ):
        feats = self.backbone(images, train=train)
        keys = [k for k in ["0", "1", "2", "p6", "p7"] if k in feats]
        features = [feats[k] for k in keys]
        logits, reg, ctr = self.head(features)
        fm_sizes = [(f.shape[1], f.shape[2]) for f in features]
        anchors = self.anchor_generator(
            (images.shape[1], images.shape[2]), fm_sizes
        )
        if return_features:
            return (logits, reg, ctr, anchors), feats
        return logits, reg, ctr, anchors

    def postprocess_detections(self, logits, reg, ctr, anchors, image_size):
        """reference fcos postprocess: score = sqrt(sigmoid(cls) *
        sigmoid(ctrness)), per-level topk, cross-level batched NMS."""
        from vision_tpu.models.detection.retinanet import Detections

        h, w = image_size
        n = logits[0].shape[0]

        def per_image(lg_list, rg_list, ct_list):
            boxes_all, scores_all, labels_all, valid_all = [], [], [], []
            for lg, rg, ct, anch in zip(lg_list, rg_list, ct_list, anchors):
                c = lg.shape[-1]
                # [HWA, C] exact two-stage top-k (ops/_topk.py) instead of
                # a full variadic sort over HW*A*C (see retinanet.py)
                scores2 = jnp.sqrt(
                    jax.nn.sigmoid(lg) * jax.nn.sigmoid(ct)
                ).reshape(-1, c)
                k = min(self.topk_candidates, scores2.size)
                top_scores, top_idx = top_k_2d(scores2, k)
                valid = top_scores > self.score_thresh
                anchor_idx = top_idx // c
                labels = top_idx % c
                dec = self.box_coder.decode(rg[anchor_idx], anch[anchor_idx])
                x = jnp.clip(dec[:, 0::2], 0, w)
                y = jnp.clip(dec[:, 1::2], 0, h)
                dec = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], -1)
                boxes_all.append(dec)
                scores_all.append(top_scores)
                labels_all.append(labels)
                valid_all.append(valid)
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            labels = jnp.concatenate(labels_all)
            valid = jnp.concatenate(valid_all)
            keep = batched_nms_mask(boxes, scores, labels, self.nms_thresh, valid=valid)
            kept = jnp.where(keep, scores, -1.0)
            top_scores, top_idx = jax.lax.top_k(kept, self.detections_per_img)
            return (
                boxes[top_idx],
                jnp.where(top_scores > 0, top_scores, 0.0),
                labels[top_idx],
                top_scores > 0,
            )

        outs = [
            per_image(
                [l[i] for l in logits], [r[i] for r in reg], [c[i] for c in ctr]
            )
            for i in range(n)
        ]
        return Detections(
            boxes=jnp.stack([o[0] for o in outs]),
            scores=jnp.stack([o[1] for o in outs]),
            labels=jnp.stack([o[2] for o in outs]),
            valid=jnp.stack([o[3] for o in outs]),
        )

    def compute_loss(
        self, logits, reg, ctr, anchors, gt_boxes, gt_labels, gt_valid,
        num_anchors_per_level=None,
    ):
        """reference ``fcos.py:440``: center-sampling match + focal/GIoU/
        ctrness losses, batched with padded gt. ``num_anchors_per_level``
        defaults to the per-level anchor counts."""
        if num_anchors_per_level is None:
            num_anchors_per_level = [a.shape[0] for a in anchors]
        all_logits = jnp.concatenate(logits, axis=1)
        all_reg = jnp.concatenate(reg, axis=1)
        all_ctr = jnp.concatenate(ctr, axis=1)[..., 0]
        all_anchors = jnp.concatenate(anchors, axis=0)  # [R, 4]
        r = all_anchors.shape[0]

        # per-anchor scale bounds
        anchor_sizes = all_anchors[:, 2] - all_anchors[:, 0]
        lower = anchor_sizes * 4
        upper = anchor_sizes * 8
        lower = lower.at[: num_anchors_per_level[0]].set(0.0)
        upper = upper.at[r - num_anchors_per_level[-1]:].set(jnp.inf)

        def match(boxes, valid):
            centers = (all_anchors[:, :2] + all_anchors[:, 2:]) / 2  # [R,2]
            gt_centers = (boxes[:, :2] + boxes[:, 2:]) / 2  # [G,2]
            pm = (
                jnp.max(
                    jnp.abs(centers[:, None] - gt_centers[None]), axis=2
                )
                < self.center_sampling_radius * anchor_sizes[:, None]
            )
            x, y = centers[:, 0:1], centers[:, 1:2]
            x0, y0, x1, y1 = (boxes[None, :, i] for i in range(4))
            dist = jnp.stack([x - x0, y - y0, x1 - x, y1 - y], axis=2)
            pm &= jnp.min(dist, axis=2) > 0
            dmax = jnp.max(dist, axis=2)
            pm &= (dmax > lower[:, None]) & (dmax < upper[:, None])
            pm &= valid[None, :]
            areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            score = pm.astype(jnp.float32) * (1e8 - areas[None, :])
            min_vals = jnp.max(score, axis=1)
            matched = jnp.argmax(score, axis=1).astype(jnp.int32)
            return jnp.where(min_vals < 1e-5, -1, matched)

        def per_image(lg, rg, ct, boxes, labels, valid):
            matched = match(boxes, valid)
            fg = matched >= 0
            num_fg = jnp.maximum(jnp.sum(fg), 1)
            cls_t = jax.nn.one_hot(
                jnp.where(fg, labels[jnp.clip(matched, 0)], 0),
                self.num_classes,
            ) * fg[:, None]
            cls_loss = jnp.sum(sigmoid_focal_loss(lg, cls_t, reduction="none"))

            gt_b = boxes[jnp.clip(matched, 0)]
            pred = self.box_coder.decode(rg, all_anchors)
            gl = generalized_box_iou_loss(pred, gt_b, reduction="none")
            reg_loss = jnp.sum(gl * fg)

            t = self.box_coder.encode(gt_b, all_anchors)
            lr = jnp.stack([t[:, 0], t[:, 2]], -1)
            tb = jnp.stack([t[:, 1], t[:, 3]], -1)
            ctr_t = jnp.sqrt(
                jnp.clip(
                    (jnp.min(lr, -1) / jnp.clip(jnp.max(lr, -1), 1e-6))
                    * (jnp.min(tb, -1) / jnp.clip(jnp.max(tb, -1), 1e-6)),
                    0.0,
                )
            )
            bce = jnp.clip(ct, 0) - ct * ctr_t + jnp.log1p(jnp.exp(-jnp.abs(ct)))
            ctr_loss = jnp.sum(bce * fg)
            return cls_loss / num_fg, reg_loss / num_fg, ctr_loss / num_fg

        cl, rl, ctl = jax.vmap(per_image)(
            all_logits, all_reg, all_ctr, gt_boxes, gt_labels, gt_valid
        )
        return {
            "classification": jnp.mean(cl),
            "bbox_regression": jnp.mean(rl),
            "bbox_ctrness": jnp.mean(ctl),
        }


class FCOS_ResNet50_FPN_Weights(WeightsEnum):
    COCO_V1 = Weights(
        url="https://download.pytorch.org/models/fcos_resnet50_fpn_coco-99b0c9b7.pth",
        transforms=ObjectDetection,
        meta={
            "num_params": 32269600,
            "_metrics": {"COCO-val2017": {"box_map": 39.2}},
        },
    )
    DEFAULT = COCO_V1


def _fcos_hooks(sd):
    """Reference checkpoint -> flax-mirrored names: FPN/extra-block
    renames plus dropped cached anchors."""
    from vision_tpu.models.detection.backbone_utils import (
        _fpn_checkpoint_renames,
    )

    sd = _fpn_checkpoint_renames(sd)
    return {k: v for k, v in sd.items() if ".anchors" not in k}


@register_model()
def fcos_resnet50_fpn(
    *, weights: Optional[FCOS_ResNet50_FPN_Weights] = None,
    num_classes: int = 91, weights_backbone=None,
    trainable_backbone_layers=None, **kwargs,
) -> VisionModel:
    weights = FCOS_ResNet50_FPN_Weights.verify(weights)
    module = FCOS(num_classes=num_classes, **kwargs)
    variables = init_variables(module, 
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    preprocess = None
    if weights is not None:
        from vision_tpu._torch_convert import convert_torch_state_dict

        sd = weights.get_state_dict()
        variables = convert_torch_state_dict(sd, dict(variables), hooks=_fcos_hooks)
        preprocess = weights.transforms()
    elif weights_backbone is not None:
        from vision_tpu.models.detection.backbone_utils import apply_weights_backbone

        variables = apply_weights_backbone(variables, weights_backbone)
    meta = ({"trainable_backbone_layers": trainable_backbone_layers}
            if trainable_backbone_layers is not None else None)
    return VisionModel(module=module, variables=variables, preprocess=preprocess,
                       meta=meta)
