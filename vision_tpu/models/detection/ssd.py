"""SSD300-VGG16 (reference ``torchvision/models/detection/ssd.py``, 682
LoC): VGG16 feature extractor with L2-scaled conv4_3, atrous FC6/FC7,
extra pyramid blocks, hard-negative-mined multibox loss, static masked
postprocessing."""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, init_variables
from vision_tpu.models.detection import _utils as det_utils
from vision_tpu.models.detection.anchor_utils import DefaultBoxGenerator
from vision_tpu.ops.nms import batched_nms_mask
from vision_tpu.transforms._presets import ObjectDetection

__all__ = ["SSD", "SSD300_VGG16_Weights", "ssd300_vgg16"]


class SSDFeatureExtractorVGG(nn.Module):
    """reference ``ssd.py:466``; torch child names features.N / extra.N
    preserved for weight conversion."""

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jax.Array]:
        conv = lambda f, k, name, s=1, p=None, d=1: nn.Conv(
            f, (k, k), (s, s),
            padding=[((k - 1) // 2 * d if p is None else p,) * 2] * 2,
            kernel_dilation=(d, d), name=name,
        )
        relu = nn.relu
        # VGG16 features up to conv4_3 (torch indices 0..22)
        cfg = [
            (64, "features.0"), (64, "features.2"), "M",
            (128, "features.5"), (128, "features.7"), "M",
            (256, "features.10"), (256, "features.12"), (256, "features.14"),
            "Mceil",
            (512, "features.17"), (512, "features.19"), (512, "features.21"),
        ]
        for item in cfg:
            if item == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            elif item == "Mceil":
                from vision_tpu.models.squeezenet import _max_pool_ceil

                x = _max_pool_ceil(x, 2, 2)
            else:
                f, name = item
                x = relu(conv(f, 3, name)(x))

        # L2 normalize + learned rescale of conv4_3
        scale_weight = self.param(
            "scale_weight", lambda k: jnp.full((512,), 20.0, jnp.float32)
        )
        norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + 1e-12)
        outputs = [x / norm * scale_weight]

        # extra.0: maxpool4 + conv5_1..5_3 + modified maxpool5 + FC6/FC7
        y = nn.max_pool(x, (2, 2), (2, 2))
        y = relu(conv(512, 3, "extra.0.1")(y))
        y = relu(conv(512, 3, "extra.0.3")(y))
        y = relu(conv(512, 3, "extra.0.5")(y))
        y = nn.max_pool(y, (3, 3), (1, 1), padding=((1, 1), (1, 1)))
        y = relu(conv(1024, 3, "extra.0.7.1", p=6, d=6)(y))  # FC6 atrous
        y = relu(conv(1024, 1, "extra.0.7.3")(y))  # FC7
        outputs.append(y)

        # extra.1..4 pyramid blocks
        y = relu(nn.Conv(256, (1, 1), name="extra.1.0")(y))
        y = relu(conv(512, 3, "extra.1.2", s=2)(y))
        outputs.append(y)
        y = relu(nn.Conv(128, (1, 1), name="extra.2.0")(y))
        y = relu(conv(256, 3, "extra.2.2", s=2)(y))
        outputs.append(y)
        y = relu(nn.Conv(128, (1, 1), name="extra.3.0")(y))
        y = relu(nn.Conv(256, (3, 3), padding="VALID", name="extra.3.2")(y))
        outputs.append(y)
        y = relu(nn.Conv(128, (1, 1), name="extra.4.0")(y))
        y = relu(nn.Conv(256, (3, 3), padding="VALID", name="extra.4.2")(y))
        outputs.append(y)
        return outputs


class SSDHead(nn.Module):
    """reference ``ssd.py:58``: per-level cls + reg convs."""

    num_anchors: Tuple[int, ...]
    num_classes: int

    @nn.compact
    def __call__(self, features: List[jax.Array]):
        cls_out, reg_out = [], []
        for i, (f, a) in enumerate(zip(features, self.num_anchors)):
            c = nn.Conv(
                self.num_classes * a, (3, 3), padding=[(1, 1)] * 2,
                name=f"classification_head.module_list.{i}",
            )(f)
            r = nn.Conv(
                4 * a, (3, 3), padding=[(1, 1)] * 2,
                name=f"regression_head.module_list.{i}",
            )(f)
            n, h, w, _ = c.shape
            cls_out.append(c.reshape(n, h * w * a, self.num_classes))
            reg_out.append(r.reshape(n, h * w * a, 4))
        return jnp.concatenate(cls_out, 1), jnp.concatenate(reg_out, 1)


class SSD(nn.Module):
    """reference ``ssd.py:126``. Input: 300x300 normalized batch."""

    num_classes: int = 91
    score_thresh: float = 0.01
    nms_thresh: float = 0.45
    detections_per_img: int = 200
    topk_candidates: int = 400
    iou_thresh: float = 0.5
    neg_to_pos_ratio: int = 3

    def setup(self):
        self.backbone = SSDFeatureExtractorVGG(name="backbone")
        self.anchor_generator = DefaultBoxGenerator(
            [[2], [2, 3], [2, 3], [2, 3], [2], [2]],
            scales=[0.07, 0.15, 0.33, 0.51, 0.69, 0.87, 1.05],
            steps=[8, 16, 32, 64, 100, 300],
        )
        self.head = SSDHead(
            num_anchors=tuple(self.anchor_generator.num_anchors_per_location()),
            num_classes=self.num_classes,
            name="head",
        )
        self.box_coder = det_utils.BoxCoder(weights=(10.0, 10.0, 5.0, 5.0))
        self.proposal_matcher = det_utils.SSDMatcher(self.iou_thresh)

    def __call__(
        self,
        images: jax.Array,
        train: bool = False,
        return_features: bool = False,
    ):
        feats = self.backbone(images, train=train)
        cls_logits, bbox_reg = self.head(feats)
        fm_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = self.anchor_generator(
            (images.shape[1], images.shape[2]), fm_sizes
        )
        if return_features:
            return (cls_logits, bbox_reg, anchors), {
                str(i): f for i, f in enumerate(feats)
            }
        return cls_logits, bbox_reg, anchors

    def postprocess_detections(
        self, cls_logits, bbox_reg, anchors, image_size
    ):
        """reference ``ssd.py`` postprocess_detections: softmax scores,
        per-class candidates, NMS."""
        from vision_tpu.models.detection.retinanet import Detections

        h, w = image_size
        n, r, c = cls_logits.shape

        def per_image(logits, reg):
            scores = jax.nn.softmax(logits)  # [R, C]
            boxes = self.box_coder.decode(reg, anchors)[:, 0]  # [R, 4]
            x = jnp.clip(boxes[:, 0::2], 0, w)
            y = jnp.clip(boxes[:, 1::2], 0, h)
            boxes = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], -1)

            # reference keeps topk_candidates PER CLASS (ssd.py:432-442:
            # per-label score filter -> topk -> concat), not a joint cap
            k = min(self.topk_candidates, r)
            cls_scores = scores[:, 1:]  # [R, C-1]
            masked = jnp.where(
                cls_scores > self.score_thresh, cls_scores, -1.0
            )
            top_s, top_i = jax.lax.top_k(masked.T, k)  # [C-1, k]
            cand_scores = top_s.reshape(-1)
            cand_boxes = boxes[top_i.reshape(-1)]
            cand_labels = jnp.repeat(jnp.arange(1, c), k)
            cvalid = cand_scores > 0
            keep = batched_nms_mask(
                cand_boxes, cand_scores, cand_labels, self.nms_thresh,
                valid=cvalid,
            )
            kept = jnp.where(keep, cand_scores, -1.0)
            top_scores, top_idx = jax.lax.top_k(kept, self.detections_per_img)
            return (
                cand_boxes[top_idx],
                jnp.where(top_scores > 0, top_scores, 0.0),
                cand_labels[top_idx],
                top_scores > 0,
            )

        outs = jax.vmap(per_image)(cls_logits, bbox_reg)
        return Detections(*outs)

    def compute_loss(
        self, cls_logits, bbox_reg, anchors, gt_boxes, gt_labels, gt_valid
    ):
        """reference ``ssd.py`` compute_loss: smooth-L1 on foreground +
        CE with 3:1 hard negative mining."""
        from vision_tpu.ops.boxes import box_iou

        def per_image(logits, reg, boxes, labels, valid):
            iou = box_iou(boxes, anchors)
            matched = self.proposal_matcher(iou, valid_gt=valid)
            fg = matched >= 0
            num_fg = jnp.maximum(jnp.sum(fg), 1)

            matched_boxes = boxes[jnp.clip(matched, 0)]
            target_reg = self.box_coder.encode(matched_boxes, anchors)
            diff = jnp.abs(reg - target_reg)
            sl1 = jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5)
            bbox_loss = jnp.sum(sl1.sum(-1) * fg)

            cls_targets = jnp.where(fg, labels[jnp.clip(matched, 0)], 0)
            logp = jax.nn.log_softmax(logits)
            ce = -jnp.take_along_axis(logp, cls_targets[:, None], -1)[:, 0]
            # hard negative mining: top (3*num_fg) negatives by loss
            neg_loss = jnp.where(fg, -jnp.inf, ce)
            order = jnp.argsort(-neg_loss)
            rank = jnp.argsort(order)
            neg_keep = rank < self.neg_to_pos_ratio * num_fg
            cls_loss = jnp.sum(ce * (fg | (neg_keep & ~fg)))
            return bbox_loss / num_fg, cls_loss / num_fg

        bl, cl = jax.vmap(per_image)(
            cls_logits, bbox_reg, gt_boxes, gt_labels, gt_valid
        )
        return {
            "bbox_regression": jnp.mean(bl),
            "classification": jnp.mean(cl),
        }


class SSD300_VGG16_Weights(WeightsEnum):
    COCO_V1 = Weights(
        url="https://download.pytorch.org/models/ssd300_vgg16_coco-b556d3b4.pth",
        transforms=ObjectDetection,
        meta={
            "num_params": 35641826,
            "_metrics": {"COCO-val2017": {"box_map": 25.1}},
        },
    )
    DEFAULT = COCO_V1


@register_model()
def ssd300_vgg16(
    *, weights: Optional[SSD300_VGG16_Weights] = None, num_classes: int = 91,
    weights_backbone=None, trainable_backbone_layers=None, **kwargs,
) -> VisionModel:
    weights = SSD300_VGG16_Weights.verify(weights)
    module = SSD(num_classes=num_classes, **kwargs)
    variables = init_variables(module, 
        jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3), jnp.float32)
    )
    preprocess = None
    if weights is not None:
        from vision_tpu._torch_convert import convert_torch_state_dict

        sd = weights.get_state_dict()
        variables = convert_torch_state_dict(sd, dict(variables))
        preprocess = weights.transforms()
    elif weights_backbone is not None:
        from vision_tpu.models.detection.backbone_utils import apply_weights_backbone

        variables = apply_weights_backbone(
            variables, weights_backbone, backbone_type="vgg"
        )
    meta = ({"trainable_backbone_layers": trainable_backbone_layers}
            if trainable_backbone_layers is not None else None)
    return VisionModel(module=module, variables=variables, preprocess=preprocess,
                       meta=meta)
