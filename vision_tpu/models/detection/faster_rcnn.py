"""Faster R-CNN (reference
``torchvision/models/detection/faster_rcnn.py``, 846 LoC; assembly of
``generalized_rcnn.py:53`` + rpn + roi_heads).

The full eval path — backbone -> FPN -> RPN -> static filter_proposals ->
MultiScaleRoIAlign -> box head -> static per-class NMS — runs as ONE jitted
XLA program with NMS+RoIAlign on device (BASELINE.json config #4).
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, init_variables
from vision_tpu.models.detection import _utils as det_utils
from vision_tpu.models.detection.anchor_utils import AnchorGenerator
from vision_tpu.models.detection.backbone_utils import (
    BackboneWithFPN,
    MobileNetV3FPNBackbone,
)
from vision_tpu.models.detection.roi_heads import (
    FastRCNNConvFCHead,
    FastRCNNPredictor,
    RoIHeadsLogic,
    TwoMLPHead,
)
from vision_tpu.models.detection.rpn import RegionProposalNetwork, RPNHead
from vision_tpu.models.resnet import BasicBlock, Bottleneck
from vision_tpu.ops.poolers import MultiScaleRoIAlign
from vision_tpu.transforms._presets import ObjectDetection

__all__ = [
    "FasterRCNN",
    "FasterRCNN_MobileNet_V3_Large_320_FPN_Weights",
    "FasterRCNN_MobileNet_V3_Large_FPN_Weights",
    "FasterRCNN_ResNet50_FPN_Weights",
    "FasterRCNN_ResNet50_FPN_V2_Weights",
    "fasterrcnn_mobilenet_v3_large_320_fpn",
    "fasterrcnn_mobilenet_v3_large_fpn",
    "fasterrcnn_resnet50_fpn",
    "fasterrcnn_resnet50_fpn_v2",
]


def _rpn_anchorgen():
    sizes = ((32,), (64,), (128,), (256,), (512,))
    return AnchorGenerator(sizes, ((0.5, 1.0, 2.0),) * len(sizes))


class FasterRCNN(nn.Module):
    """Backbone + RPN + box head, reference hyperparameters."""

    backbone_depth: int = 50
    backbone_type: str = "resnet"  # "resnet" | "mobilenet_v3_large"
    num_classes: int = 91
    v2: bool = False
    # deformable 3x3s in the listed trunk stages (1-based; (2,3,4) =
    # C3-C5, detectron2-style) — BASELINE config #5 backbone variant
    deform_stages: tuple = ()
    deform_modulated: bool = False
    # rpn
    rpn_pre_nms_top_n: int = 1000
    rpn_post_nms_top_n: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_score_thresh: float = 0.0

    # box
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    box_detections_per_img: int = 100

    def setup(self):
        if self.backbone_type == "mobilenet_v3_large":
            # reference faster_rcnn.py:664 _fasterrcnn_mobilenet_v3_large_fpn
            self.backbone = MobileNetV3FPNBackbone(name="backbone")
            sizes = ((32, 64, 128, 256, 512),) * 3
            self.anchor_generator = AnchorGenerator(
                sizes, ((0.5, 1.0, 2.0),) * len(sizes)
            )
            num_anchors = 15
            self.featmap_names = ("0", "1")
        elif self.backbone_type == "resnet":
            block, layers = {
                18: (BasicBlock, (2, 2, 2, 2)),
                50: (Bottleneck, (3, 4, 6, 3)),
            }[self.backbone_depth]
            if self.deform_stages and self.v2:
                raise ValueError(
                    "deform_stages is only supported on the frozen-BN v1 "
                    "trunk"
                )
            self.backbone = BackboneWithFPN(
                block=block,
                layers=layers,
                out_channels=256,
                returned_layers=(1, 2, 3, 4),
                norm_layer=(
                    functools.partial(nn.BatchNorm, use_running_average=True,
                                      momentum=0.9, epsilon=1e-5)
                    if self.v2
                    else None
                ),
                frozen_bn=not self.v2,
                deform_stages=tuple(self.deform_stages),
                deform_modulated=self.deform_modulated,
                name="backbone",
            )
            self.anchor_generator = _rpn_anchorgen()
            num_anchors = 3
            self.featmap_names = ("0", "1", "2", "3")
        else:
            raise ValueError(
                f"unknown backbone_type {self.backbone_type!r}; expected "
                "'resnet' or 'mobilenet_v3_large'"
            )
        self.rpn_head = RPNHead(
            num_anchors=num_anchors, conv_depth=2 if self.v2 else 1,
            name="rpn.head",
        )
        self.rpn = RegionProposalNetwork(
            pre_nms_top_n=self.rpn_pre_nms_top_n,
            post_nms_top_n=self.rpn_post_nms_top_n,
            nms_thresh=self.rpn_nms_thresh,
            score_thresh=self.rpn_score_thresh,
        )
        if self.v2:
            self.box_head = FastRCNNConvFCHead(name="roi_heads.box_head")
        else:
            self.box_head = TwoMLPHead(name="roi_heads.box_head")
        self.box_predictor = FastRCNNPredictor(
            self.num_classes, name="roi_heads.box_predictor"
        )
        self.box_roi_pool = MultiScaleRoIAlign(
            list(self.featmap_names), output_size=7, sampling_ratio=2
        )
        self.roi_heads = RoIHeadsLogic(
            score_thresh=self.box_score_thresh,
            nms_thresh=self.box_nms_thresh,
            detections_per_img=self.box_detections_per_img,
        )

    def _features_and_rpn(self, images, train=False):
        feats = self.backbone(images, train=train)
        rpn_keys = list(self.featmap_names) + ["pool"]
        rpn_feats = [feats[k] for k in rpn_keys if k in feats]
        objectness, deltas = self.rpn_head(rpn_feats)
        fm_sizes = [(f.shape[1], f.shape[2]) for f in rpn_feats]
        anchors = self.anchor_generator(
            (images.shape[1], images.shape[2]), fm_sizes
        )
        return feats, objectness, deltas, anchors

    def _make_rois(self, boxes: jax.Array) -> jax.Array:
        """[N, P, 4] boxes -> [N*P, 5] (batch_idx, x1, y1, x2, y2)."""
        n, p = boxes.shape[:2]
        batch_idx = jnp.repeat(jnp.arange(n, dtype=jnp.float32), p)
        return jnp.concatenate(
            [batch_idx[:, None], boxes.reshape(-1, 4)], axis=1
        )

    def _box_branch(self, feats, rois, image_size, train: bool = False):
        """rois: [K, 5] (batch_idx, x1..y2) -> (scores, deltas)."""
        pooled = self.box_roi_pool(
            {k: feats[k] for k in self.featmap_names}, rois, image_size
        )
        if self.v2:  # v2 conv-fc head carries BatchNorm (train-dependent)
            rep = self.box_head(pooled, train=train)
        else:
            rep = self.box_head(pooled)
        return self.box_predictor(rep)

    def __call__(
        self,
        images: jax.Array,
        train: bool = False,
        return_features: bool = False,
    ):
        """Eval forward: full detection path. images: [N, H, W, C] padded.
        Returns Detections (fixed [N, 100] rows); with
        ``return_features=True`` also the backbone FPN feature dict
        (the FX-extractor analog, reference feature_extraction.py:269)."""
        image_size = (images.shape[1], images.shape[2])
        feats, objectness, deltas, anchors = self._features_and_rpn(
            images, train=train
        )
        proposals = self.rpn.filter_proposals(
            objectness, deltas, anchors, image_size
        )

        n, p = proposals.boxes.shape[:2]
        rois = self._make_rois(proposals.boxes)
        class_logits, box_regression = self._box_branch(
            feats, rois, image_size, train=train
        )
        class_logits = class_logits.reshape(n, p, -1)
        box_regression = box_regression.reshape(n, p, -1)
        dets = self.roi_heads.postprocess_detections(
            class_logits, box_regression, proposals.boxes, proposals.valid,
            image_size,
        )
        if return_features:
            return dets, feats
        return dets

    def compute_loss(
        self,
        images: jax.Array,
        gt_boxes: jax.Array,
        gt_labels: jax.Array,
        gt_valid: jax.Array,
        key: jax.Array,
        train: bool = True,
        _return_internals: bool = False,
    ) -> Dict[str, jax.Array]:
        """Training forward: RPN + box-head losses (reference
        GeneralizedRCNN.forward training branch). ``_return_internals``
        additionally returns (feats, sampled, image_size) for the mask/
        keypoint branch losses of the subclasses."""
        image_size = (images.shape[1], images.shape[2])
        feats, objectness, deltas, anchors = self._features_and_rpn(
            images, train=train
        )
        k1, k2 = jax.random.split(key)
        rpn_losses = self.rpn.compute_loss(
            objectness, deltas, anchors, gt_boxes, gt_valid, k1
        )
        proposals = self.rpn.filter_proposals(
            objectness, deltas, anchors, image_size
        )
        sampled = self.roi_heads.select_training_samples(
            proposals.boxes, proposals.valid, gt_boxes, gt_labels, gt_valid, k2
        )
        n, s = sampled.boxes.shape[:2]
        rois = self._make_rois(sampled.boxes)
        class_logits, box_regression = self._box_branch(
            feats, rois, image_size, train=train
        )
        class_logits = class_logits.reshape(n, s, -1)
        box_regression = box_regression.reshape(n, s, -1)
        box_losses = self.roi_heads.fastrcnn_loss(
            class_logits, box_regression, sampled
        )
        losses = {**rpn_losses, **box_losses}
        if _return_internals:
            return losses, (feats, sampled, image_size)
        return losses


def _frcnn_hooks(sd):
    """Checkpoint adjustments: v1 rpn conv rename (conv -> conv.0.0),
    fc6 CHW->HWC reorder, FPN block renames, drop cached anchors."""
    from vision_tpu.models.detection.backbone_utils import (
        _fpn_checkpoint_renames,
    )

    sd = _fpn_checkpoint_renames(sd)
    out = {}
    for k, v in sd.items():
        if ".anchors" in k or "cell_anchors" in k:
            continue
        if k.startswith("rpn.head.conv.") and k.split(".")[3] in ("weight", "bias"):
            # already v1-style rpn.head.conv.weight
            pass
        if k in ("rpn.head.conv.weight", "rpn.head.conv.bias"):
            k = k.replace("rpn.head.conv.", "rpn.head.conv.0.0.")
        out[k] = v
    if "roi_heads.box_head.fc6.weight" in out:
        w = np.asarray(out["roi_heads.box_head.fc6.weight"])
        out["roi_heads.box_head.fc6.weight"] = (
            w.reshape(w.shape[0], 256, 7, 7).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
        )
    # mask head v1: the reference module names its convs "{i}.0"
    # (Sequential of Conv2dNormActivation, norm-free) but our v1 flax head
    # and the published checkpoints both use the legacy "mask_fcn{i+1}"
    # names (reference mask_rcnn.py:321 performs the reverse rename on
    # load). v2 ("{i}.1" norm keys present) matches our naming as-is.
    has_mask_norm = any(
        k.startswith("roi_heads.mask_head.") and k.split(".")[3] == "1"
        for k in out
    )
    if not has_mask_norm:
        renamed = {}
        for k, v in out.items():
            parts = k.split(".")
            if (
                len(parts) == 5
                and k.startswith("roi_heads.mask_head.")
                and parts[2].isdigit()
                and parts[3] == "0"
            ):
                k = f"roi_heads.mask_head.mask_fcn{int(parts[2]) + 1}.{parts[4]}"
            renamed[k] = v
        out = renamed
    # v2 conv-fc box head: flatten happens after convs ("5" dense input is
    # [7,7,256] flattened)
    if "roi_heads.box_head.5.weight" in out:
        w = np.asarray(out["roi_heads.box_head.5.weight"])
        out["roi_heads.box_head.5.weight"] = (
            w.reshape(w.shape[0], 256, 7, 7).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
        )
    return out


def _coco_w(url, box_map, num_params):
    return Weights(
        url=url,
        transforms=ObjectDetection,
        meta={
            "num_params": num_params,
            "_metrics": {"COCO-val2017": {"box_map": box_map}},
        },
    )


class FasterRCNN_ResNet50_FPN_Weights(WeightsEnum):
    COCO_V1 = _coco_w(
        "https://download.pytorch.org/models/fasterrcnn_resnet50_fpn_coco-258fb6c6.pth",
        37.0, 41755286,
    )
    DEFAULT = COCO_V1


class FasterRCNN_ResNet50_FPN_V2_Weights(WeightsEnum):
    COCO_V1 = _coco_w(
        "https://download.pytorch.org/models/fasterrcnn_resnet50_fpn_v2_coco-dd69338a.pth",
        46.7, 43712278,
    )
    DEFAULT = COCO_V1


def _build_frcnn(
    weights,
    v2: bool,
    num_classes=91,
    weights_backbone=None,
    trainable_backbone_layers=None,
    **kwargs,
) -> VisionModel:
    module = FasterRCNN(num_classes=num_classes, v2=v2, **kwargs)
    # tiny init input: params are input-size independent, and init *runs*
    # the full path (incl. NMS loops) eagerly on host
    variables = init_variables(module,
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    preprocess = None
    if weights is not None:
        from vision_tpu._torch_convert import convert_torch_state_dict

        sd = weights.get_state_dict()
        variables = convert_torch_state_dict(
            sd, dict(variables), hooks=_frcnn_hooks
        )
        preprocess = weights.transforms()
    elif weights_backbone is not None:
        # reference builders' weights_backbone= (ImageNet trunk init)
        from vision_tpu.models.detection.backbone_utils import (
            apply_weights_backbone,
        )

        variables = apply_weights_backbone(
            variables,
            weights_backbone,
            backbone_type=(
                "mobilenet_v3_large"
                if kwargs.get("backbone_type", "").startswith("mobilenet")
                else "resnet"
            ),
        )
    meta = (
        {"trainable_backbone_layers": trainable_backbone_layers}
        if trainable_backbone_layers is not None
        else None
    )
    return VisionModel(
        module=module, variables=variables, preprocess=preprocess, meta=meta
    )


@register_model()
def fasterrcnn_resnet50_fpn(
    *, weights: Optional[FasterRCNN_ResNet50_FPN_Weights] = None, **kwargs
) -> VisionModel:
    weights = FasterRCNN_ResNet50_FPN_Weights.verify(weights)
    return _build_frcnn(weights, v2=False, **kwargs)


@register_model()
def fasterrcnn_resnet50_fpn_v2(
    *, weights: Optional[FasterRCNN_ResNet50_FPN_V2_Weights] = None, **kwargs
) -> VisionModel:
    weights = FasterRCNN_ResNet50_FPN_V2_Weights.verify(weights)
    return _build_frcnn(weights, v2=True, **kwargs)


class FasterRCNN_MobileNet_V3_Large_FPN_Weights(WeightsEnum):
    COCO_V1 = _coco_w(
        "https://download.pytorch.org/models/fasterrcnn_mobilenet_v3_large_fpn-fb6a3cc7.pth",
        32.8, 19386354,
    )
    DEFAULT = COCO_V1


class FasterRCNN_MobileNet_V3_Large_320_FPN_Weights(WeightsEnum):
    COCO_V1 = _coco_w(
        "https://download.pytorch.org/models/fasterrcnn_mobilenet_v3_large_320_fpn-907ea3f9.pth",
        22.8, 19386354,
    )
    DEFAULT = COCO_V1


@register_model()
def fasterrcnn_mobilenet_v3_large_fpn(
    *,
    weights: Optional[FasterRCNN_MobileNet_V3_Large_FPN_Weights] = None,
    **kwargs,
) -> VisionModel:
    """reference ``faster_rcnn.py:784``: high-res mobilenet-v3-large FPN
    variant (rpn_score_thresh=0.05)."""
    weights = FasterRCNN_MobileNet_V3_Large_FPN_Weights.verify(weights)
    kwargs.setdefault("rpn_score_thresh", 0.05)
    return _build_frcnn(
        weights, v2=False, backbone_type="mobilenet_v3_large", **kwargs
    )


@register_model()
def fasterrcnn_mobilenet_v3_large_320_fpn(
    *,
    weights: Optional[FasterRCNN_MobileNet_V3_Large_320_FPN_Weights] = None,
    **kwargs,
) -> VisionModel:
    """reference ``faster_rcnn.py:710``: low-res (320-640) variant with
    rpn top-n 150 test-time defaults."""
    weights = FasterRCNN_MobileNet_V3_Large_320_FPN_Weights.verify(weights)
    kwargs.setdefault("rpn_score_thresh", 0.05)
    kwargs.setdefault("rpn_pre_nms_top_n", 150)
    kwargs.setdefault("rpn_post_nms_top_n", 150)
    return _build_frcnn(
        weights, v2=False, backbone_type="mobilenet_v3_large", **kwargs
    )
