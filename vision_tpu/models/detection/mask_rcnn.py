"""Mask R-CNN (reference ``torchvision/models/detection/mask_rcnn.py``,
590 LoC): Faster R-CNN + mask branch."""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, init_variables
from vision_tpu.models.detection.faster_rcnn import (
    FasterRCNN,
    _frcnn_hooks,
)
from vision_tpu.models.detection.roi_heads import (
    MaskRCNNHeads,
    MaskRCNNPredictor,
)
from vision_tpu.ops.poolers import MultiScaleRoIAlign
from vision_tpu.transforms._presets import ObjectDetection

__all__ = [
    "MaskRCNN",
    "MaskRCNN_ResNet50_FPN_Weights",
    "MaskRCNN_ResNet50_FPN_V2_Weights",
    "maskrcnn_resnet50_fpn",
    "maskrcnn_resnet50_fpn_v2",
    "MaskDetections",
]


class MaskDetections(NamedTuple):
    boxes: jax.Array  # [N, D, 4]
    scores: jax.Array  # [N, D]
    labels: jax.Array  # [N, D]
    valid: jax.Array  # [N, D]
    masks: jax.Array  # [N, D, M, M] probabilities in box frame


class MaskRCNN(FasterRCNN):
    """reference MaskRCNN: FasterRCNN + mask_head/mask_predictor."""

    def setup(self):
        super().setup()
        self.mask_roi_pool = MultiScaleRoIAlign(
            list(self.featmap_names), output_size=14, sampling_ratio=2
        )
        # v2 mask head adds BatchNorm; v1 is plain convs
        self.mask_head = MaskRCNNHeads(
            use_norm=self.v2, name="roi_heads.mask_head"
        )
        self.mask_predictor = MaskRCNNPredictor(
            self.num_classes, name="roi_heads.mask_predictor"
        )

    def compute_loss(
        self,
        images: jax.Array,
        gt_boxes: jax.Array,
        gt_labels: jax.Array,
        gt_valid: jax.Array,
        key: jax.Array,
        gt_masks: jax.Array = None,  # [N, G, H, W]
        train: bool = True,
    ):
        """Training forward: RPN + box losses + mask-branch BCE on the
        sampled positives (reference MaskRCNN training branch,
        roi_heads.py:100 maskrcnn_loss)."""
        losses, (feats, sampled, image_size) = super().compute_loss(
            images, gt_boxes, gt_labels, gt_valid, key, train=train,
            _return_internals=True,
        )
        if gt_masks is None:
            return losses
        n, s = sampled.boxes.shape[:2]
        rois = self._make_rois(sampled.boxes)
        pooled = self.mask_roi_pool(
            {k: feats[k] for k in self.featmap_names}, rois, image_size
        )
        # train=False: the v2 mask head's BatchNorm runs with frozen
        # running stats (like the backbone) — compute_loss is applied
        # without mutable collections
        x = self.mask_head(pooled, train=False)
        logits = self.mask_predictor(x)  # [N*S, 28, 28, C]
        m = logits.shape[1]
        logits = logits.reshape(n, s, m, m, -1)
        losses["loss_mask"] = self.roi_heads.maskrcnn_loss(
            logits, sampled, gt_masks
        )
        return losses

    def __call__(
        self,
        images: jax.Array,
        train: bool = False,
        return_features: bool = False,
    ):
        """Eval path: box detections + per-detection mask probabilities
        (28x28 in box frame; use
        ``roi_heads.paste_masks_in_image`` for full-resolution masks)."""
        # return_features hands back the FPN dict already computed inside
        # the box path — no second backbone pass
        dets, feats = super().__call__(
            images, train=train, return_features=True
        )
        image_size = (images.shape[1], images.shape[2])

        n, d = dets.boxes.shape[:2]
        rois = self._make_rois(dets.boxes)
        pooled = self.mask_roi_pool(
            {k: feats[k] for k in self.featmap_names}, rois, image_size
        )
        x = self.mask_head(pooled, train=train)
        logits = self.mask_predictor(x)  # [N*D, 28, 28, C]
        probs = jax.nn.sigmoid(logits)
        labels = dets.labels.reshape(-1)
        sel = jnp.take_along_axis(
            probs, labels[:, None, None, None], axis=-1
        )[..., 0]
        m = sel.shape[-1]
        masks = sel.reshape(n, d, m, m)
        out = MaskDetections(
            dets.boxes, dets.scores, dets.labels, dets.valid, masks
        )
        if return_features:
            return out, feats
        return out


def _coco_w(url, box_map, mask_map, num_params):
    return Weights(
        url=url,
        transforms=ObjectDetection,
        meta={
            "num_params": num_params,
            "_metrics": {
                "COCO-val2017": {"box_map": box_map, "mask_map": mask_map}
            },
        },
    )


class MaskRCNN_ResNet50_FPN_Weights(WeightsEnum):
    COCO_V1 = _coco_w(
        "https://download.pytorch.org/models/maskrcnn_resnet50_fpn_coco-bf2d0c1e.pth",
        37.9, 34.6, 44401393,
    )
    DEFAULT = COCO_V1


class MaskRCNN_ResNet50_FPN_V2_Weights(WeightsEnum):
    COCO_V1 = _coco_w(
        "https://download.pytorch.org/models/maskrcnn_resnet50_fpn_v2_coco-73cbd019.pth",
        47.4, 41.8, 46359409,
    )
    DEFAULT = COCO_V1


def _build_maskrcnn(weights, v2: bool, num_classes=91, weights_backbone=None,
                    trainable_backbone_layers=None, **kwargs) -> VisionModel:
    module = MaskRCNN(num_classes=num_classes, v2=v2, **kwargs)
    variables = init_variables(module, 
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    preprocess = None
    if weights is not None:
        from vision_tpu._torch_convert import convert_torch_state_dict

        sd = weights.get_state_dict()
        # deform-conv backbone variants: the plain checkpoint has no
        # conv2_offset predictor params — those stay at their zero init,
        # which reproduces the plain model exactly (backbone_utils
        # _DeformFrozenBottleneck zero-init semantics).
        allow_missing = (
            (lambda tk: "conv2_offset" in tk)
            if kwargs.get("deform_stages") else None
        )
        variables = convert_torch_state_dict(
            sd, dict(variables), hooks=_frcnn_hooks, allow_missing=allow_missing
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
def maskrcnn_resnet50_fpn(
    *, weights: Optional[MaskRCNN_ResNet50_FPN_Weights] = None, **kwargs
) -> VisionModel:
    weights = MaskRCNN_ResNet50_FPN_Weights.verify(weights)
    return _build_maskrcnn(weights, v2=False, **kwargs)


@register_model()
def maskrcnn_resnet50_fpn_v2(
    *, weights: Optional[MaskRCNN_ResNet50_FPN_V2_Weights] = None, **kwargs
) -> VisionModel:
    weights = MaskRCNN_ResNet50_FPN_V2_Weights.verify(weights)
    return _build_maskrcnn(weights, v2=True, **kwargs)


@register_model()
def maskrcnn_resnet50_fpn_deform(
    *,
    weights: Optional[MaskRCNN_ResNet50_FPN_Weights] = None,
    deform_stages=(2, 3, 4),
    deform_modulated: bool = False,
    **kwargs,
) -> VisionModel:
    """Mask R-CNN with deformable 3x3s in the trunk's C3-C5 bottlenecks
    (BASELINE config #5; detectron2's DCN backbone recipe over the
    reference op, ``torchvision/ops/deform_conv.py:14``).

    Not a reference builder — the reference ships the op but no consuming
    model. The offset (and, with ``deform_modulated=True``, DCNv2 mask)
    predictors are zero-initialized, so loading
    ``MaskRCNN_ResNet50_FPN_Weights`` (or ``weights_backbone``) reproduces
    the plain model's outputs exactly at init; the deformation is learned
    during fine-tuning."""
    weights = MaskRCNN_ResNet50_FPN_Weights.verify(weights)
    return _build_maskrcnn(
        weights, v2=False, deform_stages=tuple(deform_stages),
        deform_modulated=deform_modulated, **kwargs,
    )
