"""Keypoint R-CNN (reference
``torchvision/models/detection/keypoint_rcnn.py``, 476 LoC)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, init_variables
from vision_tpu.models.detection.faster_rcnn import FasterRCNN, _frcnn_hooks
from vision_tpu.models.detection.roi_heads import (
    KeypointRCNNHeads,
    KeypointRCNNPredictor,
)
from vision_tpu.ops.poolers import MultiScaleRoIAlign
from vision_tpu.transforms._presets import ObjectDetection

__all__ = [
    "KeypointRCNN",
    "KeypointRCNN_ResNet50_FPN_Weights",
    "keypointrcnn_resnet50_fpn",
    "KeypointDetections",
    "heatmaps_to_keypoints",
    "heatmaps_to_keypoints_exact",
]


class KeypointDetections(NamedTuple):
    boxes: jax.Array
    scores: jax.Array
    labels: jax.Array
    valid: jax.Array
    keypoints: jax.Array  # [N, D, K, 3] (x, y, visibility)
    keypoints_scores: jax.Array  # [N, D, K]


def heatmaps_to_keypoints_exact(maps, boxes):
    """Host-side EXACT transcription of reference ``roi_heads.py:237``
    heatmaps_to_keypoints: per-roi bicubic upsample of the heatmap to the
    roi's ceil size, argmax there, map back with the width/height
    correction. Dynamic per-roi sizes -> numpy on host (the reference's
    own loop is host-side eval code); use the jittable
    :func:`heatmaps_to_keypoints` inside compiled graphs.

    maps: [D, H, H, K] (array-like); boxes: [D, 4] -> ([D, K, 3], [D, K])
    numpy arrays."""
    import numpy as np

    from vision_tpu.transforms.v2.functional._resample import resample_matrix

    maps = np.asarray(maps, np.float32)
    boxes = np.asarray(boxes, np.float32)
    d, hm, _, k = maps.shape
    xy = np.zeros((d, k, 3), np.float32)
    scores = np.zeros((d, k), np.float32)
    for i in range(d):
        w = max(boxes[i, 2] - boxes[i, 0], 1.0)
        h = max(boxes[i, 3] - boxes[i, 1], 1.0)
        wc, hc = int(np.ceil(w)), int(np.ceil(h))
        wy = resample_matrix(hm, hc, "bicubic", antialias=False)
        wx = resample_matrix(hm, wc, "bicubic", antialias=False)
        # [hm, hm, K] -> [hc, wc, K]
        up = np.einsum("ij,jwk->iwk", wy, maps[i])
        up = np.einsum("ij,hjk->hik", wx, up)
        flat = up.reshape(hc * wc, k)
        idx = flat.argmax(axis=0)
        ys, xs = np.divmod(idx, wc)
        xy[i, :, 0] = (xs + 0.5) * (w / wc) + boxes[i, 0]
        xy[i, :, 1] = (ys + 0.5) * (h / hc) + boxes[i, 1]
        xy[i, :, 2] = 1.0
        scores[i] = flat[idx, np.arange(k)]
    return xy, scores


def heatmaps_to_keypoints(maps: jax.Array, boxes: jax.Array):
    """reference ``roi_heads.py:310`` heatmaps_to_keypoints: argmax of each
    keypoint heatmap mapped back into box coordinates.

    Jittable static-shape approximation (argmax at heatmap resolution, bin
    centers); eval pipelines wanting the reference's sub-bin precision use
    :func:`heatmaps_to_keypoints_exact` on host.

    maps: [D, H, H, K]; boxes: [D, 4] -> ([D, K, 3], [D, K])."""
    d, hm, _, k = maps.shape
    x0, y0 = boxes[:, 0], boxes[:, 1]
    ws = jnp.clip(boxes[:, 2] - boxes[:, 0], 1.0)
    hs = jnp.clip(boxes[:, 3] - boxes[:, 1], 1.0)

    flat = maps.transpose(0, 3, 1, 2).reshape(d, k, hm * hm)
    idx = jnp.argmax(flat, axis=-1)
    scores = jnp.max(flat, axis=-1)
    ys = (idx // hm).astype(jnp.float32)
    xs = (idx % hm).astype(jnp.float32)
    # map heatmap bin centers into image coords (reference uses offset 0.5
    # scaled bins)
    x = (xs + 0.5) * (ws[:, None] / hm) + x0[:, None]
    y = (ys + 0.5) * (hs[:, None] / hm) + y0[:, None]
    kp = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return kp, scores


class KeypointRCNN(FasterRCNN):
    num_keypoints: int = 17

    def setup(self):
        super().setup()
        self.keypoint_roi_pool = MultiScaleRoIAlign(
            list(self.featmap_names), output_size=14, sampling_ratio=2
        )
        self.keypoint_head = KeypointRCNNHeads(name="roi_heads.keypoint_head")
        self.keypoint_predictor = KeypointRCNNPredictor(
            self.num_keypoints, name="roi_heads.keypoint_predictor"
        )

    def compute_loss(
        self,
        images: jax.Array,
        gt_boxes: jax.Array,
        gt_labels: jax.Array,
        gt_valid: jax.Array,
        key: jax.Array,
        gt_keypoints: jax.Array = None,  # [N, G, K, 3]
        train: bool = True,
    ):
        """Training forward: RPN + box losses + keypoint-heatmap CE on
        the sampled positives (reference keypointrcnn_loss)."""
        losses, (feats, sampled, image_size) = super().compute_loss(
            images, gt_boxes, gt_labels, gt_valid, key, train=train,
            _return_internals=True,
        )
        if gt_keypoints is None:
            return losses
        n, s = sampled.boxes.shape[:2]
        rois = self._make_rois(sampled.boxes)
        pooled = self.keypoint_roi_pool(
            {k: feats[k] for k in self.featmap_names}, rois, image_size
        )
        x = self.keypoint_head(pooled)
        maps = self.keypoint_predictor(x)  # [N*S, 56, 56, K]
        hm = maps.shape[1]
        maps = maps.reshape(n, s, hm, hm, -1)
        losses["loss_keypoint"] = self.roi_heads.keypointrcnn_loss(
            maps, sampled, gt_keypoints
        )
        return losses

    def __call__(
        self,
        images: jax.Array,
        train: bool = False,
        return_features: bool = False,
    ):
        # return_features hands back the FPN dict already computed inside
        # the box path — no second backbone pass
        dets, feats = super().__call__(
            images, train=train, return_features=True
        )
        image_size = (images.shape[1], images.shape[2])

        n, d = dets.boxes.shape[:2]
        rois = self._make_rois(dets.boxes)
        pooled = self.keypoint_roi_pool(
            {k: feats[k] for k in self.featmap_names}, rois, image_size
        )
        x = self.keypoint_head(pooled)
        maps = self.keypoint_predictor(x)  # [N*D, 56, 56, K]
        kp, kp_scores = heatmaps_to_keypoints(maps, dets.boxes.reshape(-1, 4))
        out = KeypointDetections(
            dets.boxes,
            dets.scores,
            dets.labels,
            dets.valid,
            kp.reshape(n, d, self.num_keypoints, 3),
            kp_scores.reshape(n, d, self.num_keypoints),
        )
        if return_features:
            return out, feats
        return out


class KeypointRCNN_ResNet50_FPN_Weights(WeightsEnum):
    COCO_LEGACY = Weights(
        url="https://download.pytorch.org/models/keypointrcnn_resnet50_fpn_coco-9f466800.pth",
        transforms=ObjectDetection,
        meta={
            "num_params": 59137258,
            "_metrics": {"COCO-val2017": {"box_map": 50.6, "kp_map": 61.1}},
        },
    )
    COCO_V1 = Weights(
        url="https://download.pytorch.org/models/keypointrcnn_resnet50_fpn_coco-fc266e95.pth",
        transforms=ObjectDetection,
        meta={
            "num_params": 59137258,
            "_metrics": {"COCO-val2017": {"box_map": 54.6, "kp_map": 65.0}},
        },
    )
    DEFAULT = COCO_V1


@register_model()
def keypointrcnn_resnet50_fpn(
    *, weights: Optional[KeypointRCNN_ResNet50_FPN_Weights] = None,
    num_classes: int = 2, num_keypoints: int = 17, weights_backbone=None,
    trainable_backbone_layers=None, **kwargs,
) -> VisionModel:
    weights = KeypointRCNN_ResNet50_FPN_Weights.verify(weights)
    module = KeypointRCNN(
        num_classes=num_classes, num_keypoints=num_keypoints, **kwargs
    )
    variables = init_variables(module, 
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    preprocess = None
    if weights is not None:
        from vision_tpu._torch_convert import convert_torch_state_dict

        sd = weights.get_state_dict()
        variables = convert_torch_state_dict(sd, dict(variables), hooks=_frcnn_hooks)
        preprocess = weights.transforms()
    elif weights_backbone is not None:
        from vision_tpu.models.detection.backbone_utils import apply_weights_backbone

        variables = apply_weights_backbone(variables, weights_backbone)
    meta = ({"trainable_backbone_layers": trainable_backbone_layers}
            if trainable_backbone_layers is not None else None)
    return VisionModel(module=module, variables=variables, preprocess=preprocess,
                       meta=meta)
