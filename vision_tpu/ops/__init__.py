from vision_tpu.ops.boxes import (
    batched_nms,
    box_area,
    box_convert,
    box_iou,
    clip_boxes_to_image,
    complete_box_iou,
    distance_box_iou,
    generalized_box_iou,
    masks_to_boxes,
    nms,
    remove_small_boxes,
)
from vision_tpu.ops._box_iou_rotated import box_iou_rotated
from vision_tpu.ops._wrappers import (
    DeformConv2d,
    DropBlock2d,
    DropBlock3d,
    PSRoIAlign,
    PSRoIPool,
    RoIAlign,
    RoIPool,
    StochasticDepth,
)
from vision_tpu.ops.deform_conv import deform_conv2d
from vision_tpu.ops.drop_block import drop_block2d, drop_block3d
from vision_tpu.ops.feature_pyramid_network import (
    FeaturePyramidNetwork,
    LastLevelMaxPool,
    LastLevelP6P7,
)
from vision_tpu.ops.losses import (
    complete_box_iou_loss,
    distance_box_iou_loss,
    generalized_box_iou_loss,
    sigmoid_focal_loss,
)
from vision_tpu.ops.misc import (
    MLP,
    Conv2dNormActivation,
    Conv3dNormActivation,
    FrozenBatchNorm2d,
    Permute,
    SqueezeExcitation,
)
from vision_tpu.ops.nms import batched_nms_mask, nms_mask
from vision_tpu.ops.poolers import LevelMapper, MultiScaleRoIAlign
from vision_tpu.ops.ps_roi_align import ps_roi_align
from vision_tpu.ops.quantized import qnms, qroi_align
from vision_tpu.ops.ps_roi_pool import ps_roi_pool
from vision_tpu.ops.roi_align import roi_align
from vision_tpu.ops.roi_pool import roi_pool
from vision_tpu.ops.stochastic_depth import stochastic_depth

__all__ = [
    "MLP",
    "Conv2dNormActivation",
    "Conv3dNormActivation",
    "DeformConv2d",
    "DropBlock2d",
    "DropBlock3d",
    "FeaturePyramidNetwork",
    "FrozenBatchNorm2d",
    "PSRoIAlign",
    "PSRoIPool",
    "RoIAlign",
    "RoIPool",
    "StochasticDepth",
    "LastLevelMaxPool",
    "LastLevelP6P7",
    "LevelMapper",
    "MultiScaleRoIAlign",
    "Permute",
    "SqueezeExcitation",
    "batched_nms",
    "box_iou_rotated",
    "complete_box_iou_loss",
    "deform_conv2d",
    "distance_box_iou_loss",
    "drop_block2d",
    "drop_block3d",
    "generalized_box_iou_loss",
    "ps_roi_align",
    "qnms",
    "qroi_align",
    "ps_roi_pool",
    "roi_pool",
    "sigmoid_focal_loss",
    "stochastic_depth",
    "batched_nms_mask",
    "box_area",
    "box_convert",
    "box_iou",
    "clip_boxes_to_image",
    "complete_box_iou",
    "distance_box_iou",
    "generalized_box_iou",
    "masks_to_boxes",
    "nms",
    "nms_mask",
    "remove_small_boxes",
    "roi_align",
]
