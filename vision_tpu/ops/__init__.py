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
from vision_tpu.ops.nms import batched_nms_mask, nms_mask
from vision_tpu.ops.roi_align import roi_align

__all__ = [
    "batched_nms",
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
