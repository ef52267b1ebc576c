"""Dataset -> tv_tensors bridge (reference
``torchvision/tv_tensors/_dataset_wrapper.py``
``wrap_dataset_for_transforms_v2``): wraps dataset samples so images come
out as :class:`~vision_tpu.tv_tensors.Image` and detection/segmentation
targets as BoundingBoxes/Mask/labels dicts that v2 transforms dispatch on.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from vision_tpu import tv_tensors

__all__ = ["wrap_dataset_for_transforms_v2"]


def _canvas_size(img) -> tuple:
    return tuple(np.asarray(img).shape[-3:-1])


def _wrap_coco_target(target_list, canvas_size, target_keys):
    """CocoDetection: list-of-anno-dicts -> dict of tv-wrapped arrays
    (reference: "boxes" XYXY, "labels"; original keys preserved)."""
    if not target_list:
        boxes = np.zeros((0, 4), np.float32)
        labels = np.zeros((0,), np.int64)
        image_id = None
    else:
        xywh = np.asarray([a["bbox"] for a in target_list], np.float32)
        boxes = np.concatenate(
            [xywh[:, :2], xywh[:, :2] + xywh[:, 2:]], axis=1
        )
        labels = np.asarray(
            [a["category_id"] for a in target_list], np.int64
        )
        image_id = target_list[0].get("image_id")
    out = {
        "image_id": image_id,
        "boxes": tv_tensors.BoundingBoxes(
            boxes, format="XYXY", canvas_size=canvas_size
        ),
        "labels": labels,
    }
    if target_keys is not None:
        keys = set(target_keys)
        merged = {}
        for anno in target_list:
            for k, v in anno.items():
                merged.setdefault(k, []).append(v)
        for k in keys - set(out):
            if k in merged:
                out[k] = merged[k]
        out = {k: v for k, v in out.items() if k in keys or k == "image_id"}
    return out


def _wrap_voc_target(target, canvas_size, target_keys):
    """VOCDetection: parsed XML dict -> add "boxes"/"labels" (reference)."""
    objects = target.get("annotation", {}).get("object", [])
    if isinstance(objects, dict):
        objects = [objects]
    boxes, names = [], []
    for obj in objects:
        bb = obj["bndbox"]
        boxes.append(
            [float(bb["xmin"]), float(bb["ymin"]),
             float(bb["xmax"]), float(bb["ymax"])]
        )
        names.append(obj["name"])
    out = dict(target)
    out["boxes"] = tv_tensors.BoundingBoxes(
        np.asarray(boxes, np.float32).reshape(-1, 4),
        format="XYXY", canvas_size=canvas_size,
    )
    _VOC_CLASSES = (
        "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
        "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
        "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
    )
    name_to_idx = {n: i + 1 for i, n in enumerate(_VOC_CLASSES)}
    out["labels"] = np.asarray(
        [name_to_idx.get(n, 0) for n in names], np.int64
    )
    if target_keys is not None:
        out = {k: v for k, v in out.items() if k in set(target_keys)}
    return out


class _WrappedDataset:
    def __init__(self, dataset, target_keys):
        self._dataset = dataset
        self._target_keys = target_keys
        self._kind = type(dataset).__name__

    def __len__(self):
        return len(self._dataset)

    def __getattr__(self, name):
        return getattr(self._dataset, name)

    def __getitem__(self, idx):
        sample = self._dataset[idx]
        if not isinstance(sample, tuple) or len(sample) < 2:
            return sample
        img, target = sample[0], sample[1]
        canvas = _canvas_size(img)
        img = tv_tensors.Image(np.asarray(img))
        if self._kind == "CocoDetection" and isinstance(target, list):
            target = _wrap_coco_target(target, canvas, self._target_keys)
        elif self._kind == "VOCDetection" and isinstance(target, dict):
            target = _wrap_voc_target(target, canvas, self._target_keys)
        elif self._kind in ("VOCSegmentation",) or (
            isinstance(target, np.ndarray) and target.ndim >= 2
        ):
            target = tv_tensors.Mask(np.asarray(target))
        return (img, target) + tuple(sample[2:])


def wrap_dataset_for_transforms_v2(dataset, target_keys: Optional[Sequence[str]] = None):
    """reference ``_dataset_wrapper.py:19``: returns a view of ``dataset``
    whose samples are tv-tensor-wrapped for v2 transform dispatch.

    Special-cased like the reference: CocoDetection (list-of-dicts ->
    {"image_id", "boxes" XYXY, "labels"}), VOCDetection ("boxes"/"labels"
    added), segmentation targets -> Mask. Everything else: the image leaf
    is wrapped as Image, the target passed through."""
    return _WrappedDataset(dataset, target_keys)
