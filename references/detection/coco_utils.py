"""COCO dataset plumbing for the detection reference (counterpart of
``references/detection/coco_utils.py`` in the reference, which wraps
pycocotools; pycocotools is unavailable here so RLE decoding and polygon
rasterization are implemented directly).

Provides:
  * ``decode_rle`` / ``convert_coco_poly_to_mask`` — segmentation ->
    (N, H, W) uint8 masks (compressed + uncompressed RLE, polygon lists)
  * ``ConvertCocoPolysToMask`` — raw COCO annotation list -> training
    target dict (xyxy boxes clamped to the image, labels, masks,
    keypoints, area, iscrowd), degenerate boxes dropped
  * ``coco_remove_images_without_annotations``
  * ``convert_to_coco_api`` — any (img, target) dataset -> the ground
    truth dict consumed by ``coco_eval.CocoEvaluator``
  * ``get_coco`` — CocoDetection + converter + optional transforms
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

__all__ = [
    "decode_rle",
    "convert_coco_poly_to_mask",
    "ConvertCocoPolysToMask",
    "coco_remove_images_without_annotations",
    "convert_to_coco_api",
    "get_coco_api_from_dataset",
    "get_coco",
]


def _uncompress_rle_counts(counts: str) -> List[int]:
    """COCO compressed RLE string -> run lengths (LEB128-style varints
    with sign-folded deltas from the 3rd run on, per the COCO spec)."""
    out: List[int] = []
    pos = 0
    while pos < len(counts):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(counts[pos]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            pos += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k + 5)
            k += 1
        if len(out) > 2:
            x += out[-2]
        out.append(x)
    return out


def decode_rle(rle: dict) -> np.ndarray:
    """COCO RLE dict {"size": [h, w], "counts": str|list} -> (h, w) uint8.
    COCO RLE is column-major (Fortran order)."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        if isinstance(counts, bytes):
            counts = counts.decode("ascii")
        counts = _uncompress_rle_counts(counts)
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for run in counts:
        flat[pos : pos + run] = val
        pos += run
        val = 1 - val
    return flat.reshape(w, h).T


def _rasterize_polygons(polygons, height: int, width: int) -> np.ndarray:
    """Polygon list [[x0, y0, x1, y1, ...], ...] -> (h, w) uint8 union.

    Uses PIL's polygon rasterizer; pycocotools traces the boundary with
    its own scheme, so individual boundary pixels can differ — interiors
    match."""
    from PIL import Image, ImageDraw

    img = Image.new("L", (width, height), 0)
    draw = ImageDraw.Draw(img)
    for poly in polygons:
        pts = [
            (float(poly[i]), float(poly[i + 1]))
            for i in range(0, len(poly) - 1, 2)
        ]
        if len(pts) >= 3:
            draw.polygon(pts, outline=1, fill=1)
    return np.asarray(img, np.uint8)


def convert_coco_poly_to_mask(
    segmentations, height: int, width: int
) -> np.ndarray:
    """reference coco_utils.py:11: one (h, w) mask per annotation ->
    (N, h, w) uint8 (empty -> (0, h, w))."""
    masks = []
    for seg in segmentations:
        if seg is None or (isinstance(seg, list) and len(seg) == 0):
            masks.append(np.zeros((height, width), np.uint8))
        elif isinstance(seg, dict):  # RLE (crowd annotations)
            masks.append(decode_rle(seg))
        else:  # polygon list
            masks.append(_rasterize_polygons(seg, height, width))
    if not masks:
        return np.zeros((0, height, width), np.uint8)
    return np.stack(masks)


class ConvertCocoPolysToMask:
    """reference coco_utils.py:28: raw COCO target (annotation list) ->
    training target dict. Drops crowd annotations and degenerate boxes;
    boxes go xywh -> xyxy clamped to the canvas."""

    def __init__(self, with_masks: bool = True):
        self.with_masks = with_masks

    def __call__(self, image, target):
        h, w = np.asarray(image).shape[:2]
        image_id = target["image_id"]
        anno = [o for o in target["annotations"] if o.get("iscrowd", 0) == 0]

        boxes = np.asarray(
            [o["bbox"] for o in anno], np.float32
        ).reshape(-1, 4)
        boxes[:, 2:] += boxes[:, :2]
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
        classes = np.asarray([o["category_id"] for o in anno], np.int64)

        masks = None
        if self.with_masks:
            masks = convert_coco_poly_to_mask(
                [o.get("segmentation") for o in anno], h, w
            )

        keypoints = None
        if anno and "keypoints" in anno[0]:
            keypoints = np.asarray(
                [o["keypoints"] for o in anno], np.float32
            ).reshape(len(anno), -1, 3)

        keep = (boxes[:, 3] > boxes[:, 1]) & (boxes[:, 2] > boxes[:, 0])
        out = {
            "image_id": image_id,
            "boxes": boxes[keep],
            "labels": classes[keep],
            "area": np.asarray(
                [o["area"] for o in anno], np.float32
            )[keep],
            "iscrowd": np.zeros(int(keep.sum()), np.int64),
        }
        if masks is not None:
            out["masks"] = masks[keep]
        if keypoints is not None:
            out["keypoints"] = keypoints[keep]
        return image, out


def coco_remove_images_without_annotations(dataset, cat_list=None):
    """reference coco_utils.py:83: indices of images that have at least
    one usable annotation (non-empty boxes; >=10 visible keypoints for
    keypoint annotations)."""

    def _has_valid(anno):
        if len(anno) == 0:
            return False
        if all(any(c <= 1 for c in o["bbox"][2:]) for o in anno):
            return False
        if "keypoints" not in anno[0]:
            return True
        return sum(sum(1 for v in o["keypoints"][2::3] if v > 0) for o in anno) >= 10

    ids = []
    for i in range(len(dataset)):
        anno = dataset._load_target(dataset.ids[i])
        if cat_list is not None:
            anno = [o for o in anno if o["category_id"] in cat_list]
        if _has_valid(anno):
            ids.append(i)
    return ids


def convert_to_coco_api(ds) -> Dict[int, dict]:
    """reference coco_utils.py:122: walk any detection dataset yielding
    (image, target-dict) and build the ground-truth dict consumed by
    ``coco_eval.CocoEvaluator`` ({img_id: {boxes xyxy, labels, iscrowd}})."""
    gts: Dict[int, dict] = {}
    for idx in range(len(ds)):
        _, t = ds[idx]
        image_id = int(np.asarray(t["image_id"]))
        gts[image_id] = {
            "boxes": np.asarray(t["boxes"], np.float32).reshape(-1, 4),
            "labels": np.asarray(t["labels"], np.int64).reshape(-1),
            "iscrowd": np.asarray(
                t.get("iscrowd", np.zeros(len(t["labels"]))), bool
            ).reshape(-1),
        }
    return gts


def get_coco_api_from_dataset(dataset) -> Dict[int, dict]:
    """reference coco_utils.py:174 (unwraps Subset-like wrappers)."""
    while hasattr(dataset, "dataset"):
        dataset = dataset.dataset
    return convert_to_coco_api(dataset)


class _CocoDetectionForRefs:
    """CocoDetection + annotation-list target + converter (reference
    coco_utils.py:186 CocoDetection subclass)."""

    def __init__(self, img_folder, ann_file, transforms=None,
                 with_masks=True):
        from vision_tpu.datasets import CocoDetection

        self.base = CocoDetection(img_folder, ann_file)
        self.ids = self.base.ids
        self.convert = ConvertCocoPolysToMask(with_masks=with_masks)
        self.transforms = transforms

    def _load_target(self, id):
        return self.base._load_target(id)

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx):
        img, anno = self.base[idx]
        target = {"image_id": self.ids[idx], "annotations": anno}
        img, target = self.convert(img, target)
        if self.transforms is not None:
            img, target = self.transforms(img, target)
        return img, target


def get_coco(
    root,
    image_set: str,
    transforms=None,
    mode: str = "instances",
    with_masks: bool = False,
):
    """reference coco_utils.py:200: build the COCO train/val dataset with
    the standard annotation layout."""
    import os

    anno_file_template = "{}_{}2017.json"
    paths = {
        "train": (
            "train2017",
            os.path.join(
                "annotations", anno_file_template.format(mode, "train")
            ),
        ),
        "val": (
            "val2017",
            os.path.join(
                "annotations", anno_file_template.format(mode, "val")
            ),
        ),
    }
    img_folder, ann_file = paths[image_set]
    ds = _CocoDetectionForRefs(
        os.path.join(root, img_folder),
        os.path.join(root, ann_file),
        transforms=transforms,
        with_masks=with_masks,
    )
    if image_set == "train":
        keep = coco_remove_images_without_annotations(ds.base)
        ds.ids = [ds.ids[i] for i in keep]
        # narrow the underlying id list too so indexing stays aligned
        ds.base.ids = ds.ids
    return ds
