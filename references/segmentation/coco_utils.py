"""COCO-as-VOC segmentation plumbing (counterpart of reference
``references/segmentation/coco_utils.py``): keep the 20 VOC categories,
remap ids to 0..20, merge per-instance masks into one category map with
255 on overlapping instances, drop train images with <1000 annotated
pixels."""

from __future__ import annotations

import copy
import importlib.util
import os
from typing import List, Optional

import numpy as np

# VOC-20 category ids within COCO (reference coco_utils.py CAT_LIST)
CAT_LIST = [0, 5, 2, 16, 9, 44, 6, 3, 17, 62, 21, 67, 18, 19, 4, 1, 64,
            20, 63, 7, 72]


def _det_coco_utils():
    """Load ../detection/coco_utils.py (shared mask decoding) by path."""
    spec = importlib.util.spec_from_file_location(
        "_det_coco_utils",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "..", "detection", "coco_utils.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class FilterAndRemapCocoCategories:
    """reference coco_utils.py:12: keep/remap annotations to cat indices."""

    def __init__(self, categories: List[int], remap: bool = True):
        self.categories = categories
        self.remap = remap

    def __call__(self, image, anno):
        anno = [o for o in anno if o["category_id"] in self.categories]
        if not self.remap:
            return image, anno
        anno = copy.deepcopy(anno)
        for o in anno:
            o["category_id"] = self.categories.index(o["category_id"])
        return image, anno


class ConvertCocoPolysToMask:
    """reference coco_utils.py:43: instance segmentations -> one (H, W)
    uint8 category map; overlapping instances become 255 (ignore)."""

    def __init__(self):
        self._det = _det_coco_utils()

    def __call__(self, image, anno):
        h, w = np.asarray(image).shape[:2]
        segs = [o["segmentation"] for o in anno]
        cats = np.asarray(
            [o["category_id"] for o in anno], np.uint8
        )
        if segs:
            masks = self._det.convert_coco_poly_to_mask(segs, h, w)
            target = (masks * cats[:, None, None]).max(axis=0)
            target[masks.sum(axis=0) > 1] = 255
        else:
            target = np.zeros((h, w), np.uint8)
        return image, target


def coco_remove_images_without_annotations(dataset, cat_list=None):
    """reference coco_utils.py:63: keep images with >1000 annotated px."""
    ids = []
    for i in range(len(dataset)):
        anno = dataset._load_target(dataset.ids[i])
        if cat_list:
            anno = [o for o in anno if o["category_id"] in cat_list]
        if anno and sum(o["area"] for o in anno) > 1000:
            ids.append(i)
    return ids


class _CocoSegmentation:
    """CocoDetection + category remap + mask merge (+user transforms)."""

    def __init__(self, img_folder, ann_file, transforms=None):
        from vision_tpu.datasets import CocoDetection

        self.base = CocoDetection(img_folder, ann_file)
        self.ids = self.base.ids
        self.filter = FilterAndRemapCocoCategories(CAT_LIST, remap=True)
        self.convert = ConvertCocoPolysToMask()
        self.transforms = transforms

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx):
        img, anno = self.base[idx]
        img, anno = self.filter(img, anno)
        img, target = self.convert(img, anno)
        if self.transforms is not None:
            img, target = self.transforms(img, target)
        return img, target


def get_coco(root, image_set: str, transforms=None):
    """reference coco_utils.py:84."""
    paths = {
        "train": (
            "train2017", os.path.join("annotations", "instances_train2017.json")
        ),
        "val": (
            "val2017", os.path.join("annotations", "instances_val2017.json")
        ),
    }
    img_folder, ann_file = paths[image_set]
    ds = _CocoSegmentation(
        os.path.join(root, img_folder),
        os.path.join(root, ann_file),
        transforms=transforms,
    )
    if image_set == "train":
        keep = coco_remove_images_without_annotations(ds.base, CAT_LIST)
        ds.ids = [ds.ids[i] for i in keep]
        ds.base.ids = ds.ids
    return ds
