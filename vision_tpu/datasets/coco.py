"""COCO datasets (reference ``torchvision/datasets/coco.py`` — a thin
pycocotools wrapper). pycocotools is not available here, so a minimal
pure-Python COCO JSON index provides the same surface (imgs/anns lookup),
which is all the reference dataset uses."""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional, Tuple

from vision_tpu.datasets.vision import VisionDataset

__all__ = ["COCOIndex", "CocoDetection", "CocoCaptions"]


class COCOIndex:
    """Minimal pycocotools.COCO equivalent (annotation JSON index)."""

    def __init__(self, annotation_file: str):
        with open(annotation_file) as f:
            self.dataset = json.load(f)
        self.anns: Dict[int, dict] = {}
        self.imgs: Dict[int, dict] = {}
        self.cats: Dict[int, dict] = {}
        self.img_to_anns: Dict[int, List[int]] = defaultdict(list)
        for ann in self.dataset.get("annotations", []):
            self.anns[ann["id"]] = ann
            self.img_to_anns[ann["image_id"]].append(ann["id"])
        for img in self.dataset.get("images", []):
            self.imgs[img["id"]] = img
        for cat in self.dataset.get("categories", []):
            self.cats[cat["id"]] = cat

    def getImgIds(self) -> List[int]:
        return list(self.imgs.keys())

    def getAnnIds(self, imgIds=None) -> List[int]:
        if imgIds is None:
            return list(self.anns.keys())
        if isinstance(imgIds, int):
            imgIds = [imgIds]
        out = []
        for i in imgIds:
            out.extend(self.img_to_anns[i])
        return out

    def getCatIds(self) -> List[int]:
        return list(self.cats.keys())

    def loadAnns(self, ids) -> List[dict]:
        if isinstance(ids, int):
            ids = [ids]
        return [self.anns[i] for i in ids]

    def loadImgs(self, ids) -> List[dict]:
        if isinstance(ids, int):
            ids = [ids]
        return [self.imgs[i] for i in ids]

    def loadCats(self, ids) -> List[dict]:
        if isinstance(ids, int):
            ids = [ids]
        return [self.cats[i] for i in ids]


class CocoDetection(VisionDataset):
    """reference ``coco.py:10``: (image, list-of-annotation-dicts)."""

    def __init__(
        self,
        root: str,
        annFile: str,
        transform: Optional[Callable] = None,
        target_transform: Optional[Callable] = None,
        transforms: Optional[Callable] = None,
    ):
        super().__init__(root, transforms, transform, target_transform)
        self.coco = COCOIndex(annFile)
        self.ids = sorted(self.coco.imgs.keys())

    def _load_image(self, id: int):
        from vision_tpu.io.image import ImageReadMode, read_image

        path = self.coco.loadImgs(id)[0]["file_name"]
        return read_image(os.path.join(self.root, path), ImageReadMode.RGB)

    def _load_target(self, id: int) -> List[Any]:
        return self.coco.loadAnns(self.coco.getAnnIds(imgIds=id))

    def __getitem__(self, index: int) -> Tuple[Any, Any]:
        id = self.ids[index]
        image = self._load_image(id)
        target = self._load_target(id)
        if self.transforms is not None:
            image, target = self.transforms(image, target)
        return image, target

    def __len__(self) -> int:
        return len(self.ids)


class CocoCaptions(CocoDetection):
    """reference ``coco.py`` CocoCaptions: target = list of caption strings."""

    def _load_target(self, id: int) -> List[str]:
        return [ann["caption"] for ann in super()._load_target(id)]
