"""Remaining reference dataset classes (one-file-per-dataset in
``torchvision/datasets/``): Cityscapes, CelebA, FER2013, Places365, SBD,
StanfordCars, WIDERFace, INaturalist, Omniglot, LFWPeople/LFWPairs,
Kitti, PCAM, MovingMNIST, CLEVRClassification, LSUN, SBU, Flickr8k/30k.

Implementations parse the reference's documented on-disk layouts; datasets
whose download requires Google Drive or unavailable deps (lmdb, h5py)
raise a clear error instead."""

from __future__ import annotations

import csv
import json
import os
import pathlib
from collections import namedtuple
from typing import Any, Callable, List, Optional, Tuple, Union

import numpy as np

from vision_tpu.datasets.utils import verify_str_arg
from vision_tpu.datasets.vision import VisionDataset

__all__ = [
    "Cityscapes",
    "CelebA",
    "FER2013",
    "Places365",
    "SBDataset",
    "StanfordCars",
    "WIDERFace",
    "INaturalist",
    "Omniglot",
    "LFWPeople",
    "LFWPairs",
    "Kitti",
    "PCAM",
    "MovingMNIST",
    "CLEVRClassification",
    "LSUN",
    "SBU",
    "Flickr8k",
    "Flickr30k",
]


def _read_rgb(path):
    from vision_tpu.io.image import ImageReadMode, read_image

    return read_image(str(path), ImageReadMode.RGB)


def _read_any(path):
    from vision_tpu.io.image import read_image

    return read_image(str(path))


CityscapesClass = namedtuple(
    "CityscapesClass",
    ["name", "id", "train_id", "category", "category_id", "has_instances",
     "ignore_in_eval", "color"],
)


class Cityscapes(VisionDataset):
    """reference ``cityscapes.py``: leftImg8bit/<split>/<city>/*.png with
    gtFine|gtCoarse targets (instance/semantic/polygon/color)."""

    classes = [
        CityscapesClass("unlabeled", 0, 255, "void", 0, False, True, (0, 0, 0)),
        CityscapesClass("ego vehicle", 1, 255, "void", 0, False, True, (0, 0, 0)),
        CityscapesClass("rectification border", 2, 255, "void", 0, False, True, (0, 0, 0)),
        CityscapesClass("out of roi", 3, 255, "void", 0, False, True, (0, 0, 0)),
        CityscapesClass("static", 4, 255, "void", 0, False, True, (0, 0, 0)),
        CityscapesClass("dynamic", 5, 255, "void", 0, False, True, (111, 74, 0)),
        CityscapesClass("ground", 6, 255, "void", 0, False, True, (81, 0, 81)),
        CityscapesClass("road", 7, 0, "flat", 1, False, False, (128, 64, 128)),
        CityscapesClass("sidewalk", 8, 1, "flat", 1, False, False, (244, 35, 232)),
        CityscapesClass("parking", 9, 255, "flat", 1, False, True, (250, 170, 160)),
        CityscapesClass("rail track", 10, 255, "flat", 1, False, True, (230, 150, 140)),
        CityscapesClass("building", 11, 2, "construction", 2, False, False, (70, 70, 70)),
        CityscapesClass("wall", 12, 3, "construction", 2, False, False, (102, 102, 156)),
        CityscapesClass("fence", 13, 4, "construction", 2, False, False, (190, 153, 153)),
        CityscapesClass("guard rail", 14, 255, "construction", 2, False, True, (180, 165, 180)),
        CityscapesClass("bridge", 15, 255, "construction", 2, False, True, (150, 100, 100)),
        CityscapesClass("tunnel", 16, 255, "construction", 2, False, True, (150, 120, 90)),
        CityscapesClass("pole", 17, 5, "object", 3, False, False, (153, 153, 153)),
        CityscapesClass("polegroup", 18, 255, "object", 3, False, True, (153, 153, 153)),
        CityscapesClass("traffic light", 19, 6, "object", 3, False, False, (250, 170, 30)),
        CityscapesClass("traffic sign", 20, 7, "object", 3, False, False, (220, 220, 0)),
        CityscapesClass("vegetation", 21, 8, "nature", 4, False, False, (107, 142, 35)),
        CityscapesClass("terrain", 22, 9, "nature", 4, False, False, (152, 251, 152)),
        CityscapesClass("sky", 23, 10, "sky", 5, False, False, (70, 130, 180)),
        CityscapesClass("person", 24, 11, "human", 6, True, False, (220, 20, 60)),
        CityscapesClass("rider", 25, 12, "human", 6, True, False, (255, 0, 0)),
        CityscapesClass("car", 26, 13, "vehicle", 7, True, False, (0, 0, 142)),
        CityscapesClass("truck", 27, 14, "vehicle", 7, True, False, (0, 0, 70)),
        CityscapesClass("bus", 28, 15, "vehicle", 7, True, False, (0, 60, 100)),
        CityscapesClass("caravan", 29, 255, "vehicle", 7, True, True, (0, 0, 90)),
        CityscapesClass("trailer", 30, 255, "vehicle", 7, True, True, (0, 0, 110)),
        CityscapesClass("train", 31, 16, "vehicle", 7, True, False, (0, 80, 100)),
        CityscapesClass("motorcycle", 32, 17, "vehicle", 7, True, False, (0, 0, 230)),
        CityscapesClass("bicycle", 33, 18, "vehicle", 7, True, False, (119, 11, 32)),
        CityscapesClass("license plate", -1, -1, "vehicle", 7, False, True, (0, 0, 142)),
    ]

    def __init__(self, root, split="train", mode="fine",
                 target_type="semantic", transform=None,
                 target_transform=None, transforms=None):
        super().__init__(root, transforms, transform, target_transform)
        verify_str_arg(mode, "mode", ("fine", "coarse"))
        if mode == "fine":
            verify_str_arg(split, "split", ("train", "test", "val"))
        else:
            verify_str_arg(split, "split", ("train", "train_extra", "val"))
        self.mode = "gtFine" if mode == "fine" else "gtCoarse"
        self.target_type = (
            [target_type] if isinstance(target_type, str) else list(target_type)
        )
        for t in self.target_type:
            verify_str_arg(
                t, "target_type", ("instance", "semantic", "polygon", "color")
            )
        self.images_dir = os.path.join(self.root, "leftImg8bit", split)
        self.targets_dir = os.path.join(self.root, self.mode, split)
        self.images: List[str] = []
        self.targets: List[List[str]] = []
        if not os.path.isdir(self.images_dir):
            raise RuntimeError(f"Cityscapes images not found at {self.images_dir}")
        for city in sorted(os.listdir(self.images_dir)):
            img_dir = os.path.join(self.images_dir, city)
            tgt_dir = os.path.join(self.targets_dir, city)
            for fname in sorted(os.listdir(img_dir)):
                base = fname.replace("_leftImg8bit.png", "")
                self.images.append(os.path.join(img_dir, fname))
                self.targets.append([
                    os.path.join(
                        tgt_dir,
                        f"{base}_{self.mode}_{self._suffix(t)}",
                    )
                    for t in self.target_type
                ])

    @staticmethod
    def _suffix(target_type):
        return {
            "instance": "instanceIds.png",
            "semantic": "labelIds.png",
            "color": "color.png",
            "polygon": "polygons.json",
        }[target_type]

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        image = _read_rgb(self.images[idx])
        targets = []
        for t, path in zip(self.target_type, self.targets[idx]):
            if t == "polygon":
                with open(path) as f:
                    targets.append(json.load(f))
            else:
                targets.append(_read_any(path))
        target = targets[0] if len(targets) == 1 else tuple(targets)
        if self.transforms is not None:
            image, target = self.transforms(image, target)
        return image, target


class CelebA(VisionDataset):
    """reference ``celeba.py``: aligned crops + attr/identity/bbox/landmark
    annotation files, list_eval_partition 0/1/2 split."""

    def __init__(self, root, split="train", target_type="attr",
                 transform=None, target_transform=None, download=False):
        super().__init__(root, transform=transform, target_transform=target_transform)
        if download:
            raise RuntimeError(
                "CelebA download requires Google Drive; place files under "
                f"{os.path.join(root, 'celeba')}"
            )
        split_map = {"train": 0, "valid": 1, "test": 2, "all": None}
        split_idx = split_map[
            verify_str_arg(split.lower(), "split", tuple(split_map))
        ]
        self.target_type = (
            [target_type] if isinstance(target_type, str) else list(target_type)
        )
        base = pathlib.Path(self.root) / "celeba"
        if not base.exists():
            raise RuntimeError(f"CelebA not found at {base}")

        partitions = self._read_table(base / "list_eval_partition.txt")
        names = sorted(partitions)
        if split_idx is not None:
            names = [n for n in names if int(partitions[n][0]) == split_idx]
        self.filename = names
        self._base = base
        self.attr_names: List[str] = []
        self._tables = {}
        if "attr" in self.target_type:
            with open(base / "list_attr_celeba.txt") as f:
                f.readline()
                self.attr_names = f.readline().split()
            table = self._read_table(base / "list_attr_celeba.txt", skip=2)
            self._tables["attr"] = {
                n: (np.asarray(v, np.int64) + 1) // 2 for n, v in table.items()
            }
        if "identity" in self.target_type:
            self._tables["identity"] = self._read_table(base / "identity_CelebA.txt")
        if "bbox" in self.target_type:
            self._tables["bbox"] = self._read_table(
                base / "list_bbox_celeba.txt", skip=2
            )
        if "landmarks" in self.target_type:
            self._tables["landmarks"] = self._read_table(
                base / "list_landmarks_align_celeba.txt", skip=2
            )

    @staticmethod
    def _read_table(path, skip=0):
        table = {}
        with open(path) as f:
            for _ in range(skip):
                f.readline()
            for line in f:
                parts = line.split()
                if parts:
                    table[parts[0]] = np.asarray(parts[1:], np.float64)
        return table

    def __len__(self):
        return len(self.filename)

    def __getitem__(self, idx):
        name = self.filename[idx]
        img = _read_rgb(self._base / "img_align_celeba" / name)
        targets = []
        for t in self.target_type:
            v = self._tables[t][name]
            if t == "identity":
                targets.append(int(v[0]))
            else:
                targets.append(np.asarray(v, np.int64))
        target = targets[0] if len(targets) == 1 else tuple(targets)
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class FER2013(VisionDataset):
    """reference ``fer2013.py``: csv with 48x48 space-separated pixels."""

    def __init__(self, root, split="train", transform=None,
                 target_transform=None):
        super().__init__(root, transform=transform, target_transform=target_transform)
        split = verify_str_arg(split, "split", ("train", "test"))
        base = pathlib.Path(self.root) / "fer2013"
        path = base / f"{split}.csv"
        if not path.exists():
            path = base / "fer2013.csv"
        if not path.exists():
            raise RuntimeError(f"FER2013 csv not found under {base}")
        self._samples = []
        with open(path) as f:
            for row in csv.DictReader(f):
                pixels = np.asarray(
                    row["pixels"].split(), np.uint8
                ).reshape(48, 48, 1)
                label = int(row["emotion"]) if "emotion" in row else None
                usage = row.get("Usage", "").lower()
                if path.name == "fer2013.csv":
                    want = "training" if split == "train" else "publictest"
                    if usage.replace(" ", "") != want:
                        continue
                self._samples.append((pixels, label))

    def __len__(self):
        return len(self._samples)

    def __getitem__(self, idx):
        img, target = self._samples[idx]
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class Places365(VisionDataset):
    """reference ``places365.py``: categories_places365.txt + per-split
    file lists."""

    def __init__(self, root, split="train-standard", small=False,
                 transform=None, target_transform=None, download=False):
        super().__init__(root, transform=transform, target_transform=target_transform)
        verify_str_arg(
            split, "split", ("train-standard", "train-challenge", "val")
        )
        base = pathlib.Path(self.root)
        with open(base / "categories_places365.txt") as f:
            rows = [line.split() for line in f if line.strip()]
        self.classes = [r[0] for r in rows]
        self.class_to_idx = {c: int(i) for c, i in rows}
        list_name = {
            "train-standard": "places365_train_standard.txt",
            "train-challenge": "places365_train_challenge.txt",
            "val": "places365_val.txt",
        }[split]
        img_dir = base / ("val_256" if split == "val" else "data_256") \
            if small else base / ("val_large" if split == "val" else "data_large")
        with open(base / list_name) as f:
            rows = [line.split() for line in f if line.strip()]
        self.imgs = [
            (str(img_dir / r[0].lstrip("/")), int(r[1])) for r in rows
        ]
        self.targets = [t for _, t in self.imgs]

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, idx):
        path, target = self.imgs[idx]
        img = _read_rgb(path)
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class SBDataset(VisionDataset):
    """reference ``sbd.py``: semantic boundaries dataset — img/*.jpg with
    cls/*.mat (GTcls.Segmentation / GTcls.Boundaries)."""

    def __init__(self, root, image_set="train", mode="boundaries",
                 download=False, transforms=None):
        super().__init__(root, transforms=transforms)
        verify_str_arg(image_set, "image_set", ("train", "val", "train_noval"))
        self.mode = verify_str_arg(mode, "mode", ("segmentation", "boundaries"))
        self.num_classes = 20
        base = pathlib.Path(self.root)
        with open(base / f"{image_set}.txt") as f:
            names = [line.strip() for line in f if line.strip()]
        self.images = [str(base / "img" / f"{n}.jpg") for n in names]
        self.masks = [str(base / "cls" / f"{n}.mat") for n in names]

    def _get_target(self, path):
        import scipy.io as sio

        mat = sio.loadmat(path, squeeze_me=True, struct_as_record=False)
        gt = mat["GTcls"]
        if self.mode == "segmentation":
            return np.asarray(gt.Segmentation, np.uint8)
        bounds = gt.Boundaries
        return np.stack([
            np.asarray(
                bounds[i].toarray() if hasattr(bounds[i], "toarray") else bounds[i]
            )
            for i in range(self.num_classes)
        ])

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        img = _read_rgb(self.images[idx])
        target = self._get_target(self.masks[idx])
        if self.transforms is not None:
            img, target = self.transforms(img, target)
        return img, target


class StanfordCars(VisionDataset):
    """reference ``stanford_cars.py``: devkit .mat annotations."""

    def __init__(self, root, split="train", transform=None,
                 target_transform=None, download=False):
        super().__init__(root, transform=transform, target_transform=target_transform)
        split = verify_str_arg(split, "split", ("train", "test"))
        base = pathlib.Path(self.root) / "stanford_cars"
        devkit = base / "devkit"
        if split == "train":
            annos = devkit / "cars_train_annos.mat"
            images = base / "cars_train"
        else:
            annos = devkit / "cars_test_annos_withlabels.mat"
            images = base / "cars_test"
        if not annos.exists():
            raise RuntimeError(f"StanfordCars not found under {base}")
        import scipy.io as sio

        raw = sio.loadmat(str(annos), squeeze_me=True)["annotations"]
        self._samples = [
            (str(images / str(a["fname"])), int(a["class"]) - 1)
            for a in np.atleast_1d(raw)
        ]
        meta = sio.loadmat(str(devkit / "cars_meta.mat"), squeeze_me=True)
        self.classes = [str(c) for c in meta["class_names"]]
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}

    def __len__(self):
        return len(self._samples)

    def __getitem__(self, idx):
        path, target = self._samples[idx]
        img = _read_rgb(path)
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class WIDERFace(VisionDataset):
    """reference ``widerface.py``: bbx_gt.txt with per-image face boxes +
    blur/expression/illumination/occlusion/pose/invalid flags."""

    def __init__(self, root, split="train", transform=None,
                 target_transform=None, download=False):
        super().__init__(root, transform=transform, target_transform=target_transform)
        split = verify_str_arg(split, "split", ("train", "val", "test"))
        self.split = split
        base = pathlib.Path(self.root) / "widerface"
        img_root = base / f"WIDER_{split}" / "images"
        self.img_info: List[dict] = []
        if split == "test":
            list_file = base / "wider_face_split" / "wider_face_test_filelist.txt"
            with open(list_file) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        self.img_info.append({"img_path": str(img_root / line)})
            return
        ann = base / "wider_face_split" / f"wider_face_{split}_bbx_gt.txt"
        with open(ann) as f:
            lines = [line.strip() for line in f]
        i = 0
        while i < len(lines):
            img_path = str(img_root / lines[i])
            n = int(lines[i + 1])
            rows = [
                [int(v) for v in lines[i + 2 + k].split()]
                for k in range(max(n, 1) if n == 0 else n)
            ]
            if n == 0:
                rows = []  # the format still carries one all-zero row
                skip = 1
            else:
                skip = n
            labels = np.asarray(rows, np.int64).reshape(-1, 10)
            self.img_info.append({
                "img_path": img_path,
                "annotations": {
                    "bbox": labels[:, :4],
                    "blur": labels[:, 4],
                    "expression": labels[:, 5],
                    "illumination": labels[:, 6],
                    "invalid": labels[:, 7],
                    "occlusion": labels[:, 8],
                    "pose": labels[:, 9],
                },
            })
            i += 2 + skip

    def __len__(self):
        return len(self.img_info)

    def __getitem__(self, idx):
        info = self.img_info[idx]
        img = _read_rgb(info["img_path"])
        target = info.get("annotations")
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class INaturalist(VisionDataset):
    """reference ``inaturalist.py`` (2021 layout): category dirs named
    ``<idx>_<kingdom>_..._<species>``; target_type full or a taxonomy
    level."""

    _levels = ("kingdom", "phylum", "class", "order", "family", "genus")

    def __init__(self, root, version="2021_train", target_type="full",
                 transform=None, target_transform=None, download=False):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = pathlib.Path(self.root) / version
        if not base.is_dir():
            raise RuntimeError(f"INaturalist not found at {base}")
        self.target_type = (
            [target_type] if isinstance(target_type, str) else list(target_type)
        )
        self.all_categories = sorted(
            d.name for d in base.iterdir() if d.is_dir()
        )
        self.categories_map: List[dict] = []
        self.categories_index = {lvl: {} for lvl in self._levels}
        for name in self.all_categories:
            pieces = name.split("_")
            cmap = {}
            if len(pieces) >= 7:
                for lvl, val in zip(self._levels, pieces[1:7]):
                    idx_map = self.categories_index[lvl]
                    if val not in idx_map:
                        idx_map[val] = len(idx_map)
                    cmap[lvl] = idx_map[val]
            self.categories_map.append(cmap)
        self.index: List[Tuple[int, str]] = []
        for cat_idx, name in enumerate(self.all_categories):
            for fname in sorted(os.listdir(base / name)):
                self.index.append((cat_idx, str(base / name / fname)))

    def category_name(self, category_type: str, category_id: int) -> str:
        if category_type == "full":
            return self.all_categories[category_id]
        for name, idx in self.categories_index[category_type].items():
            if idx == category_id:
                return name
        raise ValueError(f"invalid category id {category_id}")

    def __len__(self):
        return len(self.index)

    def __getitem__(self, idx):
        cat_idx, path = self.index[idx]
        img = _read_rgb(path)
        targets = []
        for t in self.target_type:
            if t == "full":
                targets.append(cat_idx)
            else:
                targets.append(self.categories_map[cat_idx][t])
        target = targets[0] if len(targets) == 1 else tuple(targets)
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class Omniglot(VisionDataset):
    """reference ``omniglot.py``: images_{background,evaluation}/
    <alphabet>/<character>/*.png; target is flat character index."""

    def __init__(self, root, background=True, transform=None,
                 target_transform=None, download=False):
        super().__init__(root, transform=transform, target_transform=target_transform)
        name = "images_background" if background else "images_evaluation"
        base = pathlib.Path(self.root) / "omniglot-py" / name
        if not base.is_dir():
            raise RuntimeError(f"Omniglot not found at {base}")
        self._alphabets = sorted(d.name for d in base.iterdir() if d.is_dir())
        self._characters = [
            f"{a}/{c.name}"
            for a in self._alphabets
            for c in sorted((base / a).iterdir())
            if c.is_dir()
        ]
        self._flat: List[Tuple[str, int]] = []
        for idx, char in enumerate(self._characters):
            for p in sorted((base / char).glob("*.png")):
                self._flat.append((str(p), idx))

    def __len__(self):
        return len(self._flat)

    def __getitem__(self, idx):
        path, target = self._flat[idx]
        img = _read_any(path)
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class _LFW(VisionDataset):
    base_folder = "lfw-py"

    def __init__(self, root, split, image_set, transform, target_transform):
        super().__init__(root, transform=transform, target_transform=target_transform)
        self.split = verify_str_arg(
            split.lower(), "split", ("10fold", "train", "test")
        )
        image_set = verify_str_arg(
            image_set.lower(), "image_set", ("original", "funneled", "deepfunneled")
        )
        images_dir = {
            "original": "lfw",
            "funneled": "lfw_funneled",
            "deepfunneled": "lfw-deepfunneled",
        }[image_set]
        self.images_dir = os.path.join(self.root, self.base_folder, images_dir)
        self.ann_dir = os.path.join(self.root, self.base_folder)
        self._split_name = {"train": "DevTrain", "test": "DevTest", "10fold": ""}[
            self.split
        ]

    def _img_path(self, identity, no):
        return os.path.join(
            self.images_dir, identity, f"{identity}_{int(no):04d}.jpg"
        )


class LFWPeople(_LFW):
    """reference ``lfw.py`` LFWPeople: people{DevTrain,DevTest}.txt."""

    def __init__(self, root, split="10fold", image_set="funneled",
                 transform=None, target_transform=None, download=False):
        super().__init__(root, split, image_set, transform, target_transform)
        path = os.path.join(self.ann_dir, f"people{self._split_name}.txt")
        self.class_to_idx = {}
        self.data: List[Tuple[str, int]] = []
        with open(path) as f:
            lines = [line.strip() for line in f if line.strip()]
        entries = [l.split("\t") for l in lines if "\t" in l]
        for row in entries:
            if len(row) != 2:
                continue
            identity, count = row[0], int(row[1])
            if identity not in self.class_to_idx:
                self.class_to_idx[identity] = len(self.class_to_idx)
            for no in range(1, count + 1):
                self.data.append(
                    (self._img_path(identity, no), self.class_to_idx[identity])
                )
        self.classes = sorted(self.class_to_idx, key=self.class_to_idx.get)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        path, target = self.data[idx]
        img = _read_rgb(path)
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class LFWPairs(_LFW):
    """reference ``lfw.py`` LFWPairs: pairs{DevTrain,DevTest}.txt —
    (img1, img2, same: 1/0)."""

    def __init__(self, root, split="10fold", image_set="funneled",
                 transform=None, target_transform=None, download=False):
        super().__init__(root, split, image_set, transform, target_transform)
        path = os.path.join(self.ann_dir, f"pairs{self._split_name}.txt")
        self.pairs: List[Tuple[str, str, int]] = []
        with open(path) as f:
            lines = [line.strip().split("\t") for line in f if line.strip()]
        for row in lines[1:]:  # first line is a count header
            if len(row) == 3:  # same identity
                self.pairs.append(
                    (self._img_path(row[0], row[1]),
                     self._img_path(row[0], row[2]), 1)
                )
            elif len(row) == 4:  # different identities
                self.pairs.append(
                    (self._img_path(row[0], row[1]),
                     self._img_path(row[2], row[3]), 0)
                )

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx):
        p1, p2, same = self.pairs[idx]
        img1, img2 = _read_rgb(p1), _read_rgb(p2)
        if self.transform is not None:
            img1, img2 = self.transform(img1), self.transform(img2)
        if self.target_transform is not None:
            same = self.target_transform(same)
        return img1, img2, same


class Kitti(VisionDataset):
    """reference ``kitti.py``: object detection — training/image_2/*.png +
    training/label_2/*.txt (type, truncated, occluded, alpha, bbox,
    dimensions, location, rotation_y)."""

    def __init__(self, root, train=True, transform=None,
                 target_transform=None, transforms=None, download=False):
        super().__init__(root, transforms, transform, target_transform)
        self.train = train
        sub = "training" if train else "testing"
        base = pathlib.Path(self.root) / "Kitti" / "raw" / sub
        img_dir = base / "image_2"
        if not img_dir.is_dir():
            raise RuntimeError(f"Kitti not found at {img_dir}")
        self.images = sorted(str(p) for p in img_dir.glob("*.png"))
        self.targets = (
            [
                str(base / "label_2" / (pathlib.Path(p).stem + ".txt"))
                for p in self.images
            ]
            if train
            else [None] * len(self.images)
        )

    @staticmethod
    def _parse_label(path):
        target = []
        with open(path) as f:
            for line in f:
                v = line.split()
                if not v:
                    continue
                target.append({
                    "type": v[0],
                    "truncated": float(v[1]),
                    "occluded": int(v[2]),
                    "alpha": float(v[3]),
                    "bbox": [float(x) for x in v[4:8]],
                    "dimensions": [float(x) for x in v[8:11]],
                    "location": [float(x) for x in v[11:14]],
                    "rotation_y": float(v[14]),
                })
        return target

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        img = _read_rgb(self.images[idx])
        target = (
            self._parse_label(self.targets[idx]) if self.train else None
        )
        if self.transforms is not None:
            img, target = self.transforms(img, target)
        return img, target


class PCAM(VisionDataset):
    """reference ``pcam.py``: HDF5 patches (requires h5py)."""

    _files = {
        "train": ("camelyonpatch_level_2_split_train_x.h5",
                  "camelyonpatch_level_2_split_train_y.h5"),
        "val": ("camelyonpatch_level_2_split_valid_x.h5",
                "camelyonpatch_level_2_split_valid_y.h5"),
        "test": ("camelyonpatch_level_2_split_test_x.h5",
                 "camelyonpatch_level_2_split_test_y.h5"),
    }

    def __init__(self, root, split="train", transform=None,
                 target_transform=None, download=False):
        super().__init__(root, transform=transform, target_transform=target_transform)
        split = verify_str_arg(split, "split", ("train", "val", "test"))
        try:
            import h5py
        except ImportError as e:
            raise RuntimeError("PCAM requires h5py") from e
        base = pathlib.Path(self.root) / "pcam"
        xf, yf = self._files[split]
        self._x = h5py.File(base / xf, "r")["x"]
        self._y = h5py.File(base / yf, "r")["y"]

    def __len__(self):
        return len(self._x)

    def __getitem__(self, idx):
        img = np.asarray(self._x[idx])
        target = int(np.asarray(self._y[idx]).reshape(-1)[0])
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class MovingMNIST(VisionDataset):
    """reference ``moving_mnist.py``: mnist_test_seq.npy (20, N, 64, 64);
    returns (T, H, W, 1) uint8 clips (reference returns (T, 1, H, W))."""

    _URL = "http://www.cs.toronto.edu/~nitish/unsupervised_video/mnist_test_seq.npy"

    def __init__(self, root, split=None, split_ratio=10, transform=None,
                 download=False):
        super().__init__(root, transform=transform)
        path = os.path.join(self.root, "MovingMNIST", "mnist_test_seq.npy")
        if download and not os.path.exists(path):
            from vision_tpu.datasets.utils import download_url

            download_url(self._URL, os.path.dirname(path))
        if not os.path.exists(path):
            raise RuntimeError("MovingMNIST not found; use download=True")
        raw = np.load(path)  # (T, N, H, W)
        data = raw.transpose(1, 0, 2, 3)[..., None]  # (N, T, H, W, 1)
        if split is not None:
            verify_str_arg(split, "split", ("train", "test"))
            if not 1 <= split_ratio <= data.shape[1]:
                raise ValueError("split_ratio out of range")
            data = (
                data[:, :split_ratio]
                if split == "train"
                else data[:, split_ratio:]
            )
        self.data = data

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        clip = self.data[idx]
        if self.transform is not None:
            clip = self.transform(clip)
        return clip


class CLEVRClassification(VisionDataset):
    """reference ``clevr.py``: target = number of objects in the scene."""

    def __init__(self, root, split="train", transform=None,
                 target_transform=None, download=False):
        super().__init__(root, transform=transform, target_transform=target_transform)
        split = verify_str_arg(split, "split", ("train", "val", "test"))
        base = pathlib.Path(self.root) / "clevr" / "CLEVR_v1.0"
        img_dir = base / "images" / split
        self._image_files = sorted(str(p) for p in img_dir.glob("*.png"))
        self._labels: List[Optional[int]]
        if split != "test":
            with open(base / "scenes" / f"CLEVR_{split}_scenes.json") as f:
                content = json.load(f)
            counts = {
                s["image_filename"]: len(s["objects"])
                for s in content["scenes"]
            }
            self._labels = [
                counts[os.path.basename(p)] for p in self._image_files
            ]
        else:
            self._labels = [None] * len(self._image_files)

    def __len__(self):
        return len(self._image_files)

    def __getitem__(self, idx):
        img = _read_rgb(self._image_files[idx])
        target = self._labels[idx]
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class LSUNClass(VisionDataset):
    """reference ``lsun.py:17``: one LMDB database of encoded images
    (requires the ``lmdb`` package). Keys are enumerated once at open;
    values are compressed image bytes decoded on access."""

    def __init__(self, root, transform=None, target_transform=None):
        try:
            import lmdb
        except ImportError as e:
            raise RuntimeError("LSUNClass requires the lmdb package") from e
        super().__init__(
            root, transform=transform, target_transform=target_transform
        )
        self.env = lmdb.open(
            str(root), max_readers=1, readonly=True, lock=False,
            readahead=False, meminit=False,
        )
        with self.env.begin(write=False) as txn:
            self.length = txn.stat()["entries"]
            self.keys = list(txn.cursor().iternext(keys=True, values=False))

    def __len__(self):
        return self.length

    def __getitem__(self, index):
        from vision_tpu.io.image import ImageReadMode, decode_image

        with self.env.begin(write=False) as txn:
            buf = txn.get(self.keys[index])
        img = np.asarray(decode_image(bytes(buf), ImageReadMode.RGB))
        target = None
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class LSUN(VisionDataset):
    """reference ``lsun.py:57``: scene classification over per-class LMDB
    dirs ``{category}_{split}_lmdb`` (requires the ``lmdb`` package)."""

    _CATEGORIES = (
        "bedroom", "bridge", "church_outdoor", "classroom",
        "conference_room", "dining_room", "kitchen", "living_room",
        "restaurant", "tower",
    )

    def __init__(self, root, classes="train", transform=None,
                 target_transform=None):
        super().__init__(
            root, transform=transform, target_transform=target_transform
        )
        self.classes = self._verify_classes(classes)
        self.dbs = [
            LSUNClass(os.path.join(str(root), f"{c}_lmdb"), transform=transform)
            for c in self.classes
        ]
        self.indices = []
        count = 0
        for db in self.dbs:
            count += len(db)
            self.indices.append(count)
        self.length = count

    def _verify_classes(self, classes):
        if isinstance(classes, str):
            verify_str_arg(classes, "classes", ("train", "val", "test"))
            if classes == "test":
                return [classes]
            return [f"{c}_{classes}" for c in self._CATEGORIES]
        out = []
        for c in classes:
            category, _, split = c.rpartition("_")
            if split == "test":
                out.append(c)
                continue
            verify_str_arg(split, "classes", ("train", "val"))
            verify_str_arg(category, "classes", self._CATEGORIES)
            out.append(c)
        return out

    def __len__(self):
        return self.length

    def __getitem__(self, index):
        target = 0
        sub = index
        for db in self.dbs:
            if sub < len(db):
                img, _ = db[sub]
                break
            sub -= len(db)
            target += 1
        else:
            raise IndexError(index)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class SBU(VisionDataset):
    """reference ``sbu.py``: SBU captioned photos — dataset/
    SBU_captioned_photo_dataset_{urls,captions}.txt, images downloaded to
    dataset/."""

    def __init__(self, root, transform=None, target_transform=None,
                 download=False):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = pathlib.Path(self.root) / "dataset"
        urls_file = base / "SBU_captioned_photo_dataset_urls.txt"
        caps_file = base / "SBU_captioned_photo_dataset_captions.txt"
        if not urls_file.exists():
            raise RuntimeError(f"SBU not found at {base}")
        with open(urls_file) as fu, open(caps_file) as fc:
            self.photos, self.captions = [], []
            for url, cap in zip(fu, fc):
                fname = url.strip().rsplit("/", 1)[-1]
                if (base / fname).exists():
                    self.photos.append(fname)
                    self.captions.append(cap.strip())
        self._base = base

    def __len__(self):
        return len(self.photos)

    def __getitem__(self, idx):
        img = _read_rgb(self._base / self.photos[idx])
        target = self.captions[idx]
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class Flickr8k(VisionDataset):
    """reference ``flickr.py`` Flickr8k: ann file lines
    ``<img>#<i>\\t<caption>``."""

    def __init__(self, root, ann_file, transform=None, target_transform=None):
        super().__init__(root, transform=transform, target_transform=target_transform)
        self.ann_file = os.path.expanduser(ann_file)
        annotations = {}
        with open(self.ann_file) as f:
            for line in f:
                if not line.strip():
                    continue
                img_id, caption = line.strip().split("\t", 1)
                img_id = img_id.split("#")[0]
                annotations.setdefault(img_id, []).append(caption)
        self.annotations = annotations
        self.ids = sorted(annotations)

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, idx):
        img_id = self.ids[idx]
        img = _read_rgb(os.path.join(self.root, img_id))
        target = self.annotations[img_id]
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class Flickr30k(Flickr8k):
    """reference ``flickr.py`` Flickr30k: same layout, .token ann file."""
