"""PhotoTour patches (reference ``torchvision/datasets/phototour.py``):
64x64 grayscale patches tiled into .bmp grids; ``info.txt`` carries the
3D-point id per patch; ``m50_*.txt`` carries match/non-match pairs for
the test mode."""

from __future__ import annotations

import os
from typing import List

import numpy as np

from vision_tpu.datasets.vision import VisionDataset

__all__ = ["PhotoTour"]


def read_image_file(data_dir: str, image_ext: str, n: int) -> np.ndarray:
    """Tiled bmp grids -> (n, 64, 64) uint8 (reference ``phototour.py:183``)."""
    from PIL import Image

    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(image_ext)
    )
    patches: List[np.ndarray] = []
    for fpath in files:
        img = np.asarray(Image.open(fpath).convert("L"))
        h, w = img.shape
        for y in range(0, h, 64):
            for x in range(0, w, 64):
                patches.append(img[y : y + 64, x : x + 64])
                if len(patches) >= n:
                    return np.stack(patches)
    return np.stack(patches[:n])


def read_info_file(data_dir: str, info_file: str) -> np.ndarray:
    """info.txt: first column is the 3D-point id (reference :211)."""
    with open(os.path.join(data_dir, info_file)) as f:
        return np.asarray([int(line.split()[0]) for line in f if line.strip()])


def read_matches_files(data_dir: str, matches_file: str) -> np.ndarray:
    """m50 file rows: (patch1, 3dpoint1, unused, patch2, 3dpoint2, unused...)
    -> (idx1, idx2, is_match) (reference :220)."""
    rows = []
    with open(os.path.join(data_dir, matches_file)) as f:
        for line in f:
            v = line.split()
            if len(v) >= 5:
                rows.append(
                    [int(v[0]), int(v[3]), int(int(v[1]) == int(v[4]))]
                )
    return np.asarray(rows, np.int64)


class PhotoTour(VisionDataset):
    """reference ``phototour.py:13``; train mode yields single patches,
    test mode yields (patch1, patch2, is_match)."""

    lens = {
        "notredame": 468159,
        "yosemite": 633587,
        "liberty": 450092,
        "liberty_harris": 379587,
        "yosemite_harris": 450912,
        "notredame_harris": 325295,
    }
    image_ext = "bmp"
    info_file = "info.txt"
    matches_files = "m50_100000_100000_0.txt"

    means = {
        "notredame": 0.4854, "yosemite": 0.4844, "liberty": 0.4437,
        "notredame_harris": 0.4854, "yosemite_harris": 0.4844,
        "liberty_harris": 0.4437,
    }
    stds = {
        "notredame": 0.1864, "yosemite": 0.1818, "liberty": 0.2019,
        "notredame_harris": 0.1864, "yosemite_harris": 0.1818,
        "liberty_harris": 0.2019,
    }

    def __init__(self, root, name, train=True, transform=None,
                 download=False):
        super().__init__(root, transform=transform)
        self.name = name
        self.train = train
        self.mean = self.means.get(name)
        self.std = self.stds.get(name)
        self.data_dir = os.path.join(self.root, name)
        if not os.path.isdir(self.data_dir):
            raise RuntimeError(
                f"PhotoTour '{name}' not found at {self.data_dir}"
            )
        n = self.lens.get(name)
        if n is None:  # unknown subset: take everything present
            n = 10**9
        self.data = read_image_file(self.data_dir, self.image_ext, n)
        self.labels = read_info_file(self.data_dir, self.info_file)
        self.matches = (
            read_matches_files(self.data_dir, self.matches_files)
            if not train
            and os.path.exists(os.path.join(self.data_dir, self.matches_files))
            else np.zeros((0, 3), np.int64)
        )

    def __len__(self):
        return len(self.data) if self.train else len(self.matches)

    def __getitem__(self, index):
        if self.train:
            patch = self.data[index][..., None]  # HWC
            if self.transform is not None:
                patch = self.transform(patch)
            return patch
        m = self.matches[index]
        p1, p2 = self.data[m[0]][..., None], self.data[m[1]][..., None]
        if self.transform is not None:
            p1, p2 = self.transform(p1), self.transform(p2)
        return p1, p2, int(m[2])
