"""Optical-flow datasets (reference ``torchvision/datasets/_optical_flow.py``):
Sintel, KittiFlow, FlyingChairs, FlyingThings3D, HD1K.

Samples are ``(img1, img2, flow, valid_flow_mask)`` — img HWC uint8, flow
(H, W, 2) float32 (channels-LAST here, matching the framework's NHWC
convention; the reference returns (2, H, W)), valid a (H, W) bool or None
(None means all-valid, e.g. synthetic datasets).

Flow file formats:
* ``.flo`` — Middlebury: float32 little-endian, magic 202021.25,
  then (w, h) int32, then h*w*2 interleaved (u, v).
* ``.pfm`` — FlyingThings3D: Portable FloatMap, 3-channel, rows
  bottom-to-top; flow = first two channels, v negated.
* 16-bit PNG — KITTI/HD1K: ``(png - 2**15) / 64``, third channel = valid.
"""

from __future__ import annotations

import itertools
import os
import pathlib
import re
from abc import abstractmethod
from glob import glob
from typing import List, Optional, Tuple

import numpy as np

from vision_tpu.datasets.utils import verify_str_arg
from vision_tpu.datasets.vision import VisionDataset

__all__ = [
    "Sintel",
    "KittiFlow",
    "FlyingChairs",
    "FlyingThings3D",
    "HD1K",
    "read_flo",
    "read_pfm",
    "read_16bit_png_flow",
]

_FLO_MAGIC = 202021.25


def read_flo(path) -> np.ndarray:
    """Middlebury .flo reader (reference ``_read_flo``): (H, W, 2) f32."""
    with open(path, "rb") as f:
        magic = np.frombuffer(f.read(4), np.float32)[0]
        if abs(magic - _FLO_MAGIC) > 1e-3:
            raise ValueError(f"bad .flo magic in {path}: {magic}")
        w, h = np.frombuffer(f.read(8), np.int32)
        data = np.frombuffer(f.read(int(h) * int(w) * 8), np.float32)
    return data.reshape(int(h), int(w), 2).copy()


def write_flo(flow: np.ndarray, path) -> None:
    """Inverse of :func:`read_flo` (for tests / dataset generation)."""
    h, w, c = flow.shape
    assert c == 2
    with open(path, "wb") as f:
        f.write(np.float32(_FLO_MAGIC).tobytes())
        f.write(np.asarray([w, h], np.int32).tobytes())
        f.write(np.ascontiguousarray(flow, np.float32).tobytes())


def read_pfm(path) -> np.ndarray:
    """PFM reader (reference ``_read_pfm``): returns (H, W, C) float32,
    rows flipped to top-to-bottom."""
    with open(path, "rb") as f:
        header = f.readline().strip()
        if header == b"PF":
            channels = 3
        elif header == b"Pf":
            channels = 1
        else:
            raise ValueError(f"not a PFM file: {path}")
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        dtype = "<f4" if scale < 0 else ">f4"
        data = np.frombuffer(f.read(), dtype=dtype, count=h * w * channels)
    img = data.reshape(h, w, channels).astype(np.float32)
    return img[::-1].copy()  # PFM stores bottom-to-top


def read_16bit_png_flow(path) -> Tuple[np.ndarray, np.ndarray]:
    """KITTI/HD1K sparse flow: 16-bit PNG -> (flow (H,W,2) f32, valid (H,W)
    bool) via the native codec's uint16 path (PIL silently downconverts
    16-bit RGB PNGs to 8-bit, which destroys the encoding)."""
    from vision_tpu.io.image import decode_png16, read_file

    raw = decode_png16(read_file(path)).astype(np.float32)
    flow = (raw[..., :2] - 2**15) / 64.0
    valid = raw[..., 2] > 0
    return flow, valid


class FlowDataset(VisionDataset):
    """Base (reference ``FlowDataset``): subclasses fill ``_image_list``
    (pairs of paths) and ``_flow_list`` (path or None per pair)."""

    _has_builtin_flow_mask = False

    def __init__(self, root, transforms=None):
        super().__init__(root)
        # flow transforms take (img1, img2, flow, valid); bypass the
        # (input, target) StandardTransform wrapper from VisionDataset
        self.transforms = transforms
        self._image_list: List[List[str]] = []
        self._flow_list: List[Optional[str]] = []

    def _read_img(self, path) -> np.ndarray:
        from vision_tpu.io.image import ImageReadMode, read_image

        return read_image(str(path), ImageReadMode.RGB)

    @abstractmethod
    def _read_flow(self, path):
        ...

    def __len__(self):
        return len(self._image_list)

    def __getitem__(self, idx):
        img1 = self._read_img(self._image_list[idx][0])
        img2 = self._read_img(self._image_list[idx][1])
        flow_path = self._flow_list[idx] if self._flow_list else None
        if flow_path is not None:
            out = self._read_flow(flow_path)
            flow, valid = out if self._has_builtin_flow_mask else (out, None)
        else:
            flow, valid = None, None
        if self.transforms is not None:
            img1, img2, flow, valid = self.transforms(img1, img2, flow, valid)
        if self._has_builtin_flow_mask or valid is not None:
            return img1, img2, flow, valid
        return img1, img2, flow


class Sintel(FlowDataset):
    """MPI Sintel (reference ``Sintel``): training/{clean,final}/<scene>/
    frame_XXXX.png with flow/<scene>/frame_XXXX.flo."""

    def __init__(self, root, split="train", pass_name="clean", transforms=None):
        super().__init__(root, transforms)
        verify_str_arg(split, "split", ("train", "test"))
        verify_str_arg(pass_name, "pass_name", ("clean", "final", "both"))
        passes = ["clean", "final"] if pass_name == "both" else [pass_name]
        base = pathlib.Path(self.root) / "Sintel"
        split_dir = "training" if split == "train" else "test"
        flow_root = base / split_dir / "flow"
        for p in passes:
            image_root = base / split_dir / p
            for scene in sorted(os.listdir(image_root)):
                imgs = sorted(glob(str(image_root / scene / "*.png")))
                for a, b in zip(imgs[:-1], imgs[1:]):
                    self._image_list.append([a, b])
                if split == "train":
                    self._flow_list.extend(
                        sorted(glob(str(flow_root / scene / "*.flo")))
                    )
                else:
                    self._flow_list.extend([None] * (len(imgs) - 1))

    def _read_flow(self, path):
        return read_flo(path)


class KittiFlow(FlowDataset):
    """KITTI 2015 flow (reference ``KittiFlow``): image_2/*_10.png paired
    with *_11.png; sparse GT in flow_occ as 16-bit PNG."""

    _has_builtin_flow_mask = True

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root, transforms)
        verify_str_arg(split, "split", ("train", "test"))
        base = pathlib.Path(self.root) / "KittiFlow" / f"{split}ing"
        imgs1 = sorted(glob(str(base / "image_2" / "*_10.png")))
        imgs2 = sorted(glob(str(base / "image_2" / "*_11.png")))
        if not imgs1 or len(imgs1) != len(imgs2):
            raise FileNotFoundError(
                f"KittiFlow images not found under {base}"
            )
        self._image_list = [[a, b] for a, b in zip(imgs1, imgs2)]
        if split == "train":
            self._flow_list = sorted(glob(str(base / "flow_occ" / "*_10.png")))
        else:
            self._flow_list = [None] * len(self._image_list)

    def _read_flow(self, path):
        return read_16bit_png_flow(path)


class FlyingChairs(FlowDataset):
    """FlyingChairs (reference ``FlyingChairs``): data/XXXXX_img{1,2}.ppm +
    XXXXX_flow.flo; split via FlyingChairs_train_val.txt (1=train, 2=val)."""

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root, transforms)
        verify_str_arg(split, "split", ("train", "val"))
        base = pathlib.Path(self.root) / "FlyingChairs"
        imgs = sorted(glob(str(base / "data" / "*.ppm")))
        flows = sorted(glob(str(base / "data" / "*.flo")))
        split_path = base / "FlyingChairs_train_val.txt"
        if split_path.exists():
            split_ids = np.loadtxt(split_path, dtype=np.int64)
        else:
            split_ids = np.ones(len(flows), np.int64)
        want = 1 if split == "train" else 2
        for i, flow in enumerate(flows):
            if i < len(split_ids) and split_ids[i] == want:
                self._image_list.append([imgs[2 * i], imgs[2 * i + 1]])
                self._flow_list.append(flow)

    def _read_img(self, path):
        from PIL import Image  # .ppm

        return np.asarray(Image.open(path).convert("RGB"))

    def _read_flow(self, path):
        return read_flo(path)


class FlyingThings3D(FlowDataset):
    """FlyingThings3D (reference ``FlyingThings3D``): frames_<pass>/
    <split>/<seq>/<scene>/<cam>/*.png with optical_flow/.../{into_future,
    into_past}/OpticalFlowInto*_*.pfm; both directions, both cameras."""

    def __init__(self, root, split="train", pass_name="clean",
                 camera="left", transforms=None):
        super().__init__(root, transforms)
        verify_str_arg(split, "split", ("train", "test"))
        split_dir = {"train": "TRAIN", "test": "TEST"}[split]
        verify_str_arg(pass_name, "pass_name", ("clean", "final", "both"))
        passes = {
            "clean": ["frames_cleanpass"],
            "final": ["frames_finalpass"],
            "both": ["frames_cleanpass", "frames_finalpass"],
        }[pass_name]
        verify_str_arg(camera, "camera", ("left", "right", "both"))
        cameras = ["left", "right"] if camera == "both" else [camera]
        base = pathlib.Path(self.root) / "FlyingThings3D"

        directions = (("into_future", False), ("into_past", True))
        for pass_dir, cam in itertools.product(passes, cameras):
            image_dirs = sorted(
                glob(str(base / pass_dir / split_dir / "*" / "*"))
            )
            for idir in image_dirs:
                scene_rel = pathlib.Path(idir).relative_to(base / pass_dir)
                fdir = base / "optical_flow" / scene_rel
                imgs = sorted(glob(os.path.join(idir, cam, "*.png")))
                for direction, reverse in directions:
                    flows = sorted(
                        glob(str(fdir / direction / cam / "*.pfm"))
                    )
                    pairs = (
                        zip(imgs[:-1], imgs[1:])
                        if not reverse
                        else zip(imgs[1:], imgs[:-1])
                    )
                    use_flows = flows[:-1] if not reverse else flows[1:]
                    for (a, b), fl in zip(pairs, use_flows):
                        self._image_list.append([a, b])
                        self._flow_list.append(fl)

    def _read_flow(self, path):
        pfm = read_pfm(path)
        flow = pfm[..., :2].copy()
        flow[..., 1] = -flow[..., 1]  # PFM v-axis points up
        return flow


class HD1K(FlowDataset):
    """HD1K (reference ``HD1K``): hd1k_input/image_2/XXXXXX_YYYY.png,
    sparse GT hd1k_flow_gt/flow_occ 16-bit PNG."""

    _has_builtin_flow_mask = True

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root, transforms)
        verify_str_arg(split, "split", ("train", "test"))
        base = pathlib.Path(self.root) / "hd1k"
        if split == "train":
            flows = sorted(glob(str(base / "hd1k_flow_gt" / "flow_occ" / "*.png")))
            imgs = sorted(glob(str(base / "hd1k_input" / "image_2" / "*.png")))
            # group frames by sequence prefix; consecutive frames pair up
            by_seq = {}
            for p in imgs:
                seq = os.path.basename(p).split("_")[0]
                by_seq.setdefault(seq, []).append(p)
            flow_lookup = {
                os.path.basename(f): f for f in flows
            }
            for seq_imgs in by_seq.values():
                for a, b in zip(seq_imgs[:-1], seq_imgs[1:]):
                    fl = flow_lookup.get(os.path.basename(a))
                    if fl is not None:
                        self._image_list.append([a, b])
                        self._flow_list.append(fl)
        else:
            imgs = sorted(
                glob(str(base / "hd1k_challenge" / "image_2" / "*.png"))
            )
            by_seq = {}
            for p in imgs:
                seq = os.path.basename(p).split("_")[0]
                by_seq.setdefault(seq, []).append(p)
            for seq_imgs in by_seq.values():
                for a, b in zip(seq_imgs[:-1], seq_imgs[1:]):
                    self._image_list.append([a, b])
                    self._flow_list.append(None)

    def _read_flow(self, path):
        return read_16bit_png_flow(path)
