"""Stereo-matching datasets (reference
``torchvision/datasets/_stereo_matching.py``, 1223 LoC): CarlaStereo,
Kitti2012Stereo, Kitti2015Stereo, Middlebury2014Stereo, ETH3DStereo,
SceneFlowStereo, CREStereo, InStereo2k, FallingThingsStereo,
SintelStereo.

Samples are ``(img_left, img_right, disparity, valid_mask)`` — images
HWC uint8, disparity ``(H, W, 1)`` float32 (reference returns (1, H, W);
we keep channels-last), valid ``(H, W)`` bool or None.

Disparity encodings (per the reference's readers):
* .pfm — Middlebury/ETH3D/Carla/SceneFlow (sign-flipped to positive)
* 16-bit PNG / 256 — KITTI 2012/2015
* 16-bit PNG / 32 — CREStereo
* PNG / 100 — InStereo2k
* RGB PNG ``r*4 + g/2^6 + b/2^14`` — Sintel
"""

from __future__ import annotations

import functools
import json
import os
import pathlib
from abc import abstractmethod
from glob import glob
from typing import List, Optional, Tuple

import numpy as np

from vision_tpu.datasets._optical_flow import read_pfm
from vision_tpu.datasets.utils import verify_str_arg
from vision_tpu.datasets.vision import VisionDataset

__all__ = [
    "CarlaStereo",
    "Kitti2012Stereo",
    "Kitti2015Stereo",
    "Middlebury2014Stereo",
    "ETH3DStereo",
    "SceneFlowStereo",
    "CREStereo",
    "InStereo2k",
    "FallingThingsStereo",
    "SintelStereo",
]


def _read_png16(path) -> np.ndarray:
    from vision_tpu.io.image import decode_png16, read_file

    return decode_png16(read_file(path))


class StereoMatchingDataset(VisionDataset):
    """Base (reference ``StereoMatchingDataset``): subclasses fill
    ``_images`` (left/right pairs) and ``_disparities``."""

    _has_built_in_disparity_mask = False

    def __init__(self, root, transforms=None):
        super().__init__(root)
        self.transforms = transforms
        self._images: List[Tuple[str, str]] = []
        self._disparities: List[Tuple[Optional[str], Optional[str]]] = []

    def _read_img(self, path) -> np.ndarray:
        from vision_tpu.io.image import ImageReadMode, read_image

        return read_image(str(path), ImageReadMode.RGB)

    @abstractmethod
    def _read_disparity(self, path):
        """-> (disparity (H, W, 1) f32 or None, valid (H, W) bool or None)"""

    def __len__(self):
        return len(self._images)

    def __getitem__(self, idx):
        imgs = tuple(self._read_img(p) for p in self._images[idx])
        dsp_paths = self._disparities[idx]
        disparity, valid = (
            self._read_disparity(dsp_paths[0])
            if dsp_paths[0] is not None
            else (None, None)
        )
        sample = (imgs[0], imgs[1], disparity, valid)
        if self.transforms is not None:
            sample = self.transforms(*sample)
        return sample


class CarlaStereo(StereoMatchingDataset):
    """reference ``CarlaStereo``: carla-highres/trainingF/<scene>/
    im{0,1}.png + disp0GT.pfm."""

    def __init__(self, root, transforms=None):
        super().__init__(root, transforms)
        base = pathlib.Path(self.root) / "carla-highres" / "trainingF"
        for scene in sorted(glob(str(base / "*"))):
            self._images.append(
                (os.path.join(scene, "im0.png"), os.path.join(scene, "im1.png"))
            )
            self._disparities.append(
                (os.path.join(scene, "disp0GT.pfm"), None)
            )

    def _read_disparity(self, path):
        disp = np.abs(read_pfm(path)[..., :1])
        return disp.astype(np.float32), None


class Kitti2012Stereo(StereoMatchingDataset):
    """reference ``Kitti2012Stereo``: colored_0/colored_1 pairs, disp_noc
    16-bit PNG / 256."""

    _has_built_in_disparity_mask = True

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root, transforms)
        verify_str_arg(split, "split", ("train", "test"))
        base = pathlib.Path(self.root) / "Kitti2012" / f"{split}ing"
        left = sorted(glob(str(base / "colored_0" / "*_10.png")))
        right = sorted(glob(str(base / "colored_1" / "*_10.png")))
        self._images = list(zip(left, right))
        if split == "train":
            disp = sorted(glob(str(base / "disp_noc" / "*.png")))
            self._disparities = [(d, None) for d in disp]
        else:
            self._disparities = [(None, None)] * len(self._images)

    def _read_disparity(self, path):
        raw = _read_png16(path)[..., :1].astype(np.float32) / 256.0
        valid = raw[..., 0] > 0
        return raw, valid


class Kitti2015Stereo(StereoMatchingDataset):
    """reference ``Kitti2015Stereo``: image_2/image_3, disp_occ_0
    16-bit PNG / 256."""

    _has_built_in_disparity_mask = True

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root, transforms)
        verify_str_arg(split, "split", ("train", "test"))
        base = pathlib.Path(self.root) / "Kitti2015" / f"{split}ing"
        left = sorted(glob(str(base / "image_2" / "*.png")))
        right = sorted(glob(str(base / "image_3" / "*.png")))
        self._images = list(zip(left, right))
        if split == "train":
            disp = sorted(glob(str(base / "disp_occ_0" / "*.png")))
            self._disparities = [(d, None) for d in disp]
        else:
            self._disparities = [(None, None)] * len(self._images)

    def _read_disparity(self, path):
        raw = _read_png16(path)[..., :1].astype(np.float32) / 256.0
        valid = raw[..., 0] > 0
        return raw, valid


class Middlebury2014Stereo(StereoMatchingDataset):
    """reference ``Middlebury2014Stereo``: <scene>/im{0,1}.png +
    disp{0,1}.pfm (inf = invalid)."""

    def __init__(self, root, split="train", calibration="perfect",
                 use_ambient_views=False, transforms=None):
        super().__init__(root, transforms)
        verify_str_arg(split, "split", ("train", "additional", "test"))
        base = pathlib.Path(self.root) / "Middlebury2014" / split
        for scene in sorted(p for p in glob(str(base / "*")) if os.path.isdir(p)):
            self._images.append(
                (os.path.join(scene, "im0.png"), os.path.join(scene, "im1.png"))
            )
            d0 = os.path.join(scene, "disp0.pfm")
            self._disparities.append(
                (d0 if os.path.exists(d0) else None, None)
            )

    def _read_disparity(self, path):
        disp = read_pfm(path)[..., :1].astype(np.float32)
        valid = np.isfinite(disp[..., 0]) & (disp[..., 0] > 0)
        disp = np.where(np.isfinite(disp), disp, 0.0)
        return disp, valid


class ETH3DStereo(StereoMatchingDataset):
    """reference ``ETH3DStereo``: two_view_training/<scene>/im{0,1}.png,
    two_view_training_gt/<scene>/disp0GT.pfm + mask0nocc.png."""

    _has_built_in_disparity_mask = True

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root, transforms)
        verify_str_arg(split, "split", ("train", "test"))
        base = pathlib.Path(self.root) / "ETH3D"
        img_dir = "two_view_training" if split == "train" else "two_view_test"
        for scene in sorted(glob(str(base / img_dir / "*"))):
            self._images.append(
                (os.path.join(scene, "im0.png"), os.path.join(scene, "im1.png"))
            )
            if split == "train":
                gt = str(base / "two_view_training_gt" /
                         os.path.basename(scene) / "disp0GT.pfm")
                self._disparities.append((gt, None))
            else:
                self._disparities.append((None, None))

    def _read_disparity(self, path):
        disp = read_pfm(path)[..., :1].astype(np.float32)
        mask_path = os.path.join(os.path.dirname(path), "mask0nocc.png")
        if os.path.exists(mask_path):
            from vision_tpu.io.image import read_image

            valid = np.asarray(read_image(mask_path))[..., 0] == 255
        else:
            valid = np.isfinite(disp[..., 0])
        disp = np.where(np.isfinite(disp), disp, 0.0)
        return disp, valid


class SceneFlowStereo(StereoMatchingDataset):
    """reference ``SceneFlowStereo``: FlyingThings3D/Driving/Monkaa
    frames_<pass>pass left/right + disparity pfm."""

    def __init__(self, root, variant="FlyingThings3D", pass_name="clean",
                 transforms=None):
        super().__init__(root, transforms)
        verify_str_arg(
            variant, "variant", ("FlyingThings3D", "Driving", "Monkaa")
        )
        verify_str_arg(pass_name, "pass_name", ("clean", "final", "both"))
        passes = {
            "clean": ["frames_cleanpass"],
            "final": ["frames_finalpass"],
            "both": ["frames_cleanpass", "frames_finalpass"],
        }[pass_name]
        base = pathlib.Path(self.root) / "SceneFlow" / variant
        for p in passes:
            lefts = sorted((base / p).rglob("left/*.png"))
            for lp in lefts:
                rp = pathlib.Path(str(lp).replace("/left/", "/right/"))
                dp = pathlib.Path(
                    str(lp).replace(p, "disparity")
                ).with_suffix(".pfm")
                if rp.exists() and dp.exists():
                    self._images.append((str(lp), str(rp)))
                    self._disparities.append((str(dp), None))

    def _read_disparity(self, path):
        disp = np.abs(read_pfm(path)[..., :1]).astype(np.float32)
        return disp, None


class CREStereo(StereoMatchingDataset):
    """reference ``CREStereo``: <root>/<variant>/*_left.jpg, *_right.jpg,
    *_left.disp.png (16-bit / 32)."""

    _has_built_in_disparity_mask = True

    def __init__(self, root, transforms=None):
        super().__init__(root, transforms)
        base = pathlib.Path(self.root) / "CREStereo"
        for variant in ("shapenet", "reflective", "tree", "hole"):
            lefts = sorted(glob(str(base / variant / "*_left.jpg")))
            for lp in lefts:
                rp = lp.replace("_left.jpg", "_right.jpg")
                dp = lp.replace("_left.jpg", "_left.disp.png")
                self._images.append((lp, rp))
                self._disparities.append((dp, None))

    def _read_disparity(self, path):
        raw = _read_png16(path)[..., :1].astype(np.float32) / 32.0
        valid = raw[..., 0] > 0
        return raw, valid


class InStereo2k(StereoMatchingDataset):
    """reference ``InStereo2k``: <split>/<scene>/{left,right}.png +
    left_disp.png (/ 100)."""

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root, transforms)
        verify_str_arg(split, "split", ("train", "test"))
        base = pathlib.Path(self.root) / "InStereo2k" / split
        for scene in sorted(glob(str(base / "*"))):
            self._images.append(
                (os.path.join(scene, "left.png"), os.path.join(scene, "right.png"))
            )
            self._disparities.append(
                (os.path.join(scene, "left_disp.png"), None)
            )

    def _read_disparity(self, path):
        raw = _read_png16(path)[..., :1].astype(np.float32) / 100.0
        return raw, None


class FallingThingsStereo(StereoMatchingDataset):
    """reference ``FallingThingsStereo``: *.left.jpg / *.right.jpg +
    *.left.depth.png; disparity = fx * 6cm baseline / depth(cm)."""

    def __init__(self, root, variant="single", transforms=None):
        super().__init__(root, transforms)
        verify_str_arg(variant, "variant", ("single", "mixed", "both"))
        variants = ["single", "mixed"] if variant == "both" else [variant]
        base = pathlib.Path(self.root) / "FallingThings"
        for v in variants:
            lefts = sorted((base / v).rglob("*.left.jpg"))
            for lp in lefts:
                rp = str(lp).replace(".left.jpg", ".right.jpg")
                dp = str(lp).replace(".left.jpg", ".left.depth.png")
                self._images.append((str(lp), rp))
                self._disparities.append((dp, None))

    def _read_disparity(self, path):
        cam_path = os.path.join(
            os.path.dirname(path), "_camera_settings.json"
        )
        with open(cam_path) as f:
            intrinsics = json.load(f)
        fx = intrinsics["camera_settings"][0]["intrinsic_settings"]["fx"]
        depth = _read_png16(path)[..., 0].astype(np.float32)
        with np.errstate(divide="ignore"):
            disp = (fx * 6.0 * 100.0) / depth  # baseline 6cm, depth in 0.1mm
        disp = np.where(np.isfinite(disp), disp, 0.0)
        return disp[..., None], None


class SintelStereo(StereoMatchingDataset):
    """reference ``SintelStereo``: training/<pass>_left|right +
    disparities RGB-encoded ``r*4 + g/2^6 + b/2^14``, occlusion masks."""

    _has_built_in_disparity_mask = True

    def __init__(self, root, pass_name="final", transforms=None):
        super().__init__(root, transforms)
        verify_str_arg(pass_name, "pass_name", ("clean", "final", "both"))
        passes = ["clean", "final"] if pass_name == "both" else [pass_name]
        base = pathlib.Path(self.root) / "Sintel" / "training"
        for p in passes:
            lefts = sorted(glob(str(base / f"{p}_left" / "*" / "*.png")))
            for lp in lefts:
                rp = lp.replace(f"{p}_left", f"{p}_right")
                dp = lp.replace(f"{p}_left", "disparities")
                self._images.append((lp, rp))
                self._disparities.append((dp, None))

    def _read_disparity(self, path):
        from vision_tpu.io.image import ImageReadMode, read_image

        rgb = np.asarray(
            read_image(path, ImageReadMode.RGB)
        ).astype(np.float32)
        disp = rgb[..., 0] * 4 + rgb[..., 1] / 2**6 + rgb[..., 2] / 2**14
        occ_path = path.replace("disparities", "occlusions")
        if os.path.exists(occ_path):
            occ = np.asarray(read_image(occ_path))[..., 0]
            valid = occ == 0
        else:
            valid = np.ones(disp.shape, bool)
        return disp[..., None], valid
