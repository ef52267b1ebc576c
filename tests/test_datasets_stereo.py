"""Stereo-matching dataset layout + disparity-decoding tests."""

import os
import struct
import zlib

import numpy as np

from vision_tpu import datasets


def _png8(path, h=6, w=6, value=0, channels=3):
    from vision_tpu.io.image import write_png

    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    img = np.full((h, w, channels), value, np.uint8)
    write_png(img, str(path))


def _png16_gray(path, values: np.ndarray):
    """16-bit grayscale PNG from a (H, W) uint16 array."""
    h, w = values.shape
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    raw = b"".join(b"\x00" + values[r].astype(">u2").tobytes() for r in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def _pfm(path, data: np.ndarray):
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    h, w = data.shape[:2]
    c = 1 if data.ndim == 2 else data.shape[2]
    with open(path, "wb") as f:
        f.write(b"Pf\n" if c == 1 else b"PF\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")
        f.write(data[::-1].astype("<f4").tobytes())


def test_kitti2015_stereo(tmp_path):
    base = tmp_path / "Kitti2015" / "training"
    _png8(base / "image_2" / "000000_10.png")
    _png8(base / "image_3" / "000000_10.png")
    vals = np.zeros((6, 6), np.uint16)
    vals[2, 3] = 256 * 5  # disparity 5.0
    _png16_gray(base / "disp_occ_0" / "000000_10.png", vals)
    ds = datasets.Kitti2015Stereo(tmp_path, split="train")
    assert len(ds) == 1
    left, right, disp, valid = ds[0]
    assert disp.shape == (6, 6, 1)
    assert disp[2, 3, 0] == 5.0
    assert valid[2, 3] and not valid[0, 0]


def test_middlebury_pfm_invalid_inf(tmp_path):
    scene = tmp_path / "Middlebury2014" / "train" / "Adirondack"
    _png8(scene / "im0.png")
    _png8(scene / "im1.png")
    d = np.full((6, 6), 2.5, np.float32)
    d[0, 0] = np.inf
    _pfm(scene / "disp0.pfm", d)
    ds = datasets.Middlebury2014Stereo(tmp_path, split="train")
    left, right, disp, valid = ds[0]
    assert disp[3, 3, 0] == 2.5 and disp[0, 0, 0] == 0.0
    assert not valid[0, 0] and valid[3, 3]


def test_crestereo_layout(tmp_path):
    base = tmp_path / "CREStereo" / "shapenet"
    _png8(base / "0_left.png")
    os.rename(base / "0_left.png", base / "0_left.jpg")
    _png8(base / "0_right.png")
    os.rename(base / "0_right.png", base / "0_right.jpg")
    vals = np.full((6, 6), 32 * 3, np.uint16)  # disparity 3.0
    _png16_gray(base / "0_left.disp.png", vals)
    ds = datasets.CREStereo(tmp_path)
    assert len(ds) == 1
    _, _, disp, valid = ds[0]
    assert disp[1, 1, 0] == 3.0 and valid.all()


def test_sintel_stereo_rgb_encoding(tmp_path):
    from vision_tpu.io.image import write_png

    base = tmp_path / "Sintel" / "training"
    for d in ("final_left", "final_right", "disparities", "occlusions"):
        os.makedirs(base / d / "alley_1", exist_ok=True)
    _png8(base / "final_left" / "alley_1" / "frame_0001.png")
    _png8(base / "final_right" / "alley_1" / "frame_0001.png")
    rgb = np.zeros((6, 6, 3), np.uint8)
    rgb[..., 0] = 2   # r*4 = 8
    rgb[..., 1] = 64  # g/64 = 1
    write_png(rgb, str(base / "disparities" / "alley_1" / "frame_0001.png"))
    occ = np.zeros((6, 6, 1), np.uint8)
    occ[0, 0] = 255
    write_png(occ, str(base / "occlusions" / "alley_1" / "frame_0001.png"))
    ds = datasets.SintelStereo(tmp_path, pass_name="final")
    _, _, disp, valid = ds[0]
    np.testing.assert_allclose(disp[3, 3, 0], 9.0)
    assert not valid[0, 0] and valid[3, 3]


def test_eth3d_with_mask(tmp_path):
    from vision_tpu.io.image import write_png

    base = tmp_path / "ETH3D"
    scene_img = base / "two_view_training" / "delivery_area"
    scene_gt = base / "two_view_training_gt" / "delivery_area"
    _png8(scene_img / "im0.png")
    _png8(scene_img / "im1.png")
    _pfm(scene_gt / "disp0GT.pfm", np.full((6, 6), 1.5, np.float32))
    mask = np.full((6, 6, 1), 255, np.uint8)
    mask[0, 0] = 0
    write_png(mask, str(scene_gt / "mask0nocc.png"))
    ds = datasets.ETH3DStereo(tmp_path, split="train")
    _, _, disp, valid = ds[0]
    assert disp[2, 2, 0] == 1.5
    assert not valid[0, 0] and valid[2, 2]


def test_instereo2k(tmp_path):
    scene = tmp_path / "InStereo2k" / "train" / "000001"
    _png8(scene / "left.png")
    _png8(scene / "right.png")
    _png16_gray(scene / "left_disp.png", np.full((6, 6), 100 * 7, np.uint16))
    ds = datasets.InStereo2k(tmp_path, split="train")
    _, _, disp, valid = ds[0]
    assert disp[0, 0, 0] == 7.0 and valid is None
