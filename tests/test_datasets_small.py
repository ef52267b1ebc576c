"""Layout-parsing tests for the extra datasets (synthetic files on disk)."""

import bz2
import csv
import os

import numpy as np
import pytest

from vision_tpu import datasets


def _write_png(path, h=8, w=8):
    from vision_tpu.io.image import write_png

    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    img = np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8)
    write_png(np.asarray(img), str(path))


def _write_jpg(path, h=8, w=8):
    from vision_tpu.io.image import write_jpeg

    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    col = np.linspace(0, 255, w, dtype=np.uint8)
    img = np.broadcast_to(col[None, :, None], (h, w, 3)).copy()
    write_jpeg(img, str(path))


def test_dtd_layout(tmp_path):
    base = tmp_path / "dtd" / "images"
    for cls in ("banded", "woven"):
        for i in range(2):
            _write_jpg(base / cls / f"{cls}_{i:04d}.jpg")
    lbl = tmp_path / "dtd" / "labels"
    lbl.mkdir(parents=True)
    with open(lbl / "train1.txt", "w") as f:
        f.write("banded/banded_0000.jpg\nwoven/woven_0001.jpg\n")
    ds = datasets.DTD(tmp_path, split="train", partition=1)
    assert len(ds) == 2
    assert ds.classes == ["banded", "woven"]
    img, label = ds[1]
    assert label == 1 and img.shape == (8, 8, 3)


def test_food101_layout(tmp_path):
    base = tmp_path / "food-101"
    (base / "meta").mkdir(parents=True)
    for cls in ("pizza", "sushi"):
        _write_jpg(base / "images" / cls / "100.jpg")
    with open(base / "meta" / "train.txt", "w") as f:
        f.write("pizza/100\nsushi/100\n")
    ds = datasets.Food101(tmp_path, split="train")
    assert len(ds) == 2
    _, label = ds[0]
    assert label == 0


def test_gtsrb_test_csv(tmp_path):
    base = tmp_path / "gtsrb"
    img_dir = base / "GTSRB" / "Final_Test" / "Images"
    _write_png(img_dir / "00000.ppm.png")  # png content, csv points at it
    with open(base / "GT-final_test.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["Filename", "ClassId"], delimiter=";")
        w.writeheader()
        w.writerow({"Filename": "00000.ppm.png", "ClassId": "7"})
    ds = datasets.GTSRB(tmp_path, split="test")
    assert len(ds) == 1
    _, label = ds[0]
    assert label == 7


def test_stl10_binary(tmp_path):
    base = tmp_path / "stl10_binary"
    base.mkdir()
    n = 3
    imgs = np.random.RandomState(0).randint(0, 255, (n, 3, 96, 96), np.uint8)
    imgs.tofile(base / "train_X.bin")
    np.array([1, 2, 3], np.uint8).tofile(base / "train_y.bin")
    ds = datasets.STL10(tmp_path, split="train")
    assert len(ds) == n
    img, label = ds[0]
    assert img.shape == (96, 96, 3) and label == 0
    # column-major per image: stored (C, Wmaj) -> transpose(0,3,2,1)
    np.testing.assert_array_equal(img, imgs[0].transpose(2, 1, 0))


def test_svhn_mat(tmp_path):
    sio = pytest.importorskip("scipy.io")
    n = 4
    X = np.random.RandomState(0).randint(0, 255, (32, 32, 3, n), np.uint8)
    y = np.array([[10], [1], [2], [3]], np.uint8)  # 10 means digit 0
    sio.savemat(tmp_path / "train_32x32.mat", {"X": X, "y": y})
    ds = datasets.SVHN(tmp_path, split="train")
    assert len(ds) == n
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and label == 0
    np.testing.assert_array_equal(img, X[..., 0])


def test_oxford_pet_layout(tmp_path):
    base = tmp_path / "oxford-iiit-pet"
    (base / "annotations").mkdir(parents=True)
    _write_jpg(base / "images" / "Abyssinian_1.jpg")
    _write_jpg(base / "images" / "yorkshire_terrier_2.jpg")
    with open(base / "annotations" / "trainval.txt", "w") as f:
        f.write("Abyssinian_1 1 1 1\nyorkshire_terrier_2 37 2 25\n")
    ds = datasets.OxfordIIITPet(tmp_path)
    assert len(ds) == 2
    _, label = ds[1]
    assert label == 36


def test_fgvc_aircraft_layout(tmp_path):
    data = tmp_path / "fgvc-aircraft-2013b" / "data"
    (data / "images").mkdir(parents=True)
    _write_jpg(data / "images" / "0034309.jpg")
    with open(data / "variants.txt", "w") as f:
        f.write("707-320\nA300B4\n")
    with open(data / "images_variant_trainval.txt", "w") as f:
        f.write("0034309 A300B4\n")
    ds = datasets.FGVCAircraft(tmp_path, split="trainval")
    assert len(ds) == 1
    _, label = ds[0]
    assert label == 1


def test_usps_bz2(tmp_path):
    rows = []
    rng = np.random.RandomState(0)
    for digit in (1, 5):
        vals = rng.uniform(-1, 1, 256)
        feats = " ".join(f"{i + 1}:{v:.6f}" for i, v in enumerate(vals))
        rows.append(f"{digit} {feats}\n")
    with bz2.open(tmp_path / "usps.bz2", "wt") as f:
        f.writelines(rows)
    ds = datasets.USPS(tmp_path, train=True)
    assert len(ds) == 2
    img, label = ds[0]
    assert img.shape == (16, 16, 1) and label == 0
    _, label = ds[1]
    assert label == 4


def test_semeion(tmp_path):
    rng = np.random.RandomState(0)
    n = 3
    pix = rng.randint(0, 2, (n, 256))
    onehot = np.zeros((n, 10))
    onehot[np.arange(n), [2, 0, 9]] = 1
    np.savetxt(tmp_path / "semeion.data", np.hstack([pix, onehot]), fmt="%.4f")
    ds = datasets.SEMEION(tmp_path)
    assert len(ds) == n
    img, label = ds[0]
    assert img.shape == (16, 16, 1) and label == 2
    assert ds[2][1] == 9


def test_caltech101_layout(tmp_path):
    base = tmp_path / "caltech101" / "101_ObjectCategories"
    for cls in ("BACKGROUND_Google", "accordion", "watch"):
        _write_jpg(base / cls / "image_0001.jpg")
    ds = datasets.Caltech101(tmp_path)
    assert ds.categories == ["accordion", "watch"]  # background excluded
    assert len(ds) == 2
    assert ds[1][1] == 1


def test_caltech256_layout(tmp_path):
    base = tmp_path / "caltech256" / "256_ObjectCategories"
    for cls in ("001.ak47", "257.clutter"):
        _write_jpg(base / cls / f"{cls.split('.')[0]}_0001.jpg")
    ds = datasets.Caltech256(tmp_path)
    assert len(ds) == 2
    assert ds[0][1] == 0 and ds[1][1] == 256


def test_eurosat_imagefolder(tmp_path):
    base = tmp_path / "eurosat" / "2750"
    for cls in ("Forest", "River"):
        _write_jpg(base / cls / "a.jpg")
    ds = datasets.EuroSAT(tmp_path)
    assert len(ds) == 2
    assert ds.classes == ["Forest", "River"]


def test_country211_imagefolder(tmp_path):
    base = tmp_path / "country211" / "train"
    for cls in ("AD", "ZW"):
        _write_jpg(base / cls / "a.jpg")
    ds = datasets.Country211(tmp_path, split="train")
    assert len(ds) == 2


def test_sun397_layout(tmp_path):
    base = tmp_path / "SUN397"
    with open_makedirs(base / "ClassName.txt") as f:
        f.write("/a/abbey\n/a/airplane_cabin\n")
    _write_jpg(base / "a" / "abbey" / "sun_0001.jpg")
    _write_jpg(base / "a" / "airplane_cabin" / "sun_0002.jpg")
    ds = datasets.SUN397(tmp_path)
    assert len(ds) == 2
    assert ds[1][1] == 1


def open_makedirs(path):
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    return open(path, "w")
