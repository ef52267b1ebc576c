"""Dataset parsing against synthetic on-disk trees — the reference's
``inject_fake_data`` strategy (``test/datasets_utils.py:304``): every
dataset's full parsing logic runs with no network."""

import gzip
import json
import os
import pickle

import numpy as np
import pytest

from vision_tpu import datasets
from vision_tpu.io.image import write_png


def _make_image_folder(root, classes, per_class=3, size=(8, 10)):
    rng = np.random.RandomState(0)
    for cls in classes:
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            img = (rng.rand(*size, 3) * 255).astype(np.uint8)
            write_png(img, os.path.join(d, f"{i}.png"))


def test_image_folder(tmp_path):
    _make_image_folder(tmp_path, ["cat", "dog"])
    ds = datasets.ImageFolder(str(tmp_path))
    assert len(ds) == 6
    assert ds.classes == ["cat", "dog"]
    img, target = ds[0]
    assert img.shape == (8, 10, 3)
    assert target == 0
    assert ds.targets[-1] == 1


def test_image_folder_transform(tmp_path):
    _make_image_folder(tmp_path, ["a"])
    ds = datasets.ImageFolder(str(tmp_path), transform=lambda x: x.mean())
    val, _ = ds[0]
    assert np.isscalar(val) or val.shape == ()


def _write_idx(path, arr):
    """IDX format writer for MNIST fake data."""
    ty = {1: 0x08}.get(arr.itemsize, 0x08)
    nd = arr.ndim
    header = (0x08 * 256 + nd).to_bytes(4, "big")
    for s in arr.shape:
        header += s.to_bytes(4, "big")
    with open(path, "wb") as f:
        f.write(header + arr.tobytes())


def test_mnist_idx_parsing(tmp_path):
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.RandomState(0)
    train_imgs = (rng.rand(5, 28, 28) * 255).astype(np.uint8)
    train_lbls = rng.randint(0, 10, 5).astype(np.uint8)
    test_imgs = (rng.rand(3, 28, 28) * 255).astype(np.uint8)
    test_lbls = rng.randint(0, 10, 3).astype(np.uint8)
    _write_idx(raw / "train-images-idx3-ubyte", train_imgs)
    _write_idx(raw / "train-labels-idx1-ubyte", train_lbls)
    _write_idx(raw / "t10k-images-idx3-ubyte", test_imgs)
    _write_idx(raw / "t10k-labels-idx1-ubyte", test_lbls)

    ds = datasets.MNIST(str(tmp_path), train=True)
    assert len(ds) == 5
    img, target = ds[2]
    assert img.shape == (28, 28, 1)
    np.testing.assert_array_equal(img[..., 0], train_imgs[2])
    assert target == int(train_lbls[2])
    ds_test = datasets.MNIST(str(tmp_path), train=False)
    assert len(ds_test) == 3


def test_cifar10_pickle_parsing(tmp_path):
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for name, _ in datasets.CIFAR10.train_list + datasets.CIFAR10.test_list:
        data = (rng.rand(4, 3072) * 255).astype(np.uint8)
        with open(base / name, "wb") as f:
            pickle.dump({"data": data, "labels": [0, 1, 2, 3]}, f)
    with open(base / "batches.meta", "wb") as f:
        pickle.dump({"label_names": [f"c{i}" for i in range(10)]}, f)

    # bypass md5 by monkeypatching check
    import vision_tpu.datasets.cifar as cifar_mod

    orig = cifar_mod.check_integrity
    cifar_mod.check_integrity = lambda p, md5=None: os.path.isfile(p)
    try:
        ds = datasets.CIFAR10(str(tmp_path), train=True)
        assert len(ds) == 20  # 5 batches x 4
        img, target = ds[0]
        assert img.shape == (32, 32, 3)
        assert ds.classes[0] == "c0"
    finally:
        cifar_mod.check_integrity = orig


def test_coco_detection(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    ann = {"images": [], "annotations": [], "categories": [{"id": 1, "name": "thing"}]}
    for i in range(3):
        write_png(
            (rng.rand(10, 12, 3) * 255).astype(np.uint8),
            img_dir / f"img{i}.png",
        )
        ann["images"].append(
            {"id": i, "file_name": f"img{i}.png", "height": 10, "width": 12}
        )
        ann["annotations"].append(
            {
                "id": 100 + i, "image_id": i, "category_id": 1,
                "bbox": [1, 2, 5, 4], "area": 20, "iscrowd": 0,
            }
        )
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))

    ds = datasets.CocoDetection(str(img_dir), str(ann_file))
    assert len(ds) == 3
    img, target = ds[1]
    assert img.shape == (10, 12, 3)
    assert len(target) == 1
    assert target[0]["bbox"] == [1, 2, 5, 4]


def test_voc_detection_xml(tmp_path):
    base = tmp_path / "VOCdevkit" / "VOC2012"
    (base / "ImageSets" / "Main").mkdir(parents=True)
    (base / "JPEGImages").mkdir()
    (base / "Annotations").mkdir()
    from vision_tpu.io.image import write_jpeg

    rng = np.random.RandomState(0)
    write_jpeg(
        (rng.rand(10, 10, 3) * 255).astype(np.uint8),
        base / "JPEGImages" / "im0.jpg",
    )
    (base / "Annotations" / "im0.xml").write_text(
        "<annotation><filename>im0.jpg</filename>"
        "<object><name>cat</name><bndbox><xmin>1</xmin><ymin>2</ymin>"
        "<xmax>5</xmax><ymax>6</ymax></bndbox></object></annotation>"
    )
    (base / "ImageSets" / "Main" / "train.txt").write_text("im0\n")

    ds = datasets.VOCDetection(str(tmp_path), year="2012", image_set="train")
    img, target = ds[0]
    assert img.shape == (10, 10, 3)
    obj = target["annotation"]["object"][0]
    assert obj["name"] == "cat"
    assert obj["bndbox"]["xmin"] == "1"


def test_fake_data():
    ds = datasets.FakeData(size=10, image_size=(16, 16, 3), num_classes=4)
    img, target = ds[3]
    assert img.shape == (16, 16, 3)
    assert 0 <= target < 4
    img2, _ = ds[3]
    np.testing.assert_array_equal(img, img2)  # deterministic per index


def test_distributed_sampler():
    ds = datasets.FakeData(size=10)
    s0 = datasets.DistributedSampler(ds, num_replicas=3, rank=0, shuffle=False)
    s1 = datasets.DistributedSampler(ds, num_replicas=3, rank=1, shuffle=False)
    s2 = datasets.DistributedSampler(ds, num_replicas=3, rank=2, shuffle=False)
    all_idx = sorted(list(s0) + list(s1) + list(s2))
    assert len(all_idx) == 12  # padded to equal shards
    assert set(all_idx) == set(range(10))
    # shuffled sampler changes with epoch
    sh = datasets.DistributedSampler(ds, num_replicas=2, rank=0, shuffle=True)
    sh.set_epoch(0)
    e0 = list(sh)
    sh.set_epoch(1)
    assert e0 != list(sh)


def test_dataloader_batching(tmp_path):
    ds = datasets.FakeData(size=7, image_size=(4, 4, 3), num_classes=3)
    loader = datasets.DataLoader(ds, batch_size=3)
    batches = list(loader)
    assert len(batches) == 3
    imgs, targets = batches[0]
    assert imgs.shape == (3, 4, 4, 3)
    assert targets.shape == (3,)
    loader_dl = datasets.DataLoader(ds, batch_size=3, drop_last=True)
    assert len(list(loader_dl)) == 2


def test_dataloader_workers():
    ds = datasets.FakeData(size=8, image_size=(4, 4, 3))
    loader = datasets.DataLoader(ds, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    ref = datasets.DataLoader(ds, batch_size=4)
    np.testing.assert_array_equal(batches[0][0], list(ref)[0][0])
