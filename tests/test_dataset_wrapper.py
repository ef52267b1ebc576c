"""wrap_dataset_for_transforms_v2 per-dataset factories (reference
``tv_tensors/_dataset_wrapper.py:19-449``, 14 registrations), driven over
synthetic on-disk trees like the reference's inject_fake_data harness."""

import os

import numpy as np
import pytest

from vision_tpu import datasets, tv_tensors
from vision_tpu.datasets import wrap_dataset_for_transforms_v2
from vision_tpu.io.image import write_png


def _png(path, value=0, channels=3, size=(8, 8)):
    path = str(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.full((*size, channels), value, np.uint8)
    write_png(arr, path)


def test_kitti_wrapper(tmp_path):
    base = tmp_path / "Kitti" / "raw" / "training"
    _png(base / "image_2" / "000000.png")
    os.makedirs(base / "label_2")
    with open(base / "label_2" / "000000.txt", "w") as f:
        f.write(
            "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 "
            "1.65 1.67 3.64 -0.65 1.71 46.70 -1.59\n"
            "Pedestrian 0.00 0 -1.58 1.0 2.0 3.0 4.0 "
            "1.65 1.67 3.64 -0.65 1.71 46.70 -1.59\n"
        )
    ds = datasets.Kitti(tmp_path, train=True)
    wrapped = wrap_dataset_for_transforms_v2(ds)
    img, target = wrapped[0]
    assert isinstance(img, tv_tensors.Image)
    assert isinstance(target["boxes"], tv_tensors.BoundingBoxes)
    np.testing.assert_allclose(
        np.asarray(target["boxes"].data),
        [[587.01, 173.33, 614.12, 200.12], [1, 2, 3, 4]],
    )
    np.testing.assert_array_equal(target["labels"], [0, 3])  # Car, Pedestrian

    # target_keys selects native keys too
    wrapped = wrap_dataset_for_transforms_v2(ds, target_keys=["boxes", "type"])
    _, target = wrapped[0]
    assert set(target) == {"boxes", "type"}
    assert target["type"] == ["Car", "Pedestrian"]


def test_celeba_bbox_wrapper(tmp_path):
    base = tmp_path / "celeba"
    os.makedirs(base / "img_align_celeba")
    _png(base / "img_align_celeba" / "000001.png")
    os.rename(
        base / "img_align_celeba" / "000001.png",
        base / "img_align_celeba" / "000001.jpg",
    )
    with open(base / "list_eval_partition.txt", "w") as f:
        f.write("000001.jpg 0\n")
    with open(base / "list_bbox_celeba.txt", "w") as f:
        f.write("1\nimage_id x_1 y_1 width height\n000001.jpg 10 20 30 40\n")
    ds = datasets.CelebA(tmp_path, split="train", target_type="bbox")
    wrapped = wrap_dataset_for_transforms_v2(ds)
    img, target = wrapped[0]
    assert isinstance(target, tv_tensors.BoundingBoxes)
    np.testing.assert_array_equal(
        np.asarray(target.data), [[10, 20, 40, 60]]  # XYWH -> XYXY
    )

    ds_attr = datasets.CelebA(tmp_path, split="train", target_type="bbox")
    ds_attr.target_type = ["attr"]
    with pytest.raises(RuntimeError, match="not supported"):
        wrap_dataset_for_transforms_v2(ds_attr)[0]


def test_widerface_wrapper(tmp_path):
    base = tmp_path / "widerface"
    img_rel = "0--Parade/0_Parade_marchingband_1_5.jpg"
    img_path = base / "WIDER_train" / "images" / img_rel
    _png(str(img_path).replace(".jpg", ".png"))
    os.rename(str(img_path).replace(".jpg", ".png"), img_path)
    os.makedirs(base / "wider_face_split")
    with open(base / "wider_face_split" / "wider_face_train_bbx_gt.txt", "w") as f:
        f.write(img_rel + "\n1\n10 20 30 40 0 0 0 0 0 0\n")
    ds = datasets.WIDERFace(tmp_path, split="train")
    wrapped = wrap_dataset_for_transforms_v2(ds)
    img, target = wrapped[0]
    assert isinstance(target["bbox"], tv_tensors.BoundingBoxes)
    np.testing.assert_array_equal(
        np.asarray(target["bbox"].data), [[10, 20, 40, 60]]
    )
    assert "blur" in target and "pose" in target


def test_oxford_pet_segmentation_wrapper(tmp_path):
    base = tmp_path / "oxford-iiit-pet"
    (base / "annotations" / "trimaps").mkdir(parents=True)
    _png(base / "images" / "Abyssinian_1.png")
    os.rename(
        base / "images" / "Abyssinian_1.png",
        base / "images" / "Abyssinian_1.jpg",
    )
    _png(base / "annotations" / "trimaps" / "Abyssinian_1.png", value=2,
         channels=1)
    with open(base / "annotations" / "trainval.txt", "w") as f:
        f.write("Abyssinian_1 1 1 1\n")
    ds = datasets.OxfordIIITPet(
        tmp_path, target_types=["category", "segmentation"]
    )
    wrapped = wrap_dataset_for_transforms_v2(ds)
    img, (label, seg) = wrapped[0]
    assert label == 0
    assert isinstance(seg, tv_tensors.Mask)
    assert int(np.asarray(seg.data).max()) == 2


def test_cityscapes_wrapper(tmp_path):
    img_dir = tmp_path / "leftImg8bit" / "train" / "bochum"
    gt_dir = tmp_path / "gtFine" / "train" / "bochum"
    _png(img_dir / "bochum_000000_000313_leftImg8bit.png")
    _png(gt_dir / "bochum_000000_000313_gtFine_labelIds.png", value=7,
         channels=1)
    # instance ids: one stuff region (id 7) is enough for the split logic
    _png(gt_dir / "bochum_000000_000313_gtFine_instanceIds.png", value=7,
         channels=1)
    ds = datasets.Cityscapes(
        tmp_path, split="train", mode="fine",
        target_type=["semantic", "instance"],
    )
    wrapped = wrap_dataset_for_transforms_v2(ds)
    img, (sem, inst) = wrapped[0]
    assert isinstance(sem, tv_tensors.Mask)
    assert isinstance(inst, dict)
    assert isinstance(inst["masks"], tv_tensors.Mask)
    np.testing.assert_array_equal(inst["labels"], [7])

    ds_color = datasets.Cityscapes(
        tmp_path, split="train", mode="fine", target_type="semantic"
    )
    ds_color.target_type = ["color"]
    with pytest.raises(RuntimeError, match="not supported"):
        wrap_dataset_for_transforms_v2(ds_color)[0]


def test_video_wrapper_unit():
    """Video factory (HMDB51/Kinetics/UCF101 group) wraps frame stacks."""

    class Kinetics:  # name-matched stub: full video files are heavyweight
        def __len__(self):
            return 1

        def __getitem__(self, idx):
            video = np.zeros((4, 8, 8, 3), np.uint8)
            audio = np.zeros((0,), np.float32)
            return video, audio, 3

    wrapped = wrap_dataset_for_transforms_v2(Kinetics())
    video, audio, label = wrapped[0]
    assert isinstance(video, tv_tensors.Video)
    assert label == 3


def test_classification_identity_and_target_keys_error(tmp_path):
    root = tmp_path / "data" / "cls_a"
    _png(root / "a.png")
    ds = datasets.ImageFolder(str(tmp_path / "data"))
    wrapped = wrap_dataset_for_transforms_v2(ds)
    img, label = wrapped[0]
    assert isinstance(img, tv_tensors.Image) and label == 0
    with pytest.raises(ValueError, match="target_keys"):
        wrap_dataset_for_transforms_v2(ds, target_keys=["boxes"])


def test_voc_detection_wrapper_target_keys(tmp_path):
    root = tmp_path / "VOCdevkit" / "VOC2012"
    _png(root / "JPEGImages" / "0.png")
    os.rename(root / "JPEGImages" / "0.png", root / "JPEGImages" / "0.jpg")
    (root / "Annotations").mkdir(parents=True, exist_ok=True)
    (root / "ImageSets" / "Main").mkdir(parents=True)
    with open(root / "ImageSets" / "Main" / "train.txt", "w") as f:
        f.write("0\n")
    with open(root / "Annotations" / "0.xml", "w") as f:
        f.write(
            "<annotation><object><name>dog</name><bndbox>"
            "<xmin>1</xmin><ymin>2</ymin><xmax>5</xmax><ymax>6</ymax>"
            "</bndbox></object></annotation>"
        )
    ds = datasets.VOCDetection(tmp_path, image_set="train")
    wrapped = wrap_dataset_for_transforms_v2(
        ds, target_keys=["boxes", "labels"]
    )
    img, target = wrapped[0]
    assert set(target) == {"boxes", "labels"}
    np.testing.assert_array_equal(np.asarray(target["boxes"].data), [[1, 2, 5, 6]])
    np.testing.assert_array_equal(target["labels"], [12])  # dog
