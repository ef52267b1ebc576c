"""Tests for optical-flow datasets, VideoClips, and the _more.py family,
all against synthetic on-disk layouts."""

import json
import os

import numpy as np
import pytest

from vision_tpu import datasets
from vision_tpu.datasets._optical_flow import read_flo, read_pfm, write_flo
from vision_tpu.datasets.video_utils import VideoClips, unfold


def _png(path, h=8, w=8, value=None, channels=3):
    from vision_tpu.io.image import write_png

    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    if value is None:
        img = np.random.RandomState(0).randint(0, 255, (h, w, channels), np.uint8)
    else:
        img = np.full((h, w, channels), value, np.uint8)
    write_png(img, str(path))


def _png16_flow(path, h=8, w=8, u=1.5, v=-2.0):
    """KITTI-format 16-bit RGB png, written byte-by-byte (PIL can't encode
    16-bit multichannel)."""
    import struct
    import zlib

    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    arr = np.zeros((h, w, 3), np.uint16)
    arr[..., 0] = int(u * 64 + 2**15)
    arr[..., 1] = int(v * 64 + 2**15)
    arr[..., 2] = 1
    arr[0, 0, 2] = 0  # one invalid pixel

    raw = b"".join(
        b"\x00" + arr[r].astype(">u2").tobytes() for r in range(h)
    )

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)  # 16-bit RGB
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def test_flo_roundtrip(tmp_path):
    flow = np.random.RandomState(0).randn(6, 5, 2).astype(np.float32)
    write_flo(flow, tmp_path / "a.flo")
    np.testing.assert_array_equal(read_flo(tmp_path / "a.flo"), flow)


def test_pfm_reader(tmp_path):
    h, w = 4, 3
    data = np.arange(h * w * 3, dtype="<f4").reshape(h, w, 3)
    with open(tmp_path / "a.pfm", "wb") as f:
        f.write(b"PF\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")
        f.write(data.tobytes())
    out = read_pfm(tmp_path / "a.pfm")
    np.testing.assert_array_equal(out, data[::-1])


def test_16bit_png_flow(tmp_path):
    from vision_tpu.datasets._optical_flow import read_16bit_png_flow

    _png16_flow(tmp_path / "f.png", u=1.5, v=-2.0)
    flow, valid = read_16bit_png_flow(tmp_path / "f.png")
    assert flow.shape == (8, 8, 2) and valid.shape == (8, 8)
    assert not valid[0, 0] and valid[1, 1]
    np.testing.assert_allclose(flow[1, 1], [1.5, -2.0])


def test_sintel_layout(tmp_path):
    base = tmp_path / "Sintel" / "training"
    for i in range(3):
        _png(base / "clean" / "alley_1" / f"frame_{i:04d}.png")
    for i in range(2):
        flow = np.zeros((8, 8, 2), np.float32)
        os.makedirs(base / "flow" / "alley_1", exist_ok=True)
        write_flo(flow, base / "flow" / "alley_1" / f"frame_{i:04d}.flo")
    ds = datasets.Sintel(tmp_path, split="train", pass_name="clean")
    assert len(ds) == 2
    img1, img2, flow = ds[0]
    assert img1.shape == (8, 8, 3) and flow.shape == (8, 8, 2)


def test_kitti_flow_layout(tmp_path):
    base = tmp_path / "KittiFlow" / "training"
    _png(base / "image_2" / "000000_10.png")
    _png(base / "image_2" / "000000_11.png")
    _png16_flow(base / "flow_occ" / "000000_10.png")
    ds = datasets.KittiFlow(tmp_path, split="train")
    assert len(ds) == 1
    img1, img2, flow, valid = ds[0]
    assert flow.shape == (8, 8, 2) and valid.dtype == bool


def test_flying_chairs_layout(tmp_path):
    from PIL import Image

    base = tmp_path / "FlyingChairs" / "data"
    os.makedirs(base)
    for i in (1, 2):
        for k in (1, 2):
            Image.fromarray(
                np.zeros((8, 8, 3), np.uint8)
            ).save(base / f"{i:05d}_img{k}.ppm")
        write_flo(np.zeros((8, 8, 2), np.float32), base / f"{i:05d}_flow.flo")
    np.savetxt(
        tmp_path / "FlyingChairs" / "FlyingChairs_train_val.txt", [1, 2], fmt="%d"
    )
    train = datasets.FlyingChairs(tmp_path, split="train")
    val = datasets.FlyingChairs(tmp_path, split="val")
    assert len(train) == 1 and len(val) == 1
    img1, img2, flow = train[0]
    assert flow.shape == (8, 8, 2)


def test_unfold_and_videoclips_precomputed():
    idxs = unfold(np.arange(10), size=4, step=3)
    assert idxs.shape == (3, 4)
    np.testing.assert_array_equal(idxs[1], [3, 4, 5, 6])

    meta = {
        "video_paths": ["a.mp4", "b.mp4"],
        "video_pts": [np.arange(10) / 30.0, np.arange(7) / 30.0],
        "video_fps": [30.0, 30.0],
    }
    clips = VideoClips(
        meta["video_paths"], clip_length_in_frames=4, frames_between_clips=3,
        _precomputed_metadata=meta,
    )
    # video a: (10-4)//3+1 = 3 clips; video b: (7-4)//3+1 = 2 clips
    assert clips.num_clips() == 5
    assert clips.get_clip_location(0) == (0, 0)
    assert clips.get_clip_location(3) == (1, 0)
    assert clips.get_clip_location(4) == (1, 1)
    sub = clips.subset([1])
    assert sub.num_clips() == 2

    # frame-rate resampling halves the frame count
    clips.compute_clips(4, 3, frame_rate=15.0)
    assert clips.clips[0].shape[1] == 4
    np.testing.assert_array_equal(clips.resampling_idxs[0], [0, 2, 4, 6, 8])


def test_cityscapes_layout(tmp_path):
    img_dir = tmp_path / "leftImg8bit" / "train" / "bochum"
    gt_dir = tmp_path / "gtFine" / "train" / "bochum"
    _png(img_dir / "bochum_000000_000313_leftImg8bit.png")
    _png(gt_dir / "bochum_000000_000313_gtFine_labelIds.png", value=7, channels=1)
    _png(gt_dir / "bochum_000000_000313_gtFine_instanceIds.png", channels=1)
    ds = datasets.Cityscapes(
        tmp_path, split="train", mode="fine",
        target_type=["semantic", "instance"],
    )
    assert len(ds) == 1
    img, (sem, inst) = ds[0]
    assert img.shape == (8, 8, 3)
    assert int(np.asarray(sem).max()) == 7
    assert len(datasets.Cityscapes.classes) == 35


def test_celeba_layout(tmp_path):
    base = tmp_path / "celeba"
    os.makedirs(base / "img_align_celeba")
    _png(base / "img_align_celeba" / "000001.jpg".replace(".jpg", ".png"))
    # our reader sniffs magic bytes, so a png payload with .jpg name works
    os.rename(
        base / "img_align_celeba" / "000001.png",
        base / "img_align_celeba" / "000001.jpg",
    )
    with open(base / "list_eval_partition.txt", "w") as f:
        f.write("000001.jpg 0\n")
    with open(base / "list_attr_celeba.txt", "w") as f:
        f.write("1\nSmiling Young\n000001.jpg 1 -1\n")
    with open(base / "identity_CelebA.txt", "w") as f:
        f.write("000001.jpg 42\n")
    ds = datasets.CelebA(tmp_path, split="train", target_type=["attr", "identity"])
    assert len(ds) == 1
    img, (attr, ident) = ds[0]
    np.testing.assert_array_equal(attr, [1, 0])
    assert ident == 42
    assert ds.attr_names == ["Smiling", "Young"]


def test_fer2013_csv(tmp_path):
    base = tmp_path / "fer2013"
    os.makedirs(base)
    pixels = " ".join(["128"] * (48 * 48))
    with open(base / "train.csv", "w") as f:
        f.write("emotion,pixels\n3," + pixels + "\n")
    ds = datasets.FER2013(tmp_path, split="train")
    img, label = ds[0]
    assert img.shape == (48, 48, 1) and label == 3


def test_widerface_annotations(tmp_path):
    base = tmp_path / "widerface"
    img_rel = "0--Parade/0_Parade_marchingband_1_5.jpg"
    img_path = base / "WIDER_train" / "images" / img_rel
    _png(str(img_path).replace(".jpg", ".png"))
    os.rename(str(img_path).replace(".jpg", ".png"), img_path)
    os.makedirs(base / "wider_face_split")
    with open(base / "wider_face_split" / "wider_face_train_bbx_gt.txt", "w") as f:
        f.write(img_rel + "\n2\n10 20 30 40 0 0 0 0 0 0\n50 60 20 20 1 0 1 0 2 0\n")
    ds = datasets.WIDERFace(tmp_path, split="train")
    assert len(ds) == 1
    img, target = ds[0]
    np.testing.assert_array_equal(target["bbox"][0], [10, 20, 30, 40])
    assert target["blur"][1] == 1 and target["occlusion"][1] == 2


def test_kitti_detection_labels(tmp_path):
    base = tmp_path / "Kitti" / "raw" / "training"
    _png(base / "image_2" / "000000.png")
    os.makedirs(base / "label_2")
    with open(base / "label_2" / "000000.txt", "w") as f:
        f.write(
            "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 "
            "1.65 1.67 3.64 -0.65 1.71 46.70 -1.59\n"
        )
    ds = datasets.Kitti(tmp_path, train=True)
    img, target = ds[0]
    assert target[0]["type"] == "Car"
    np.testing.assert_allclose(target[0]["bbox"], [587.01, 173.33, 614.12, 200.12])


def test_moving_mnist(tmp_path):
    path = tmp_path / "MovingMNIST"
    os.makedirs(path)
    raw = np.random.RandomState(0).randint(0, 255, (20, 3, 64, 64), np.uint8)
    np.save(path / "mnist_test_seq.npy", raw)
    ds = datasets.MovingMNIST(tmp_path)
    assert len(ds) == 3
    assert ds[0].shape == (20, 64, 64, 1)
    train = datasets.MovingMNIST(tmp_path, split="train", split_ratio=10)
    assert train[0].shape == (10, 64, 64, 1)


def test_clevr_layout(tmp_path):
    base = tmp_path / "clevr" / "CLEVR_v1.0"
    _png(base / "images" / "train" / "CLEVR_train_000000.png")
    os.makedirs(base / "scenes")
    with open(base / "scenes" / "CLEVR_train_scenes.json", "w") as f:
        json.dump(
            {"scenes": [{"image_filename": "CLEVR_train_000000.png",
                         "objects": [{}, {}, {}]}]},
            f,
        )
    ds = datasets.CLEVRClassification(tmp_path, split="train")
    img, count = ds[0]
    assert count == 3


def test_omniglot_layout(tmp_path):
    base = tmp_path / "omniglot-py" / "images_background"
    _png(base / "Latin" / "character01" / "0001_01.png", channels=1)
    _png(base / "Latin" / "character02" / "0002_01.png", channels=1)
    ds = datasets.Omniglot(tmp_path, background=True)
    assert len(ds) == 2
    _, label = ds[1]
    assert label == 1


def test_lfw_people_and_pairs(tmp_path):
    base = tmp_path / "lfw-py"
    img = base / "lfw_funneled"
    for ident, n in (("Aaron_Eckhart", 1), ("Zoe_Ball", 2)):
        for i in range(1, n + 1):
            p = img / ident / f"{ident}_{i:04d}.png"
            _png(p)
            os.rename(p, str(p).replace(".png", ".jpg"))
    with open(base / "peopleDevTrain.txt", "w") as f:
        f.write("2\nAaron_Eckhart\t1\nZoe_Ball\t2\n")
    ds = datasets.LFWPeople(tmp_path, split="train")
    assert len(ds) == 3
    _, label = ds[2]
    assert label == 1

    with open(base / "pairsDevTrain.txt", "w") as f:
        f.write("1\nZoe_Ball\t1\t2\nAaron_Eckhart\t1\tZoe_Ball\t1\n")
    pairs = datasets.LFWPairs(tmp_path, split="train")
    assert len(pairs) == 2
    _, _, same = pairs[0]
    assert same == 1
    assert pairs[1][2] == 0


def test_emnist_qmnist(tmp_path):
    from vision_tpu.datasets.mnist import read_idx_file

    def write_idx(path, arr):
        import struct

        os.makedirs(os.path.dirname(path), exist_ok=True)
        ty = {np.uint8: 8, np.int32: 12}[arr.dtype.type]
        with open(path, "wb") as f:
            f.write(struct.pack(">i", ty * 256 + arr.ndim))
            for s in arr.shape:
                f.write(struct.pack(">i", s))
            f.write(arr.astype(f">{arr.dtype.kind}{arr.dtype.itemsize}").tobytes())

    # EMNIST: images stored transposed
    raw = np.arange(2 * 4 * 4, dtype=np.uint8).reshape(2, 4, 4)
    eroot = tmp_path / "EMNIST" / "raw"
    write_idx(str(eroot / "emnist-digits-train-images-idx3-ubyte"), raw)
    write_idx(
        str(eroot / "emnist-digits-train-labels-idx1-ubyte"),
        np.asarray([1, 2], np.uint8),
    )
    ds = datasets.EMNIST(tmp_path, split="digits", train=True)
    img, label = ds[0]
    np.testing.assert_array_equal(img[..., 0], raw[0].T)
    assert label == 1

    # QMNIST: idx2 int32 label matrix, target = column 0
    qroot = tmp_path / "QMNIST" / "raw"
    write_idx(str(qroot / "qmnist-train-images-idx3-ubyte"), raw)
    write_idx(
        str(qroot / "qmnist-train-labels-idx2-int"),
        np.asarray([[7, 0, 0, 0, 0, 0, 0, 0], [3, 0, 0, 0, 0, 0, 0, 0]], np.int32),
    )
    qds = datasets.QMNIST(tmp_path, what="train")
    img, label = qds[0]
    assert label == 7 and img.shape == (4, 4, 1)


def test_flickr8k(tmp_path):
    _png(tmp_path / "imgs" / "a.png")
    ann = tmp_path / "ann.txt"
    with open(ann, "w") as f:
        f.write("a.png#0\tA dog runs.\na.png#1\tA dog sprints.\n")
    ds = datasets.Flickr8k(tmp_path / "imgs", str(ann))
    img, captions = ds[0]
    assert captions == ["A dog runs.", "A dog sprints."]


def test_places365_layout(tmp_path):
    os.makedirs(tmp_path / "data_large" / "a" / "abbey", exist_ok=True)
    _png(tmp_path / "data_large" / "a" / "abbey" / "00000001.jpg".replace(".jpg", ".png"))
    os.rename(
        tmp_path / "data_large" / "a" / "abbey" / "00000001.png",
        tmp_path / "data_large" / "a" / "abbey" / "00000001.jpg",
    )
    with open(tmp_path / "categories_places365.txt", "w") as f:
        f.write("/a/abbey 0\n/a/airfield 1\n")
    with open(tmp_path / "places365_train_standard.txt", "w") as f:
        f.write("/a/abbey/00000001.jpg 0\n")
    ds = datasets.Places365(tmp_path, split="train-standard")
    assert len(ds) == 1 and ds.classes[0] == "/a/abbey"
    img, label = ds[0]
    assert label == 0 and img.shape == (8, 8, 3)


def test_inaturalist_layout(tmp_path):
    base = tmp_path / "2021_train"
    name = "00001_Animalia_Chordata_Aves_Passeriformes_Corvidae_Corvus_corax"
    _png(base / name / "x.jpg")
    os.rename(base / name / "x.jpg", base / name / "x.jpg")
    ds = datasets.INaturalist(
        tmp_path, version="2021_train", target_type=["full", "kingdom"]
    )
    assert len(ds) == 1
    img, (full, kingdom) = ds[0]
    assert full == 0 and kingdom == 0
    assert ds.category_name("kingdom", 0) == "Animalia"


def test_sbu_layout(tmp_path):
    base = tmp_path / "dataset"
    _png(base / "photo1.jpg".replace(".jpg", ".png"))
    os.rename(base / "photo1.png", base / "photo1.jpg")
    with open(base / "SBU_captioned_photo_dataset_urls.txt", "w") as f:
        f.write("http://x/photo1.jpg\nhttp://x/missing.jpg\n")
    with open(base / "SBU_captioned_photo_dataset_captions.txt", "w") as f:
        f.write("a dog\na cat\n")
    ds = datasets.SBU(tmp_path)
    assert len(ds) == 1  # missing.jpg skipped
    img, caption = ds[0]
    assert caption == "a dog"


def test_stanford_cars_layout(tmp_path):
    sio = pytest.importorskip("scipy.io")
    base = tmp_path / "stanford_cars"
    os.makedirs(base / "devkit")
    os.makedirs(base / "cars_train")
    _png(base / "cars_train" / "00001.jpg".replace(".jpg", ".png"))
    os.rename(base / "cars_train" / "00001.png", base / "cars_train" / "00001.jpg")
    sio.savemat(
        base / "devkit" / "cars_train_annos.mat",
        {"annotations": np.asarray(
            [(np.uint8(1), np.uint8(1), np.uint8(1), np.uint8(1),
              np.uint8(3), "00001.jpg")],
            dtype=[("bbox_x1", "O"), ("bbox_y1", "O"), ("bbox_x2", "O"),
                   ("bbox_y2", "O"), ("class", "O"), ("fname", "O")],
        )},
    )
    sio.savemat(
        base / "devkit" / "cars_meta.mat",
        {"class_names": np.asarray(["A", "B", "C"], object)},
    )
    ds = datasets.StanfordCars(tmp_path, split="train")
    assert len(ds) == 1
    img, label = ds[0]
    assert label == 2 and ds.classes == ["A", "B", "C"]


def test_sbd_layout(tmp_path):
    sio = pytest.importorskip("scipy.io")
    _png(tmp_path / "img" / "2008_000002.jpg".replace(".jpg", ".png"))
    os.rename(tmp_path / "img" / "2008_000002.png",
              tmp_path / "img" / "2008_000002.jpg")
    os.makedirs(tmp_path / "cls")
    seg = np.random.RandomState(0).randint(0, 3, (8, 8)).astype(np.uint8)
    sio.savemat(
        tmp_path / "cls" / "2008_000002.mat",
        {"GTcls": {"Segmentation": seg, "Boundaries": np.zeros((20, 1), object)}},
    )
    with open(tmp_path / "train.txt", "w") as f:
        f.write("2008_000002\n")
    ds = datasets.SBDataset(tmp_path, image_set="train", mode="segmentation")
    img, target = ds[0]
    np.testing.assert_array_equal(target, seg)


def test_hmdb51_split_selection(tmp_path):
    from vision_tpu.datasets.video import HMDB51

    ann = tmp_path / "splits"
    os.makedirs(ann)
    with open(ann / "brush_hair_test_split1.txt", "w") as f:
        f.write("vid_a.avi 1\nvid_b.avi 2\nvid_c.avi 0\n")
    with open(ann / "brush_hair_test_split2.txt", "w") as f:
        f.write("vid_d.avi 1\n")
    train = HMDB51._select(str(ann), fold=1, tag=HMDB51.TRAIN_TAG)
    test = HMDB51._select(str(ann), fold=1, tag=HMDB51.TEST_TAG)
    assert train == {"vid_a.avi"} and test == {"vid_b.avi"}
    assert HMDB51._select(str(ann), fold=2, tag=1) == {"vid_d.avi"}
