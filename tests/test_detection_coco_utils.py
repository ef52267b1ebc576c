"""references/detection/coco_utils.py: clean-room RLE decode, polygon
rasterization, COCO target conversion and the GT-dict builder feeding
CocoEvaluator (reference references/detection/coco_utils.py)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "references", "detection")
)

from coco_utils import (  # noqa: E402
    ConvertCocoPolysToMask,
    convert_coco_poly_to_mask,
    convert_to_coco_api,
    decode_rle,
    get_coco,
)


def test_decode_uncompressed_rle():
    # column-major runs: 3 zeros, 4 ones, rest zeros in a 4x3 mask
    rle = {"size": [4, 3], "counts": [3, 4, 5]}
    m = decode_rle(rle)
    assert m.shape == (4, 3)
    flat = m.T.reshape(-1)  # back to Fortran order
    np.testing.assert_array_equal(flat, [0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 0])


def test_decode_compressed_rle_roundtrip():
    # encode a known runs list with the COCO varint scheme, decode back
    def encode(counts):
        s = []
        for i, x in enumerate(counts):
            if i > 2:
                x -= counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = not (
                    (x == 0 and not (c & 0x10))
                    or (x == -1 and (c & 0x10))
                )
                if more:
                    c |= 0x20
                s.append(chr(c + 48))
        return "".join(s)

    counts = [7, 5, 0, 12, 3, 9]
    rle = {"size": [6, 6], "counts": encode(counts)}
    m = decode_rle(rle)
    flat = m.T.reshape(-1)
    want = np.zeros(36, np.uint8)
    pos, val = 0, 0
    for run in counts:
        want[pos : pos + run] = val
        pos += run
        val = 1 - val
    np.testing.assert_array_equal(flat, want)


def test_polygon_mask_interior():
    seg = [[2.0, 2.0, 10.0, 2.0, 10.0, 8.0, 2.0, 8.0]]  # axis-aligned rect
    m = convert_coco_poly_to_mask([seg], 12, 14)
    assert m.shape == (1, 12, 14)
    assert m[0, 4, 5] == 1 and m[0, 0, 0] == 0
    assert m[0, 3:8, 3:10].all()


def _fake_coco_target():
    return {
        "image_id": 7,
        "annotations": [
            {
                "bbox": [2.0, 3.0, 5.0, 4.0],
                "category_id": 1,
                "area": 20.0,
                "iscrowd": 0,
                "segmentation": [[2, 3, 7, 3, 7, 7, 2, 7]],
            },
            {  # degenerate (zero width) -> dropped
                "bbox": [4.0, 4.0, 0.0, 3.0],
                "category_id": 2,
                "area": 0.0,
                "iscrowd": 0,
                "segmentation": [[4, 4, 4, 7]],
            },
            {  # crowd -> dropped
                "bbox": [0.0, 0.0, 10.0, 10.0],
                "category_id": 3,
                "area": 100.0,
                "iscrowd": 1,
                "segmentation": {"size": [16, 20], "counts": [100, 50, 170]},
            },
        ],
    }


def test_convert_coco_polys_to_mask_targets():
    img = np.zeros((16, 20, 3), np.uint8)
    _, t = ConvertCocoPolysToMask()(img, _fake_coco_target())
    np.testing.assert_allclose(t["boxes"], [[2, 3, 7, 7]])
    np.testing.assert_array_equal(t["labels"], [1])
    assert t["masks"].shape == (1, 16, 20)
    assert t["iscrowd"].tolist() == [0]
    assert t["area"].tolist() == [20.0]


def test_convert_to_coco_api_and_perfect_eval():
    class DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            t = {
                "image_id": i + 1,
                "boxes": np.asarray(
                    [[1.0, 1.0, 9.0, 9.0], [3.0, 4.0, 7.0, 12.0]], np.float32
                ),
                "labels": np.asarray([1, 2]),
            }
            return np.zeros((16, 16, 3), np.uint8), t

    sys.path_hook_nothing = None
    from coco_eval import CocoEvaluator

    gts = convert_to_coco_api(DS())
    assert set(gts) == {1, 2} and gts[1]["boxes"].shape == (2, 4)
    ev = CocoEvaluator(gts)
    for img_id, gt in gts.items():
        ev.update(
            {
                img_id: {
                    "boxes": gt["boxes"],
                    "scores": np.asarray([0.9, 0.8]),
                    "labels": gt["labels"],
                }
            }
        )
    res = ev.summarize()
    assert res["map"] == pytest.approx(1.0)


def test_get_coco_synthetic_tree(tmp_path):
    import PIL.Image

    root = tmp_path
    (root / "train2017").mkdir()
    (root / "annotations").mkdir()
    imgs, anns = [], []
    for i in range(3):
        name = f"{i:012d}.jpg"
        PIL.Image.fromarray(
            np.zeros((20, 24, 3), np.uint8)
        ).save(root / "train2017" / name)
        imgs.append(
            {"id": i + 1, "file_name": name, "height": 20, "width": 24}
        )
        if i != 1:  # image 2 has no annotations -> filtered from train
            anns.append(
                {
                    "id": 10 + i,
                    "image_id": i + 1,
                    "bbox": [2, 2, 8, 8],
                    "category_id": 1,
                    "area": 64.0,
                    "iscrowd": 0,
                    "segmentation": [[2, 2, 10, 2, 10, 10, 2, 10]],
                }
            )
    with open(root / "annotations" / "instances_train2017.json", "w") as f:
        json.dump(
            {
                "images": imgs,
                "annotations": anns,
                "categories": [{"id": 1, "name": "thing"}],
            },
            f,
        )
    ds = get_coco(str(root), "train", with_masks=True)
    assert len(ds) == 2  # empty image dropped
    img, t = ds[0]
    assert np.asarray(img).shape == (20, 24, 3)
    np.testing.assert_allclose(t["boxes"], [[2, 2, 10, 10]])
    assert t["masks"].shape == (1, 20, 24)
