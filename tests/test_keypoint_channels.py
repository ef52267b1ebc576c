"""Keypoint visibility-channel pass-through + chiral hflip (advisor r2
medium findings): geometry kernels must leave channels beyond (x, y)
untouched, and RandomHorizontalFlip with ``keypoint_flip_indices`` must
swap left/right joints (reference ``references/detection/transforms.py``
``_flip_coco_person_keypoints``)."""

import jax
import numpy as np

from vision_tpu import tv_tensors
from vision_tpu.transforms import v2 as T
from vision_tpu.transforms.v2 import functional as F

FLIP17 = (0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15)


def _kp3(n=2, k=17, seed=0, h=100, w=120):
    r = np.random.RandomState(seed)
    xy = r.uniform(0, [w - 1, h - 1], (n, k, 2)).astype(np.float32)
    vis = r.randint(0, 3, (n, k, 1)).astype(np.float32)
    return tv_tensors.KeyPoints(
        np.concatenate([xy, vis], -1), canvas_size=(h, w)
    )


def test_hflip_swaps_chiral_joints_and_visibility():
    kp = _kp3()
    t = T.RandomHorizontalFlip(p=1.0, keypoint_flip_indices=FLIP17)
    out = t(kp, key=jax.random.PRNGKey(0))
    src = np.asarray(kp.data)
    got = np.asarray(out.data)
    w = kp.canvas_size[1]
    # joint j of the output is mirrored joint FLIP17[j] of the input;
    # visibility travels with its joint
    for j, src_j in enumerate(FLIP17):
        np.testing.assert_allclose(got[:, j, 0], w - 1 - src[:, src_j, 0])
        np.testing.assert_allclose(got[:, j, 1], src[:, src_j, 1])
        np.testing.assert_allclose(got[:, j, 2], src[:, src_j, 2])


def test_hflip_without_map_keeps_rows():
    kp = _kp3()
    out = T.RandomHorizontalFlip(p=1.0)(kp, key=jax.random.PRNGKey(0))
    src, got = np.asarray(kp.data), np.asarray(out.data)
    np.testing.assert_allclose(got[..., 1:], src[..., 1:])
    np.testing.assert_allclose(got[..., 0], kp.canvas_size[1] - 1 - src[..., 0])


def test_geometry_kernels_pass_visibility_through():
    kp = _kp3()
    vis = np.asarray(kp.data)[..., 2]
    resized = F.resize(kp, (50, 60))
    np.testing.assert_allclose(np.asarray(resized.data)[..., 2], vis)
    cropped = F.crop(kp, 10, 5, 80, 100)
    np.testing.assert_allclose(np.asarray(cropped.data)[..., 2], vis)
    padded = F.pad(kp, [4, 6])
    np.testing.assert_allclose(np.asarray(padded.data)[..., 2], vis)
    flipped = F.vertical_flip(kp)
    np.testing.assert_allclose(np.asarray(flipped.data)[..., 2], vis)
    rotated = F.rotate(kp, 30.0)
    np.testing.assert_allclose(np.asarray(rotated.data)[..., 2], vis)
    aff = F.affine(kp, 10.0, [2.0, -3.0], 1.1, [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(aff.data)[..., 2], vis)


def test_sanitize_filters_keypoint_rows_with_visibility():
    h, w = 64, 64
    boxes = tv_tensors.BoundingBoxes(
        np.array(
            [[5.0, 5.0, 30.0, 30.0], [10.0, 10.0, 10.5, 10.5]],
            np.float32,
        ),
        format="XYXY", canvas_size=(h, w),
    )  # second box is degenerate -> dropped
    kp = _kp3(n=2, h=h, w=w)
    labels = np.array([1, 2], np.int64)
    sample = {"boxes": boxes, "labels": labels, "keypoints": kp}
    out = T.SanitizeBoundingBoxes()(sample)
    assert out["boxes"].data.shape[0] == 1
    assert out["labels"].shape[0] == 1
    assert out["keypoints"].data.shape == (1, 17, 3)
    np.testing.assert_allclose(
        np.asarray(out["keypoints"].data), np.asarray(kp.data)[:1]
    )
