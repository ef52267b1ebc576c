"""Visualization utils behavior (reference ``test/test_utils.py``)."""

import numpy as np
import pytest

from vision_tpu import utils


def test_make_grid_shape(rng):
    imgs = (rng.rand(6, 8, 8, 3) * 255).astype(np.uint8)
    grid = utils.make_grid(imgs, nrow=3, padding=2)
    assert grid.shape == (2 * 10 + 2, 3 * 10 + 2, 3)
    assert grid.dtype == np.float32


def test_make_grid_normalize(rng):
    imgs = rng.randn(2, 4, 4, 3).astype(np.float32)
    grid = utils.make_grid(imgs, normalize=True)
    assert grid.min() >= 0 and grid.max() <= 1


def test_save_image(tmp_path, rng):
    from vision_tpu.io.image import read_image

    imgs = (rng.rand(2, 8, 8, 3) * 255).astype(np.uint8)
    p = tmp_path / "grid.png"
    utils.save_image(imgs, p)
    out = read_image(p)
    assert out.ndim == 3 and out.shape[2] == 3


def test_draw_bounding_boxes(rng):
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    boxes = np.array([[4, 4, 20, 20], [10, 10, 30, 28]], np.float32)
    out = utils.draw_bounding_boxes(img, boxes, labels=["a", "b"])
    assert out.shape == img.shape
    assert not np.array_equal(out, img)


def test_draw_segmentation_masks(rng):
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    masks = np.zeros((2, 16, 16), bool)
    masks[0, :8] = True
    masks[1, 8:] = True
    out = utils.draw_segmentation_masks(img, masks, alpha=1.0)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)


def test_draw_keypoints(rng):
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    kps = np.array([[[5.0, 5.0], [20.0, 20.0]]])
    out = utils.draw_keypoints(img, kps, connectivity=[(0, 1)])
    assert out.shape == img.shape
    assert not np.array_equal(out, img)


def test_flow_to_image(rng):
    flow = rng.randn(10, 12, 2).astype(np.float32)
    out = utils.flow_to_image(flow)
    assert out.shape == (10, 12, 3)
    assert out.dtype == np.uint8
    batch = utils.flow_to_image(rng.randn(2, 5, 5, 2).astype(np.float32))
    assert batch.shape == (2, 5, 5, 3)


def test_api_usage_logger():
    seen = []
    utils.set_api_usage_logger(seen.append)

    def fake_api():
        utils._log_api_usage_once(fake_api)

    fake_api()
    fake_api()
    utils.set_api_usage_logger(None)
    assert len(seen) == 1
    assert "fake_api" in seen[0]
