"""references/optical_flow/{transforms,presets}.py: flow-aware
augmentation (counterpart of reference references/optical_flow/
transforms.py — flip flow sign rules, sparse scatter resize, dense
rescale, asymmetric jitter, preset composition)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

_DIR = os.path.join(
    os.path.dirname(__file__), "..", "references", "optical_flow"
)


def _load(name, register_as=None):
    spec = importlib.util.spec_from_file_location(
        f"oflow_{name}", os.path.join(_DIR, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    if register_as:
        sys.modules[register_as] = mod
    spec.loader.exec_module(mod)
    return mod


T = _load("transforms", register_as="transforms")
presets = _load("presets")


def _sample(h=40, w=48, seed=0):
    rng = np.random.RandomState(seed)
    img1 = rng.rand(h, w, 3).astype(np.float32)
    img2 = rng.rand(h, w, 3).astype(np.float32)
    flow = rng.randn(h, w, 2).astype(np.float32) * 3
    return img1, img2, flow


def test_horizontal_flip_negates_u():
    img1, img2, flow = _sample()
    t = T.RandomHorizontalFlip(p=1.0)
    o1, o2, of, ov = t(img1, img2, flow, None, np.random.RandomState(0))
    np.testing.assert_allclose(o1, img1[:, ::-1])
    np.testing.assert_allclose(of[..., 0], -flow[:, ::-1][..., 0])
    np.testing.assert_allclose(of[..., 1], flow[:, ::-1][..., 1])


def test_vertical_flip_negates_v():
    img1, img2, flow = _sample()
    t = T.RandomVerticalFlip(p=1.0)
    _, _, of, _ = t(img1, img2, flow, None, np.random.RandomState(0))
    np.testing.assert_allclose(of[..., 1], -flow[::-1][..., 1])
    np.testing.assert_allclose(of[..., 0], flow[::-1][..., 0])


def test_make_valid_flow_mask_threshold():
    img1, img2, flow = _sample()
    flow[3, 4, 0] = 2000.0
    _, _, _, valid = T.MakeValidFlowMask()(
        img1, img2, flow, None, np.random.RandomState(0)
    )
    assert valid.dtype == np.bool_ and not valid[3, 4] and valid[0, 0]


def test_resize_and_crop_dense_scales_flow():
    img1, img2, _ = _sample(h=60, w=60)
    flow = np.tile(
        np.asarray([2.0, -3.0], np.float32), (60, 60, 1)
    )  # constant field: resize preserves it, scaling is exact
    t = T.RandomResizeAndCrop((32, 32), min_scale=0.5, max_scale=0.5,
                              stretch_prob=0.0)
    t.resize_prob = 1.0  # force the resize branch
    o1, o2, of, _ = t(img1, img2, flow, None, np.random.RandomState(0))
    assert o1.shape == (32, 32, 3) and of.shape == (32, 32, 2)
    s = 2 ** 0.5
    np.testing.assert_allclose(
        of, np.tile([2.0 * s, -3.0 * s], (32, 32, 1)), rtol=1e-5
    )


def test_resize_sparse_flow_scatter():
    flow = np.zeros((10, 10, 2), np.float32)
    valid = np.zeros((10, 10), bool)
    flow[2, 3] = (1.0, -2.0)
    valid[2, 3] = True
    nf, nv = T.RandomResizeAndCrop._resize_sparse_flow(flow, valid, 2.0, 2.0)
    assert nf.shape == (20, 20, 2) and nv.sum() == 1
    assert nv[4, 6]
    np.testing.assert_allclose(nf[4, 6], [2.0, -4.0])


def test_asymmetric_jitter_shared_vs_independent():
    img1, img2, flow = _sample()
    img2 = img1.copy()  # identical frames
    t = T.AsymmetricColorJitter(brightness=0.5, contrast=0.5, p=0.0)
    o1, o2, _, _ = t(img1, img2, flow, None, np.random.RandomState(0))
    np.testing.assert_allclose(o1, o2)  # shared params -> identical out
    t = T.AsymmetricColorJitter(brightness=0.5, contrast=0.5, p=1.0)
    o1, o2, _, _ = t(img1, img2, flow, None, np.random.RandomState(1))
    assert np.abs(o1 - o2).max() > 1e-3  # independent params


def test_erasing_touches_img2_only():
    img1, img2, flow = _sample()
    t = T.RandomErasing(p=1.0, max_erase=2)
    o1, o2, _, _ = t(img1, img2, flow, None, np.random.RandomState(0))
    np.testing.assert_allclose(o1, img1)
    assert np.abs(o2 - img2).max() > 0


def test_train_preset_end_to_end():
    rng = np.random.RandomState(0)
    img1 = rng.randint(0, 256, (96, 128, 3)).astype(np.uint8)
    img2 = rng.randint(0, 256, (96, 128, 3)).astype(np.uint8)
    flow = rng.randn(96, 128, 2).astype(np.float32)
    p = presets.OpticalFlowPresetTrain(crop_size=(64, 64))
    o1, o2, of, ov = p(img1, img2, flow, None, np.random.RandomState(3))
    assert o1.shape == (64, 64, 3) and o1.dtype == np.float32
    assert of.shape == (64, 64, 2) and ov.shape == (64, 64)
    assert -1.01 <= o1.min() and o1.max() <= 1.01


def test_eval_preset_validates():
    img1, img2, flow = _sample()
    p = presets.OpticalFlowPresetEval()
    o1, o2, of, ov = p(img1, img2, flow, None)
    assert o1.min() >= -1.0 - 1e-6
    with pytest.raises(ValueError):
        p(img1, img2, flow[:10], None)
