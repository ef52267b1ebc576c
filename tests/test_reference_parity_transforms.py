"""v2 functional parity against the ACTUAL reference torchvision.

VERDICT r2 item 1's second half: beyond the model zoo, sweep the v2
functional surface (geometry / color / misc kernels) directly against
``torchvision.transforms.v2.functional`` imported from /root/reference
(via ``tests/_reference_import.py``), on plain tensors and on
BoundingBoxes/KeyPoints tv_tensors. This replaces transcription-trust for
the transform math with live-oracle parity, mirroring the reference's own
closed-form/PIL checks (``test/test_transforms_v2.py:502-672``).

Conventions: repo images are HWC jax arrays, the reference's are CHW torch
tensors; each case converts at the boundary. uint8 tolerances allow +/-1
count where the reference documents its uint8-native paths as within 1 of
the float path (``_geometry.py:270-281``); exact ops (flips, crops, pads,
LUT color ops) are compared exactly.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests._reference_import import load_reference
from vision_tpu import tv_tensors
from vision_tpu.transforms.v2 import functional as F


@pytest.fixture(scope="module")
def RF():
    tv = load_reference()
    import torchvision.transforms.v2.functional as _RF

    return _RF


def _img_u8(h=64, w=96, c=3, seed=0):
    rng = np.random.RandomState(seed)
    # structured gradient + noise: catches systematic rounding drift that
    # pure noise averages away
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = (yy[..., None] * 2 + xx[..., None] + np.arange(c) * 40) % 256
    noise = rng.randint(-40, 40, (h, w, c))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _to_torch(hwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(hwc.transpose(2, 0, 1)))


def _from_torch(chw: torch.Tensor) -> np.ndarray:
    arr = chw.detach().numpy()
    if arr.ndim == 3:
        return arr.transpose(1, 2, 0)
    return arr


def _assert_close(repo_out, ref_chw, u8_atol=0, f32_atol=1e-5):
    got = np.asarray(repo_out)
    want = _from_torch(ref_chw)
    assert got.shape == want.shape, (got.shape, want.shape)
    if want.dtype == np.uint8:
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= u8_atol, f"max u8 diff {diff.max()} > {u8_atol}"
    else:
        np.testing.assert_allclose(got, want, atol=f32_atol, rtol=0)


# --------------------------------------------------------------- images ---

# Each entry: id, repo_fn(img_jax), ref_fn(img_torch), u8_atol, f32_atol,
# dtypes to run.
def _image_cases(RF):
    IM = RF.InterpolationMode
    return [
        (
            "hflip",
            lambda x: F.horizontal_flip(x),
            lambda t: RF.horizontal_flip(t),
            0, 0,
        ),
        (
            "vflip",
            lambda x: F.vertical_flip(x),
            lambda t: RF.vertical_flip(t),
            0, 0,
        ),
        (
            "crop",
            lambda x: F.crop(x, 5, 7, 40, 50),
            lambda t: RF.crop(t, 5, 7, 40, 50),
            0, 0,
        ),
        (
            "crop_oob_pads",
            lambda x: F.crop(x, -4, -6, 40, 50),
            lambda t: RF.crop(t, -4, -6, 40, 50),
            0, 0,
        ),
        (
            "center_crop",
            lambda x: F.center_crop(x, (30, 31)),
            lambda t: RF.center_crop(t, (30, 31)),
            0, 0,
        ),
        (
            "center_crop_pad",
            lambda x: F.center_crop(x, (80, 120)),
            lambda t: RF.center_crop(t, (80, 120)),
            0, 0,
        ),
        (
            "pad_constant",
            lambda x: F.pad(x, [2, 3, 4, 5], fill=7),
            lambda t: RF.pad(t, [2, 3, 4, 5], fill=7),
            0, 0,
        ),
        (
            "pad_reflect",
            lambda x: F.pad(x, [2, 3, 4, 5], padding_mode="reflect"),
            lambda t: RF.pad(t, [2, 3, 4, 5], padding_mode="reflect"),
            0, 0,
        ),
        (
            "pad_symmetric",
            lambda x: F.pad(x, [2, 3, 4, 5], padding_mode="symmetric"),
            lambda t: RF.pad(t, [2, 3, 4, 5], padding_mode="symmetric"),
            0, 0,
        ),
        (
            "pad_edge",
            lambda x: F.pad(x, [2, 3, 4, 5], padding_mode="edge"),
            lambda t: RF.pad(t, [2, 3, 4, 5], padding_mode="edge"),
            0, 0,
        ),
        (
            "resize_bilinear_aa",
            lambda x: F.resize(x, (32, 48), antialias=True),
            lambda t: RF.resize(t, (32, 48), antialias=True),
            1, 1e-4,
        ),
        (
            "resize_bilinear_noaa",
            lambda x: F.resize(
                x, (32, 48), interpolation="bilinear", antialias=False
            ),
            lambda t: RF.resize(
                t, (32, 48), interpolation=IM.BILINEAR, antialias=False
            ),
            1, 1e-4,
        ),
        (
            "resize_nearest",
            lambda x: F.resize(
                x, (32, 48), interpolation="nearest", antialias=False
            ),
            lambda t: RF.resize(
                t, (32, 48), interpolation=IM.NEAREST, antialias=False
            ),
            0, 0,
        ),
        (
            "resize_bicubic_aa",
            lambda x: F.resize(
                x, (32, 48), interpolation="bicubic", antialias=True
            ),
            lambda t: RF.resize(
                t, (32, 48), interpolation=IM.BICUBIC, antialias=True
            ),
            # the reference's uint8-native bicubic path is itself ~2 counts
            # off its float path (test/test_transforms_v2.py resize checks)
            2, 1e-3,
        ),
        (
            "resize_upscale",
            lambda x: F.resize(x, (128, 192), antialias=True),
            lambda t: RF.resize(t, (128, 192), antialias=True),
            1, 1e-4,
        ),
        (
            "resized_crop",
            lambda x: F.resized_crop(x, 4, 6, 40, 60, (32, 48), antialias=True),
            lambda t: RF.resized_crop(
                t, 4, 6, 40, 60, (32, 48), antialias=True
            ),
            1, 1e-4,
        ),
        (
            "affine_bilinear",
            lambda x: F.affine(
                x, angle=23.0, translate=[5, -3], scale=1.2,
                shear=[10.0, 5.0], interpolation="bilinear",
            ),
            lambda t: RF.affine(
                t, angle=23.0, translate=[5, -3], scale=1.2,
                shear=[10.0, 5.0], interpolation=IM.BILINEAR,
            ),
            1, 1e-4,
        ),
        (
            "affine_nearest",
            lambda x: F.affine(
                x, angle=-17.0, translate=[-2, 4], scale=0.8, shear=[0.0, 0.0]
            ),
            lambda t: RF.affine(
                t, angle=-17.0, translate=[-2, 4], scale=0.8, shear=[0.0, 0.0]
            ),
            0, 0,
        ),
        (
            "rotate_bilinear",
            lambda x: F.rotate(x, 33.0, interpolation="bilinear"),
            lambda t: RF.rotate(t, 33.0, interpolation=IM.BILINEAR),
            1, 1e-4,
        ),
        (
            "rotate_expand",
            lambda x: F.rotate(x, 33.0, interpolation="bilinear", expand=True),
            lambda t: RF.rotate(t, 33.0, interpolation=IM.BILINEAR, expand=True),
            1, 1e-4,
        ),
        (
            "perspective",
            lambda x: F.perspective(
                x,
                [[0, 0], [95, 2], [93, 63], [2, 61]],
                [[3, 2], [92, 0], [95, 61], [0, 63]],
                interpolation="bilinear",
            ),
            lambda t: RF.perspective(
                t,
                [[0, 0], [95, 2], [93, 63], [2, 61]],
                [[3, 2], [92, 0], [95, 61], [0, 63]],
                interpolation=IM.BILINEAR,
            ),
            1, 1e-4,
        ),
        (
            "adjust_brightness",
            lambda x: F.adjust_brightness(x, 1.3),
            lambda t: RF.adjust_brightness(t, 1.3),
            1, 1e-5,
        ),
        (
            "adjust_contrast",
            lambda x: F.adjust_contrast(x, 0.7),
            lambda t: RF.adjust_contrast(t, 0.7),
            1, 1e-5,
        ),
        (
            "adjust_saturation",
            lambda x: F.adjust_saturation(x, 1.6),
            lambda t: RF.adjust_saturation(t, 1.6),
            1, 1e-5,
        ),
        (
            "adjust_hue",
            lambda x: F.adjust_hue(x, 0.12),
            lambda t: RF.adjust_hue(t, 0.12),
            2, 1e-4,
        ),
        (
            "adjust_gamma",
            lambda x: F.adjust_gamma(x, 1.4, gain=0.9),
            lambda t: RF.adjust_gamma(t, 1.4, gain=0.9),
            1, 1e-5,
        ),
        (
            "adjust_sharpness",
            lambda x: F.adjust_sharpness(x, 1.7),
            lambda t: RF.adjust_sharpness(t, 1.7),
            1, 1e-5,
        ),
        (
            "posterize",
            lambda x: F.posterize(x, 3),
            lambda t: RF.posterize(t, 3),
            0, 0,
        ),
        (
            "solarize",
            lambda x: F.solarize(x, 128),
            lambda t: RF.solarize(t, 128),
            0, 0,
        ),
        (
            "autocontrast",
            lambda x: F.autocontrast(x),
            lambda t: RF.autocontrast(t),
            1, 1e-5,
        ),
        (
            "equalize_u8",
            lambda x: F.equalize(x),
            lambda t: RF.equalize(t),
            0, None,  # u8-only op
        ),
        (
            "invert",
            lambda x: F.invert(x),
            lambda t: RF.invert(t),
            0, 0,
        ),
        (
            "rgb_to_grayscale",
            lambda x: F.rgb_to_grayscale(x, num_output_channels=1),
            lambda t: RF.rgb_to_grayscale(t, num_output_channels=1),
            1, 1e-5,
        ),
        (
            "grayscale_to_rgb",
            lambda x: F.grayscale_to_rgb(F.rgb_to_grayscale(x)),
            lambda t: RF.grayscale_to_rgb(RF.rgb_to_grayscale(t)),
            1, 1e-5,
        ),
        (
            "permute_channels",
            lambda x: F.permute_channels(x, [2, 0, 1]),
            lambda t: RF.permute_channels(t, [2, 0, 1]),
            0, 0,
        ),
        (
            "erase",
            lambda x: F.erase(
                x, 5, 7, 20, 30, jnp.zeros((1, 1, x.shape[-1]), x.dtype)
            ),
            lambda t: RF.erase(
                t, 5, 7, 20, 30, torch.zeros(t.shape[0], 1, 1, dtype=t.dtype)
            ),
            0, 0,
        ),
        (
            "gaussian_blur",
            lambda x: F.gaussian_blur(x, [5, 5], sigma=1.4),
            lambda t: RF.gaussian_blur(t, [5, 5], sigma=1.4),
            1, 1e-4,
        ),
        (
            "to_dtype_scale",
            lambda x: F.to_dtype(x, jnp.float32, scale=True),
            lambda t: RF.to_dtype(t, torch.float32, scale=True),
            None, 1e-6,  # u8 input -> f32 output; compared as float
        ),
    ]


def _case_ids(RF):
    return [c[0] for c in _image_cases(RF)]


@pytest.fixture(scope="module")
def image_cases(RF):
    return {c[0]: c for c in _image_cases(RF)}


CASE_NAMES = [
    "hflip", "vflip", "crop", "crop_oob_pads", "center_crop",
    "center_crop_pad", "pad_constant", "pad_reflect", "pad_symmetric",
    "pad_edge", "resize_bilinear_aa", "resize_bilinear_noaa",
    "resize_nearest", "resize_bicubic_aa", "resize_upscale", "resized_crop",
    "affine_bilinear", "affine_nearest", "rotate_bilinear", "rotate_expand",
    "perspective", "adjust_brightness", "adjust_contrast",
    "adjust_saturation", "adjust_hue", "adjust_gamma", "adjust_sharpness",
    "posterize", "solarize", "autocontrast", "equalize_u8", "invert",
    "rgb_to_grayscale", "grayscale_to_rgb", "permute_channels", "erase",
    "gaussian_blur", "to_dtype_scale",
]


@pytest.mark.parametrize("name", CASE_NAMES)
def test_image_functional_matches_reference_u8(name, image_cases):
    _, repo_fn, ref_fn, u8_atol, _ = image_cases[name]
    if u8_atol is None:
        pytest.skip("float-only comparison")
    img = _img_u8()
    out = repo_fn(jnp.asarray(img))
    want = ref_fn(_to_torch(img))
    if name == "to_dtype_scale":
        _assert_close(out, want, f32_atol=1e-6)
    else:
        _assert_close(out, want, u8_atol=u8_atol)


@pytest.mark.parametrize("name", CASE_NAMES)
def test_image_functional_matches_reference_f32(name, image_cases):
    _, repo_fn, ref_fn, _, f32_atol = image_cases[name]
    if f32_atol is None:
        pytest.skip("uint8-only op")
    if name in ("posterize", "to_dtype_scale"):
        pytest.skip("uint8-domain op" )
    img = _img_u8().astype(np.float32) / 255.0
    out = repo_fn(jnp.asarray(img))
    if name == "solarize":
        want = _from_torch(
            load_reference().transforms.v2.functional.solarize(
                _to_torch(img), 0.5
            )
        )
        got = np.asarray(F.solarize(jnp.asarray(img), 0.5))
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)
        return
    want = ref_fn(_to_torch(img))
    _assert_close(out, want, f32_atol=f32_atol)


def test_normalize_matches_reference(RF):
    img = _img_u8().astype(np.float32) / 255.0
    mean = [0.485, 0.456, 0.406]
    std = [0.229, 0.224, 0.225]
    out = F.normalize(jnp.asarray(img), mean=mean, std=std)
    want = RF.normalize(_to_torch(img), mean=mean, std=std)
    _assert_close(out, want, f32_atol=1e-6)


def test_five_crop_matches_reference(RF):
    img = _img_u8()
    outs = F.five_crop(jnp.asarray(img), (32, 40))
    wants = RF.five_crop(_to_torch(img), (32, 40))
    assert len(outs) == len(wants) == 5
    for o, w in zip(outs, wants):
        _assert_close(o, w, u8_atol=0)


def test_ten_crop_matches_reference(RF):
    img = _img_u8()
    outs = F.ten_crop(jnp.asarray(img), (32, 40))
    wants = RF.ten_crop(_to_torch(img), (32, 40))
    assert len(outs) == len(wants) == 10
    for o, w in zip(outs, wants):
        _assert_close(o, w, u8_atol=0)


# ------------------------------------------------------ bounding boxes ---


def _boxes(seed=0, n=7, canvas=(64, 96)):
    rng = np.random.RandomState(seed)
    h, w = canvas
    x1 = rng.uniform(0, w - 8, n)
    y1 = rng.uniform(0, h - 8, n)
    x2 = x1 + rng.uniform(2, w / 2, n)
    y2 = y1 + rng.uniform(2, h / 2, n)
    arr = np.stack([x1, y1, np.minimum(x2, w), np.minimum(y2, h)], 1)
    return arr.astype(np.float32)


def _ref_bb(tv, arr, canvas=(64, 96), fmt="XYXY"):
    return tv.tv_tensors.BoundingBoxes(
        torch.from_numpy(arr.copy()),
        format=fmt,
        canvas_size=canvas,
    )


def _repo_bb(arr, canvas=(64, 96), fmt="XYXY"):
    return tv_tensors.BoundingBoxes(arr.copy(), format=fmt, canvas_size=canvas)


BOX_CASES = [
    "hflip", "vflip", "resize", "crop", "center_crop", "pad", "affine",
    "rotate", "rotate_expand", "perspective",
]


@pytest.mark.parametrize("name", BOX_CASES)
def test_bounding_boxes_match_reference(name, RF):
    tv = load_reference()
    IM = RF.InterpolationMode
    arr = _boxes()
    bb, rbb = _repo_bb(arr), _ref_bb(tv, arr)
    if name == "hflip":
        out, want = F.horizontal_flip(bb), RF.horizontal_flip(rbb)
    elif name == "vflip":
        out, want = F.vertical_flip(bb), RF.vertical_flip(rbb)
    elif name == "resize":
        out = F.resize(bb, (32, 48))
        want = RF.resize(rbb, (32, 48))
    elif name == "crop":
        out = F.crop(bb, 5, 7, 40, 50)
        want = RF.crop(rbb, 5, 7, 40, 50)
    elif name == "center_crop":
        out = F.center_crop(bb, (30, 31))
        want = RF.center_crop(rbb, (30, 31))
    elif name == "pad":
        out = F.pad(bb, [2, 3, 4, 5])
        want = RF.pad(rbb, [2, 3, 4, 5])
    elif name == "affine":
        kw = dict(angle=23.0, translate=[5, -3], scale=1.2, shear=[10.0, 5.0])
        out = F.affine(bb, **kw)
        want = RF.affine(rbb, **kw)
    elif name == "rotate":
        out = F.rotate(bb, 33.0)
        want = RF.rotate(rbb, 33.0)
    elif name == "rotate_expand":
        out = F.rotate(bb, 33.0, expand=True)
        want = RF.rotate(rbb, 33.0, expand=True)
    elif name == "perspective":
        sp = [[0, 0], [95, 2], [93, 63], [2, 61]]
        ep = [[3, 2], [92, 0], [95, 61], [0, 63]]
        out = F.perspective(bb, sp, ep, interpolation=IM.BILINEAR)
        want = RF.perspective(rbb, sp, ep)
    got = np.asarray(out.data, dtype=np.float32)
    exp = want.as_subclass(torch.Tensor).numpy().astype(np.float32)
    np.testing.assert_allclose(got, exp, atol=1e-3, rtol=1e-5)
    assert tuple(out.canvas_size) == tuple(want.canvas_size)


def test_convert_bounding_box_format_matches_reference(RF):
    tv = load_reference()
    arr = _boxes()
    for dst in ("XYWH", "CXCYWH"):
        out = F.convert_bounding_box_format(
            _repo_bb(arr), new_format=dst
        )
        want = RF.convert_bounding_box_format(
            _ref_bb(tv, arr),
            new_format=tv.tv_tensors.BoundingBoxFormat[dst],
        )
        np.testing.assert_allclose(
            np.asarray(out.data),
            want.as_subclass(torch.Tensor).numpy(),
            atol=1e-4,
        )


def test_clamp_bounding_boxes_matches_reference(RF):
    tv = load_reference()
    arr = _boxes() * 1.4 - 10.0  # push some boxes out of canvas
    out = F.clamp_bounding_boxes(_repo_bb(arr))
    want = RF.clamp_bounding_boxes(_ref_bb(tv, arr))
    np.testing.assert_allclose(
        np.asarray(out.data),
        want.as_subclass(torch.Tensor).numpy(),
        atol=1e-4,
    )


# ------------------------------------------------------------ keypoints ---


def _kps(seed=1, n=9, canvas=(64, 96)):
    rng = np.random.RandomState(seed)
    h, w = canvas
    return np.stack(
        [rng.uniform(0, w, n), rng.uniform(0, h, n)], 1
    ).astype(np.float32)


KP_CASES = [
    "hflip", "resize", "crop", "pad", "affine", "rotate_expand", "perspective",
]


@pytest.mark.parametrize("name", KP_CASES)
def test_keypoints_match_reference(name, RF):
    tv = load_reference()
    if not hasattr(tv.tv_tensors, "KeyPoints"):
        pytest.skip("reference build has no KeyPoints")
    arr = _kps()
    kp = tv_tensors.KeyPoints(arr.copy(), canvas_size=(64, 96))
    rkp = tv.tv_tensors.KeyPoints(
        torch.from_numpy(arr.copy()), canvas_size=(64, 96)
    )
    if name == "hflip":
        out, want = F.horizontal_flip(kp), RF.horizontal_flip(rkp)
    elif name == "resize":
        out, want = F.resize(kp, (32, 48)), RF.resize(rkp, (32, 48))
    elif name == "crop":
        out = F.crop(kp, 5, 7, 40, 50)
        want = RF.crop(rkp, 5, 7, 40, 50)
    elif name == "pad":
        out, want = F.pad(kp, [2, 3, 4, 5]), RF.pad(rkp, [2, 3, 4, 5])
    elif name == "affine":
        kw = dict(angle=23.0, translate=[5, -3], scale=1.2, shear=[10.0, 5.0])
        out, want = F.affine(kp, **kw), RF.affine(rkp, **kw)
    elif name == "rotate_expand":
        out = F.rotate(kp, 33.0, expand=True)
        want = RF.rotate(rkp, 33.0, expand=True)
    elif name == "perspective":
        sp = [[0, 0], [95, 2], [93, 63], [2, 61]]
        ep = [[3, 2], [92, 0], [95, 61], [0, 63]]
        out = F.perspective(kp, sp, ep)
        want = RF.perspective(rkp, sp, ep)
    np.testing.assert_allclose(
        np.asarray(out.data),
        want.as_subclass(torch.Tensor).numpy(),
        atol=1e-3,
        rtol=1e-5,
    )


# ----------------------------------------------------------------- masks ---


def test_mask_kernels_match_reference(RF):
    tv = load_reference()
    rng = np.random.RandomState(0)
    m = (rng.rand(64, 96) > 0.5).astype(np.uint8)
    mk = tv_tensors.Mask(m.copy())
    rmk = tv.tv_tensors.Mask(torch.from_numpy(m.copy()))
    pairs = [
        (F.horizontal_flip(mk), RF.horizontal_flip(rmk)),
        (F.resize(mk, (32, 48)), RF.resize(rmk, (32, 48))),
        (F.crop(mk, 5, 7, 40, 50), RF.crop(rmk, 5, 7, 40, 50)),
        (F.pad(mk, [2, 3, 4, 5]), RF.pad(rmk, [2, 3, 4, 5])),
    ]
    for out, want in pairs:
        np.testing.assert_array_equal(
            np.asarray(out.data), want.as_subclass(torch.Tensor).numpy()
        )


# ---------------------------------------------------- sweep tail (r3 #9) ---


def test_elastic_matches_reference(RF):
    """elastic with a FIXED displacement grid (reference
    ``_geometry.py:elastic_image``): both sides get the same [1,H,W,2]
    normalized displacement, so the warp is deterministic."""
    img = _img_u8()
    h, w = img.shape[:2]
    rng = np.random.RandomState(3)
    disp = (rng.rand(1, h, w, 2).astype(np.float32) - 0.5) * 0.12
    out = F.elastic(jnp.asarray(img), jnp.asarray(disp))
    want = RF.elastic(_to_torch(img), torch.from_numpy(disp))
    # bilinear resample of a warped grid: allow small u8 rounding skew
    got = np.asarray(out).astype(np.int32)
    ref = _from_torch(want).astype(np.int32)
    assert got.shape == ref.shape
    diff = np.abs(got - ref)
    assert np.mean(diff) < 1.0 and np.percentile(diff, 99) <= 2, (
        np.mean(diff), np.percentile(diff, 99)
    )
    # float path: tighter
    imgf = img.astype(np.float32) / 255.0
    outf = F.elastic(jnp.asarray(imgf), jnp.asarray(disp))
    wantf = RF.elastic(_to_torch(imgf), torch.from_numpy(disp))
    np.testing.assert_allclose(
        np.asarray(outf), _from_torch(wantf), atol=2e-5, rtol=0
    )


def test_elastic_boxes_match_reference(RF):
    tv = load_reference()
    h, w = 64, 96
    rng = np.random.RandomState(4)
    disp = (rng.rand(1, h, w, 2).astype(np.float32) - 0.5) * 0.1
    arr = _boxes(seed=5)
    out = F.elastic(_repo_bb(arr), jnp.asarray(disp))
    want = RF.elastic(_ref_bb(tv, arr), torch.from_numpy(disp))
    np.testing.assert_allclose(
        np.asarray(out.data),
        want.as_subclass(torch.Tensor).numpy(),
        atol=1.0,  # both sides truncate the displacement lookup per corner
        rtol=0.02,
    )


def test_gaussian_noise_matches_reference_semantics(RF):
    """gaussian_noise draws from different RNGs (torch vs JAX), so parity
    is on the CONTRACT (reference ``_misc.py:gaussian_noise_image``):
    float -> clip(x + mean + sigma*N, 0, 1); uint8 -> x + int16(255*(mean
    + sigma*N)) clamped to [0,255]; other dtypes raise; negative sigma
    raises. Statistics must match the parameters on BOTH sides."""
    import jax

    key = jax.random.PRNGKey(0)
    img = np.full((64, 96, 3), 0.5, np.float32)
    t = _to_torch(img)
    # both sides reject non-(uint8|float) dtypes and negative sigma
    with pytest.raises((TypeError, ValueError, RuntimeError)):
        RF.gaussian_noise(torch.zeros(3, 8, 8, dtype=torch.int32))
    with pytest.raises((TypeError, ValueError)):
        F.gaussian_noise(jnp.zeros((8, 8, 3), jnp.int32), key=key)
    with pytest.raises(ValueError):
        RF.gaussian_noise(t, sigma=-1.0)
    with pytest.raises(ValueError):
        F.gaussian_noise(jnp.asarray(img), sigma=-1.0, key=key)
    # float path, unclipped: noise stats match (mean, sigma)
    torch.manual_seed(0)
    want = _from_torch(RF.gaussian_noise(t, mean=0.1, sigma=0.2, clip=False))
    out = np.asarray(
        F.gaussian_noise(jnp.asarray(img), mean=0.1, sigma=0.2, clip=False, key=key)
    )
    for a in (out, want):
        noise = a - img
        assert abs(np.mean(noise) - 0.1) < 0.01
        assert abs(np.std(noise) - 0.2) < 0.01
    # float path, clipped
    out = np.asarray(
        F.gaussian_noise(jnp.asarray(img), mean=0.1, sigma=0.2, clip=True, key=key)
    )
    assert out.min() >= 0.0 and out.max() <= 1.0
    # uint8 path (reference _misc.py:208-216): int16 noise at 255 scale
    img_u8 = np.full((64, 96, 3), 128, np.uint8)
    torch.manual_seed(0)
    want_u8 = _from_torch(
        RF.gaussian_noise(_to_torch(img_u8), mean=0.0, sigma=0.1, clip=True)
    )
    out_u8 = np.asarray(
        F.gaussian_noise(jnp.asarray(img_u8), mean=0.0, sigma=0.1, clip=True, key=key)
    )
    assert out_u8.dtype == np.uint8 == want_u8.dtype
    for a in (out_u8, want_u8):
        noise = a.astype(np.int32) - 128
        assert abs(np.mean(noise)) < 2.0
        assert abs(np.std(noise) - 25.5) < 2.0  # sigma*255, int16-truncated


def test_jpeg_roundtrip_close_to_reference(RF):
    """F.jpeg encode+decode. The reference's own codec needs its native
    extension (unavailable here), so the oracle is PIL's libjpeg
    round-trip at the same quality — the exact backend the reference
    links against (``csrc/io/image/cpu/encode_jpeg.cpp``)."""
    import io as _io

    import PIL.Image

    img = _img_u8()
    for quality in (35, 80):
        out = np.asarray(F.jpeg(jnp.asarray(img), quality=quality))
        buf = _io.BytesIO()
        PIL.Image.fromarray(img).save(buf, "JPEG", quality=quality)
        want = np.asarray(PIL.Image.open(_io.BytesIO(buf.getvalue())))
        assert out.shape == want.shape and out.dtype == np.uint8
        diff = np.abs(out.astype(np.int32) - want.astype(np.int32))
        # both are q-quality libjpeg reconstructions of the same source
        assert np.mean(diff) < 2.0, np.mean(diff)
        assert np.percentile(diff, 99) <= 12, np.percentile(diff, 99)


def test_sanitize_bounding_boxes_matches_reference(RF):
    """Ours returns (boxes, valid_mask) with static shapes; the reference
    removes rows (``_misc.py:sanitize_bounding_boxes``). Parity: the
    reference's surviving set == our mask's True rows, over degenerate /
    out-of-canvas / small-area fixtures."""
    tv = load_reference()
    canvas = (64, 96)
    arr = np.array(
        [
            [10, 10, 30, 30],      # good
            [5, 5, 5, 25],         # zero width
            [40, 40, 39, 50],      # inverted x
            [200, 10, 220, 30],    # fully right of canvas
            [-30, -30, -10, -10],  # fully outside top-left
            [0, 0, 1.2, 1.2],      # tiny area
            [90, 60, 120, 80],     # partially inside
        ],
        np.float32,
    )
    ref_boxes = tv.tv_tensors.BoundingBoxes(
        torch.from_numpy(arr.copy()), format="XYXY", canvas_size=canvas
    )
    ref_out = RF.sanitize_bounding_boxes(ref_boxes, min_size=2.0, min_area=4.0)
    ref_kept = ref_out[0].as_subclass(torch.Tensor).numpy()
    _, valid = F.sanitize_bounding_boxes(
        _repo_bb(arr, canvas=canvas), min_size=2.0, min_area=4.0
    )
    ours_kept = arr[np.asarray(valid)]
    np.testing.assert_allclose(ours_kept, ref_kept, atol=1e-5)
    # pure-tensor input path (format/canvas_size kwargs)
    _, valid2 = F.sanitize_bounding_boxes(
        jnp.asarray(arr), format="XYXY", canvas_size=canvas,
        min_size=2.0, min_area=4.0,
    )
    np.testing.assert_array_equal(np.asarray(valid2), np.asarray(valid))
