"""Functional transform parity tests.

Color/geometry kernels vs torch oracles where torch core provides the math
(grid_sample, conv), and vs closed-form/property checks otherwise — the
reference's own strategy (``test/test_transforms_v2.py`` checks vs PIL and
closed-form affine references)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from vision_tpu import tv_tensors
from vision_tpu.transforms.v2 import functional as F
from vision_tpu.transforms.v2.functional._geometry import (
    _get_inverse_affine_matrix,
)


# ------------------------------------------------------------ resize ----
def test_resize_shorter_edge_semantics(rng):
    img = rng.rand(100, 150, 3).astype(np.float32)
    out = F.resize(jnp.asarray(img), 50)
    assert out.shape == (50, 75, 3)
    out = F.resize(jnp.asarray(img), 50, max_size=60)
    assert out.shape == (40, 60, 3)
    out = F.resize(jnp.asarray(img), (64, 32))
    assert out.shape == (64, 32, 3)


def test_resize_bounding_boxes_scales():
    bb = tv_tensors.BoundingBoxes(
        np.array([[10.0, 20.0, 30.0, 40.0]], np.float32),
        format="XYXY",
        canvas_size=(100, 200),
    )
    out = F.resize(bb, (50, 100))
    np.testing.assert_allclose(np.asarray(out.data), [[5, 10, 15, 20]])
    assert out.canvas_size == (50, 100)


def test_resize_mask_nearest():
    m = tv_tensors.Mask(np.arange(16).reshape(4, 4).astype(np.int32))
    out = F.resize(m, (2, 2))
    assert out.shape == (2, 2)
    assert out.dtype == jnp.int32


# ------------------------------------------------------------- flips ----
def test_horizontal_flip_box_formats():
    canvas = (10, 20)
    bb = tv_tensors.BoundingBoxes(
        np.array([[2.0, 3.0, 8.0, 7.0]], np.float32), format="XYXY", canvas_size=canvas
    )
    out = F.horizontal_flip(bb)
    np.testing.assert_allclose(np.asarray(out.data), [[12, 3, 18, 7]])
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 2, 2, 3))
    np.testing.assert_allclose(
        np.asarray(F.horizontal_flip(img)), np.asarray(img)[:, :, ::-1]
    )


def test_flip_roundtrip_types():
    kp = tv_tensors.KeyPoints(
        np.array([[1.0, 2.0], [5.0, 7.0]], np.float32), canvas_size=(10, 20)
    )
    out = F.horizontal_flip(F.horizontal_flip(kp))
    np.testing.assert_allclose(np.asarray(out.data), np.asarray(kp.data))


# ------------------------------------------------------------ crop/pad ----
def test_crop_zero_pads_out_of_bounds(rng):
    img = jnp.asarray(rng.rand(10, 10, 3).astype(np.float32))
    out = F.crop(img, -2, -2, 6, 6)
    assert out.shape == (6, 6, 3)
    np.testing.assert_allclose(np.asarray(out)[:2, :, :], 0)
    np.testing.assert_allclose(np.asarray(out)[2:, 2:], np.asarray(img)[:4, :4])


def test_center_crop_matches_torch_semantics(rng):
    img = rng.rand(10, 11, 3).astype(np.float32)
    out = np.asarray(F.center_crop(jnp.asarray(img), (4, 5)))
    top, left = int(round((10 - 4) / 2)), int(round((11 - 5) / 2))
    np.testing.assert_allclose(out, img[top : top + 4, left : left + 5])


def test_pad_modes(rng):
    img = rng.rand(4, 4, 1).astype(np.float32)
    out = F.pad(jnp.asarray(img), [1, 2], fill=7.0)
    assert out.shape == (8, 6, 1)
    assert float(out[0, 0, 0]) == 7.0
    refl = F.pad(jnp.asarray(img), [1, 1], padding_mode="reflect")
    np.testing.assert_allclose(np.asarray(refl)[0, 1:-1, 0], img[1, :, 0])


def test_pad_boxes_shift():
    bb = tv_tensors.BoundingBoxes(
        np.array([[1.0, 1.0, 3.0, 3.0]], np.float32), format="XYXY", canvas_size=(5, 5)
    )
    out = F.pad(bb, [2, 3])  # left=2, top=3
    np.testing.assert_allclose(np.asarray(out.data), [[3, 4, 5, 6]])
    assert out.canvas_size == (11, 9)


# ------------------------------------------------------------ affine ----
def _torch_affine_oracle(img_hwc, matrix, oh, ow, mode):
    """Replicates torchvision _gen_affine_grid + grid_sample exactly."""
    img = torch.from_numpy(img_hwc).permute(2, 0, 1)[None].float()
    theta = torch.tensor(
        [[matrix[0], matrix[1], matrix[2]], [matrix[3], matrix[4], matrix[5]]]
    ).float()[None]
    h, w = img.shape[-2:]
    d = 0.5
    base_grid = torch.empty(1, oh, ow, 3)
    x_grid = torch.linspace(-ow * 0.5 + d, ow * 0.5 + d - 1, steps=ow)
    base_grid[..., 0].copy_(x_grid)
    y_grid = torch.linspace(-oh * 0.5 + d, oh * 0.5 + d - 1, steps=oh).unsqueeze_(-1)
    base_grid[..., 1].copy_(y_grid)
    base_grid[..., 2].fill_(1)
    rescaled_theta = theta.transpose(1, 2) / torch.tensor([0.5 * w, 0.5 * h])
    grid = base_grid.view(1, oh * ow, 3).bmm(rescaled_theta).view(1, oh, ow, 2)
    out = TF.grid_sample(img, grid, mode=mode, padding_mode="zeros", align_corners=False)
    return out[0].permute(1, 2, 0).numpy()


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize(
    "angle,translate,scale,shear",
    [
        (30.0, [0.0, 0.0], 1.0, [0.0, 0.0]),
        (0.0, [3.0, -2.0], 1.0, [0.0, 0.0]),
        (0.0, [0.0, 0.0], 0.7, [0.0, 0.0]),
        (15.0, [1.0, 2.0], 1.3, [10.0, 5.0]),
    ],
)
def test_affine_image_matches_torch_grid_sample(rng, mode, angle, translate, scale, shear):
    img = rng.rand(20, 24, 3).astype(np.float32)
    h, w = img.shape[:2]
    matrix = _get_inverse_affine_matrix([0.0, 0.0], angle, translate, scale, shear)
    ref = _torch_affine_oracle(img, matrix, h, w, mode)
    out = np.asarray(
        F.affine_image(jnp.asarray(img), angle, translate, scale, shear, mode)
    )
    atol = 1e-4 if mode == "bilinear" else 1e-6
    # nearest can differ at exact .5 boundaries; allow tiny mismatch count
    if mode == "nearest":
        mismatch = np.abs(out - ref) > 1e-5
        assert mismatch.mean() < 0.01
    else:
        np.testing.assert_allclose(out, ref, atol=atol)


def test_affine_image_fill(rng):
    img = rng.rand(10, 10, 3).astype(np.float32)
    out = np.asarray(
        F.affine_image(
            jnp.asarray(img), 0.0, [20.0, 0.0], 1.0, [0.0, 0.0], "bilinear",
            fill=[0.5, 0.6, 0.7],
        )
    )
    # fully translated out of frame: everything is fill
    np.testing.assert_allclose(out[:, :5], np.array([0.5, 0.6, 0.7]) * np.ones((10, 5, 3)), atol=1e-5)


def test_affine_boxes_translation():
    bb = tv_tensors.BoundingBoxes(
        np.array([[2.0, 3.0, 6.0, 8.0]], np.float32), format="XYXY", canvas_size=(20, 20)
    )
    out = F.affine(bb, 0.0, [2.0, 1.0], 1.0, [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(out.data), [[4, 4, 8, 9]], atol=1e-4)


def test_affine_boxes_rotation_90():
    # affine() angle is CLOCKWISE (torchvision docstring); the top-left box
    # moves to the top-right corner
    bb = tv_tensors.BoundingBoxes(
        np.array([[0.0, 0.0, 4.0, 4.0]], np.float32), format="XYXY", canvas_size=(10, 10)
    )
    out = F.affine(bb, 90.0, [0.0, 0.0], 1.0, [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(out.data), [[6, 0, 10, 4]], atol=1e-4)


def test_affine_image_boxes_consistent(rng):
    """The transformed box must cover the transformed content — the core
    v2 contract (geometry applied consistently across leaf types)."""
    img = np.zeros((20, 20, 1), np.float32)
    img[2:6, 3:8] = 1.0
    bb = tv_tensors.BoundingBoxes(
        np.array([[3.0, 2.0, 8.0, 6.0]], np.float32), format="XYXY", canvas_size=(20, 20)
    )
    for angle in [30.0, -45.0, 90.0]:
        im_out = np.asarray(
            F.affine_image(jnp.asarray(img), angle, [1.0, -2.0], 1.1, [0.0, 0.0], "bilinear")
        )
        bb_out = np.asarray(
            F.affine(bb, angle, [1.0, -2.0], 1.1, [0.0, 0.0]).data
        )[0]
        ys, xs, _ = np.nonzero(im_out > 0.5)
        assert xs.min() >= bb_out[0] - 1.5 and xs.max() <= bb_out[2] + 1.5
        assert ys.min() >= bb_out[1] - 1.5 and ys.max() <= bb_out[3] + 1.5


def test_rotate_expand_size(rng):
    img = rng.rand(10, 20, 3).astype(np.float32)
    out = F.rotate_image(jnp.asarray(img), 90.0, expand=True)
    assert out.shape == (20, 10, 3)
    # rotate -90 of rotate 90 with expand returns original content
    back = F.rotate_image(out, -90.0, expand=True)
    np.testing.assert_allclose(np.asarray(back), img, atol=1e-4)


def test_rotate_keypoints_90():
    kp = tv_tensors.KeyPoints(np.array([[2.0, 3.0]], np.float32), canvas_size=(10, 10))
    out = F.rotate(kp, 90.0)
    # 90deg CCW about center (5,5): (x,y) -> (y, 10 - x)
    np.testing.assert_allclose(np.asarray(out.data), [[3.0, 8.0]], atol=1e-4)


# -------------------------------------------------------- perspective ----
def test_perspective_identity(rng):
    img = rng.rand(12, 12, 3).astype(np.float32)
    pts = [[0, 0], [11, 0], [11, 11], [0, 11]]
    out = np.asarray(F.perspective_image(jnp.asarray(img), pts, pts))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_perspective_boxes_identity():
    bb = tv_tensors.BoundingBoxes(
        np.array([[1.0, 2.0, 5.0, 6.0]], np.float32), format="XYXY", canvas_size=(12, 12)
    )
    pts = [[0, 0], [11, 0], [11, 11], [0, 11]]
    out = F.perspective(bb, pts, pts)
    np.testing.assert_allclose(np.asarray(out.data), [[1, 2, 5, 6]], atol=1e-3)


# ------------------------------------------------------------ elastic ----
def test_elastic_zero_displacement_identity(rng):
    img = rng.rand(8, 8, 3).astype(np.float32)
    disp = np.zeros((1, 8, 8, 2), np.float32)
    out = np.asarray(F.elastic_image(jnp.asarray(img), jnp.asarray(disp)))
    np.testing.assert_allclose(out, img, atol=1e-5)


# -------------------------------------------------------------- color ----
def _to_torch(img):
    return torch.from_numpy(img).permute(2, 0, 1)[None]


def _from_torch(t):
    return t[0].permute(1, 2, 0).numpy()


@pytest.mark.parametrize("dtype", ["float32", "uint8"])
def test_rgb_to_grayscale_matches_torch(rng, dtype):
    img = (rng.rand(8, 8, 3) * (255 if dtype == "uint8" else 1)).astype(dtype)
    # torch rgb_to_grayscale formula with truncation
    f = img.astype(np.float64)
    l = 0.2989 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    ref = l.astype(dtype)
    out = np.asarray(F.rgb_to_grayscale(jnp.asarray(img)))[..., 0]
    if dtype == "uint8":
        assert (np.abs(out.astype(int) - ref.astype(int)) <= 1).all()
    else:
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_adjust_brightness_uint8(rng):
    img = (rng.rand(6, 6, 3) * 255).astype(np.uint8)
    out = np.asarray(F.adjust_brightness(jnp.asarray(img), 1.5))
    ref = np.clip(img.astype(np.float32) * 1.5, 0, 255).astype(np.uint8)
    assert (np.abs(out.astype(int) - ref.astype(int)) <= 1).all()


def test_adjust_hue_roundtrip(rng):
    img = (rng.rand(8, 8, 3)).astype(np.float32)
    out = np.asarray(F.adjust_hue(jnp.asarray(img), 0.0))
    np.testing.assert_allclose(out, img, atol=1e-4)
    # shifting by 0.5 twice returns original
    twice = F.adjust_hue(F.adjust_hue(jnp.asarray(img), 0.5), 0.5)
    np.testing.assert_allclose(np.asarray(twice), img, atol=1e-3)


def test_invert_solarize_posterize(rng):
    img = (rng.rand(4, 4, 3) * 255).astype(np.uint8)
    inv = np.asarray(F.invert(jnp.asarray(img)))
    np.testing.assert_array_equal(inv, 255 - img)
    sol = np.asarray(F.solarize(jnp.asarray(img), 128))
    ref = np.where(img >= 128, 255 - img, img)
    np.testing.assert_array_equal(sol, ref)
    post = np.asarray(F.posterize(jnp.asarray(img), 2))
    np.testing.assert_array_equal(post, img & 0xC0)


def test_autocontrast_range(rng):
    img = (rng.rand(8, 8, 3) * 100 + 50).astype(np.uint8)
    out = np.asarray(F.autocontrast(jnp.asarray(img)))
    assert out.min() == 0
    assert out.max() == 255


def test_equalize_uniformizes(rng):
    img = (rng.rand(32, 32, 1) * 64).astype(np.uint8)  # compressed range
    out = np.asarray(F.equalize(jnp.asarray(img)))
    assert out.max() > 200  # spread to full range


def test_equalize_matches_torch_algorithm(rng):
    """Transcribe torch _scale_channel and compare exactly."""
    img = (rng.rand(16, 16) * 256).astype(np.uint8)

    def torch_scale_channel(chan):
        hist = torch.histc(torch.from_numpy(chan).float(), bins=256, min=0, max=255)
        nonzero_hist = hist[hist != 0]
        step = torch.div(nonzero_hist[:-1].sum(), 255, rounding_mode="floor")
        if step == 0:
            return chan
        lut = torch.div(
            torch.cumsum(hist, 0) + torch.div(step, 2, rounding_mode="floor"),
            step,
            rounding_mode="floor",
        )
        lut = torch.nn.functional.pad(lut, [1, 0])[:-1].clamp(0, 255)
        return lut[torch.from_numpy(chan).long()].numpy().astype(np.uint8)

    ref = torch_scale_channel(img)
    out = np.asarray(F.equalize(jnp.asarray(img[..., None])))[..., 0]
    np.testing.assert_array_equal(out, ref)


def test_adjust_sharpness_border_preserved(rng):
    img = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
    out = np.asarray(F.adjust_sharpness(jnp.asarray(img), 0.0))  # fully blurred
    np.testing.assert_array_equal(out[0, :], img[0, :])  # border untouched
    assert not np.array_equal(out[2:-2, 2:-2], img[2:-2, 2:-2])


# --------------------------------------------------------------- misc ----
def test_normalize(rng):
    img = rng.rand(4, 4, 3).astype(np.float32)
    out = np.asarray(F.normalize(jnp.asarray(img), [0.5, 0.5, 0.5], [0.25, 0.2, 0.1]))
    ref = (img - 0.5) / np.array([0.25, 0.2, 0.1])
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_gaussian_blur_matches_torch(rng):
    img = rng.rand(16, 16, 3).astype(np.float32)
    out = np.asarray(F.gaussian_blur_image(jnp.asarray(img), 5, 1.5))
    # torch oracle: conv2d with the same separable kernel + reflect pad
    ksize_half = (5 - 1) * 0.5
    x = torch.linspace(-ksize_half, ksize_half, steps=5)
    pdf = torch.exp(-0.5 * (x / 1.5).pow(2))
    k1d = pdf / pdf.sum()
    k2d = torch.outer(k1d, k1d)
    t = _to_torch(img)
    t = TF.pad(t, [2, 2, 2, 2], mode="reflect")
    ref = TF.conv2d(t, k2d.expand(3, 1, 5, 5), groups=3)
    np.testing.assert_allclose(out, _from_torch(ref), atol=1e-5)


def test_to_dtype_scale_roundtrip(rng):
    img = (rng.rand(4, 4, 3) * 255).astype(np.uint8)
    f = F.to_dtype(jnp.asarray(img), jnp.float32, scale=True)
    assert float(jnp.max(f)) <= 1.0
    back = F.to_dtype(f, jnp.uint8, scale=True)
    np.testing.assert_array_equal(np.asarray(back), img)


def test_sanitize_bounding_boxes():
    # reference `_misc.py:_get_sanitize_bounding_boxes_mask`: degenerate
    # (< min_size / min_area) boxes, negative coords, AND any coordinate
    # beyond the canvas (inclusive bound: == canvas is valid) are removed
    bb = tv_tensors.BoundingBoxes(
        np.array(
            [
                [1, 1, 5, 5],        # valid
                [2, 2, 2.5, 8],      # w < min_size
                [-10, -10, -5, -5],  # negative coords
                [0, 0, 50, 50],      # coords beyond the 20x20 canvas
                [0, 0, 20, 20],      # == canvas: inclusive bound, valid
            ],
            np.float32,
        ),
        format="XYXY",
        canvas_size=(20, 20),
    )
    out, valid = F.sanitize_bounding_boxes(bb)
    np.testing.assert_array_equal(
        np.asarray(valid), [True, False, False, False, True]
    )
    # container kind follows the input (reference _misc.py:391): wrapper
    # in -> wrapper out, pure array in -> pure array out
    assert isinstance(out, tv_tensors.BoundingBoxes)
    out_plain, valid_plain = F.sanitize_bounding_boxes(
        bb.data, format="XYXY", canvas_size=(20, 20)
    )
    assert not isinstance(out_plain, tv_tensors.BoundingBoxes)
    np.testing.assert_array_equal(np.asarray(valid_plain), np.asarray(valid))
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(bb.data))


def test_erase(rng):
    img = jnp.asarray(rng.rand(6, 6, 3).astype(np.float32))
    out = np.asarray(F.erase(img, 1, 2, 3, 2, jnp.zeros((3, 2, 3))))
    assert (out[1:4, 2:4] == 0).all()
    assert (out[0] == np.asarray(img)[0]).all()


# --------------------------------------------------------- five crop ----
def test_five_ten_crop(rng):
    img = jnp.asarray(rng.rand(10, 12, 3).astype(np.float32))
    crops = F.five_crop(img, 4)
    assert len(crops) == 5
    assert all(c.shape == (4, 4, 3) for c in crops)
    crops10 = F.ten_crop(img, 4)
    assert len(crops10) == 10


# -------------------------------------------------------------- meta ----
def test_get_size():
    img = tv_tensors.Image(np.zeros((7, 9, 3), np.float32))
    assert F.get_size(img) == [7, 9]
    bb = tv_tensors.BoundingBoxes(
        np.zeros((1, 4), np.float32), format="XYXY", canvas_size=(5, 6)
    )
    assert F.get_size(bb) == [5, 6]
    m = tv_tensors.Mask(np.zeros((3, 4), np.uint8))
    assert F.get_size(m) == [3, 4]


def test_convert_bounding_box_format_wrapper():
    bb = tv_tensors.BoundingBoxes(
        np.array([[0.0, 0.0, 4.0, 2.0]], np.float32), format="XYXY", canvas_size=(5, 5)
    )
    out = F.convert_bounding_box_format(bb, new_format="CXCYWH")
    assert out.format == tv_tensors.BoundingBoxFormat.CXCYWH
    np.testing.assert_allclose(np.asarray(out.data), [[2, 1, 4, 2]])


def test_clamp_bounding_boxes():
    bb = tv_tensors.BoundingBoxes(
        np.array([[-5.0, -5.0, 30.0, 30.0]], np.float32),
        format="XYXY",
        canvas_size=(20, 25),
    )
    out = F.clamp_bounding_boxes(bb)
    np.testing.assert_allclose(np.asarray(out.data), [[0, 0, 25, 20]])


# ------------------------------------------------- rotate expand (r2) ----
def test_rotate_keypoints_expand_tracks_image():
    """ADVICE r1 (medium): rotate(KeyPoints, expand=True) must translate
    points into the expanded canvas (reference
    ``_affine_keypoints_with_expand`` subtracts the transformed-frame min).
    Oracle-free check: a keypoint must stay on the image marker it tags."""
    for angle in (30.0, -47.0, 120.0):
        img = np.zeros((60, 80, 1), np.float32)
        img[35, 10, 0] = 1.0  # marker at (x=10, y=35)
        kp = tv_tensors.KeyPoints(
            np.array([[10.0, 35.0]], np.float32), canvas_size=(60, 80)
        )
        oi = np.asarray(
            F.rotate_image(jnp.asarray(img), angle, "bilinear", expand=True)
        )
        ok = F.rotate(kp, angle, expand=True)
        ys, xs, _ = np.nonzero(oi > 0.05)
        cx, cy = xs.mean() + 0.5, ys.mean() + 0.5  # pixel-center coords
        px, py = np.asarray(ok.data)[0]
        assert abs(cx - px) < 1.2 and abs(cy - py) < 1.2, (
            f"angle={angle}: marker ({cx:.2f},{cy:.2f}) vs kp ({px:.2f},{py:.2f})"
        )


def test_rotate_expand_custom_center():
    """ADVICE r1 (low): expand size must come from the actual matrix incl.
    a non-default center (reference ``_compute_affine_output_size``), not a
    center-ignoring closed form. A marker near the rotation center stays in
    frame and must line up between the image and keypoint paths."""
    img = np.zeros((40, 60, 1), np.float32)
    img[12, 14, 0] = 1.0  # near the custom center (10, 10)
    out = np.asarray(
        F.rotate_image(jnp.asarray(img), 35.0, "bilinear", expand=True,
                       center=[10.0, 10.0])
    )
    # canvas derived from the actual matrix: differs from default-center
    default = np.asarray(
        F.rotate_image(jnp.asarray(img), 35.0, "bilinear", expand=True)
    )
    assert out.shape != default.shape, (
        "expand canvas ignored the custom center"
    )
    # content near the rotation center must stay inside the grown canvas
    ys, xs, _ = np.nonzero(out > 0.05)
    assert len(xs) > 0
    # keypoints path must report the same grown canvas family (within the
    # reference's own ±1 rounding between centered/absolute conventions)
    kp = tv_tensors.KeyPoints(
        np.array([[14.0, 12.0]], np.float32), canvas_size=(40, 60)
    )
    okp = F.rotate(kp, 35.0, expand=True, center=[10.0, 10.0])
    assert abs(okp.canvas_size[0] - out.shape[0]) <= 1
    assert abs(okp.canvas_size[1] - out.shape[1]) <= 1


def test_affine_bounding_boxes_raw_kernel_clamps():
    """ADVICE r1 (low): the raw-array kernel clamps internally to the
    canvas like the reference kernel contract (``_geometry.py:1205``)."""
    boxes = jnp.asarray(np.array([[-30.0, -30.0, 90.0, 90.0]], np.float32))
    out = F.affine_bounding_boxes(
        boxes, tv_tensors.BoundingBoxFormat.XYXY, (50, 50),
        angle=0.0, translate=[0.0, 0.0], scale=1.5, shear=[0.0, 0.0],
    )
    out = np.asarray(out)
    assert out[..., 0::2].min() >= 0 and out[..., 0::2].max() <= 50
    assert out[..., 1::2].min() >= 0 and out[..., 1::2].max() <= 50
