"""v2 functional contract harness.

Registry-wide analog of the reference ``check_kernel`` /
``check_functional`` sweep (``test/test_transforms_v2.py:163-225``):
for every dispatching functional we check, across input kinds,

* **jit-vs-eager parity** — the scripted-vs-eager analog; tracing bugs
  (dtype promotion under ``jit``, shape-dependent Python branches) are
  exactly what this catches;
* **batched == stacked per-sample** outputs;
* **dtype preservation** for uint8 and float32 images;
* **TVTensor dispatch** — Mask / BoundingBoxes / KeyPoints inputs
  produce the same type with coherent metadata.

Cases are declared once in ``CASES`` with the input kinds each
functional supports; the sweep parametrizes over the cross product.
"""

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu import tv_tensors
from vision_tpu.transforms.v2 import functional as F

_RS = np.random.RandomState(0)
_IMG = _RS.rand(3, 16, 16, 3).astype(np.float32)  # [B, H, W, C]
_BOXES = np.array(
    [[1.0, 2.0, 10.0, 12.0], [0.0, 0.0, 16.0, 16.0], [4.0, 5.0, 6.0, 9.0]],
    np.float32,
)
_KPTS = np.array([[[2.0, 3.0], [10.0, 5.0], [7.0, 15.0]]], np.float32)
_MASK = (_RS.rand(2, 16, 16) > 0.5).astype(np.uint8)


@dataclasses.dataclass
class Case:
    name: str
    fn: Callable  # fn(inpt) -> out, args already bound
    kinds: str = "i"  # i=image array, m=Mask, b=BoundingBoxes, k=KeyPoints
    uint8: bool = True  # supports uint8 images & must preserve the dtype
    u8_only: bool = False  # functional rejects float input (jpeg)
    f32_only_check: bool = False  # skip uint8 dtype-preservation check
    keyed: bool = False  # PRNG-keyed: batched noise != stacked per-sample
    atol: float = 1e-5
    # some outputs are tuples (five_crop) — reduce to one array for checks
    pick: Callable = staticmethod(lambda out: out)


def _k():
    return jax.random.PRNGKey(0)


CASES = [
    Case("resize", lambda x: F.resize(x, (8, 8)), kinds="imbk"),
    Case("resize_aa_off",
         lambda x: F.resize(x, (8, 8), antialias=False), kinds="i"),
    Case("resize_nearest",
         lambda x: F.resize(x, (8, 8), interpolation="nearest"), kinds="i"),
    Case("resize_bicubic",
         lambda x: F.resize(x, (8, 8), interpolation="bicubic"), kinds="i",
         atol=1e-4),
    Case("horizontal_flip", F.horizontal_flip, kinds="imbk"),
    Case("vertical_flip", F.vertical_flip, kinds="imbk"),
    Case("center_crop", lambda x: F.center_crop(x, (10, 10)), kinds="imbk"),
    Case("pad", lambda x: F.pad(x, [2]), kinds="imbk"),
    Case("pad_reflect",
         lambda x: F.pad(x, [2], padding_mode="reflect"), kinds="i"),
    Case("crop", lambda x: F.crop(x, 2, 3, 8, 8), kinds="imbk"),
    Case("rotate", lambda x: F.rotate(x, 30.0), kinds="imbk"),
    Case("affine",
         lambda x: F.affine(x, angle=15.0, translate=(1, 2), scale=1.1,
                            shear=(5.0, 0.0)),
         kinds="imbk"),
    Case("perspective",
         lambda x: F.perspective(
             x,
             startpoints=[[0, 0], [15, 0], [15, 15], [0, 15]],
             endpoints=[[1, 1], [14, 0], [15, 14], [0, 15]],
         ),
         kinds="imbk"),
    Case("elastic",
         lambda x: F.elastic(
             x, jnp.zeros((16, 16, 2), jnp.float32) + 0.5), kinds="imk"),
    Case("resized_crop",
         lambda x: F.resized_crop(x, 2, 2, 12, 12, (8, 8)), kinds="imbk"),
    Case("erase",
         lambda x: F.erase(x, 2, 3, 4, 5,
                           jnp.zeros((4, 5, 3), jnp.float32))),
    Case("adjust_brightness", lambda x: F.adjust_brightness(x, 1.3)),
    Case("adjust_contrast", lambda x: F.adjust_contrast(x, 0.7)),
    Case("adjust_saturation", lambda x: F.adjust_saturation(x, 1.5)),
    Case("adjust_hue", lambda x: F.adjust_hue(x, 0.1)),
    Case("adjust_gamma", lambda x: F.adjust_gamma(x, 0.8)),
    Case("adjust_sharpness", lambda x: F.adjust_sharpness(x, 1.4)),
    Case("invert", F.invert),
    Case("autocontrast", F.autocontrast),
    Case("equalize", F.equalize),
    Case("posterize", lambda x: F.posterize(x, 3)),
    Case("solarize", lambda x: F.solarize(x, 0.6), f32_only_check=True),
    Case("rgb_to_grayscale", lambda x: F.rgb_to_grayscale(x, 3)),
    Case("grayscale_to_rgb",
         lambda x: F.grayscale_to_rgb(x[..., :1])),
    Case("permute_channels", lambda x: F.permute_channels(x, [2, 0, 1])),
    Case("normalize",
         lambda x: F.normalize(x, [0.5] * 3, [0.25] * 3), uint8=False),
    Case("gaussian_blur", lambda x: F.gaussian_blur(x, 3)),
    Case("gaussian_noise",
         lambda x: F.gaussian_noise(x, key=_k()), uint8=False, keyed=True),
    Case("jpeg", lambda x: F.jpeg(x, 70), u8_only=True, atol=30.0),
    Case("five_crop", lambda x: F.five_crop(x, (8, 8)),
         pick=lambda out: out[0]),
    Case("ten_crop", lambda x: F.ten_crop(x, (8, 8)),
         pick=lambda out: out[-1]),
    Case("to_dtype_scale",
         lambda x: F.to_dtype(x, jnp.float32, scale=True),
         f32_only_check=True),
    Case("convert_image_dtype",
         lambda x: F.convert_image_dtype(x, jnp.float32),
         f32_only_check=True),
]
_BY_NAME = {c.name: c for c in CASES}
_IDS = [c.name for c in CASES]


def _img_for(c: Case, dtype, batched=True):
    arr = _IMG if batched else _IMG[0]
    if dtype == jnp.uint8:
        return (jnp.asarray(arr) * 255).astype(jnp.uint8)
    return jnp.asarray(arr)


# ----------------------------------------------------------------------
# 1. jit == eager (scripted-vs-eager analog), both dtypes
# ----------------------------------------------------------------------
@pytest.mark.parametrize("dtype", ["float32", "uint8"])
@pytest.mark.parametrize("case", CASES, ids=_IDS)
def test_jit_matches_eager(case, dtype):
    if dtype == "uint8" and not case.uint8:
        pytest.skip("float-only functional")
    if dtype == "float32" and case.u8_only:
        pytest.skip("uint8-only functional")
    x = _img_for(case, jnp.uint8 if dtype == "uint8" else jnp.float32)
    eager = case.pick(case.fn(x))
    jitted = case.pick(jax.jit(lambda a: case.fn(a))(x))
    assert jitted.dtype == eager.dtype, (
        f"{case.name}: traced dtype {jitted.dtype} != eager {eager.dtype}"
    )
    assert jitted.shape == eager.shape
    np.testing.assert_allclose(
        np.asarray(jitted, np.float32), np.asarray(eager, np.float32),
        atol=max(case.atol, 1.0 if dtype == "uint8" else case.atol),
        rtol=1e-4,
    )


# ----------------------------------------------------------------------
# 2. batched == stacked per-sample
# ----------------------------------------------------------------------
@pytest.mark.parametrize("case", CASES, ids=_IDS)
def test_batched_equals_per_sample(case):
    if case.keyed:
        pytest.skip("keyed noise: batched layout != stacked per-sample")
    batch = _img_for(case, jnp.uint8 if case.u8_only else jnp.float32)
    batched = np.asarray(case.pick(case.fn(batch)), np.float32)
    per = np.stack(
        [np.asarray(case.pick(case.fn(batch[i])), np.float32)
         for i in range(batch.shape[0])]
    )
    np.testing.assert_allclose(batched, per, atol=case.atol, rtol=1e-4)
    assert np.isfinite(batched).all()


# ----------------------------------------------------------------------
# 3. dtype preservation
# ----------------------------------------------------------------------
@pytest.mark.parametrize("dtype", ["float32", "uint8"])
@pytest.mark.parametrize("case", CASES, ids=_IDS)
def test_dtype_preserved(case, dtype):
    if case.name in ("to_dtype_scale", "convert_image_dtype"):
        pytest.skip("dtype conversion is the functional's contract")
    if dtype == "uint8" and (not case.uint8 or case.f32_only_check):
        pytest.skip("uint8 unsupported / not dtype-preserving by contract")
    if dtype == "float32" and case.u8_only:
        pytest.skip("uint8-only functional")
    x = _img_for(case, jnp.uint8 if dtype == "uint8" else jnp.float32)
    out = case.pick(case.fn(x))
    assert out.dtype == x.dtype, case.name


# ----------------------------------------------------------------------
# 4. TVTensor dispatch: type + metadata coherence
# ----------------------------------------------------------------------
_GEOM = [c for c in CASES if len(c.kinds) > 1]


@pytest.mark.parametrize("case", _GEOM, ids=[c.name for c in _GEOM])
def test_mask_dispatch(case):
    if "m" not in case.kinds:
        pytest.skip("no Mask kernel")
    m = tv_tensors.Mask(jnp.asarray(_MASK))
    out = case.fn(m)
    assert isinstance(out, tv_tensors.Mask), case.name
    img_out = case.pick(case.fn(_img_for(case, jnp.float32)))
    assert out.data.shape[-2:] == img_out.shape[-3:-1], (
        f"{case.name}: mask spatial {out.data.shape} vs image "
        f"{img_out.shape}"
    )


@pytest.mark.parametrize("case", _GEOM, ids=[c.name for c in _GEOM])
def test_bounding_boxes_dispatch(case):
    if "b" not in case.kinds:
        pytest.skip("no BoundingBoxes kernel")
    bb = tv_tensors.BoundingBoxes(
        jnp.asarray(_BOXES), format="XYXY", canvas_size=(16, 16)
    )
    out = case.fn(bb)
    assert isinstance(out, tv_tensors.BoundingBoxes), case.name
    assert out.data.shape == _BOXES.shape
    img_out = case.pick(case.fn(_img_for(case, jnp.float32)))
    assert tuple(out.canvas_size) == tuple(img_out.shape[-3:-1]), (
        f"{case.name}: canvas {out.canvas_size} vs image {img_out.shape}"
    )
    assert np.isfinite(np.asarray(out.data)).all()


@pytest.mark.parametrize("case", _GEOM, ids=[c.name for c in _GEOM])
def test_keypoints_dispatch(case):
    if "k" not in case.kinds:
        pytest.skip("no KeyPoints kernel")
    kp = tv_tensors.KeyPoints(jnp.asarray(_KPTS), canvas_size=(16, 16))
    out = case.fn(kp)
    assert isinstance(out, tv_tensors.KeyPoints), case.name
    assert out.data.shape == _KPTS.shape
    assert np.isfinite(np.asarray(out.data)).all()


# ----------------------------------------------------------------------
# 5. flip involution + box/keypoint geometric consistency spot checks
# ----------------------------------------------------------------------
@pytest.mark.parametrize("fn", [F.horizontal_flip, F.vertical_flip],
                         ids=["hflip", "vflip"])
def test_flip_involution(fn):
    x = jnp.asarray(_IMG)
    np.testing.assert_allclose(np.asarray(fn(fn(x))), _IMG, atol=0)
    bb = tv_tensors.BoundingBoxes(
        jnp.asarray(_BOXES), format="XYXY", canvas_size=(16, 16)
    )
    np.testing.assert_allclose(
        np.asarray(fn(fn(bb)).data), _BOXES, atol=1e-5
    )


def test_hflip_boxes_match_pixels():
    """A box around a bright blob must track the blob under hflip."""
    img = jnp.zeros((16, 16, 3)).at[4:8, 2:6].set(1.0)
    bb = tv_tensors.BoundingBoxes(
        jnp.array([[2.0, 4.0, 6.0, 8.0]]), format="XYXY",
        canvas_size=(16, 16),
    )
    fi = np.asarray(F.horizontal_flip(img))
    fb = np.asarray(F.horizontal_flip(bb).data)[0]
    x1, y1, x2, y2 = (int(round(v)) for v in fb)
    assert fi[y1:y2, x1:x2].sum() == pytest.approx(fi.sum())
