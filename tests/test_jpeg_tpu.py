"""TPU-offloaded JPEG decode: host entropy decode (csrc
vtpu_jpeg_coefficients) + device dequant/IDCT/upsample/color
(vision_tpu/io/jpeg_tpu.py) vs the full libjpeg decode.

Not bit-exact by design (float IDCT + bilinear chroma vs libjpeg's
fixed-point IDCT + fancy upsampler); the contract is a small max-abs
bound, tightest on luma/interior. Reference counterpart:
torchvision/io/image.py:233 decode_jpegs_cuda (nvJPEG batch decode)."""

import io

import numpy as np
import PIL.Image
import pytest

from vision_tpu.io._codecs import has_native, jpeg_coefficients_native
from vision_tpu.io.image import decode_jpeg, encode_jpeg
from vision_tpu.io.jpeg_tpu import decode_jpeg_batch_tpu

pytestmark = pytest.mark.skipif(
    not has_native(), reason="native codec shim unavailable"
)


def _photo_like(h=120, w=160, seed=0):
    rng = np.random.RandomState(seed)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    base = 128 + 60 * np.sin(x / 17.0) * np.cos(y / 23.0)
    img = base[..., None] + rng.randn(h, w, 3) * 18
    return np.clip(img, 0, 255).astype(np.uint8)


def _pil_jpeg(img, subsampling, quality=80):
    buf = io.BytesIO()
    PIL.Image.fromarray(img).save(
        buf, "JPEG", quality=quality, subsampling=subsampling
    )
    return buf.getvalue()


def test_coefficients_shapes_and_tables():
    img = _photo_like()
    data = encode_jpeg(img, quality=75)
    coefs, qtabs, samp, (h, w) = jpeg_coefficients_native(data)
    assert (h, w) == img.shape[:2]
    assert len(coefs) == 3 and samp[0] == (2, 2) and samp[1] == (1, 1)
    assert coefs[0].shape == (15, 20, 64)  # ceil(120/8), ceil(160/8)
    assert coefs[1].shape == (8, 10, 64)
    assert qtabs[0].dtype == np.uint16 and qtabs[0][0] > 0


@pytest.mark.parametrize("quality", [50, 75, 95])
def test_batch_decode_matches_libjpeg_420(quality):
    img = _photo_like()
    data = encode_jpeg(img, quality=quality)
    ref = np.asarray(decode_jpeg(data)).astype(np.int32)
    out = decode_jpeg_batch_tpu([data, data])
    assert out is not None and out.shape == (2,) + ref.shape
    d = np.abs(np.asarray(out[0]).astype(np.int32) - ref)
    assert d.max() <= 8, d.max()
    assert d.mean() < 1.0
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out[1]))


@pytest.mark.parametrize("subsampling", [0, 1, 2])  # 4:4:4, 4:2:2, 4:2:0
def test_batch_decode_subsampling_modes(subsampling):
    img = _photo_like(seed=3)
    data = _pil_jpeg(img, subsampling)
    ref = np.asarray(decode_jpeg(data)).astype(np.int32)
    out = decode_jpeg_batch_tpu([data])
    assert out is not None
    d = np.abs(np.asarray(out[0]).astype(np.int32) - ref)
    assert d.max() <= 8, (subsampling, d.max())


def test_batch_decode_grayscale():
    img = _photo_like()[:, :, 0]
    buf = io.BytesIO()
    PIL.Image.fromarray(img, "L").save(buf, "JPEG", quality=80)
    data = buf.getvalue()
    ref = np.asarray(decode_jpeg(data))
    if ref.ndim == 2:
        ref = ref[..., None]
    ref3 = np.repeat(ref[..., :1], 3, axis=-1).astype(np.int32)
    out = decode_jpeg_batch_tpu([data])
    assert out is not None
    d = np.abs(np.asarray(out[0]).astype(np.int32) - ref3)
    assert d.max() <= 2, d.max()


def test_batch_decode_mixed_geometry_falls_back():
    a = encode_jpeg(_photo_like(), quality=75)
    b = encode_jpeg(_photo_like(h=64, w=64), quality=75)
    assert decode_jpeg_batch_tpu([a, b]) is None


def test_decode_jpeg_device_tpu_api():
    """decode_jpeg(device="tpu") list API mirrors the reference's
    decode_jpeg(device="cuda") batch entry (io/image.py:233)."""
    img = _photo_like()
    data = encode_jpeg(img, quality=80)
    ref = np.asarray(decode_jpeg(data)).astype(np.int32)
    out = decode_jpeg([data, data], device="tpu")
    assert np.abs(np.asarray(out[0]).astype(np.int32) - ref).max() <= 8
    one = decode_jpeg(data, device="tpu")
    assert np.asarray(one).shape == ref.shape
    # geometry-mixed list falls back to the host loop, still correct
    small = encode_jpeg(_photo_like(h=64, w=64), quality=80)
    mixed = decode_jpeg([data, small], device="tpu")
    assert np.asarray(mixed[1]).shape == (64, 64, 3)


@pytest.mark.parametrize("m", [5, 4, 2])
def test_scaled_decode_coef_limit(m):
    """DCT-scaled device decode: only the top-left MxM coefficients ship
    ((M/8)^2 of the bytes) and the output is the M/8-scale image.

    Note on the oracle: this libjpeg build implements scale=(M,8) as full
    IDCT + box averaging, while the device path is the classic truncated
    M-point IDCT — two different (both valid) low-pass resamples, so the
    comparison bound is loose; DC-only content must be exact."""
    img = _photo_like(h=96, w=120)
    data = encode_jpeg(img, quality=85)
    out = decode_jpeg_batch_tpu([data], coef_limit=m)
    assert out is not None
    ref = np.asarray(decode_jpeg(data, scale=(m, 8))).astype(np.float64)
    got = np.asarray(out[0]).astype(np.float64)
    assert got.shape == ref.shape  # ceil(dim * M/8)
    d = np.abs(got - ref)
    assert d.mean() < 4.0, d.mean()

    # flat image: every low-pass resample agrees exactly (+-1 rounding)
    flat = encode_jpeg(np.full((64, 64, 3), 130, np.uint8), quality=90)
    fr = np.asarray(decode_jpeg(flat, scale=(m, 8))).astype(np.int32)
    fo = np.asarray(
        decode_jpeg_batch_tpu([flat], coef_limit=m)[0]
    ).astype(np.int32)
    assert np.abs(fo - fr).max() <= 1


def test_scaled_decode_transfer_shrinks():
    data = encode_jpeg(_photo_like(), quality=85)
    from vision_tpu.io._codecs import jpeg_coefficients_native

    full = jpeg_coefficients_native(data)
    lim = jpeg_coefficients_native(data, 4)
    assert lim[0][0].shape[-1] == 16 and full[0][0].shape[-1] == 64
    assert lim[0][0].nbytes * 4 == full[0][0].nbytes


def test_scale_fallback_resamples_when_native_unavailable(monkeypatch):
    """Regression (round-2 review): decode_jpeg(scale=...) used to
    silently return the FULL-size image when the native scaled decode is
    unavailable; it must resample to the scaled dims instead."""
    from vision_tpu.io import _codecs as codecs_mod

    data = encode_jpeg(_photo_like(h=96, w=120), quality=85)
    want = np.asarray(decode_jpeg(data, scale=(4, 8))).shape
    monkeypatch.setattr(
        codecs_mod, "decode_jpeg_scaled_native", lambda *a: None
    )
    got = np.asarray(decode_jpeg(data, scale=(4, 8)))
    assert got.shape == want  # (48, 60, 3), NOT (96, 120, 3)


def test_device_tpu_gray_mode_and_list_contract():
    """Regression (round-2 review): device='tpu' honors mode=GRAY and a
    list input returns a list on BOTH the device path and the fallback."""
    from vision_tpu.io.image import ImageReadMode

    data = encode_jpeg(_photo_like(), quality=85)
    out = decode_jpeg([data, data], device="tpu", mode=ImageReadMode.GRAY)
    assert isinstance(out, list) and np.asarray(out[0]).shape[-1] == 1
    small = encode_jpeg(_photo_like(h=64, w=64), quality=85)
    mixed = decode_jpeg([data, small], device="tpu")
    assert isinstance(mixed, list)
    assert np.asarray(mixed[0]).shape[-1] == 3
