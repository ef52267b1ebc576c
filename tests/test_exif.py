"""EXIF orientation parity (reference ``test/test_image.py``
``test_decode_with_exif_orientation`` / ``test_invalid_exif``): fixtures
are built with PIL exactly like the reference test, and the expected
pixels come from ``PIL.ImageOps.exif_transpose`` — the same oracle the
reference pins its C++ parser against."""

import io as _io

import numpy as np
import PIL.Image
import pytest
from PIL import ImageOps

from vision_tpu.io._exif import (
    exif_orientation_transform,
    parse_jpeg_exif_orientation,
    parse_png_exif_orientation,
)
from vision_tpu.io.image import (
    ImageReadMode,
    decode_image,
    decode_jpeg,
    decode_png,
    read_image,
)


def _base_image(rng=None):
    rng = rng or np.random.RandomState(0)
    # asymmetric dims so every orientation produces a distinct array
    return rng.randint(0, 256, (96, 128, 3), dtype=np.uint8)


def _encode_with_orientation(arr, codec: str, orientation: int) -> bytes:
    im = PIL.Image.fromarray(arr)
    exif = im.getexif()
    exif[0x0112] = orientation
    buf = _io.BytesIO()
    im.save(buf, codec.upper(), exif=exif.tobytes())
    return buf.getvalue()


def _pil_expected(data: bytes) -> np.ndarray:
    with PIL.Image.open(_io.BytesIO(data)) as im:
        return np.asarray(ImageOps.exif_transpose(im).convert("RGB"))


@pytest.mark.parametrize("codec", ["jpeg", "png"])
@pytest.mark.parametrize("orientation", list(range(1, 9)))
def test_decode_with_exif_orientation(codec, orientation):
    data = _encode_with_orientation(_base_image(), codec, orientation)
    out = decode_image(data, ImageReadMode.RGB, apply_exif_orientation=True)
    expected = _pil_expected(data)
    assert out.shape == expected.shape
    if codec == "png":
        np.testing.assert_array_equal(out, expected)
    else:
        # JPEG decode itself may differ by a few uint8 counts vs PIL
        assert np.mean(np.abs(out.astype(int) - expected.astype(int))) < 3


@pytest.mark.parametrize("orientation", [2, 3, 4, 5, 6, 7, 8])
def test_orientation_transform_matches_pil_semantics(orientation):
    """Pure-transform check, no codec noise: PIL applies the same tag to
    the same array."""
    arr = _base_image()
    im = PIL.Image.fromarray(arr)
    exif = im.getexif()
    exif[0x0112] = orientation
    im.info["exif"] = exif.tobytes()  # exif_transpose reads from getexif
    # build an in-memory PNG (lossless) and run PIL's oracle on it
    data = _encode_with_orientation(arr, "png", orientation)
    expected = _pil_expected(data)
    got = exif_orientation_transform(arr, orientation)
    np.testing.assert_array_equal(np.ascontiguousarray(got), expected)


@pytest.mark.parametrize("codec", ["jpeg", "png"])
def test_default_is_no_orientation(codec):
    arr = _base_image()
    data = _encode_with_orientation(arr, codec, 6)
    out = decode_image(data, ImageReadMode.RGB)  # default False
    assert out.shape == arr.shape  # unrotated: 96x128 stays 96x128


@pytest.mark.parametrize("size", [255, 512])
def test_invalid_exif(size):
    """reference ``test_image.py:test_invalid_exif``: garbage APP1 must
    decode as identity, not crash."""
    arr = _base_image()
    im = PIL.Image.fromarray(arr)
    buf = _io.BytesIO()
    im.save(buf, "JPEG", exif=b"1" * size)
    data = buf.getvalue()
    out = decode_jpeg(data, ImageReadMode.RGB, apply_exif_orientation=True)
    expected = _pil_expected(data)
    assert out.shape == expected.shape
    assert np.mean(np.abs(out.astype(int) - expected.astype(int))) < 3


def test_parse_orientation_absent():
    arr = _base_image()
    buf = _io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, "JPEG")
    assert parse_jpeg_exif_orientation(buf.getvalue()) == -1
    buf = _io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, "PNG")
    assert parse_png_exif_orientation(buf.getvalue()) == -1
    assert parse_jpeg_exif_orientation(b"\x00\x01") == -1
    assert parse_png_exif_orientation(b"\x89PNG\r\n\x1a\n") == -1


def test_parse_orientation_values():
    arr = _base_image()
    for o in range(1, 9):
        j = _encode_with_orientation(arr, "jpeg", o)
        p = _encode_with_orientation(arr, "png", o)
        assert parse_jpeg_exif_orientation(j) == o
        assert parse_png_exif_orientation(p) == o


def test_read_image_threads_flag(tmp_path):
    arr = _base_image()
    data = _encode_with_orientation(arr, "png", 6)
    fp = tmp_path / "oriented.png"
    fp.write_bytes(data)
    out = read_image(fp, ImageReadMode.RGB, apply_exif_orientation=True)
    np.testing.assert_array_equal(out, _pil_expected(data))


def test_decode_png_gray_oriented():
    arr = _base_image()
    data = _encode_with_orientation(arr, "png", 8)
    out = decode_png(data, ImageReadMode.GRAY, apply_exif_orientation=True)
    assert out.shape == (128, 96, 1)  # rotated dims, mode conversion kept


def test_tpu_offload_path_applies_orientation():
    """decode_jpeg(device='tpu') honors the flag (the reference's CUDA
    batch path does not — io/image.py:231)."""
    jax = pytest.importorskip("jax")
    del jax
    arr = _base_image()
    plain = _encode_with_orientation(arr, "jpeg", 1)
    rot = _encode_with_orientation(arr, "jpeg", 6)
    outs = decode_jpeg(
        [plain, plain], mode=ImageReadMode.RGB, device="tpu",
        apply_exif_orientation=True,
    )
    assert np.asarray(outs[0]).shape == (96, 128, 3)
    outs = decode_jpeg(
        [rot, rot], mode=ImageReadMode.RGB, device="tpu",
        apply_exif_orientation=True,
    )
    got = np.asarray(outs[0])
    expected = _pil_expected(rot)
    assert got.shape == expected.shape == (128, 96, 3)
    assert np.mean(np.abs(got.astype(int) - expected.astype(int))) < 3


def test_tpu_loader_reorients():
    from vision_tpu.io.tpu_loader import TpuJpegLoader

    arr = _base_image()
    rot = _encode_with_orientation(arr, "jpeg", 6)
    samples = [(rot, 0)] * 4
    loader = TpuJpegLoader(
        samples, batch_size=4, crop_size=32, train=False,
        apply_exif_orientation=True,
    )
    batches = list(loader)
    assert len(batches) == 1
    assert loader.stats["exif_reorient"] == 4
    assert loader.stats["dropped"] == 0
    # upright pixels: compare against the same loader fed pre-rotated data
    import io as _io2

    upright = _io2.BytesIO()
    PIL.Image.fromarray(np.ascontiguousarray(arr.transpose(1, 0, 2)[:, ::-1])).save(
        upright, "JPEG", quality=97
    )
    ref_loader = TpuJpegLoader(
        [(upright.getvalue(), 0)] * 4, batch_size=4, crop_size=32, train=False
    )
    ref = list(ref_loader)[0]["image"]
    got = batches[0]["image"]
    assert np.mean(np.abs(np.asarray(got) - np.asarray(ref))) < 0.25
