"""IO round trips (reference ``test/test_image.py``: asset decode vs PIL +
encode->decode round trips)."""

import io as _io

import numpy as np
import PIL.Image
import pytest

from vision_tpu import io as vio


@pytest.fixture
def rgb(rng):
    return (rng.rand(37, 53, 3) * 255).astype(np.uint8)


def _pil_bytes(arr, fmt, **kw):
    buf = _io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, format=fmt, **kw)
    return buf.getvalue()


def test_native_codecs_built():
    from vision_tpu.io import _codecs

    assert _codecs.has_native(), "native codec shim failed to build"


def test_decode_png_matches_pil(rgb):
    data = _pil_bytes(rgb, "PNG")
    out = vio.decode_png(data)
    np.testing.assert_array_equal(out, rgb)


def test_decode_jpeg_close_to_pil(rgb):
    data = _pil_bytes(rgb, "JPEG", quality=95)
    out = vio.decode_jpeg(data)
    ref = np.asarray(PIL.Image.open(_io.BytesIO(data)))
    assert out.shape == ref.shape
    # decoders may differ by small IDCT rounding
    assert np.mean(np.abs(out.astype(int) - ref.astype(int))) < 2.0


def test_encode_jpeg_roundtrip():
    # smooth gradient: JPEG handles it with low error (noise is worst-case)
    y, x = np.mgrid[0:64, 0:64]
    smooth = np.stack([y * 4, x * 4, (y + x) * 2], axis=-1).astype(np.uint8)
    data = vio.encode_jpeg(smooth, quality=95)
    out = vio.decode_jpeg(data)
    assert out.shape == smooth.shape
    assert np.mean(np.abs(out.astype(int) - smooth.astype(int))) < 3.0


def test_encode_png_lossless(rgb):
    data = vio.encode_png(rgb)
    out = vio.decode_png(data)
    np.testing.assert_array_equal(out, rgb)


def test_decode_image_sniffing(rgb):
    for fmt, dec in [("PNG", vio.decode_png), ("JPEG", vio.decode_jpeg)]:
        data = _pil_bytes(rgb, fmt)
        out = vio.decode_image(data)
        np.testing.assert_array_equal(out, dec(data))


def test_decode_webp(rgb):
    data = _pil_bytes(rgb, "WEBP", lossless=True)
    out = vio.decode_image(data)
    np.testing.assert_array_equal(out[..., :3], rgb)


def test_decode_gif_animation(rng):
    frames = [(rng.rand(16, 16, 3) * 255).astype(np.uint8) for _ in range(3)]
    buf = _io.BytesIO()
    ims = [PIL.Image.fromarray(f) for f in frames]
    ims[0].save(buf, format="GIF", save_all=True, append_images=ims[1:])
    out = vio.decode_gif(buf.getvalue())
    assert out.ndim == 4 and out.shape[0] == 3


def test_read_mode_conversions(rgb):
    data = _pil_bytes(rgb, "PNG")
    gray = vio.decode_png(data, vio.ImageReadMode.GRAY)
    assert gray.shape == (37, 53, 1)
    rgba = vio.decode_png(data, vio.ImageReadMode.RGB_ALPHA)
    assert rgba.shape == (37, 53, 4)
    assert (rgba[..., 3] == 255).all()


def test_read_write_file(tmp_path, rgb):
    p = tmp_path / "img.png"
    vio.write_png(rgb, p)
    out = vio.read_image(p)
    np.testing.assert_array_equal(out, rgb)


def test_decode_batch_threads(rgb):
    datas = [_pil_bytes(rgb, "PNG")] * 8
    outs = vio.decode_batch(datas, num_threads=4)
    assert len(outs) == 8
    np.testing.assert_array_equal(outs[0], rgb)


def test_prefetch_iterator(rng):
    batches = [
        {"x": rng.rand(4, 8, 8, 3).astype(np.float32)} for _ in range(5)
    ]
    seen = list(vio.prefetch_to_device(batches, depth=2))
    assert len(seen) == 5
    np.testing.assert_allclose(np.asarray(seen[0]["x"]), batches[0]["x"])


def test_decode_gif_native_matches_pil(rng):
    """Clean-room native GIF decoder (LZW + palette + animation) vs PIL
    (reference vendors giflib, csrc/io/image/cpu/decode_gif.cpp)."""
    import io as _io

    import PIL.Image

    from vision_tpu.io._codecs import decode_gif_native
    from vision_tpu.io.image import decode_gif

    if decode_gif_native(b"GIF89a") is None:
        pass  # invalid data returns None without crashing

    # animated 3-frame palette GIF with full disposal replacement
    frames = [
        PIL.Image.fromarray(
            rng.randint(0, 255, (9, 11, 3)).astype(np.uint8)
        ).convert("P", palette=PIL.Image.ADAPTIVE)
        for _ in range(3)
    ]
    b = _io.BytesIO()
    frames[0].save(
        b, "GIF", save_all=True, append_images=frames[1:], duration=100,
        disposal=1,
    )
    data = b.getvalue()
    got = decode_gif_native(data)
    assert got is not None and got.shape[0] == 3

    pil = PIL.Image.open(_io.BytesIO(data))
    refs = []
    try:
        while True:
            refs.append(np.asarray(pil.convert("RGB")))
            pil.seek(pil.tell() + 1)
    except EOFError:
        pass
    np.testing.assert_array_equal(got, np.stack(refs))

    # public decode_gif returns (H, W, 3) for single frame
    b2 = _io.BytesIO()
    frames[0].save(b2, "GIF")
    single = decode_gif(b2.getvalue())
    assert single.ndim == 3 and single.shape[-1] == 3


def test_decode_gif_interlaced(rng):
    import io as _io

    import PIL.Image

    from vision_tpu.io._codecs import decode_gif_native

    img = PIL.Image.fromarray(
        rng.randint(0, 255, (16, 16, 3)).astype(np.uint8)
    ).convert("P", palette=PIL.Image.ADAPTIVE)
    b = _io.BytesIO()
    img.save(b, "GIF", interlace=True)
    data = b.getvalue()
    got = decode_gif_native(data)
    ref = np.asarray(PIL.Image.open(_io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(got[0], ref)
