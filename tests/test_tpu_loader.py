"""io/tpu_loader.py: DALI-style bucketed loader with on-device JPEG
decode (host Huffman only) + traced resized crop over padded canvases."""

import numpy as np
import pytest

from vision_tpu.io._codecs import has_native
from vision_tpu.io.image import decode_jpeg, encode_jpeg
from vision_tpu.io.tpu_loader import TpuJpegLoader

pytestmark = pytest.mark.skipif(
    not has_native(), reason="native codec shim unavailable"
)


def _jpeg(h, w, seed=0, quality=85):
    rng = np.random.RandomState(seed)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    img = np.clip(
        (128 + 60 * np.sin(x / 17.0) * np.cos(y / 23.0))[..., None]
        + rng.randn(h, w, 3) * 15,
        0,
        255,
    ).astype(np.uint8)
    return encode_jpeg(img, quality=quality), img


def test_train_batches_bucket_and_shape():
    samples = []
    for i, (h, w) in enumerate([(96, 128), (100, 120), (160, 90), (97, 131)]):
        data, _ = _jpeg(h, w, seed=i)
        samples.append((data, i % 3))
    loader = TpuJpegLoader(samples, batch_size=2, crop_size=64, train=True)
    batches = list(loader)
    assert sum(b["image"].shape[0] for b in batches) == 4
    for b in batches:
        assert b["image"].shape[1:] == (64, 64, 3)
        arr = np.asarray(b["image"])
        assert np.isfinite(arr).all()
        # normalized ImageNet stats: values in a sane range
        assert arr.min() > -4.0 and arr.max() < 4.0
        assert b["label"].dtype == np.int32


def test_val_matches_host_preset():
    """Eval path (short-side resize + center crop as one traced crop box)
    vs the same math on the host-decoded image."""
    data, img = _jpeg(120, 160, seed=5)
    loader = TpuJpegLoader(
        [(data, 0)], batch_size=1, crop_size=56, train=False,
        val_resize_size=64,
    )
    out = np.asarray(next(iter(loader))["image"][0])

    # host reference: identical crop-box formulation on the decoded image
    ref_img = np.asarray(decode_jpeg(data)).astype(np.float32)
    th, tw = ref_img.shape[:2]
    side = min(th, tw) * 56 / 64.0
    top, left = (th - side) / 2.0, (tw - side) / 2.0
    ys = np.clip(top + (np.arange(56) + 0.5) * side / 56 - 0.5, 0, th - 1)
    xs = np.clip(left + (np.arange(56) + 0.5) * side / 56 - 0.5, 0, tw - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, th - 1)
    x1 = np.minimum(x0 + 1, tw - 1)
    ly = (ys - y0)[:, None, None]
    lx = (xs - x0)[None, :, None]
    r = (
        ref_img[y0][:, x0] * (1 - ly) * (1 - lx)
        + ref_img[y0][:, x1] * (1 - ly) * lx
        + ref_img[y1][:, x0] * ly * (1 - lx)
        + ref_img[y1][:, x1] * ly * lx
    )
    mean = np.asarray([0.485, 0.456, 0.406]) * 255
    std = np.asarray([0.229, 0.224, 0.225]) * 255
    want = (r - mean) / std
    # decode differs by a couple uint8 counts -> small normalized slack
    assert np.abs(out - want).max() < 0.1


def test_train_crop_stays_inside_true_dims():
    """Canvas padding (zero coefficients -> gray 128) must never leak:
    decode a uniform white image whose dims force canvas padding; every
    output pixel must be white, not gray."""
    img = np.full((70, 90, 3), 255, np.uint8)
    data = encode_jpeg(img, quality=95)
    loader = TpuJpegLoader(
        [(data, 0)] * 2, batch_size=2, crop_size=48, train=True, seed=3
    )
    b = next(iter(loader))
    mean = np.asarray([0.485, 0.456, 0.406]) * 255
    std = np.asarray([0.229, 0.224, 0.225]) * 255
    white = (255.0 - mean) / std
    arr = np.asarray(b["image"])
    assert np.abs(arr - white).max() < 0.15, np.abs(arr - white).max()


def test_scaled_decode_loader():
    data, _ = _jpeg(120, 160, seed=7)
    loader = TpuJpegLoader(
        [(data, 1)], batch_size=1, crop_size=48, train=True, coef_limit=4
    )
    b = next(iter(loader))
    assert b["image"].shape == (1, 48, 48, 3)
    assert np.isfinite(np.asarray(b["image"])).all()


def test_mixed_sampling_buckets_separate():
    import io

    import PIL.Image

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (96, 96, 3)).astype(np.uint8)
    buf0, buf1 = io.BytesIO(), io.BytesIO()
    PIL.Image.fromarray(img).save(buf0, "JPEG", subsampling=0)  # 4:4:4
    PIL.Image.fromarray(img).save(buf1, "JPEG", subsampling=2)  # 4:2:0
    loader = TpuJpegLoader(
        [(buf0.getvalue(), 0), (buf1.getvalue(), 1)],
        batch_size=2,
        crop_size=32,
        train=False,
    )
    batches = list(loader)
    # different sampling factors cannot share a compiled program
    assert len(batches) == 2
    assert all(b["image"].shape == (1, 32, 32, 3) for b in batches)


def test_progressive_jpeg_rides_offload_path():
    """Progressive streams entropy-decode directly (no fallback) and the
    device decode matches PIL within the baseline bound (<=8 counts)."""
    import io as _io

    import PIL.Image

    from vision_tpu.io.jpeg_tpu import decode_coefs, host_entropy_decode

    _, img = _jpeg(64, 96, seed=3)
    b = _io.BytesIO()
    PIL.Image.fromarray(img).save(b, "JPEG", quality=85, progressive=True)
    data = b.getvalue()
    r = host_entropy_decode(data)
    assert r is not None, "progressive stream fell back off the offload path"
    coefs, qtabs, samp, (h, w) = r
    out = np.asarray(decode_coefs(coefs, qtabs, h, w, samp))
    pil = np.asarray(PIL.Image.open(_io.BytesIO(data)).convert("RGB"))
    assert int(np.abs(out.astype(int) - pil.astype(int)).max()) <= 8

    # and the loader counts it as a direct offload hit
    loader = TpuJpegLoader([(data, 0)], batch_size=1, crop_size=32)
    list(loader)
    assert loader.stats["offload"] == 1
    assert loader.offload_hit_rate == 1.0


def test_cmyk_jpeg_reencode_fallback_counted():
    """A 4-component (CMYK) JPEG can't feed the coefficient path directly;
    the loader must host-decode + re-encode it (sample kept, counted)."""
    import io as _io

    import PIL.Image

    _, img = _jpeg(64, 64, seed=5)
    b = _io.BytesIO()
    PIL.Image.fromarray(img, "RGB").convert("CMYK").save(b, "JPEG", quality=90)
    data = b.getvalue()
    loader = TpuJpegLoader([(data, 1)], batch_size=1, crop_size=32)
    batches = list(loader)
    assert sum(x["image"].shape[0] for x in batches) == 1  # sample kept
    assert loader.stats["reencode_fallback"] == 1
    assert loader.stats["dropped"] == 0
    assert loader.offload_hit_rate == 0.0


def test_multihost_sharding_disjoint_and_complete():
    """Per-host strided shards of the same seeded permutation: disjoint,
    complete, deterministic (SURVEY §2.10 per-host file lists)."""
    samples = []
    for i in range(8):
        data, _ = _jpeg(48 + 8 * (i % 2), 64, seed=i)
        samples.append((data, i))
    seen = []
    for pi in range(2):
        loader = TpuJpegLoader(
            samples, batch_size=2, crop_size=32, train=True, seed=7,
            process_index=pi, process_count=2,
        )
        labels = []
        for b in loader:
            labels.extend(int(v) for v in np.asarray(b["label"]))
        assert len(labels) == 4
        assert len(loader) == 2
        seen.append(set(labels))
    assert seen[0] | seen[1] == set(range(8))
    assert not (seen[0] & seen[1])


def test_multihost_lockstep_equal_batch_counts():
    """SPMD lockstep: hosts must emit EXACTLY the same number of full
    batches even when content-dependent bucketing and odd shard sizes
    would naturally give them different counts — otherwise one host
    issues an extra collective step and the program deadlocks."""
    # 9 samples, heterogeneous sizes -> uneven bucket fill per host
    samples = []
    for i in range(9):
        data, _ = _jpeg(40 + 8 * (i % 3), 64, seed=10 + i)
        samples.append((data, i))
    counts = []
    for pi in range(2):
        loader = TpuJpegLoader(
            samples, batch_size=2, crop_size=32, train=True, seed=3,
            process_index=pi, process_count=2,
        )
        batches = list(loader)
        # every batch is FULL (top-up duplicates, never ragged)
        assert all(b["image"].shape[0] == 2 for b in batches)
        assert len(batches) == len(loader)
        counts.append(len(batches))
    assert counts[0] == counts[1]


def test_stats_reset_per_epoch():
    """offload_hit_rate reflects the CURRENT epoch (lifetime totals move
    to stats_total) so a mid-training degradation is visible."""
    data, _ = _jpeg(48, 64, seed=0)
    loader = TpuJpegLoader([(data, 0)] * 2, batch_size=2, crop_size=32)
    list(loader)
    assert loader.stats["offload"] == 2
    list(loader)
    assert loader.stats["offload"] == 2  # this epoch, not 4
    assert loader.stats_total["offload"] == 2  # prior epochs
