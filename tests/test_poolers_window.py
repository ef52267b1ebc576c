"""Windowed MultiScaleRoIAlign (TPU fast path) vs the dense reference path.

The windowed backend must reproduce the dense per-level masked-sum result
exactly (same roi_align math at the assigned level) whenever a roi's
bilinear corners fit its 32x32 window, and must route oversized rois
through the dense residual pass (exact up to ``overflow_capacity``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu.ops.poolers import MultiScaleRoIAlign, _windowed_multiscale


def _pyramid(rng, n=1, c=16, h0=64):
    feats = {}
    h = h0
    for i in range(4):
        feats[str(i)] = jnp.asarray(
            rng.randn(n, h, h, c).astype(np.float32)
        )
        h //= 2
    return feats


def _random_rois(rng, k, n, image_size, max_extent=200.0):
    cx = rng.rand(k) * image_size
    cy = rng.rand(k) * image_size
    w = rng.rand(k) * max_extent + 1.0
    h = rng.rand(k) * max_extent + 1.0
    x1 = np.clip(cx - w / 2, 0, image_size)
    y1 = np.clip(cy - h / 2, 0, image_size)
    x2 = np.clip(cx + w / 2, 0, image_size)
    y2 = np.clip(cy + h / 2, 0, image_size)
    b = rng.randint(0, n, size=k).astype(np.float32)
    return jnp.asarray(
        np.stack([b, x1, y1, x2, y2], axis=1).astype(np.float32)
    )


@pytest.mark.parametrize("n", [1, 2])
def test_windowed_matches_dense_random_boxes(n):
    rng = np.random.RandomState(0)
    feats = _pyramid(rng, n=n)
    image_size = (256, 256)
    rois = _random_rois(rng, 64, n, 256)
    keys = list(feats)
    dense_p = MultiScaleRoIAlign(keys, 7, 2, backend="dense")
    win_p = MultiScaleRoIAlign(keys, 7, 2, backend="window")
    want = dense_p(feats, rois, image_size)
    got = win_p(feats, rois, image_size)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_windowed_extreme_aspect_ratio_uses_dense_residual():
    """Slivers (AR >> 5) overflow the 32px window; the residual pass must
    recompute them exactly."""
    rng = np.random.RandomState(1)
    feats = _pyramid(rng)
    image_size = (256, 256)
    rois = jnp.asarray(
        np.array(
            [
                [0, 0.0, 100.0, 255.0, 110.0],  # 255x10 sliver (AR 25)
                [0, 120.0, 0.0, 130.0, 255.0],  # 10x255 sliver
                [0, 0.0, 0.0, 255.0, 8.0],  # edge-hugging sliver
                [0, 30.0, 30.0, 60.0, 60.0],  # normal box (window path)
            ],
            dtype=np.float32,
        )
    )
    keys = list(feats)
    want = MultiScaleRoIAlign(keys, 7, 2, backend="dense")(
        feats, rois, image_size
    )
    got = MultiScaleRoIAlign(keys, 7, 2, backend="window")(
        feats, rois, image_size
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_windowed_overflow_beyond_capacity_degrades_gracefully():
    """More oversized rois than overflow_capacity: no crash, finite
    output, and the non-overflowing rois stay exact."""
    rng = np.random.RandomState(2)
    feats = _pyramid(rng)
    image_size = (256, 256)
    slivers = np.tile(
        np.array([[0, 0.0, 100.0, 255.0, 106.0]], np.float32), (8, 1)
    )
    slivers[:, 2] += np.arange(8) * 10  # distinct rows
    slivers[:, 4] += np.arange(8) * 10
    normal = np.array([[0, 30.0, 30.0, 70.0, 70.0]], np.float32)
    rois = jnp.asarray(np.concatenate([slivers, normal]))
    keys = list(feats)
    got = MultiScaleRoIAlign(
        keys, 7, 2, backend="window", overflow_capacity=2
    )(feats, rois, image_size)
    assert np.isfinite(np.asarray(got)).all()
    want = MultiScaleRoIAlign(keys, 7, 2, backend="dense")(
        feats, rois, image_size
    )
    np.testing.assert_allclose(
        np.asarray(got[-1]), np.asarray(want[-1]), atol=2e-5, rtol=1e-5
    )


def test_windowed_bf16_and_mask_config():
    """14x14 mask-branch config, bf16 features."""
    rng = np.random.RandomState(3)
    feats = {
        k: v.astype(jnp.bfloat16) for k, v in _pyramid(rng).items()
    }
    image_size = (256, 256)
    rois = _random_rois(rng, 32, 1, 256)
    keys = list(feats)
    want = MultiScaleRoIAlign(keys, 14, 2, backend="dense")(
        feats, rois, image_size
    )
    got = MultiScaleRoIAlign(keys, 14, 2, backend="window")(
        feats, rois, image_size
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        atol=3e-2,
        rtol=3e-2,
    )


def test_windowed_tiny_levels_smaller_than_window():
    """Levels smaller than the 32px window (P5 at 832 input is 26x26):
    window slices bleed into the zero padding / next level rows but the
    local weights never reference them."""
    rng = np.random.RandomState(4)
    feats = {
        "0": jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32)),
        "1": jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32)),
    }
    image_size = (64, 64)
    rois = _random_rois(rng, 16, 1, 64, max_extent=60.0)
    want = MultiScaleRoIAlign(["0", "1"], 7, 2, backend="dense")(
        feats, rois, image_size
    )
    got = MultiScaleRoIAlign(["0", "1"], 7, 2, backend="window")(
        feats, rois, image_size
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_windowed_under_jit_and_grad():
    """The windowed path must be jittable and differentiable (train-time
    box/mask branches pool sampled proposals)."""
    rng = np.random.RandomState(5)
    feats = _pyramid(rng, c=8)
    image_size = (256, 256)
    rois = _random_rois(rng, 16, 1, 256)
    keys = list(feats)
    pooler = MultiScaleRoIAlign(keys, 7, 2, backend="window")

    @jax.jit
    def loss(fs):
        return jnp.sum(pooler(fs, rois, image_size) ** 2)

    g = jax.grad(loss)(feats)
    for k in keys:
        assert np.isfinite(np.asarray(g[k])).all()
    # grads flow: at least the finest level receives signal
    assert float(jnp.abs(g[keys[0]]).sum()) > 0
