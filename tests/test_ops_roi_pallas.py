"""Pallas fused-separable RoIAlign kernel (ops/_pallas/roi_align.py).

Parity oracle is the gather path (itself pinned against the imported
reference in tests/test_ops_reference.py), so these tests close the
chain kernel -> gather -> reference CUDA/CPU semantics
(``torchvision/csrc/ops/cpu/roi_align_kernel.cpp``). Runs the Pallas
interpreter on CPU; the real-TPU A/B lives in bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu.ops.roi_align import (
    _roi_align_gather,
    roi_align,
    roi_align_mxu,
    set_roi_align_backend,
)
from vision_tpu.ops._pallas.roi_align import roi_align_pallas


def _rand_rois(rng, k, n_images, lo=-5.0, hi=35.0):
    xy = rng.uniform(lo, hi, (k, 2)).astype(np.float32)
    wh = np.abs(rng.uniform(lo, hi, (k, 2))).astype(np.float32)
    b = rng.randint(0, n_images, (k, 1)).astype(np.float32)
    return jnp.asarray(np.concatenate([b, xy, xy + wh], 1))


@pytest.mark.parametrize("aligned", [False, True])
def test_pallas_matches_gather_batched(aligned):
    """Batch-index folding + every pad path at once: W 31->32, C 8->128,
    K 40->pad to the roi block."""
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(2, 25, 31, 8).astype(np.float32))
    rois = _rand_rois(rng, 40, 2)
    a = _roi_align_gather(feat, rois, (7, 7), 0.5, 2, aligned)
    p = roi_align_pallas(feat, rois, (7, 7), 0.5, 2, aligned, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(p), atol=2e-5)


def test_pallas_matches_gather_frcnn_config():
    """The FRCNN P2 box-head shape (scaled down), K a multiple of the
    roi block, exact-tile W."""
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.rand(1, 50, 64, 128).astype(np.float32))
    rois = _rand_rois(rng, 64, 1, 0.0, 150.0)
    a = _roi_align_gather(feat, rois, (7, 7), 0.25, 2, False)
    p = roi_align_pallas(feat, rois, (7, 7), 0.25, 2, False, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(p), atol=2e-5)


def test_pallas_small_k_rect_pool():
    """K below one roi block; PH != PW (mask-head 14x14-style pools)."""
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.rand(1, 50, 64, 128).astype(np.float32))
    rois = _rand_rois(rng, 5, 1, 0.0, 150.0)
    a = _roi_align_gather(feat, rois, (14, 7), 0.25, 2, True)
    p = roi_align_pallas(feat, rois, (14, 7), 0.25, 2, True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(p), atol=2e-5)


def test_pallas_bf16_training_tolerance():
    rng = np.random.RandomState(3)
    feat32 = jnp.asarray(rng.rand(1, 40, 48, 128).astype(np.float32))
    rois = _rand_rois(rng, 32, 1, 0.0, 120.0)
    ref = np.asarray(_roi_align_gather(feat32, rois, (7, 7), 0.25, 2, False))
    p = roi_align_pallas(
        feat32.astype(jnp.bfloat16), rois, (7, 7), 0.25, 2, False,
        interpret=True,
    ).astype(jnp.float32)
    # single-pass bf16: same tolerance class as the mxu "default" path
    m = np.asarray(
        roi_align_mxu(feat32.astype(jnp.bfloat16), rois, (7, 7), 0.25, 2)
    ).astype(np.float32)
    assert np.abs(np.asarray(p) - ref).max() <= 2.0 * max(
        np.abs(m - ref).max(), 1e-3
    )


def test_pallas_sr4():
    """sampling_ratio=4 exercises denser combination rows + the sr^2
    average."""
    rng = np.random.RandomState(4)
    feat = jnp.asarray(rng.rand(1, 30, 33, 16).astype(np.float32))
    rois = _rand_rois(rng, 12, 1, 0.0, 80.0)
    a = _roi_align_gather(feat, rois, (5, 5), 0.5, 4, False)
    p = roi_align_pallas(feat, rois, (5, 5), 0.5, 4, False, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(p), atol=2e-5)


def test_pallas_backend_dispatch_and_grad():
    """The "pallas" backend routes through the custom-VJP wrapper:
    forward == kernel, grad-wrt-input == the einsum path's deterministic
    VJP, grad-wrt-rois == 0 (the reference op's contract — its autograd
    kernel computes grad_input only)."""
    rng = np.random.RandomState(5)
    feat = jnp.asarray(rng.rand(1, 20, 24, 8).astype(np.float32))
    rois = _rand_rois(rng, 9, 1, 0.0, 60.0)
    prev = set_roi_align_backend("pallas")
    try:
        out = roi_align(feat, rois, (7, 7), 0.5, 2)
        ref = _roi_align_gather(feat, rois, (7, 7), 0.5, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

        def loss(f, r):
            return jnp.sum(roi_align(f, r, (7, 7), 0.5, 2) ** 2)

        gf, gr = jax.grad(loss, argnums=(0, 1))(feat, rois)
        gf_ref = jax.grad(
            lambda f: jnp.sum(_roi_align_gather(f, rois, (7, 7), 0.5, 2) ** 2)
        )(feat)
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gf_ref), atol=1e-3
        )
        np.testing.assert_array_equal(np.asarray(gr), 0.0)
    finally:
        set_roi_align_backend(prev)


def test_backend_rejects_unknown():
    with pytest.raises(ValueError):
        set_roi_align_backend("cuda")
