"""Op correctness vs slow numpy references — the reference's own strategy
(``test/test_ops.py``: RoIOpTester checks against a pure reimplementation,
NMS against a numpy greedy loop, ``test_ops.py:844``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu.ops import boxes as B
from vision_tpu.ops.nms import batched_nms, nms, nms_mask
from vision_tpu.ops.roi_align import roi_align


# ---------------------------------------------------------------- NMS ----
def _ref_nms(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep, sup = [], np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        iou = inter / (areas + areas[i] - inter)
        sup |= iou > thr
        sup[i] = False
    return np.array(keep, dtype=np.int64)


def _random_boxes(rng, n, scale=100.0):
    xy = rng.rand(n, 2) * scale
    wh = rng.rand(n, 2) * scale / 2
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


@pytest.mark.parametrize("n", [1, 17, 200])
@pytest.mark.parametrize("thr", [0.3, 0.5, 0.7])
def test_nms_matches_greedy_reference(rng, n, thr):
    boxes = _random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    ref = _ref_nms(boxes, scores, thr)
    out = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), thr))
    np.testing.assert_array_equal(out[out >= 0], ref)


def test_nms_mask_with_padding(rng):
    boxes = _random_boxes(rng, 50)
    scores = rng.rand(50).astype(np.float32)
    valid = np.ones(50, bool)
    valid[30:] = False
    keep = np.asarray(
        nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5, valid=jnp.asarray(valid))
    )
    assert not keep[30:].any()
    ref = _ref_nms(boxes[:30], scores[:30], 0.5)
    np.testing.assert_array_equal(np.nonzero(keep[:30])[0], np.sort(ref))


def test_batched_nms_classes_do_not_interact(rng):
    boxes = np.tile(_random_boxes(rng, 40), (2, 1))
    scores = rng.rand(80).astype(np.float32)
    idxs = np.repeat(np.arange(2), 40)
    out = np.asarray(
        batched_nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), 0.5)
    )
    got = set(out[out >= 0].tolist())
    for c in range(2):
        sel = np.nonzero(idxs == c)[0]
        ref = sel[_ref_nms(boxes[sel], scores[sel], 0.5)]
        assert set(ref.tolist()) <= got
    assert len(got) == sum(
        len(_ref_nms(boxes[idxs == c], scores[idxs == c], 0.5)) for c in range(2)
    )


def test_nms_jit_static_shape(rng):
    boxes = _random_boxes(rng, 64)
    scores = rng.rand(64).astype(np.float32)
    f = jax.jit(lambda b, s: nms_mask(b, s, 0.5))
    out = np.asarray(f(jnp.asarray(boxes), jnp.asarray(scores)))
    ref = _ref_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(np.sort(np.nonzero(out)[0]), np.sort(ref))


# ---------------------------------------------------------- roi_align ----
def _bilinear_ref(feat, y, x):
    H, W, C = feat.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(C)
    y, x = max(y, 0.0), max(x, 0.0)
    yl, xl = int(y), int(x)
    yh, xh = min(yl + 1, H - 1), min(xl + 1, W - 1)
    if yl >= H - 1:
        yl = yh = H - 1
        y = float(yl)
    if xl >= W - 1:
        xl = xh = W - 1
        x = float(xl)
    ly, lx = y - yl, x - xl
    hy, hx = 1 - ly, 1 - lx
    return (
        hy * hx * feat[yl, xl]
        + hy * lx * feat[yl, xh]
        + ly * hx * feat[yh, xl]
        + ly * lx * feat[yh, xh]
    )


def _roi_align_ref(inp, rois, out_size, scale, sr, aligned):
    K, (PH, PW), C = rois.shape[0], out_size, inp.shape[-1]
    out = np.zeros((K, PH, PW, C))
    off = 0.5 if aligned else 0.0
    for k in range(K):
        b = int(rois[k, 0])
        sw, sh = rois[k, 1] * scale - off, rois[k, 2] * scale - off
        ew, eh = rois[k, 3] * scale - off, rois[k, 4] * scale - off
        rw, rh = ew - sw, eh - sh
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bh, bw = rh / PH, rw / PW
        gh = sr if sr > 0 else int(np.ceil(rh / PH))
        gw = sr if sr > 0 else int(np.ceil(rw / PW))
        cnt = max(gh * gw, 1)
        for ph in range(PH):
            for pw in range(PW):
                acc = np.zeros(C)
                for iy in range(gh):
                    yy = sh + ph * bh + (iy + 0.5) * bh / gh
                    for ix in range(gw):
                        xx = sw + pw * bw + (ix + 0.5) * bw / gw
                        acc += _bilinear_ref(inp[b], yy, xx)
                out[k, ph, pw] = acc / cnt
    return out


ROIS = np.array(
    [
        [0, 1.5, 2.5, 14.0, 12.0],
        [1, 0.0, 0.0, 20.0, 16.0],
        [0, -2.0, -2.0, 5.0, 5.0],
        [1, 10.0, 8.0, 30.0, 25.0],
        [0, 5.0, 5.0, 5.5, 5.5],
    ],
    dtype=np.float32,
)


@pytest.mark.parametrize("sr", [2, -1])
@pytest.mark.parametrize("aligned", [False, True])
@pytest.mark.parametrize("scale", [1.0, 0.5])
def test_roi_align_matches_reference(rng, sr, aligned, scale):
    inp = rng.randn(2, 16, 20, 8).astype(np.float32)
    ref = _roi_align_ref(inp, ROIS, (7, 7), scale, sr, aligned)
    out = np.asarray(
        roi_align(jnp.asarray(inp), jnp.asarray(ROIS), (7, 7), scale, sr, aligned)
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_roi_align_grad_deterministic(rng):
    inp = rng.randn(1, 8, 8, 4).astype(np.float32)
    rois = np.array([[0, 1.0, 1.0, 6.0, 6.0]], dtype=np.float32)

    def loss(x):
        return jnp.sum(roi_align(x, jnp.asarray(rois), (3, 3), 1.0, 2, True))

    g1 = jax.grad(loss)(jnp.asarray(inp))
    g2 = jax.grad(loss)(jnp.asarray(inp))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert np.abs(np.asarray(g1)).sum() > 0


# -------------------------------------------------------------- boxes ----
def test_box_convert_roundtrip(rng):
    boxes = _random_boxes(rng, 10)
    for fmt in ["xywh", "cxcywh"]:
        conv = B.box_convert(jnp.asarray(boxes), "xyxy", fmt)
        back = B.box_convert(conv, fmt, "xyxy")
        np.testing.assert_allclose(np.asarray(back), boxes, atol=1e-5)


def test_box_convert_rotated_roundtrip(rng):
    b = np.concatenate(
        [rng.rand(8, 2) * 50, 5 + rng.rand(8, 2) * 20, rng.rand(8, 1) * 90],
        axis=1,
    ).astype(np.float32)
    for fmt in ["cxcywhr", "xyxyxyxy"]:
        conv = B.box_convert(jnp.asarray(b), "xywhr", fmt)
        back = B.box_convert(conv, fmt, "xywhr")
        np.testing.assert_allclose(np.asarray(back), b, atol=1e-3)


def test_box_iou_basics():
    b1 = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], dtype=jnp.float32)
    iou = np.asarray(B.box_iou(b1, b1))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0, atol=1e-6)


def test_generalized_box_iou():
    b1 = jnp.asarray([[0, 0, 10, 10]], dtype=jnp.float32)
    b2 = jnp.asarray([[20, 20, 30, 30]], dtype=jnp.float32)
    giou = np.asarray(B.generalized_box_iou(b1, b2))
    assert giou[0, 0] < 0  # disjoint boxes have negative GIoU


def test_masks_to_boxes():
    m = np.zeros((2, 10, 12), dtype=np.uint8)
    m[0, 2:5, 3:8] = 1
    boxes = np.asarray(B.masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_allclose(boxes[0], [3, 2, 7, 4])
    np.testing.assert_allclose(boxes[1], [0, 0, 0, 0])


def test_clip_boxes_to_image():
    b = jnp.asarray([[-5.0, -5.0, 120.0, 40.0]])
    out = np.asarray(B.clip_boxes_to_image(b, (50, 100)))
    np.testing.assert_allclose(out[0], [0, 0, 100, 40])


# ------------------------------------------------- Pallas NMS kernel ----
# The Pallas kernel rides the hot path whenever jax.default_backend()=="tpu"
# (ops/nms.py:_pallas_nms_enabled). Parity is pinned two ways: the kernel
# body in interpreter mode here (CPU), and the compiled kernel on real TPU
# in a tpu-marked test.
def _pallas_nms_kernels():
    from vision_tpu.ops._pallas.nms import (
        nms_pallas_bitmask_sorted,
        nms_pallas_sorted,
    )

    # bitmask = the r4 block-parallel default; rowscan = the r2 kernel
    # kept behind VISION_TPU_NMS_KERNEL=rowscan
    return {"bitmask": nms_pallas_bitmask_sorted, "rowscan": nms_pallas_sorted}


@pytest.mark.parametrize("kernel", ["bitmask", "rowscan"])
@pytest.mark.parametrize("n", [1, 64, 130, 300])
@pytest.mark.parametrize("thr", [0.3, 0.5, 0.7])
def test_nms_pallas_interpret_matches_greedy_reference(rng, kernel, n, thr):
    fn = _pallas_nms_kernels()[kernel]
    boxes = _random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    keep = np.asarray(
        fn(
            jnp.asarray(boxes[order]),
            jnp.ones((n,), bool),
            thr,
            interpret=True,
        )
    )
    ref = _ref_nms(boxes, scores, thr)
    np.testing.assert_array_equal(order[keep], ref)


@pytest.mark.parametrize("kernel", ["bitmask", "rowscan"])
def test_nms_pallas_interpret_padding_rows_never_suppress(rng, kernel):
    fn = _pallas_nms_kernels()[kernel]
    boxes = _random_boxes(rng, 40)
    scores = rng.rand(40).astype(np.float32)
    # mark the last 10 (lowest-score after sort manipulation) invalid
    scores[30:] = -1.0  # sort them last
    order = np.argsort(-scores, kind="stable")
    valid = np.zeros(40, bool)
    valid[:30] = True  # in sorted order: exactly the -1-score rows invalid
    keep = np.asarray(
        fn(jnp.asarray(boxes[order]), jnp.asarray(valid), 0.5, interpret=True)
    )
    assert not keep[30:].any()
    ref = _ref_nms(boxes[order[:30]], scores[order[:30]], 0.5)
    np.testing.assert_array_equal(np.nonzero(keep[:30])[0], np.sort(ref))


@pytest.mark.tpu
@pytest.mark.parametrize("kernel", ["bitmask", "rowscan"])
def test_nms_pallas_compiled_matches_reference_on_tpu(rng, kernel):
    if jax.default_backend() != "tpu":
        pytest.skip("requires TPU")
    fn = _pallas_nms_kernels()[kernel]
    for n, thr in [(200, 0.5), (1000, 0.5), (1000, 0.7)]:
        boxes = _random_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        keep = np.asarray(
            fn(jnp.asarray(boxes[order]), jnp.ones((n,), bool), thr)
        )
        ref = _ref_nms(boxes, scores, thr)
        np.testing.assert_array_equal(order[keep], ref)


def test_roi_align_mxu_matches_gather(rng):
    """MXU (separable one-hot matmul) roi_align == gather roi_align at
    highest precision, including partially-out-of-bounds rois."""
    from vision_tpu.ops.roi_align import roi_align, roi_align_mxu

    feat = jnp.asarray(rng.rand(1, 24, 30, 8).astype(np.float32))
    rois = jnp.asarray(
        np.array(
            [
                [0, 2.3, 3.1, 20.4, 18.9],
                [0, -4.0, -2.0, 10.0, 8.0],  # out-of-bounds corner
                [0, 25.0, 20.0, 40.0, 33.0],  # beyond far edge
                [0, 5.0, 5.0, 5.2, 5.2],  # tiny
            ],
            np.float32,
        )
    )
    for aligned in (False, True):
        ref = roi_align(feat, rois, (7, 7), 0.5, 2, aligned)
        got = roi_align_mxu(feat, rois, (7, 7), 0.5, 2, aligned)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-6, rtol=1e-5
        )
    # batched: the per-roi batch index folds into the W_y one-hot offset
    feat2 = jnp.asarray(rng.rand(3, 24, 30, 8).astype(np.float32))
    rois2 = jnp.asarray(
        np.array(
            [
                [1, 2.0, 2.0, 10.0, 10.0],
                [0, 1.0, 4.0, 22.0, 19.0],
                [2, -3.0, -3.0, 9.0, 7.5],
                [2, 12.0, 8.0, 28.0, 23.0],
            ],
            np.float32,
        )
    )
    ref = roi_align(feat2, rois2, (3, 3), 1.0, 2)
    got = roi_align_mxu(feat2, rois2, (3, 3), 1.0, 2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6, rtol=1e-5
    )
    # adaptive sampling_ratio still routes to the gather impl
    ref = roi_align(feat2, rois2, (3, 3), 1.0, -1)
    got = roi_align_mxu(feat2, rois2, (3, 3), 1.0, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_roi_align_backend_dispatch(rng):
    """set_roi_align_backend routes the public roi_align through the MXU
    formulation; results match the gather path (training-grade parity, the
    dispatch the detection poolers ride on TPU)."""
    from vision_tpu.ops.roi_align import roi_align, set_roi_align_backend

    feat = jnp.asarray(rng.rand(2, 16, 20, 8).astype(np.float32))
    rois = jnp.asarray(
        np.array(
            [[0, 2.0, 3.0, 14.0, 12.0], [1, -1.0, 0.0, 9.0, 15.5]],
            np.float32,
        )
    )
    ref = roi_align(feat, rois, (7, 7), 0.5, 2, True)
    prev = set_roi_align_backend("mxu")
    try:
        got = roi_align(feat, rois, (7, 7), 0.5, 2, True)
        # gradients flow through the einsum path deterministically
        g = jax.grad(
            lambda f: roi_align(f, rois, (7, 7), 0.5, 2, True).sum()
        )(feat)
        g2 = jax.grad(
            lambda f: roi_align(f, rois, (7, 7), 0.5, 2, True).sum()
        )(feat)
    finally:
        set_roi_align_backend(prev)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6, rtol=1e-5
    )
    gg = jax.grad(
        lambda f: roi_align(f, rois, (7, 7), 0.5, 2, True).sum()
    )(feat)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g2))
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(gg), atol=2e-6, rtol=1e-5
    )


def test_roi_align_mxu_training_precision_parity(rng):
    """The f32 MXU dispatch default is precision="high" (bf16x3) from r4:
    half the MXU passes of "highest" with ~f32-grade accuracy (VERDICT r3
    item 8). On CPU the precision flag is inert (this asserts the
    plumbing + exact math); on TPU the same assertion bounds the bf16x3
    error at training tolerance — run there via
    ``JAX_PLATFORMS= pytest -k training_precision`` on a chip."""
    from vision_tpu.ops.roi_align import _roi_align_gather, roi_align_mxu

    feat = jnp.asarray(rng.rand(1, 50, 68, 64).astype(np.float32))
    n = 64
    xy = rng.uniform(0, 150, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, 80, (n, 2)).astype(np.float32)
    rois = jnp.asarray(
        np.concatenate([np.zeros((n, 1), np.float32), xy, xy + wh], 1)
    )
    ref = _roi_align_gather(feat, rois, (7, 7), 0.25, 2, True)
    got = roi_align_mxu(feat, rois, (7, 7), 0.25, 2, True)  # default=high
    # training tolerance: 1e-3 relative on [0,1)-valued features
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3
    )
    # the exact-parity opt-in stays available and tighter
    exact = roi_align_mxu(
        feat, rois, (7, 7), 0.25, 2, True, precision="highest"
    )
    np.testing.assert_allclose(
        np.asarray(exact), np.asarray(ref), atol=2e-6, rtol=1e-5
    )


def test_nms_mask_presorted_matches_default(rng):
    """presorted=True on descending-score rows (incl. interleaved invalid
    rows) must equal the default sort-then-kernel path."""
    for n, thr in [(64, 0.5), (300, 0.3), (1024, 0.7)]:
        boxes = _random_boxes(rng, n)
        scores = np.sort(rng.rand(n).astype(np.float32))[::-1].copy()
        valid = rng.rand(n) > 0.2  # interleaved invalids
        args = (jnp.asarray(boxes), jnp.asarray(scores), thr)
        ref = np.asarray(nms_mask(*args, valid=jnp.asarray(valid)))
        out = np.asarray(
            nms_mask(*args, valid=jnp.asarray(valid), presorted=True)
        )
        np.testing.assert_array_equal(out, ref)
        # and without a valid mask
        ref2 = np.asarray(nms_mask(*args))
        out2 = np.asarray(nms_mask(*args, presorted=True))
        np.testing.assert_array_equal(out2, ref2)
