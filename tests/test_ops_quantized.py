"""Quantized op parity: qnms / qroi_align vs independent numpy
transcriptions of the reference kernels
(``csrc/ops/quantized/cpu/qnms_kernel.cpp``,
``csrc/ops/quantized/cpu/qroi_align_kernel.cpp``)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vision_tpu.ops import qnms, qroi_align, roi_align


def _greedy_qnms_ref(boxes, scores, iou_threshold):
    """qnms_kernel.cpp:20-109: greedy suppress on int_repr cast to float,
    stable-descending score order, strict > threshold."""
    boxes = boxes.astype(np.float64)
    order = np.argsort(-scores.astype(np.float64), kind="stable")
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    suppressed = np.zeros(len(boxes), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > iou_threshold
    return np.array(keep, np.int64)


def _qroi_align_ref(
    inp_q, rois_q, in_scale, in_zp, r_scale, r_zp,
    spatial_scale, ph, pw, sampling_ratio, aligned,
):
    """qroi_align_kernel.cpp:19-160 transcribed (NHWC): dequantized-roi
    bilinear average of integer samples with realized-weight zero-point
    correction, round-half-even requantize, dtype clamp. N==1 like the
    kernel (batch index hard-coded 0, :50)."""
    _, H, W, C = inp_q.shape
    x = inp_q[0].astype(np.float64)
    out = np.zeros((len(rois_q), ph, pw, C), np.float64)
    for n, r in enumerate(rois_q):
        rf = (r.astype(np.float64) - r_zp) * r_scale
        off = 0.5 if aligned else 0.0
        sw, sh = rf[1] * spatial_scale - off, rf[2] * spatial_scale - off
        ew, eh = rf[3] * spatial_scale - off, rf[4] * spatial_scale - off
        rw, rh = ew - sw, eh - sh
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bh, bw = rh / ph, rw / pw
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rh / ph))
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rw / pw))
        count = max(gh * gw, 1)
        for iy in range(ph):
            for ix in range(pw):
                acc = np.zeros(C)
                sum_w = 0.0
                for sy in range(gh):
                    yy = sh + iy * bh + (sy + 0.5) * bh / gh
                    for sx in range(gw):
                        xx = sw + ix * bw + (sx + 0.5) * bw / gw
                        if yy < -1.0 or yy > H or xx < -1.0 or xx > W:
                            continue
                        y = min(max(yy, 0.0), H - 1)
                        xc = min(max(xx, 0.0), W - 1)
                        y0, x0 = int(y), int(xc)
                        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        ly, lx = y - y0, xc - x0
                        ws = [(1 - ly) * (1 - lx), (1 - ly) * lx,
                              ly * (1 - lx), ly * lx]
                        pts = [(y0, x0), (y0, x1), (y1, x0), (y1, x1)]
                        for w_, (py, px) in zip(ws, pts):
                            acc += w_ * x[py, px]
                            sum_w += w_
                val = in_scale * (acc - in_zp * sum_w) / count
                out[n, iy, ix] = val
    q = in_zp + np.round(out / in_scale)  # numpy rounds half to even
    info = np.iinfo(inp_q.dtype)
    return np.clip(q, info.min, info.max).astype(inp_q.dtype)


def test_qnms_matches_reference_greedy():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 64
        x1y1 = rng.randint(0, 180, (n, 2))
        wh = rng.randint(1, 75, (n, 2))
        boxes = np.concatenate([x1y1, x1y1 + wh], 1).astype(np.uint8)
        scores = rng.randint(0, 256, (n,)).astype(np.uint8)
        ref = _greedy_qnms_ref(boxes, scores, 0.5)
        got = np.asarray(qnms(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        got = got[got >= 0]
        np.testing.assert_array_equal(got, ref)


def test_qnms_scale_invariance():
    """The reference's "Note 1": int_repr NMS == dequantized NMS."""
    from vision_tpu.ops import nms

    rng = np.random.RandomState(1)
    boxes = rng.randint(0, 200, (48, 4)).astype(np.uint8)
    boxes[:, 2:] = np.maximum(boxes[:, 2:], boxes[:, :2] + 1)
    scores = rng.randint(0, 256, (48,)).astype(np.uint8)
    scale, zp = 0.37, 3
    deq_b = (boxes.astype(np.float32) - zp) * scale
    deq_s = (scores.astype(np.float32) - zp) * scale
    a = np.asarray(qnms(jnp.asarray(boxes), jnp.asarray(scores), 0.45))
    b = np.asarray(nms(jnp.asarray(deq_b), jnp.asarray(deq_s), 0.45))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("aligned", [False, True])
@pytest.mark.parametrize("sampling_ratio", [2, -1])
def test_qroi_align_matches_reference(aligned, sampling_ratio):
    rng = np.random.RandomState(42)
    H, W, C = 13, 11, 3
    inp = rng.randint(0, 256, (1, H, W, C)).astype(np.uint8)
    in_scale, in_zp = 0.173, 128
    r_scale, r_zp = 0.25, 2
    # rois in int_repr: batch 0, coords covering edges and interior
    rois_f = np.array(
        [[0, 1.0, 1.0, 9.5, 11.2], [0, 0.0, 0.0, 4.0, 4.0],
         [0, 5.3, 2.1, 10.9, 12.7], [0, -1.0, -1.0, 3.0, 3.0]]
    )
    rois_q = np.clip(np.round(rois_f / r_scale + r_zp), 0, 255).astype(
        np.uint8
    )
    ref = _qroi_align_ref(
        inp, rois_q, in_scale, in_zp, r_scale, r_zp,
        0.5, 3, 3, sampling_ratio, aligned,
    )
    got = np.asarray(
        qroi_align(
            jnp.asarray(inp), jnp.asarray(rois_q), in_scale, in_zp,
            r_scale, r_zp, spatial_scale=0.5, output_size=(3, 3),
            sampling_ratio=sampling_ratio, aligned=aligned,
        )
    )
    # f32-vs-f64 accumulation can flip a value sitting exactly on a
    # rounding boundary by 1 count; the reference's own quantized tests
    # use the same tolerance (test/test_ops.py qroi diff <= 1)
    assert got.dtype == ref.dtype
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_qroi_align_consistent_with_float_path():
    """Dequantize->roi_align->requantize equals qroi_align exactly (the
    zero-point correction identity in the module docstring)."""
    rng = np.random.RandomState(7)
    inp = rng.randint(0, 256, (1, 9, 9, 4)).astype(np.uint8)
    in_scale, in_zp = 0.31, 100
    rois_f = np.array([[0, 0.5, 0.5, 7.5, 7.5]], np.float32)
    got = np.asarray(
        qroi_align(
            jnp.asarray(inp), jnp.asarray(np.round(rois_f / 0.5).astype(np.uint8)),
            in_scale, in_zp, 0.5, 0,
            spatial_scale=1.0, output_size=(5, 5), sampling_ratio=2,
        )
    )
    deq = (inp.astype(np.float32) - in_zp) * in_scale
    f = np.asarray(
        roi_align(
            jnp.asarray(deq), jnp.asarray(rois_f), (5, 5),
            spatial_scale=1.0, sampling_ratio=2,
        )
    )
    req = np.clip(in_zp + np.round(f / in_scale), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, req)
