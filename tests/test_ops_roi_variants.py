"""roi_pool / ps_roi_align / ps_roi_pool vs numpy transcriptions of the
reference CPU kernels (``csrc/ops/cpu/*_kernel.cpp``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu.ops.ps_roi_align import ps_roi_align
from vision_tpu.ops.ps_roi_pool import ps_roi_pool
from vision_tpu.ops.roi_pool import roi_pool


def _roi_pool_ref(inp, rois, out_size, scale):
    K, (PH, PW) = rois.shape[0], out_size
    N, H, W, C = inp.shape
    out = np.zeros((K, PH, PW, C))
    for k in range(K):
        b = int(rois[k, 0])
        sw = int(round(rois[k, 1] * scale))
        sh = int(round(rois[k, 2] * scale))
        ew = int(round(rois[k, 3] * scale))
        eh = int(round(rois[k, 4] * scale))
        rw, rh = max(ew - sw + 1, 1), max(eh - sh + 1, 1)
        bh, bw = rh / PH, rw / PW
        for ph in range(PH):
            for pw in range(PW):
                hs = min(max(int(np.floor(ph * bh)) + sh, 0), H)
                he = min(max(int(np.ceil((ph + 1) * bh)) + sh, 0), H)
                ws = min(max(int(np.floor(pw * bw)) + sw, 0), W)
                we = min(max(int(np.ceil((pw + 1) * bw)) + sw, 0), W)
                if he <= hs or we <= ws:
                    out[k, ph, pw] = 0
                else:
                    out[k, ph, pw] = inp[b, hs:he, ws:we].max(axis=(0, 1))
    return out


def _bilinear_ra(feat, y, x):
    H, W = feat.shape[:2]
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(feat.shape[-1])
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
    return (
        (1 - ly) * (1 - lx) * feat[yl, xl]
        + (1 - ly) * lx * feat[yl, xh]
        + ly * (1 - lx) * feat[yh, xl]
        + ly * lx * feat[yh, xh]
    )


def _ps_roi_align_ref(inp, rois, out_size, scale, sr):
    K, (PH, PW) = rois.shape[0], out_size
    N, H, W, C = inp.shape
    c_out = C // (PH * PW)
    out = np.zeros((K, PH, PW, c_out))
    for k in range(K):
        b = int(rois[k, 0])
        sw = rois[k, 1] * scale - 0.5
        sh = rois[k, 2] * scale - 0.5
        ew = rois[k, 3] * scale - 0.5
        eh = rois[k, 4] * scale - 0.5
        rw, rh = ew - sw, eh - sh
        bh, bw = rh / PH, rw / PW
        gh = sr if sr > 0 else int(np.ceil(rh / PH))
        gw = sr if sr > 0 else int(np.ceil(rw / PW))
        cnt = gh * gw
        for co in range(c_out):
            for ph in range(PH):
                for pw in range(PW):
                    cin = (co * PH + ph) * PW + pw
                    acc = 0.0
                    for iy in range(gh):
                        yy = ph * bh + sh + (iy + 0.5) * bh / gh
                        for ix in range(gw):
                            xx = pw * bw + sw + (ix + 0.5) * bw / gw
                            acc += _bilinear_ra(inp[b, :, :, cin : cin + 1], yy, xx)[0]
                    out[k, ph, pw, co] = acc / cnt
    return out


def _ps_roi_pool_ref(inp, rois, out_size, scale):
    K, (PH, PW) = rois.shape[0], out_size
    N, H, W, C = inp.shape
    c_out = C // (PH * PW)
    out = np.zeros((K, PH, PW, c_out))
    for k in range(K):
        b = int(rois[k, 0])
        sw = int(round(rois[k, 1] * scale))
        sh = int(round(rois[k, 2] * scale))
        ew = int(round(rois[k, 3] * scale))
        eh = int(round(rois[k, 4] * scale))
        rw, rh = max(ew - sw, 1), max(eh - sh, 1)
        bh, bw = rh / PH, rw / PW
        for co in range(c_out):
            for ph in range(PH):
                for pw in range(PW):
                    cin = (co * PH + ph) * PW + pw
                    hs = min(max(int(np.floor(ph * bh)) + sh, 0), H - 1)
                    he = min(max(int(np.ceil((ph + 1) * bh)) + sh, 0), H - 1)
                    ws = min(max(int(np.floor(pw * bw)) + sw, 0), W - 1)
                    we = min(max(int(np.ceil((pw + 1) * bw)) + sw, 0), W - 1)
                    if he <= hs or we <= ws:
                        out[k, ph, pw, co] = 0
                    else:
                        region = inp[b, hs:he, ws:we, cin]
                        out[k, ph, pw, co] = region.sum() / region.size
    return out


ROIS = np.array(
    [
        [0, 1.5, 2.5, 14.0, 12.0],
        [1, 0.0, 0.0, 19.0, 15.0],
        [0, 3.0, 3.0, 9.0, 9.0],
        [1, 10.0, 8.0, 18.0, 14.0],
    ],
    dtype=np.float32,
)


@pytest.mark.parametrize("scale", [1.0, 0.5])
def test_roi_pool_matches_reference(rng, scale):
    inp = rng.randn(2, 16, 20, 6).astype(np.float32)
    ref = _roi_pool_ref(inp, ROIS, (5, 5), scale)
    out = np.asarray(roi_pool(jnp.asarray(inp), jnp.asarray(ROIS), (5, 5), scale))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize("sr", [2, -1])
def test_ps_roi_align_matches_reference(rng, sr):
    inp = rng.randn(2, 16, 20, 3 * 3 * 4).astype(np.float32)
    ref = _ps_roi_align_ref(inp, ROIS, (3, 3), 0.5, sr)
    out = np.asarray(
        ps_roi_align(jnp.asarray(inp), jnp.asarray(ROIS), (3, 3), 0.5, sr)
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_ps_roi_pool_matches_reference(rng):
    inp = rng.randn(2, 16, 20, 3 * 3 * 4).astype(np.float32)
    ref = _ps_roi_pool_ref(inp, ROIS, (3, 3), 0.5)
    out = np.asarray(ps_roi_pool(jnp.asarray(inp), jnp.asarray(ROIS), (3, 3), 0.5))
    np.testing.assert_allclose(out, ref, atol=1e-5)
