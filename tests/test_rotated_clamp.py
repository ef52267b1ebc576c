"""Rotated-box clamping: behavior tests + a torch-CPU oracle transcription
of the reference algorithm (``transforms/v2/functional/_meta.py:403-660``)
for exact parity on random boxes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vision_tpu.ops.boxes import box_convert
from vision_tpu.transforms.v2.functional import clamp_bounding_boxes


# ---- torch oracle (reference semantics, same math in torch ops) --------
def _t_order(boxes, indices=None):
    if indices is None:
        x, y = boxes[..., 0::2], boxes[..., 1::2]
        y_max = torch.clamp(y.abs().max(dim=1, keepdim=True)[0], min=1e-12)
        x_max = torch.clamp(x.abs().max(dim=1, keepdim=True)[0], min=1e-12)
        _, x1 = (y / y_max + (x / x_max) * 100).min(dim=1)
        indices = torch.ones_like(boxes)
        indices[..., 0] = x1.mul(2)
        indices = indices.cumsum(1).remainder(8)
    return indices, boxes.gather(1, indices.to(torch.int64))


def _t_slope_intercept(box):
    x, y = box[..., ::2], box[..., 1::2]
    a = y.diff(append=y[..., 0:1]) / x.diff(append=x[..., 0:1])
    b = y - a * x
    return a, b


def _t_intersection(a, b):
    x = b.diff(prepend=b[..., 3:4]).neg() / a.diff(prepend=a[..., 3:4])
    y = a * x + b
    return torch.cat((x.unsqueeze(-1), y.unsqueeze(-1)), dim=-1).view(
        a.shape[0], 8
    )


def _t_clamp_y_intercept(boxes, orig, canvas_size, mode):
    a, b = _t_slope_intercept(boxes)
    a1, a2, a3, a4 = a.unbind(-1)
    b1, b2, b3, b4 = b.unbind(-1)
    _, bm = _t_slope_intercept(orig)
    b1m, b2m, b3m, b4m = bm.unbind(-1)
    b1 = b2.clamp(b1, b3).clamp(0, canvas_size[0])
    b4 = b3.clamp(b2, b4).clamp(0, canvas_size[0])
    if mode == "hard":
        b1 = b4 = (b1 + b4) / 2
        b2_c = torch.stack(
            [b1 * a2 / a1, b3 * a2 / a3,
             (a1 - a2) * canvas_size[1] + b1, (a3 - a2) * canvas_size[1] + b3],
            dim=1,
        )
        b2 = torch.max(b2_c, dim=1)[0].clamp(max=b2)
        b3_c = torch.stack(
            [canvas_size[0] * (1 - a3 / a4) + b4 * a3 / a4,
             canvas_size[0] * (1 - a3 / a2) + b2 * a3 / a2,
             (a2 - a3) * canvas_size[1] + b2, (a4 - a3) * canvas_size[1] + b4],
            dim=1,
        )
        b3 = torch.min(b3_c, dim=1)[0].clamp(min=b3)
    b1 = b1.clamp(b1m, b3m)
    b3 = b3.clamp(b1m, b3m)
    b2 = b2.clamp(b2m, b4m)
    b4 = b4.clamp(b2m, b4m)
    return torch.stack([b1, b2, b3, b4], dim=-1)


def _t_clamp_along_y(boxes, orig, canvas_size, mode):
    boxes = boxes.reshape(-1, 8)
    orig = orig.reshape(-1, 8)
    a, _ = _t_slope_intercept(boxes)
    x1, y1, x2, y2, x3, y3, x4, y4 = boxes.unbind(-1)
    b = _t_clamp_y_intercept(boxes, orig, canvas_size, mode)
    case_a = _t_intersection(a, b)
    case_b = boxes.clone()
    case_b[..., 0].clamp_(0)
    case_b[..., 6].clamp_(0)
    case_c = torch.zeros_like(case_b)
    cond_a = (x1 < 0) & ~case_a.isnan().any(-1)
    cond_b = y1.isclose(y2) | y3.isclose(y4)
    cond_c = (x1 <= 0) & (x2 <= 0) & (x3 <= 0) & (x4 <= 0)
    cond_c = cond_c | y1.isclose(y4) | y2.isclose(y3) | (
        cond_b & x1.isclose(x2)
    )
    for cond, case in zip([cond_a, cond_b, cond_c], [case_a, case_b, case_c]):
        boxes = torch.where(cond.unsqueeze(1).repeat(1, 8), case, boxes)
    return boxes


def _t_clamp_rotated_xyxyxyxy(boxes8, canvas_size, mode):
    out = boxes8.clone().reshape(-1, 8)
    orig = out.clone()
    h, w = canvas_size
    for _ in range(4):
        indices, out = _t_order(out)
        _, orig = _t_order(orig, indices)
        out = _t_clamp_along_y(out, orig, (h, w), mode)
        _, out = _t_order(out, indices)
        _, orig = _t_order(orig, indices)
        out[:, ::2], out[:, 1::2] = (
            out[:, 1::2].clone(), w - out[:, ::2].clone(),
        )
        orig[:, ::2], orig[:, 1::2] = (
            orig[:, 1::2].clone(), w - orig[:, ::2].clone(),
        )
        h, w = w, h
    return out


# ---- tests --------------------------------------------------------------
def _random_xyxyxyxy(n, seed):
    rng = np.random.RandomState(seed)
    cx = rng.uniform(-20, 170, n)
    cy = rng.uniform(-20, 120, n)
    bw = rng.uniform(10, 80, n)
    bh = rng.uniform(10, 60, n)
    th = rng.uniform(5, 85, n) * np.pi / 180  # avoid exact axis alignment
    pts = []
    for dx, dy in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
        x = cx + (dx * bw / 2) * np.cos(th) + (dy * bh / 2) * np.sin(th)
        y = cy - (dx * bw / 2) * np.sin(th) + (dy * bh / 2) * np.cos(th)
        pts.extend([x, y])
    return np.stack(pts, axis=1).astype(np.float32)


@pytest.mark.parametrize("mode", ["soft", "hard"])
def test_rotated_clamp_matches_reference_oracle(mode):
    canvas = (100, 150)
    boxes = _random_xyxyxyxy(64, seed=0)
    ours = np.asarray(
        clamp_bounding_boxes(
            jnp.asarray(boxes), format="XYXYXYXY", canvas_size=canvas,
            clamping_mode=mode,
        )
    )
    ref = _t_clamp_rotated_xyxyxyxy(
        torch.from_numpy(boxes), canvas, mode
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-4)


def test_axis_aligned_rotated_matches_plain_clamp():
    canvas = (100, 150)
    box = jnp.asarray([[-10.0, -5.0, 40.0, 30.0, 0.0]])
    out = clamp_bounding_boxes(
        box, format="XYWHR", canvas_size=canvas, clamping_mode="soft"
    )
    np.testing.assert_allclose(np.asarray(out), [[0, 0, 30, 25, 0]], atol=1e-3)


def test_hard_clamp_keeps_vertices_inside():
    canvas = (100, 150)
    rot = jnp.asarray([[-5.0, 20.0, 60.0, 30.0, 30.0]])
    hard = clamp_bounding_boxes(
        rot, format="XYWHR", canvas_size=canvas, clamping_mode="hard"
    )
    pts = np.asarray(box_convert(hard, "xywhr", "xyxyxyxy")).reshape(4, 2)
    assert (pts[:, 0] >= -1e-3).all() and (pts[:, 0] <= 150 + 1e-3).all()
    assert (pts[:, 1] >= -1e-3).all() and (pts[:, 1] <= 100 + 1e-3).all()


def test_inside_box_unchanged():
    inside = jnp.asarray([[50.0, 40.0, 30.0, 20.0, 30.0]])
    for mode in ("soft", "hard"):
        out = clamp_bounding_boxes(
            inside, format="XYWHR", canvas_size=(100, 150), clamping_mode=mode
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(inside), atol=1e-3)
