"""deform_conv2d, losses, stochastic_depth, drop_block, rotated IoU,
FPN/pooler shape + behavior tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from vision_tpu import ops


# ------------------------------------------------------- deform_conv ----
def test_deform_conv_zero_offset_equals_conv(rng):
    """With zero offsets and no mask, deform_conv2d == plain conv2d
    (torch CPU as oracle)."""
    n, h, w, cin, cout, k = 2, 10, 12, 6, 8, 3
    x = rng.randn(n, h, w, cin).astype(np.float32)
    wgt = rng.randn(k, k, cin, cout).astype(np.float32) * 0.1
    bias = rng.randn(cout).astype(np.float32)
    oh, ow = h - k + 1 + 2, w - k + 1 + 2  # padding 1, stride 1
    offset = np.zeros((n, oh, ow, 2 * k * k), np.float32)

    out = np.asarray(
        ops.deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(wgt),
            bias=jnp.asarray(bias), stride=(1, 1), padding=(1, 1),
        )
    )
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    wt = torch.from_numpy(wgt).permute(3, 2, 0, 1)  # HWIO -> OIHW
    ref = TF.conv2d(xt, wt, torch.from_numpy(bias), stride=1, padding=1)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_deform_conv_offset_shifts_input(rng):
    """Integer offset (dy=1, dx=0) samples one row lower — equals conv of
    the shifted input."""
    n, h, w, cin, cout, k = 1, 8, 8, 4, 5, 3
    x = rng.randn(n, h, w, cin).astype(np.float32)
    wgt = rng.randn(k, k, cin, cout).astype(np.float32) * 0.1
    oh = ow = h - k + 1
    offset = np.zeros((n, oh, ow, 2 * k * k), np.float32)
    offset[..., 0::2] = 1.0  # dy = 1 on every tap

    out = np.asarray(
        ops.deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(wgt))
    )
    x_shift = np.concatenate([x[:, 1:], np.zeros_like(x[:, :1])], axis=1)
    ref = np.asarray(
        ops.deform_conv2d(
            jnp.asarray(x_shift),
            jnp.asarray(np.zeros_like(offset)),
            jnp.asarray(wgt),
        )
    )
    # interior matches exactly; boundary rows sample zeros in both
    np.testing.assert_allclose(out[:, :-1], ref[:, :-1], atol=1e-4)


def test_deform_conv_mask_scales(rng):
    n, h, w, cin, cout, k = 1, 6, 6, 2, 3, 3
    x = rng.randn(n, h, w, cin).astype(np.float32)
    wgt = rng.randn(k, k, cin, cout).astype(np.float32)
    oh = ow = h - k + 1
    offset = np.zeros((n, oh, ow, 2 * k * k), np.float32)
    mask_half = np.full((n, oh, ow, k * k), 0.5, np.float32)
    full = np.asarray(
        ops.deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(wgt))
    )
    half = np.asarray(
        ops.deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(wgt),
            mask=jnp.asarray(mask_half),
        )
    )
    np.testing.assert_allclose(half, 0.5 * full, atol=1e-4)


def test_deform_conv_groups(rng):
    n, h, w, cin, cout, k = 2, 8, 8, 8, 6, 3
    groups = 2
    x = rng.randn(n, h, w, cin).astype(np.float32)
    wgt = rng.randn(k, k, cin // groups, cout).astype(np.float32) * 0.1
    oh = ow = h - k + 1
    offset = np.zeros((n, oh, ow, 2 * k * k), np.float32)
    out = np.asarray(
        ops.deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(wgt))
    )
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    wt = torch.from_numpy(wgt).permute(3, 2, 0, 1)
    ref = TF.conv2d(xt, wt, stride=1, groups=groups).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4)


# ------------------------------------------------------------ losses ----
def test_sigmoid_focal_loss_matches_manual(rng):
    logits = rng.randn(4, 7).astype(np.float32)
    targets = (rng.rand(4, 7) > 0.5).astype(np.float32)
    lt, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    p = torch.sigmoid(lt)
    ce = TF.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p_t = p * tt + (1 - p) * (1 - tt)
    ref = ce * ((1 - p_t) ** 2.0)
    ref = (0.25 * tt + 0.75 * (1 - tt)) * ref
    out = np.asarray(
        ops.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets))
    )
    np.testing.assert_allclose(out, ref.numpy(), atol=1e-5)
    for red in ["mean", "sum"]:
        o = ops.sigmoid_focal_loss(
            jnp.asarray(logits), jnp.asarray(targets), reduction=red
        )
        r = ref.mean() if red == "mean" else ref.sum()
        np.testing.assert_allclose(float(o), float(r), atol=1e-5)


def test_iou_losses_perfect_is_zero():
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    for fn in [
        ops.generalized_box_iou_loss,
        ops.complete_box_iou_loss,
        ops.distance_box_iou_loss,
    ]:
        assert abs(float(fn(b, b, reduction="sum"))) < 1e-5


def test_giou_loss_disjoint_above_one():
    b1 = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b2 = jnp.asarray([[10.0, 10.0, 11.0, 11.0]])
    assert float(ops.generalized_box_iou_loss(b1, b2, reduction="sum")) > 1.0


# ------------------------------------------------------ regularizers ----
def test_stochastic_depth_modes(rng):
    x = jnp.asarray(rng.randn(8, 4, 4, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)
    out = ops.stochastic_depth(x, 0.5, "row", training=True, key=key)
    # each row either zero or scaled by 1/0.5
    per_row = np.asarray(out).reshape(8, -1)
    xr = np.asarray(x).reshape(8, -1)
    for i in range(8):
        assert np.allclose(per_row[i], 0) or np.allclose(per_row[i], 2 * xr[i], atol=1e-5)
    # eval mode = identity
    np.testing.assert_array_equal(
        np.asarray(ops.stochastic_depth(x, 0.9, "batch", training=False)),
        np.asarray(x),
    )


def test_drop_block2d_shapes_and_eval(rng):
    x = jnp.asarray(rng.randn(2, 14, 14, 8).astype(np.float32))
    key = jax.random.PRNGKey(1)
    out = ops.drop_block2d(x, 0.3, 3, training=True, key=key)
    assert out.shape == x.shape
    np.testing.assert_array_equal(
        np.asarray(ops.drop_block2d(x, 0.3, 3, training=False)), np.asarray(x)
    )


def test_drop_block3d_shapes(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 4).astype(np.float32))
    out = ops.drop_block3d(x, 0.2, 3, training=True, key=jax.random.PRNGKey(2))
    assert out.shape == x.shape


# -------------------------------------------------------- rotated IoU ----
def test_box_iou_rotated_identity():
    b = jnp.asarray([[10.0, 10.0, 8.0, 4.0, 30.0]])
    iou = np.asarray(ops.box_iou_rotated(b, b))
    np.testing.assert_allclose(iou, 1.0, atol=1e-4)


@pytest.mark.slow
def test_box_iou_rotated_axis_aligned_matches_box_iou():
    r = jnp.asarray([[10.0, 10.0, 8.0, 6.0, 0.0], [13.0, 11.0, 8.0, 6.0, 0.0]])
    xyxy = ops.box_convert(r[:, :4], "cxcywh", "xyxy")
    ref = np.asarray(ops.box_iou(xyxy, xyxy))
    out = np.asarray(ops.box_iou_rotated(r, r))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_box_iou_rotated_90deg_square_invariant():
    a = jnp.asarray([[5.0, 5.0, 4.0, 4.0, 0.0]])
    b = jnp.asarray([[5.0, 5.0, 4.0, 4.0, 90.0]])
    np.testing.assert_allclose(np.asarray(ops.box_iou_rotated(a, b)), 1.0, atol=1e-4)


def test_box_iou_rotated_disjoint():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 15.0]])
    b = jnp.asarray([[100.0, 100.0, 2.0, 2.0, 40.0]])
    np.testing.assert_allclose(np.asarray(ops.box_iou_rotated(a, b)), 0.0, atol=1e-6)


def test_box_iou_rotated_45deg_known_value():
    # unit square vs itself rotated 45deg around the same center:
    # intersection is a regular octagon, area = 8*(sqrt(2)-1)/2 ~ 0.8284
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 45.0]])
    inter = 2 * (np.sqrt(2) - 1)
    expected = inter / (2 - inter)
    np.testing.assert_allclose(
        np.asarray(ops.box_iou_rotated(a, b)), expected, atol=1e-4
    )


# --------------------------------------------------------- FPN/pooler ----
def test_fpn_shapes(rng):
    import flax.linen as nn

    fpn = ops.FeaturePyramidNetwork(out_channels=16, extra_blocks=ops.LastLevelMaxPool())
    feats = {
        "c2": jnp.asarray(rng.randn(1, 32, 32, 4).astype(np.float32)),
        "c3": jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32)),
        "c4": jnp.asarray(rng.randn(1, 8, 8, 12).astype(np.float32)),
    }
    params = fpn.init(jax.random.PRNGKey(0), feats)
    out = fpn.apply(params, feats)
    assert set(out.keys()) == {"c2", "c3", "c4", "pool"}
    assert out["c2"].shape == (1, 32, 32, 16)
    assert out["pool"].shape == (1, 4, 4, 16)


def test_multiscale_roi_align_matches_single_level(rng):
    feat = jnp.asarray(rng.randn(1, 32, 32, 8).astype(np.float32))
    rois = jnp.asarray([[0, 10.0, 10.0, 100.0, 100.0]])
    pooler = ops.MultiScaleRoIAlign(["0"], output_size=7, sampling_ratio=2)
    out = pooler({"0": feat}, rois, image_size=(128, 128))
    ref = ops.roi_align(feat, rois, (7, 7), 0.25, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_multiscale_roi_align_level_assignment(rng):
    feats = {
        "0": jnp.asarray(rng.randn(1, 64, 64, 8).astype(np.float32)),
        "1": jnp.asarray(rng.randn(1, 32, 32, 8).astype(np.float32)),
    }
    # small box -> level 0, large box -> level 1
    rois = jnp.asarray(
        [[0, 0.0, 0.0, 32.0, 32.0], [0, 0.0, 0.0, 250.0, 250.0]]
    )
    pooler = ops.MultiScaleRoIAlign(["0", "1"], output_size=3, sampling_ratio=2)
    out = pooler(feats, rois, image_size=(256, 256))
    ref0 = ops.roi_align(feats["0"], rois[:1], (3, 3), 0.25, 2)
    ref1 = ops.roi_align(feats["1"], rois[1:], (3, 3), 0.125, 2)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref1[0]), atol=1e-6)


# ------------------------------------------------------- misc modules ----
def test_frozen_batch_norm():
    m = ops.FrozenBatchNorm2d(4)
    x = jnp.ones((1, 2, 2, 4))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-3)


def test_squeeze_excitation_shapes(rng):
    m = ops.SqueezeExcitation(8, 2)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == x.shape


def test_module_wrappers_match_functional():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vision_tpu import ops

    feat = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 4), jnp.float32)
    rois = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 4.0]])
    np.testing.assert_array_equal(
        ops.RoIAlign((2, 2), 1.0, 2)(feat, rois),
        ops.roi_align(feat, rois, (2, 2), 1.0, 2),
    )
    np.testing.assert_array_equal(
        ops.RoIPool((2, 2))(feat, rois), ops.roi_pool(feat, rois, (2, 2))
    )
    np.testing.assert_array_equal(
        ops.PSRoIPool((2, 2))(feat, rois), ops.ps_roi_pool(feat, rois, (2, 2))
    )
    # StochasticDepth eval mode is identity
    np.testing.assert_array_equal(
        ops.StochasticDepth(0.5, "row")(feat, training=False), feat
    )

    # DeformConv2d with zero offsets == plain convolution of its weights
    dc = ops.DeformConv2d(features=6, kernel_size=3, padding=1)
    offset = jnp.zeros((1, 8, 8, 2 * 9))
    variables = dc.init(jax.random.PRNGKey(0), feat, offset)
    out = dc.apply(variables, feat, offset)
    assert out.shape == (1, 8, 8, 6)
    w = variables["params"]["weight"]
    ref = jax.lax.conv_general_dilated(
        feat, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + variables["params"]["bias"]
    np.testing.assert_allclose(out, ref, atol=1e-4)
