"""Detection utilities + RetinaNet behavior (reference
``test/test_models_detection_utils.py``, ``test_models_detection_anchor_utils.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu.models.detection import _utils as det_utils
from vision_tpu.models.detection.anchor_utils import AnchorGenerator
from vision_tpu.models.detection.transform import GeneralizedRCNNTransform


def test_box_coder_roundtrip(rng):
    coder = det_utils.BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))
    xy = rng.rand(10, 2) * 100
    wh = rng.rand(10, 2) * 50 + 5
    props = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    xy2 = rng.rand(10, 2) * 100
    wh2 = rng.rand(10, 2) * 50 + 5
    gts = np.concatenate([xy2, xy2 + wh2], 1).astype(np.float32)
    codes = coder.encode(jnp.asarray(gts), jnp.asarray(props))
    decoded = coder.decode(codes.reshape(10, 4), jnp.asarray(props))[:, 0]
    np.testing.assert_allclose(np.asarray(decoded), gts, atol=1e-3)


def test_box_coder_weights():
    """reference test_box_coder: known encode values."""
    coder = det_utils.BoxCoder(weights=(10.0, 10.0, 5.0, 5.0))
    props = jnp.asarray([[0.0, 0.0, 100.0, 100.0]])
    gts = jnp.asarray([[10.0, 10.0, 90.0, 90.0]])
    codes = np.asarray(coder.encode(gts, props))
    np.testing.assert_allclose(
        codes[0], [0.0, 0.0, 5 * np.log(0.8), 5 * np.log(0.8)], atol=1e-5
    )


def test_box_linear_coder_roundtrip(rng):
    coder = det_utils.BoxLinearCoder(normalize_by_size=True)
    anchors = jnp.asarray([[10.0, 10.0, 30.0, 30.0], [0.0, 0.0, 8.0, 8.0]])
    gts = jnp.asarray([[5.0, 8.0, 35.0, 28.0], [1.0, 1.0, 9.0, 7.0]])
    codes = coder.encode(gts, anchors)
    back = coder.decode(codes, anchors)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gts), atol=1e-4)


def test_matcher_thresholds():
    # 2 gt x 4 predictions
    m = det_utils.Matcher(0.7, 0.3, allow_low_quality_matches=False)
    quality = jnp.asarray(
        [[0.9, 0.5, 0.1, 0.0], [0.1, 0.2, 0.75, 0.25]]
    )
    matches = np.asarray(m(quality))
    assert matches[0] == 0  # high
    assert matches[1] == det_utils.BETWEEN_THRESHOLDS
    assert matches[2] == 1
    assert matches[3] == det_utils.BELOW_LOW_THRESHOLD


def test_matcher_allow_low_quality():
    m = det_utils.Matcher(0.7, 0.3, allow_low_quality_matches=True)
    quality = jnp.asarray([[0.2, 0.1], [0.05, 0.25]])
    matches = np.asarray(m(quality))
    # each gt's best prediction is rescued despite low quality
    assert matches[0] == 0
    assert matches[1] == 1


def test_matcher_padded_gt():
    m = det_utils.Matcher(0.7, 0.3)
    quality = jnp.asarray([[0.9, 0.9], [0.95, 0.99]])
    valid = jnp.asarray([True, False])  # second gt is padding
    matches = np.asarray(m(quality, valid_gt=valid))
    assert (matches == 0).all()


def test_sampler_budgets(rng):
    s = det_utils.BalancedPositiveNegativeSampler(8, 0.5)
    matched = jnp.asarray([0, 1, -1, -1, -1, -1, -2, 2])
    pos, neg = s(matched, jax.random.PRNGKey(0))
    pos, neg = np.asarray(pos), np.asarray(neg)
    assert pos.sum() == 3  # only 3 positives available (budget 4)
    assert neg.sum() == 4  # budget is 5 but only 4 negatives exist
    assert not (pos & neg).any()
    assert not pos[np.asarray(matched) < 0].any()
    assert not neg[np.asarray(matched) != -1].any()


def test_anchor_generator_counts():
    gen = AnchorGenerator(((32, 64),), ((0.5, 1.0),))
    anchors = gen((64, 64), [(8, 8)])
    assert len(anchors) == 1
    assert anchors[0].shape == (8 * 8 * 4, 4)
    # centered at stride offsets
    a = np.asarray(anchors[0])
    first = a[:4]
    np.testing.assert_allclose(first[:, 0] + first[:, 2], 0, atol=1e-4)


def test_anchor_generator_round_matches_torch():
    """reference cell anchors are rounded; spot-check size-32 ar-1."""
    gen = AnchorGenerator(((32,),), ((1.0,),))
    a = np.asarray(gen((32, 32), [(1, 1)])[0])
    np.testing.assert_allclose(a[0], [-16, -16, 16, 16])


def test_transform_resize_and_canvas(rng):
    t = GeneralizedRCNNTransform(min_size=100, max_size=150, fixed_size=(160, 160))
    img = rng.rand(50, 200, 3).astype(np.float32)
    il = t([jnp.asarray(img)])
    assert il.tensors.shape == (1, 160, 160, 3)
    nh, nw = il.image_sizes[0]
    assert nw == 150  # capped by max_size (200 * 0.75)
    assert nh == round(50 * 150 / 200)


def test_transform_postprocess_roundtrip():
    t = GeneralizedRCNNTransform(min_size=100, max_size=200, fixed_size=(224, 224))
    boxes = jnp.asarray([[10.0, 20.0, 50.0, 80.0]])
    out = t.postprocess_boxes(boxes, (100, 150), (200, 300))
    np.testing.assert_allclose(np.asarray(out), [[20, 40, 100, 160]])


def test_retinanet_loss_and_detections(rng):
    from vision_tpu.models.detection.retinanet import RetinaNet

    module = RetinaNet(backbone_depth=18, num_classes=5, detections_per_img=10,
                       topk_candidates=50)
    x = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x)
    cls, reg, anchors = module.apply(variables, x)
    # loss with 2 valid gt + 1 padded
    gt_boxes = jnp.asarray([[[10, 10, 50, 50], [60, 60, 100, 120], [0, 0, 0, 0]]], jnp.float32)
    gt_labels = jnp.asarray([[1, 3, 0]])
    gt_valid = jnp.asarray([[True, True, False]])
    losses = module.apply(
        variables, cls, reg, anchors, gt_boxes, gt_labels, gt_valid,
        method="compute_loss",
    )
    assert float(losses["classification"]) > 0
    assert float(losses["bbox_regression"]) >= 0
    dets = module.apply(
        variables, cls, reg, anchors, (128, 128), method="postprocess_detections"
    )
    assert dets.boxes.shape == (1, 10, 4)
    assert dets.valid.dtype == bool


def test_faster_rcnn_e2e_tiny(rng):
    """Full Faster R-CNN path (rpn -> roi heads -> nms) on a tiny image +
    training loss, resnet18 backbone for speed."""
    from vision_tpu.models.detection.faster_rcnn import FasterRCNN

    module = FasterRCNN(
        backbone_depth=18, num_classes=5,
        rpn_pre_nms_top_n=50, rpn_post_nms_top_n=20,
        box_detections_per_img=8,
    )
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x)
    dets = module.apply(variables, x)
    assert dets.boxes.shape == (1, 8, 4)
    assert dets.labels.shape == (1, 8)

    gt_boxes = jnp.asarray([[[5, 5, 30, 30], [0, 0, 0, 0]]], jnp.float32)
    gt_labels = jnp.asarray([[2, 0]])
    gt_valid = jnp.asarray([[True, False]])
    losses = module.apply(
        variables, x, gt_boxes, gt_labels, gt_valid, jax.random.PRNGKey(1),
        method="compute_loss",
    )
    for k in ["loss_objectness", "loss_rpn_box_reg", "loss_classifier", "loss_box_reg"]:
        assert np.isfinite(float(losses[k])), k


def test_paste_masks_in_image():
    from vision_tpu.models.detection.roi_heads import paste_masks_in_image

    masks = jnp.ones((1, 4, 4))
    boxes = jnp.asarray([[2.0, 2.0, 6.0, 6.0]])
    out = np.asarray(paste_masks_in_image(masks, boxes, 10, 10))
    assert out.shape == (1, 10, 10)
    assert out[0, 4, 4] > 0.9  # inside the box
    assert out[0, 0, 0] < 0.1  # far outside
    assert out[0, 9, 9] < 0.1


def test_paste_masks_matches_torch_reference():
    """paste_masks_in_image vs a torch transcription of the reference
    (roi_heads.py:486): expand by padding, int64-truncated boxes,
    interpolate(bilinear, align_corners=False) to (y1-y0+1, x1-x0+1),
    paste clipped to the image."""
    import torch
    import torch.nn.functional as TF

    from vision_tpu.models.detection.roi_heads import paste_masks_in_image

    def torch_paste(masks, boxes, im_h, im_w, padding=1):
        m = masks.shape[-1]
        scale = (m + 2 * padding) / m
        padded = TF.pad(masks[:, None], (padding,) * 4)
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        hw = (boxes[:, 2] - boxes[:, 0]) * 0.5 * scale
        hh = (boxes[:, 3] - boxes[:, 1]) * 0.5 * scale
        eb = torch.stack([cx - hw, cy - hh, cx + hw, cy + hh], 1).to(torch.int64)
        out = torch.zeros(len(boxes), im_h, im_w)
        for i, (mask, box) in enumerate(zip(padded, eb)):
            w = max(int(box[2] - box[0] + 1), 1)
            h = max(int(box[3] - box[1] + 1), 1)
            rm = TF.interpolate(
                mask[None], size=(h, w), mode="bilinear", align_corners=False
            )[0, 0]
            x_0, x_1 = max(int(box[0]), 0), min(int(box[2]) + 1, im_w)
            y_0, y_1 = max(int(box[1]), 0), min(int(box[3]) + 1, im_h)
            out[i, y_0:y_1, x_0:x_1] = rm[
                (y_0 - int(box[1])) : (y_1 - int(box[1])),
                (x_0 - int(box[0])) : (x_1 - int(box[0])),
            ]
        return out

    rng = np.random.RandomState(0)
    masks = rng.rand(4, 14, 14).astype(np.float32)
    boxes = np.asarray(
        [
            [3.2, 4.7, 18.9, 22.1],
            [-2.0, 1.0, 9.5, 12.0],  # partially off-image
            [10.0, 10.0, 29.0, 27.0],  # clipped at the far edge
            [5.0, 5.0, 5.4, 5.4],  # degenerate small
        ],
        np.float32,
    )
    ref = torch_paste(torch.from_numpy(masks), torch.from_numpy(boxes), 28, 30)
    got = np.asarray(
        paste_masks_in_image(jnp.asarray(masks), jnp.asarray(boxes), 28, 30)
    )
    np.testing.assert_allclose(got, ref.numpy(), atol=2e-5, rtol=1e-4)


def test_heatmaps_to_keypoints_exact_matches_torch():
    """Exact keypoint decode vs torch transcription of roi_heads.py:237
    (bicubic upsample to roi ceil size, argmax, width/height correction)."""
    import torch
    import torch.nn.functional as TF

    from vision_tpu.models.detection.keypoint_rcnn import (
        heatmaps_to_keypoints_exact,
    )

    def torch_decode(maps, rois):  # maps [D, K, H, W]
        d, k = maps.shape[:2]
        xy = torch.zeros(d, k, 3)
        sc = torch.zeros(d, k)
        for i in range(d):
            w = max(float(rois[i, 2] - rois[i, 0]), 1.0)
            h = max(float(rois[i, 3] - rois[i, 1]), 1.0)
            wc, hc = int(np.ceil(w)), int(np.ceil(h))
            rm = TF.interpolate(
                maps[i][:, None], size=(hc, wc), mode="bicubic",
                align_corners=False,
            )[:, 0]
            pos = rm.reshape(k, -1).argmax(dim=1)
            xs = (pos % wc).float()
            ys = torch.div(pos, wc, rounding_mode="floor").float()
            xy[i, :, 0] = (xs + 0.5) * (w / wc) + rois[i, 0]
            xy[i, :, 1] = (ys + 0.5) * (h / hc) + rois[i, 1]
            xy[i, :, 2] = 1
            sc[i] = rm.reshape(k, -1)[torch.arange(k), pos]
        return xy, sc

    rng = np.random.RandomState(0)
    maps = rng.rand(3, 14, 14, 5).astype(np.float32)  # D, H, W, K
    rois = np.asarray(
        [[4.2, 3.1, 40.8, 30.5], [0.0, 0.0, 14.0, 14.0], [10.0, 5.0, 90.3, 22.9]],
        np.float32,
    )
    got_xy, got_sc = heatmaps_to_keypoints_exact(maps, rois)
    ref_xy, ref_sc = torch_decode(
        torch.from_numpy(maps.transpose(0, 3, 1, 2)), torch.from_numpy(rois)
    )
    np.testing.assert_allclose(got_xy, ref_xy.numpy(), atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(got_sc, ref_sc.numpy(), atol=1e-4, rtol=1e-4)
