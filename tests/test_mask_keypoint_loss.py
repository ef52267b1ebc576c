"""Mask/keypoint branch training losses (reference roi_heads.py:100
maskrcnn_loss and keypointrcnn_loss + keypoints_to_heatmap) — numpy
transcriptions + end-to-end compute_loss smoke on tiny inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_ops_reference import _roi_align_ref
from vision_tpu.models.detection.roi_heads import (
    RoIHeadsLogic,
    SampledProposals,
)


def _sampled(n, s, g, rng, image=64):
    boxes = np.zeros((n, s, 4), np.float32)
    xy = rng.uniform(2, image - 20, (n, s, 2))
    wh = rng.uniform(8, 18, (n, s, 2))
    boxes[..., :2] = xy
    boxes[..., 2:] = xy + wh
    labels = rng.randint(0, 4, (n, s)).astype(np.int32)
    pos = rng.rand(n, s) < 0.6
    labels = np.where(pos, np.maximum(labels, 1), 0)
    matched = rng.randint(0, g, (n, s)).astype(np.int32)
    return SampledProposals(
        boxes=jnp.asarray(boxes),
        labels=jnp.asarray(labels),
        reg_targets=jnp.zeros((n, s, 4)),
        pos_mask=jnp.asarray(pos),
        valid=jnp.ones((n, s), bool),
        matched_gt=jnp.asarray(matched),
    )


def test_maskrcnn_loss_matches_numpy_transcription():
    rng = np.random.RandomState(0)
    n, s, g, m, c = 2, 5, 3, 14, 4
    sampled = _sampled(n, s, g, rng)
    gt_masks = (rng.rand(n, g, 64, 64) > 0.5).astype(np.float32)
    mask_logits = rng.randn(n, s, m, m, c).astype(np.float32)

    logic = RoIHeadsLogic()
    got = float(
        logic.maskrcnn_loss(
            jnp.asarray(mask_logits), sampled, jnp.asarray(gt_masks)
        )
    )

    # transcription: per (img, proposal) project matched mask, BCE on
    # the label channel, mean over positive-proposal pixels
    boxes = np.asarray(sampled.boxes)
    labels = np.asarray(sampled.labels)
    pos = np.asarray(sampled.pos_mask)
    matched = np.asarray(sampled.matched_gt)
    total = 0.0
    count = 0
    for i in range(n):
        for j in range(s):
            tgt = _roi_align_ref(
                gt_masks[i, matched[i, j]][None, ..., None],
                np.concatenate([[0.0], boxes[i, j]])[None],
                (m, m), 1.0, 2, False,
            )[0, ..., 0]
            z = mask_logits[i, j, :, :, labels[i, j]]
            bce = np.clip(z, 0, None) - z * tgt + np.log1p(
                np.exp(-np.abs(z))
            )
            if pos[i, j]:
                total += bce.sum()
                count += m * m
    want = total / max(count, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_keypointrcnn_loss_matches_numpy_transcription():
    rng = np.random.RandomState(1)
    n, s, g, hm, k = 2, 4, 2, 14, 5
    sampled = _sampled(n, s, g, rng)
    gt_kp = np.zeros((n, g, k, 3), np.float32)
    gt_kp[..., 0] = rng.uniform(0, 64, (n, g, k))
    gt_kp[..., 1] = rng.uniform(0, 64, (n, g, k))
    gt_kp[..., 2] = (rng.rand(n, g, k) > 0.3).astype(np.float32)
    logits = rng.randn(n, s, hm, hm, k).astype(np.float32)

    logic = RoIHeadsLogic()
    got = float(
        logic.keypointrcnn_loss(
            jnp.asarray(logits), sampled, jnp.asarray(gt_kp)
        )
    )

    boxes = np.asarray(sampled.boxes)
    pos = np.asarray(sampled.pos_mask)
    matched = np.asarray(sampled.matched_gt)
    total = 0.0
    count = 0
    for i in range(n):
        for j in range(s):
            if not pos[i, j]:
                continue
            b = boxes[i, j]
            kp = gt_kp[i, matched[i, j]]
            sx = hm / max(b[2] - b[0], 1e-6)
            sy = hm / max(b[3] - b[1], 1e-6)
            for q in range(k):
                x, y, vis = kp[q]
                xi = hm - 1 if x == b[2] else int(
                    np.floor((x - b[0]) * sx)
                )
                yi = hm - 1 if y == b[3] else int(
                    np.floor((y - b[1]) * sy)
                )
                if not (0 <= xi < hm and 0 <= yi < hm and vis > 0):
                    continue
                z = logits[i, j, :, :, q].reshape(-1)
                logp = z - np.log(np.exp(z - z.max()).sum()) - z.max()
                total += -logp[yi * hm + xi]
                count += 1
    want = total / max(count, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.slow
def test_maskrcnn_compute_loss_end_to_end():
    from vision_tpu.models.detection.mask_rcnn import MaskRCNN

    module = MaskRCNN(num_classes=5)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), imgs)
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]])
    gt_labels = jnp.asarray([[1]])
    gt_valid = jnp.ones((1, 1), bool)
    gt_masks = jnp.asarray(
        (rng.rand(1, 1, 64, 64) > 0.5).astype(np.float32)
    )
    losses = module.apply(
        variables, imgs, gt_boxes, gt_labels, gt_valid,
        jax.random.PRNGKey(1), gt_masks=gt_masks, method="compute_loss",
    )
    assert "loss_mask" in losses
    for v in losses.values():
        assert np.isfinite(float(v))


@pytest.mark.slow
def test_keypointrcnn_compute_loss_end_to_end():
    from vision_tpu.models.detection.keypoint_rcnn import KeypointRCNN

    module = KeypointRCNN(num_classes=2, num_keypoints=5)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), imgs)
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]])
    gt_labels = jnp.asarray([[1]])
    gt_valid = jnp.ones((1, 1), bool)
    gt_kp = np.zeros((1, 1, 5, 3), np.float32)
    gt_kp[..., 0] = rng.uniform(10, 38, (1, 1, 5))
    gt_kp[..., 1] = rng.uniform(10, 38, (1, 1, 5))
    gt_kp[..., 2] = 1.0
    losses = module.apply(
        variables, imgs, gt_boxes, gt_labels, gt_valid,
        jax.random.PRNGKey(1), gt_keypoints=jnp.asarray(gt_kp),
        method="compute_loss",
    )
    assert "loss_keypoint" in losses
    for v in losses.values():
        assert np.isfinite(float(v))
