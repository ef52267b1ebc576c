"""RoI heads (reference ``torchvision/models/detection/roi_heads.py:504-887``):
box / mask / keypoint branches with static-shape training sampling and
postprocessing.

TPU design notes:
* ``select_training_samples`` (:642) keeps the reference's fixed 512-RoI
  budget — already static-friendly — via top-k over random priorities.
* ``postprocess_detections`` (:680) flattens (RoI, class) pairs, masks
  low scores, runs one masked batched NMS, and emits fixed
  ``detections_per_img`` rows.
* ``paste_masks_in_image`` (:486) is an inverse bilinear warp per box,
  vmapped — no dynamic resize.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models.detection import _utils as det_utils
from vision_tpu.ops.nms import batched_nms_mask

__all__ = [
    "TwoMLPHead",
    "FastRCNNPredictor",
    "MaskRCNNHeads",
    "MaskRCNNPredictor",
    "KeypointRCNNHeads",
    "KeypointRCNNPredictor",
    "RoIHeadsLogic",
    "paste_masks_in_image",
]


class TwoMLPHead(nn.Module):
    """reference ``faster_rcnn.py`` TwoMLPHead; input [K, 7, 7, C].
    The fc6 weight conversion reorders the torch CHW flatten."""

    representation_size: int = 1024

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.representation_size, name="fc6")(x))
        x = nn.relu(nn.Dense(self.representation_size, name="fc7")(x))
        return x


class FastRCNNConvFCHead(nn.Module):
    """v2 box head (reference FastRCNNConvFCHead, ``faster_rcnn.py:307``):
    4x Conv2dNormActivation(256, norm_layer=nn.BatchNorm2d) -> flatten ->
    fc. Names: "{i}.0" conv / "{i}.1" batch norm, "5" fc."""

    representation_size: int = 1024

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(4):
            x = nn.Conv(
                256, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                name=f"{i}.0",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"{i}.1",
            )(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.relu(nn.Dense(self.representation_size, name="5")(x))


class FastRCNNPredictor(nn.Module):
    """reference FastRCNNPredictor: cls_score + bbox_pred."""

    num_classes: int

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, name="bbox_pred")(x)
        return scores, deltas


class MaskRCNNHeads(nn.Module):
    """reference MaskRCNNHeads (v2 Sequential of Conv2dNormActivation,
    ``mask_rcnn.py:271``): v1 checkpoints use names mask_fcn1..4 (no norm);
    v2 uses "{i}.0"/"{i}.1" with BatchNorm."""

    layers: int = 4
    features: int = 256
    use_norm: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.layers):
            if self.use_norm:
                x = nn.Conv(
                    self.features, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, name=f"{i}.0",
                )(x)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    name=f"{i}.1",
                )(x)
            else:
                x = nn.Conv(
                    self.features, (3, 3), padding=[(1, 1)] * 2,
                    name=f"mask_fcn{i + 1}",
                )(x)
            x = nn.relu(x)
        return x


class MaskRCNNPredictor(nn.Module):
    """reference MaskRCNNPredictor: deconv 2x + 1x1 logits."""

    num_classes: int

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            256, (2, 2), strides=(2, 2), name="conv5_mask"
        )(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), name="mask_fcn_logits")(x)


class KeypointRCNNHeads(nn.Module):
    """reference KeypointRCNNHeads: 8x conv3x3(512), torch Sequential names
    0, 2, 4, ... (relu at odd indices)."""

    layers: int = 8
    features: int = 512

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            x = nn.relu(
                nn.Conv(
                    self.features, (3, 3), padding=[(1, 1)] * 2,
                    name=str(2 * i),
                )(x)
            )
        return x


class KeypointRCNNPredictor(nn.Module):
    """reference KeypointRCNNPredictor: 4x4 stride-2 deconv + 2x bilinear
    upsample -> [K, 56, 56, num_keypoints]."""

    num_keypoints: int = 17

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2), padding="SAME",
            name="kps_score_lowres",
        )(x)
        from vision_tpu.transforms.v2.functional._resample import resize_2d

        h, w = x.shape[1] * 2, x.shape[2] * 2
        return resize_2d(x, (h, w), mode="bilinear", antialias=False,
                         align_corners=False)


class SampledProposals(NamedTuple):
    boxes: jax.Array  # [N, S, 4]
    labels: jax.Array  # [N, S] int (0 = background)
    reg_targets: jax.Array  # [N, S, 4]
    pos_mask: jax.Array  # [N, S]
    valid: jax.Array  # [N, S]
    matched_gt: jax.Array  # [N, S] gt index per sampled proposal


class RoIHeadsLogic:
    """Stateless transcription of reference RoIHeads hyper-logic."""

    def __init__(
        self,
        fg_iou_thresh: float = 0.5,
        bg_iou_thresh: float = 0.5,
        batch_size_per_image: int = 512,
        positive_fraction: float = 0.25,
        bbox_reg_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0),
        score_thresh: float = 0.05,
        nms_thresh: float = 0.5,
        detections_per_img: int = 100,
        topk_candidates: int = 1000,
    ):
        self.box_coder = det_utils.BoxCoder(weights=bbox_reg_weights)
        self.proposal_matcher = det_utils.Matcher(
            fg_iou_thresh, bg_iou_thresh, allow_low_quality_matches=False
        )
        self.sampler = det_utils.BalancedPositiveNegativeSampler(
            batch_size_per_image, positive_fraction
        )
        self.batch_size_per_image = batch_size_per_image
        self.score_thresh = score_thresh
        self.nms_thresh = nms_thresh
        self.detections_per_img = detections_per_img
        # static cap on (roi, class) candidates entering NMS — the reference
        # NMSes the dynamically score-filtered set (usually << 1000); the
        # O(K^2) masked NMS needs a fixed K
        self.topk_candidates = topk_candidates

    def select_training_samples(
        self,
        proposals: jax.Array,  # [N, P, 4]
        proposals_valid: jax.Array,  # [N, P]
        gt_boxes: jax.Array,  # [N, G, 4]
        gt_labels: jax.Array,  # [N, G]
        gt_valid: jax.Array,  # [N, G]
        key: jax.Array,
    ) -> SampledProposals:
        """reference ``roi_heads.py:642``: append gt to proposals, match,
        sample fixed budget, compute regression targets."""
        from vision_tpu.ops.boxes import box_iou

        def per_image(props, pvalid, boxes, labels, valid, k):
            props = jnp.concatenate([props, boxes], axis=0)
            pvalid = jnp.concatenate([pvalid, valid], axis=0)
            iou = box_iou(boxes, props)  # [G, P+G]
            iou = jnp.where(pvalid[None, :], iou, -1.0)
            matched = self.proposal_matcher(iou, valid_gt=valid)  # [P+G]
            matched = jnp.where(pvalid, matched, det_utils.BELOW_LOW_THRESHOLD)
            pos, neg = self.sampler(matched, k)
            sampled = pos | neg
            # compact sampled rois to fixed budget S via top_k on sampled flag
            s = min(self.batch_size_per_image, props.shape[0])
            pri = sampled.astype(jnp.float32) + jnp.where(pos, 0.5, 0.0)
            _, idx = jax.lax.top_k(pri, s)
            sel_boxes = props[idx]
            sel_matched = matched[idx]
            sel_pos = pos[idx]
            sel_valid = sampled[idx]
            clamped = jnp.clip(sel_matched, 0)
            sel_labels = jnp.where(sel_pos, labels[clamped], 0)
            matched_boxes = boxes[clamped]
            # the reference (roi_heads.py fastrcnn_loss) dynamically
            # indexes positives only, so degenerate negative/padded rows
            # never reach encode; statically we must substitute a unit
            # box or log(w/0)=inf leaks NaN through the pos_mask product
            unit = jnp.array([0.0, 0.0, 1.0, 1.0], sel_boxes.dtype)
            m = sel_pos[:, None]
            reg_targets = self.box_coder.encode(
                jnp.where(m, matched_boxes, unit),
                jnp.where(m, sel_boxes, unit),
            )
            return (
                sel_boxes, sel_labels, reg_targets, sel_pos, sel_valid, clamped
            )

        keys = jax.random.split(key, proposals.shape[0])
        outs = jax.vmap(per_image)(
            proposals, proposals_valid, gt_boxes, gt_labels, gt_valid, keys
        )
        return SampledProposals(*outs)

    def fastrcnn_loss(
        self,
        class_logits: jax.Array,  # [N, S, C]
        box_regression: jax.Array,  # [N, S, C*4]
        sampled: SampledProposals,
    ) -> Dict[str, jax.Array]:
        """reference ``roi_heads.py:29`` fastrcnn_loss: CE over sampled,
        smooth-L1(beta=1/9) on positives' matched-class deltas, / sampled."""
        n, s, c = class_logits.shape
        valid = sampled.valid
        num_valid = jnp.maximum(jnp.sum(valid), 1)

        logp = jax.nn.log_softmax(class_logits)
        ce = -jnp.take_along_axis(logp, sampled.labels[..., None], axis=-1)[..., 0]
        cls_loss = jnp.sum(ce * valid) / num_valid

        reg = box_regression.reshape(n, s, c, 4)
        cls_idx = sampled.labels[..., None, None]
        reg_sel = jnp.take_along_axis(
            reg, jnp.broadcast_to(cls_idx, (n, s, 1, 4)), axis=2
        )[:, :, 0]
        diff = jnp.abs(reg_sel - sampled.reg_targets)
        beta = 1.0 / 9.0
        sl1 = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
        box_loss = jnp.sum(sl1.sum(-1) * sampled.pos_mask) / num_valid
        return {"loss_classifier": cls_loss, "loss_box_reg": box_loss}

    def maskrcnn_loss(
        self,
        mask_logits: jax.Array,  # [N, S, M, M, C]
        sampled: SampledProposals,
        gt_masks: jax.Array,  # [N, G, H, W] (0/1)
    ) -> jax.Array:
        """reference ``roi_heads.py:100`` maskrcnn_loss: project each
        positive proposal's matched gt mask into the proposal box at MxM
        via roi_align (scale 1), then BCE-with-logits on the matched
        class's mask channel, averaged over positive-proposal pixels.

        Divergence note: the reference projects with the ADAPTIVE
        sampling ratio (-1, ceil(box/M) samples per bin); the static-
        shape path here uses sampling_ratio=2 — same bilinear filter,
        fixed 2x2 sample grid per bin."""
        from vision_tpu.ops.roi_align import roi_align

        n, s, m, _, c = mask_logits.shape
        g, h, w = gt_masks.shape[1:]
        flat = gt_masks.reshape(n * g, h, w, 1).astype(jnp.float32)
        gt_idx = jnp.clip(sampled.matched_gt, 0)
        batch_idx = (
            jnp.arange(n)[:, None] * g + gt_idx
        ).reshape(-1).astype(jnp.float32)
        rois = jnp.concatenate(
            [batch_idx[:, None], sampled.boxes.reshape(-1, 4)], axis=1
        )
        targets = roi_align(flat, rois, (m, m), 1.0, sampling_ratio=2)
        targets = targets[..., 0].reshape(n, s, m, m)

        sel = jnp.take_along_axis(
            mask_logits,
            sampled.labels[..., None, None, None],
            axis=-1,
        )[..., 0]  # [N, S, M, M]
        bce = (
            jnp.clip(sel, 0)
            - sel * targets
            + jnp.log1p(jnp.exp(-jnp.abs(sel)))
        )
        pos = sampled.pos_mask
        denom = jnp.maximum(jnp.sum(pos) * m * m, 1)
        return jnp.sum(bce * pos[..., None, None]) / denom

    def keypointrcnn_loss(
        self,
        keypoint_logits: jax.Array,  # [N, S, HM, HM, K]
        sampled: SampledProposals,
        gt_keypoints: jax.Array,  # [N, G, K, 3] (x, y, vis)
    ) -> jax.Array:
        """reference ``roi_heads.py`` keypointrcnn_loss +
        keypoints_to_heatmap: discretize each visible keypoint of the
        matched gt into the proposal's HMxHM grid and cross-entropy the
        spatial softmax, averaged over valid keypoints of positive
        proposals."""
        n, s, hm, _, k = keypoint_logits.shape
        kp = jnp.take_along_axis(
            gt_keypoints,
            jnp.clip(sampled.matched_gt, 0)[..., None, None],
            axis=1,
        )  # [N, S, K, 3]
        boxes = sampled.boxes  # [N, S, 4]
        x0, y0 = boxes[..., 0:1], boxes[..., 1:2]
        sx = hm / jnp.maximum(boxes[..., 2:3] - x0, 1e-6)
        sy = hm / jnp.maximum(boxes[..., 3:4] - y0, 1e-6)
        x = kp[..., 0]
        y = kp[..., 1]
        on_bx = x == boxes[..., 2:3]
        on_by = y == boxes[..., 3:4]
        xi = jnp.floor((x - x0) * sx).astype(jnp.int32)
        yi = jnp.floor((y - y0) * sy).astype(jnp.int32)
        xi = jnp.where(on_bx, hm - 1, xi)
        yi = jnp.where(on_by, hm - 1, yi)
        valid_loc = (xi >= 0) & (yi >= 0) & (xi < hm) & (yi < hm)
        valid = valid_loc & (kp[..., 2] > 0) & sampled.pos_mask[..., None]
        target = yi * hm + xi  # [N, S, K]

        logits = keypoint_logits.reshape(n, s, hm * hm, k)
        logits = jnp.swapaxes(logits, -1, -2)  # [N, S, K, HM*HM]
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(
            logp, jnp.clip(target, 0, hm * hm - 1)[..., None], axis=-1
        )[..., 0]
        denom = jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(ce * valid) / denom

    def postprocess_detections(
        self,
        class_logits: jax.Array,  # [N, P, C]
        box_regression: jax.Array,  # [N, P, C*4]
        proposals: jax.Array,  # [N, P, 4]
        proposals_valid: jax.Array,  # [N, P]
        image_size: Tuple[int, int],
    ):
        """reference ``roi_heads.py:680``. Returns a Detections tuple."""
        from vision_tpu.models.detection.retinanet import Detections

        h, w = image_size
        n, p, c = class_logits.shape

        def per_image(logits, reg, props, pvalid):
            scores = jax.nn.softmax(logits)  # [P, C]
            boxes = self.box_coder.decode(reg, props)  # [P, C, 4]
            x = jnp.clip(boxes[..., 0::2], 0, w)
            y = jnp.clip(boxes[..., 1::2], 0, h)
            boxes = jnp.stack(
                [x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1
            )
            # drop background column 0; flatten (P, C-1)
            fg_scores = scores[:, 1:].reshape(-1)
            fg_boxes = boxes[:, 1:].reshape(-1, 4)
            fg_labels = jnp.tile(jnp.arange(1, c), (p,))
            valid = fg_scores > self.score_thresh
            valid &= jnp.repeat(pvalid, c - 1)
            ws = fg_boxes[:, 2] - fg_boxes[:, 0]
            hs = fg_boxes[:, 3] - fg_boxes[:, 1]
            valid &= (ws >= 1e-2) & (hs >= 1e-2)

            # static candidate cap before the O(K^2) NMS
            from vision_tpu.ops._topk import top_k_flat

            kcap = min(self.topk_candidates, fg_scores.shape[0])
            cand_scores, cand_idx = top_k_flat(
                jnp.where(valid, fg_scores, -1.0), kcap
            )
            fg_boxes = fg_boxes[cand_idx]
            fg_scores = fg_scores[cand_idx]
            fg_labels = fg_labels[cand_idx]
            valid = cand_scores > 0

            keep = batched_nms_mask(
                fg_boxes, fg_scores, fg_labels, self.nms_thresh, valid=valid
            )
            kept_scores = jnp.where(keep, fg_scores, -1.0)
            top_scores, top_idx = jax.lax.top_k(
                kept_scores, self.detections_per_img
            )
            return (
                fg_boxes[top_idx],
                jnp.where(top_scores > 0, top_scores, 0.0),
                fg_labels[top_idx],
                top_scores > 0,
            )

        outs = jax.vmap(per_image)(
            class_logits, box_regression, proposals, proposals_valid
        )
        return Detections(*outs)


def paste_masks_in_image(
    masks: jax.Array,  # [K, M, M] probabilities
    boxes: jax.Array,  # [K, 4] xyxy
    img_h: int,
    img_w: int,
) -> jax.Array:
    """reference ``roi_heads.py:486`` paste_masks_in_image: expand each
    mask by 1px (scale (M+2)/M), bilinear-resize into its box, paste.

    TPU formulation: the bilinear paste is separable, so it runs as two
    one-hot matmuls on the MXU — ``out = W_y @ padded_mask @ W_x^T``
    with at most two nonzeros per row of W (the same shape as
    ``roi_align_mxu``). The earlier vmapped per-pixel gather formulation
    benched 2.96 img/s inside the Mask R-CNN e2e pipeline at 832x832
    (gathers are scalar loads on TPU); this one is MXU-bound. Math is
    identical (same coordinate rule, pinned by the torch oracle in
    ``tests/test_detection_utils.py``). Returns [K, img_h, img_w] float
    probabilities.
    """
    k, m, _ = masks.shape
    scale = (m + 2.0) / m
    # expand boxes like the reference, then truncate to int64 and size the
    # paste region as x1-x0+1 (reference paste_masks_in_image:486 casts
    # expand_boxes(...).to(int64) and interpolates to (h, w) = (y1-y0+1,
    # x1-x0+1)) — pinned by the torch oracle in test_detection_utils.py
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    bw = (boxes[:, 2] - boxes[:, 0]) * 0.5 * scale
    bh = (boxes[:, 3] - boxes[:, 1]) * 0.5 * scale
    x0 = jnp.trunc(cx - bw)
    x1 = jnp.trunc(cx + bw)
    y0 = jnp.trunc(cy - bh)
    y1 = jnp.trunc(cy + bh)
    padded = jnp.pad(masks, ((0, 0), (1, 1), (1, 1))).astype(jnp.float32)
    mp = m + 2

    def weights(coords, b0, b1, size):
        """[K, size, mp] bilinear one-hot row weights for one axis.

        torch F.interpolate(align_corners=False) source-index rule over
        the integer paste region; clamp to >= 0 before floor (edge
        replication at borders); zero rows outside the box."""
        extent = jnp.maximum(b1 - b0 + 1.0, 1.0)[:, None]  # [K, 1]
        g = jnp.maximum(
            (coords[None, :] - b0[:, None] + 0.5) / extent * mp - 0.5, 0.0
        )  # [K, size]
        inside = (coords[None, :] >= b0[:, None]) & (
            coords[None, :] <= b1[:, None]
        )
        i0 = jnp.minimum(jnp.floor(g).astype(jnp.int32), mp - 1)
        i1 = jnp.minimum(i0 + 1, mp - 1)
        frac = g - i0
        w = jax.nn.one_hot(i0, mp) * (1.0 - frac)[..., None] + jax.nn.one_hot(
            i1, mp
        ) * frac[..., None]
        return w * inside[..., None]

    ys = jnp.arange(img_h, dtype=jnp.float32)
    xs = jnp.arange(img_w, dtype=jnp.float32)
    w_y = weights(ys, y0, y1, img_h)  # [K, H, mp]
    w_x = weights(xs, x0, x1, img_w)  # [K, W, mp]
    rows = jnp.einsum("kym,kmn->kyn", w_y, padded, precision="highest")
    return jnp.einsum(
        "kyn,kxn->kyx", rows, w_x, precision="highest"
    ).astype(masks.dtype)
