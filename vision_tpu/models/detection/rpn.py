"""Region Proposal Network (reference
``torchvision/models/detection/rpn.py:113-436``).

TPU-first: ``filter_proposals`` (the reference's #1 dynamic-shape hot spot,
SURVEY.md §3.4) becomes static per-level top-k + masked cross-level NMS,
emitting a fixed ``post_nms_top_n`` proposal tensor with a validity mask.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.models.detection import _utils as det_utils
from vision_tpu.ops.nms import nms_mask

__all__ = ["RPNHead", "RegionProposalNetwork", "Proposals"]


class Proposals(NamedTuple):
    boxes: jax.Array  # [N, P, 4]
    scores: jax.Array  # [N, P]
    valid: jax.Array  # [N, P] bool


class RPNHead(nn.Module):
    """reference ``rpn.py:15``: shared 3x3 conv tower + 1x1 cls/reg."""

    num_anchors: int
    conv_depth: int = 1

    @nn.compact
    def __call__(self, features: List[jax.Array]):
        in_ch = features[0].shape[-1]
        convs = [
            nn.Conv(
                in_ch, (3, 3), padding=[(1, 1)] * 2, name=f"conv.{i}.0"
            )
            for i in range(self.conv_depth)
        ]
        cls_logits = nn.Conv(self.num_anchors, (1, 1), name="cls_logits")
        bbox_pred = nn.Conv(self.num_anchors * 4, (1, 1), name="bbox_pred")

        objectness, deltas = [], []
        for f in features:
            t = f
            for conv in convs:
                t = nn.relu(conv(t))
            o = cls_logits(t)
            d = bbox_pred(t)
            n, h, w, _ = o.shape
            objectness.append(o.reshape(n, h * w * self.num_anchors))
            deltas.append(d.reshape(n, h * w * self.num_anchors, 4))
        return objectness, deltas


class RegionProposalNetwork:
    """Stateless logic around RPNHead outputs (the flax module holds only
    the head; this class mirrors the reference's hyperparameters +
    filter_proposals/loss)."""

    def __init__(
        self,
        fg_iou_thresh: float = 0.7,
        bg_iou_thresh: float = 0.3,
        batch_size_per_image: int = 256,
        positive_fraction: float = 0.5,
        pre_nms_top_n: int = 1000,
        post_nms_top_n: int = 1000,
        nms_thresh: float = 0.7,
        score_thresh: float = 0.0,
        min_size: float = 1e-3,
    ):
        self.box_coder = det_utils.BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))
        self.proposal_matcher = det_utils.Matcher(
            fg_iou_thresh, bg_iou_thresh, allow_low_quality_matches=True
        )
        self.sampler = det_utils.BalancedPositiveNegativeSampler(
            batch_size_per_image, positive_fraction
        )
        self.pre_nms_top_n = pre_nms_top_n
        self.post_nms_top_n = post_nms_top_n
        self.nms_thresh = nms_thresh
        self.score_thresh = score_thresh
        self.min_size = min_size

    def filter_proposals(
        self,
        objectness: List[jax.Array],
        deltas: List[jax.Array],
        anchors: List[jax.Array],
        image_size: Tuple[int, int],
    ) -> Proposals:
        """reference ``rpn.py:242``: per-level pre-NMS top-k -> decode ->
        clip -> small/low-score mask -> cross-level NMS (level as class) ->
        top post_nms_top_n, all static."""
        n = objectness[0].shape[0]
        h, w = image_size
        # reference rpn.py:253,368-370: Faster R-CNN does NOT backprop
        # through the proposals — without this, second-stage losses leak
        # gradient into the decode->clip chain, where clipped exp-decoded
        # coords produce 0*inf = NaN backbone grads.
        objectness = [jax.lax.stop_gradient(o) for o in objectness]
        deltas = [jax.lax.stop_gradient(d) for d in deltas]

        def per_image(obj_per_lvl, dl_per_lvl):
            boxes_l, scores_l, valid_l = [], [], []
            kmax = max(
                min(self.pre_nms_top_n, o.shape[0]) for o in obj_per_lvl
            )
            for obj, dl, anch in zip(obj_per_lvl, dl_per_lvl, anchors):
                k = min(self.pre_nms_top_n, obj.shape[0])
                from vision_tpu.ops._topk import top_k_flat

                top_scores, top_idx = top_k_flat(obj, k)
                dec = self.box_coder.decode(dl[top_idx], anch[top_idx])[:, 0]
                x = jnp.clip(dec[:, 0::2], 0, w)
                y = jnp.clip(dec[:, 1::2], 0, h)
                dec = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], -1)
                ws = dec[:, 2] - dec[:, 0]
                hs = dec[:, 3] - dec[:, 1]
                valid = (ws >= self.min_size) & (hs >= self.min_size)
                valid &= jax.nn.sigmoid(top_scores) > self.score_thresh
                if k < kmax:  # small levels pad to a uniform row length
                    dec = jnp.pad(dec, ((0, kmax - k), (0, 0)))
                    top_scores = jnp.pad(
                        top_scores, (0, kmax - k),
                        constant_values=-jnp.inf,
                    )
                    valid = jnp.pad(valid, (0, kmax - k))
                boxes_l.append(dec)
                scores_l.append(top_scores)
                valid_l.append(valid)

            # batched NMS with level-as-class = independent per-level NMS:
            # levels never suppress each other, so run the kernel with the
            # level as a leading (vmapped -> grid) dim instead of the
            # coordinate-offset trick over the 5x concatenation — ~L x less
            # pairwise IoU work and per-level (not global) score sorts.
            boxes = jnp.stack(boxes_l)  # [L, kmax, 4]
            scores = jnp.stack(scores_l)  # [L, kmax]
            valid = jnp.stack(valid_l)  # [L, kmax]
            # rows come straight out of top_k (descending scores), so the
            # argsort + [N,4] permutation gathers inside nms_mask are skipped
            keep = jax.vmap(
                lambda b, s, v: nms_mask(
                    b, s, self.nms_thresh, valid=v, presorted=True
                )
            )(boxes, scores, valid)
            kept_scores = jnp.where(keep, scores, -jnp.inf).reshape(-1)
            boxes = boxes.reshape(-1, 4)
            p = min(self.post_nms_top_n, boxes.shape[0])
            top_scores, top_idx = jax.lax.top_k(kept_scores, p)
            return boxes[top_idx], top_scores, top_scores > -jnp.inf

        # vmap over the batch (was a Python loop, which compiled N copies
        # of the NMS + top-k chain and scaled compile time with batch size)
        outs = jax.vmap(per_image)(tuple(objectness), tuple(deltas))
        return Proposals(boxes=outs[0], scores=outs[1], valid=outs[2])

    def compute_loss(
        self,
        objectness: List[jax.Array],
        deltas: List[jax.Array],
        anchors: List[jax.Array],
        gt_boxes: jax.Array,
        gt_valid: jax.Array,
        key: jax.Array,
    ) -> Dict[str, jax.Array]:
        """reference ``rpn.py:299``: BCE objectness on sampled anchors +
        smooth-L1 (beta=1/9, sum / total sampled) on positives."""
        from vision_tpu.ops.boxes import box_iou

        all_obj = jnp.concatenate(objectness, axis=1)  # [N, R]
        all_deltas = jnp.concatenate(deltas, axis=1)  # [N, R, 4]
        all_anchors = jnp.concatenate(anchors, axis=0)  # [R, 4]

        def per_image(obj, dl, boxes, valid, k):
            iou = box_iou(boxes, all_anchors)  # [G, R]
            matched = self.proposal_matcher(iou, valid_gt=valid)
            pos, neg = self.sampler(matched, k)
            sampled = pos | neg
            num_sampled = jnp.maximum(jnp.sum(sampled), 1)

            labels = (matched >= 0).astype(jnp.float32)
            bce = (
                jnp.clip(obj, 0)
                - obj * labels
                + jnp.log1p(jnp.exp(-jnp.abs(obj)))
            )
            obj_loss = jnp.sum(bce * sampled) / num_sampled

            matched_boxes = boxes[jnp.clip(matched, 0)]
            target = self.box_coder.encode(matched_boxes, all_anchors)
            diff = jnp.abs(dl - target)
            beta = 1.0 / 9.0
            sl1 = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
            box_loss = jnp.sum(sl1.sum(-1) * pos) / num_sampled
            return obj_loss, box_loss

        keys = jax.random.split(key, all_obj.shape[0])
        obj_l, box_l = jax.vmap(per_image)(
            all_obj, all_deltas, gt_boxes, gt_valid, keys
        )
        return {
            "loss_objectness": jnp.mean(obj_l),
            "loss_rpn_box_reg": jnp.mean(box_l),
        }
