"""Adversarial validation of the numpy CocoEvaluator against
pycocotools SEMANTICS (VERDICT r3 item 4).

pycocotools is not installed in this image, so each case hand-derives
its expected value from the transcribed rules of
``pycocotools/cocoeval.py`` (the library the reference wraps,
``/root/reference/references/detection/coco_eval.py:13``):

- evaluateImg match loop: dets in -score order (mergesort/stable),
  truncated to maxDet; per det, scan gts (non-ignored first);
  ``if gtm[t,g]>0 and not iscrowd[g]: continue`` (crowd gts match
  unlimited times); ``if m>-1 and gtIg[m]==0 and gtIg[g]==1: break``
  (never upgrade from a real match to an ignored one);
  ``if ious[d,g] < iou: continue`` with ``iou = min(t, 1-1e-10)``
  (>= threshold matches; later EQUAL IoU replaces the match).
- gt ignore = iscrowd OR area outside the range; det matched to an
  ignored gt is ignored; unmatched det with area outside the range is
  ignored (``dtIg = dtIg | (dtm==0 & outside)``).
- accumulate: categories with zero non-ignored gt are EXCLUDED from the
  mean (not scored 0); tp/fp cumsums over the globally score-sorted det
  list; precision envelope ``pr[i-1] = max(pr[i-1], pr[i])``; 101-point
  interpolation ``q[r] = pr[searchsorted(rc, recThrs, side='left')]``
  with out-of-range -> 0.

Every case is constructed so a deviation in one rule ('>' vs '>=',
unstable sort, crowd treated as FP, area bucketing off-by-one,
interpolation side='right', absent-class scored as 0) flips the result.
"""

import numpy as np
import pytest

from references.detection.coco_eval import CocoEvaluator, coco_map


def _gt(boxes, labels, iscrowd=None):
    d = {"boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
         "labels": np.asarray(labels, np.int64)}
    if iscrowd is not None:
        d["iscrowd"] = np.asarray(iscrowd, np.int64)
    return d


def _pred(boxes, scores, labels):
    return {"boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
            "scores": np.asarray(scores, np.float64),
            "labels": np.asarray(labels, np.int64)}


# boxes are xyxy here (the evaluator converts to xywh internally)
BOX_A = [10, 10, 60, 60]      # area 2500 (small: <= 32^2? no: 2500 > 1024 -> medium)
BOX_SMALL = [0, 0, 20, 20]    # area 400 -> small bucket
BOX_MED = [0, 0, 50, 50]      # area 2500 -> medium bucket
BOX_LARGE = [0, 0, 120, 120]  # area 14400 -> large bucket


def test_perfect_single_detection():
    gts = {1: _gt([BOX_A], [1])}
    preds = {1: _pred([BOX_A], [0.9], [1])}
    r = coco_map(preds, gts)
    assert r["map"] == pytest.approx(1.0)
    assert r["map_50"] == pytest.approx(1.0)


def test_iscrowd_unlimited_matches_and_ignored():
    """Crowd gt: dets matching it are ignored (not FP), the crowd gt is
    not counted in npig, and it can absorb MANY dets (cocoeval.py: the
    `not iscrowd` guard on the continue)."""
    gts = {1: _gt([BOX_A, [100, 100, 200, 200]], [1, 1], iscrowd=[0, 1])}
    # one TP + THREE high-scoring dets inside the crowd region
    crowd_hits = [[100, 100, 200, 200], [102, 100, 202, 200],
                  [100, 104, 200, 204]]
    preds = {1: _pred([BOX_A] + crowd_hits, [0.5, 0.99, 0.98, 0.97],
                      [1, 1, 1, 1])}
    r = coco_map(preds, gts)
    # crowd-matched dets are ignored even though they outscore the TP:
    # a deviation that counts any of them as FP gives map_50 <= ~0.5
    assert r["map_50"] == pytest.approx(1.0)
    # control: same dets but the region is NOT crowd and has no gt there
    gts_nc = {1: _gt([BOX_A], [1])}
    r_nc = coco_map(preds, gts_nc)
    assert r_nc["map_50"] == pytest.approx(0.25, abs=0.01)  # 3 FPs first


def test_crowd_iou_uses_det_area_denominator():
    """IoU vs crowd gt = intersection / det area (cocoeval iscrowd
    semantics): a small det fully inside a big crowd region 'matches' it
    even though the true IoU is tiny."""
    crowd = [0, 0, 100, 100]
    tiny_det = [10, 10, 20, 20]  # true IoU = 100/10000 = 0.01
    gts = {1: _gt([BOX_A, crowd], [1, 1], iscrowd=[0, 1])}
    preds = {1: _pred([BOX_A, tiny_det], [0.9, 0.95], [1, 1])}
    r = coco_map(preds, gts)
    # with det-area denominator the tiny det's 'iou' vs crowd is 1.0 ->
    # ignored; with a plain-union denominator it would be an FP at 0.95
    # outscoring the TP -> map_50 0.5
    assert r["map_50"] == pytest.approx(1.0)


def test_area_range_bucketing():
    """Per-bucket AP ignores gts outside the bucket AND ignores their
    matched dets; unmatched dets outside the bucket are ignored too."""
    gts = {1: _gt([BOX_SMALL, BOX_MED, BOX_LARGE], [1, 1, 1])}
    preds = {1: _pred([BOX_SMALL, BOX_MED, BOX_LARGE],
                      [0.9, 0.8, 0.7], [1, 1, 1])}
    r = coco_map(preds, gts)
    assert r["map_small"] == pytest.approx(1.0)
    assert r["map_medium"] == pytest.approx(1.0)
    assert r["map_large"] == pytest.approx(1.0)
    assert r["map"] == pytest.approx(1.0)
    # an unmatched large FP does not pollute the small bucket
    preds2 = {1: _pred([BOX_SMALL, BOX_MED, BOX_LARGE, [200, 200, 380, 380]],
                       [0.9, 0.8, 0.7, 0.99], [1, 1, 1, 1])}
    r2 = coco_map(preds2, gts)
    assert r2["map_small"] == pytest.approx(1.0)
    assert r2["map_large"] < 1.0  # but it IS an FP in its own bucket


def test_area_bucket_boundaries():
    """Bucket edges are inclusive: area == 32^2 belongs to small AND
    medium per the [0,1024],[1024,9216] ranges (pycocotools areaRng
    closed intervals)."""
    import math
    s = math.sqrt(1024.0)  # 32 -> area exactly 1024
    box = [0.0, 0.0, s, s]
    gts = {1: _gt([box], [1])}
    preds = {1: _pred([box], [0.9], [1])}
    r = coco_map(preds, gts)
    assert r["map_small"] == pytest.approx(1.0)   # area <= 32^2
    assert r["map_medium"] == pytest.approx(1.0)  # area >= 32^2
    assert r["map_large"] == -1.0                 # no gt in range -> excluded


def test_maxdets_truncation():
    """dets are truncated to maxDets AFTER score sort: with maxDet=1 only
    the top-scoring (wrong) det survives -> AP 0; with 100 the TP at
    rank 2 gives AP 0.5 (envelope over rc=[0,1], pr=[0,0.5])."""
    gts = {1: _gt([BOX_A], [1])}
    preds = {1: _pred([[200, 200, 260, 260], BOX_A], [0.9, 0.8], [1, 1])}
    r100 = coco_map(preds, gts, max_dets=100)
    r1 = coco_map(preds, gts, max_dets=1)
    assert r100["map_50"] == pytest.approx(0.5, abs=0.005)
    assert r1["map_50"] == pytest.approx(0.0)


def test_duplicate_detections_on_one_gt():
    """Second det on an already-matched gt is an FP — but since recall 1
    is reached at rank 1, the monotone envelope + left-searchsorted give
    AP exactly 1.0 (a classic pycocotools quirk; a 'right' interpolation
    or per-rank averaging would give < 1)."""
    gts = {1: _gt([BOX_A], [1])}
    preds = {1: _pred([BOX_A, BOX_A], [0.9, 0.8], [1, 1])}
    r = coco_map(preds, gts)
    assert r["map_50"] == pytest.approx(1.0)


def test_score_tie_stability():
    """Equal scores keep insertion order (mergesort). FP listed before
    TP at the same score -> rc=[0,1], pr=[0,0.5] -> AP 0.5. An unstable
    sort that flips them would give 1.0."""
    gts = {1: _gt([BOX_A], [1])}
    preds = {1: _pred([[200, 200, 260, 260], BOX_A], [0.5, 0.5], [1, 1])}
    r = coco_map(preds, gts)
    assert r["map_50"] == pytest.approx(0.5, abs=0.005)


def test_iou_exactly_at_threshold_matches():
    """cocoeval matches at iou >= t (the `< iou: continue` guard with
    iou initialized to min(t, 1-1e-10)). det with IoU exactly 0.5
    counts at t=0.5; a '>' rule would reject it."""
    gt_box = [0, 0, 10, 10]     # xyxy, area 100
    det_box = [0, 0, 10, 5]     # inter 50, union 100 -> IoU 0.5 exactly
    gts = {1: _gt([gt_box], [1])}
    preds = {1: _pred([det_box], [0.9], [1])}
    r = coco_map(preds, gts)
    assert r["map_50"] == pytest.approx(1.0)
    assert r["map_75"] == pytest.approx(0.0)


def test_prefers_nonignored_gt_despite_lower_iou():
    """Once matched to a non-ignored gt, the scan BREAKS before ignored
    gts: a det overlapping a crowd region at IoU 0.95 and a real gt at
    0.6 must match the real gt (TP), not the crowd (ignored)."""
    real = [0, 0, 40, 40]
    det = [0, 0, 40, 24]  # IoU vs real = 960/1600 = 0.6
    crowd = [0, 0, 40, 25]  # inter/det_area = 960/960 = 1.0 (crowd IoU)
    gts = {1: _gt([real, crowd], [1, 1], iscrowd=[0, 1])}
    preds = {1: _pred([det], [0.9], [1])}
    r = coco_map(preds, gts)
    # matched to the REAL gt -> recall 1 at t=0.5/0.55/0.6 -> ap50 = 1.
    # if it matched the crowd instead, the det would be ignored and the
    # real gt unmatched -> ap50 = 0.
    assert r["map_50"] == pytest.approx(1.0)


def test_class_with_zero_gt_excluded_not_zeroed():
    """Predictions for a class absent from ALL gts must not drag the
    mean down (cocoeval: precision slices stay -1 and are excluded)."""
    gts = {1: _gt([BOX_A], [1])}
    preds = {1: _pred([BOX_A, [0, 0, 30, 30]], [0.9, 0.99], [1, 99])}
    r = coco_map(preds, gts)
    assert r["map"] == pytest.approx(1.0)


def test_multi_image_accumulation_interpolated_value():
    """Cross-image accumulation with a hand-computed 101-point value:
    img1 TP (score .9), img2 FP (score .95) + missed gt. Global order
    FP,TP -> rc=[0,.5], pr=[0,.5] -> envelope [.5,.5] -> q=0.5 for
    recThrs 0..0.5 (51 points), 0 above -> AP = 51*0.5/101."""
    gts = {1: _gt([BOX_A], [1]), 2: _gt([BOX_A], [1])}
    preds = {1: _pred([BOX_A], [0.9], [1]),
             2: _pred([[200, 200, 260, 260]], [0.95], [1])}
    r = coco_map(preds, gts)
    expected = 51 * 0.5 / 101
    assert r["map_50"] == pytest.approx(expected, abs=1e-9)
    assert r["map"] == pytest.approx(expected, abs=1e-9)


def test_missing_prediction_image_counts_gts():
    """An image with gts but no prediction entry still contributes its
    gts to npig (recall denominator)."""
    gts = {1: _gt([BOX_A], [1]), 2: _gt([BOX_A], [1])}
    preds = {1: _pred([BOX_A], [0.9], [1])}
    r = coco_map(preds, gts)
    expected = 51 * 1.0 / 101  # rc=[0.5], pr=[1.0] -> q=1 for thr<=0.5
    assert r["map_50"] == pytest.approx(expected, abs=1e-9)


def test_per_class_averaging():
    """mAP is the unweighted mean over classes regardless of gt counts:
    class 1 perfect (3 gts), class 2 all missed (1 gt) -> 0.5."""
    gts = {1: _gt([BOX_SMALL, BOX_MED, BOX_LARGE, [300, 300, 360, 360]],
                  [1, 1, 1, 2])}
    preds = {1: _pred([BOX_SMALL, BOX_MED, BOX_LARGE],
                      [0.9, 0.8, 0.7], [1, 1, 1])}
    r = coco_map(preds, gts)
    assert r["map"] == pytest.approx(0.5)


def test_evaluator_accumulates_and_merges():
    gts = {1: _gt([BOX_A], [1]), 2: _gt([BOX_A], [1])}
    ev = CocoEvaluator(gts)
    ev.update({1: _pred([BOX_A], [0.9], [1])})
    ev.merge([{2: _pred([BOX_A], [0.8], [1])}])
    r = ev.summarize()
    assert r["map"] == pytest.approx(1.0)
