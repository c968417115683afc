"""COCO-style mAP evaluation (reference coco/eval_func.py:203-273 role).

The reference delegates AP to pycocotools (absent in this environment); this
is a self-contained numpy implementation of the pycocotools protocol,
verified against hand-derived golden fixtures (tests/test_detect.py):

- per-image, per-class greedy matching at IoU thresholds 0.50:0.95:0.05,
  detections in score order (stable sort), each matching the unmatched gt
  with the highest IoU >= threshold
- ``maxDets`` per-image truncation (COCO default 100) before matching
- crowd ground truths (``iscrowd``) are ignore regions: IoU against a crowd
  uses the detection's own area as the union, crowds may be matched by many
  detections, and such matches count neither TP nor FP
- area-range buckets (all/small/medium/large): out-of-range gts are ignored;
  unmatched detections whose own area is out of range are ignored (not FP)
- 101-point interpolated precision (envelope + searchsorted-left), averaged
  over classes that have ground truth, then over IoU thresholds
- AR (average recall) at maxDets, averaged over thresholds and classes

Intentional protocol deltas vs pycocotools: none in the math; the API takes
arrays per image instead of COCO JSON, and boxes are tlbr in any consistent
unit. AP_small/medium/large assume pixel-square areas (32^2 / 96^2 bounds).

API:
- ``coco_map(detections, ground_truths, num_classes)`` where detections is a
  list (per image) of (boxes [N,4] tlbr, scores [N], labels [N]) and
  ground_truths a list of (boxes [M,4], labels [M]) or
  (boxes, labels, iscrowd [M]).
- ``DetectionEvaluator``: accumulate-per-batch harness (COCOEvalCallback
  role) — feed model outputs through detect.nms.DecodePredictions, then
  ``add_batch``, then ``summarize``.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def _iou_matrix(a: np.ndarray, b: np.ndarray, crowd: Optional[np.ndarray] = None) -> np.ndarray:
    """IoU between [N,4] detections and [M,4] gts (tlbr). For crowd gts the
    union is the detection's own area (pycocotools iscrowd semantics)."""
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    hw = np.clip(br - tl, 0, None)
    inter = hw[..., 0] * hw[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None] - inter
    if crowd is not None and crowd.any():
        union = np.where(crowd[None, :], area_a[:, None], union)
    return inter / np.maximum(union, 1e-12)


def _box_area(b: np.ndarray) -> np.ndarray:
    return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])


def _match_image(db, ds, gb, g_crowd, area_rng, iou_thresholds):
    """Per-image matching for one class. Returns (scores, tp, ignore) with
    tp/ignore shaped (T, n_det), plus the non-ignored gt count."""
    g_area = _box_area(gb)
    g_ignore = g_crowd | (g_area < area_rng[0]) | (g_area > area_rng[1])
    # ignored gts sort last (pycocotools gtind)
    g_order = np.argsort(g_ignore, kind="stable")
    gb, g_crowd, g_ignore = gb[g_order], g_crowd[g_order], g_ignore[g_order]

    order = np.argsort(-ds, kind="stable")
    db, ds = db[order], ds[order]
    d_area = _box_area(db)
    d_out = (d_area < area_rng[0]) | (d_area > area_rng[1])

    T, n_d, n_g = len(iou_thresholds), len(db), len(gb)
    ious = _iou_matrix(db, gb, g_crowd) if n_g else np.zeros((n_d, 0))
    tp = np.zeros((T, n_d), bool)
    d_ig = np.zeros((T, n_d), bool)
    for ti, thr in enumerate(iou_thresholds):
        g_taken = np.zeros(n_g, bool)
        for di in range(n_d):
            best_iou = min(thr, 1 - 1e-10)
            best = -1
            for gi in range(n_g):
                # gt already matched (crowds may be matched repeatedly)
                if g_taken[gi] and not g_crowd[gi]:
                    continue
                # gts are sorted ignored-last: stop considering ignored gts
                # once a non-ignored match is in hand
                if best > -1 and not g_ignore[best] and g_ignore[gi]:
                    break
                if ious[di, gi] < best_iou:
                    continue
                best_iou = ious[di, gi]
                best = gi
            if best == -1:
                # unmatched: ignored (not FP) when the detection's own area
                # is outside the range
                d_ig[ti, di] = d_out[di]
                continue
            g_taken[best] = True
            if g_ignore[best]:
                d_ig[ti, di] = True  # matched an ignore region: drop
            else:
                tp[ti, di] = True
    return ds, tp, d_ig, int((~g_ignore).sum())


def _ap_ar_from_matches(scores, tp, ignore, n_gt):
    """101-point interpolated AP + recall from global (score-sorted)
    match flags for one (class, iou-threshold, area-range)."""
    if n_gt == 0:
        return np.nan, np.nan
    keep = ~ignore
    scores, tp = scores[keep], tp[keep]
    if len(scores) == 0:
        return 0.0, 0.0
    order = np.argsort(-scores, kind="stable")
    tp = tp[order]
    tps = np.cumsum(tp)
    fps = np.cumsum(~tp)
    recall = tps / n_gt
    precision = tps / np.maximum(tps + fps, 1e-12)
    for i in range(len(precision) - 2, -1, -1):  # envelope
        precision[i] = max(precision[i], precision[i + 1])
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    prec_at = np.where(
        idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0
    )
    return float(prec_at.mean()), float(recall[-1])


def coco_map(
    detections: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    ground_truths: Sequence,
    num_classes: int,
    iou_thresholds: np.ndarray = IOU_THRESHOLDS,
    max_dets: int = 100,
    area_ranges: Optional[Dict[str, Tuple[float, float]]] = None,
) -> Dict[str, float]:
    """COCO AP@[.5:.95], AP@.5, AP@.75, AP_small/medium/large, AR@max_dets.

    ``ground_truths[i]`` is (boxes, labels) or (boxes, labels, iscrowd).
    """
    area_ranges = area_ranges or AREA_RANGES
    range_names = list(area_ranges)
    T, R = len(iou_thresholds), len(range_names)
    aps = np.full((R, T, num_classes), np.nan)
    ars = np.full((R, T, num_classes), np.nan)

    # normalize + pre-truncate once (maxDets applies per image, by score)
    norm_dets, norm_gts = [], []
    for det, gt in zip(detections, ground_truths):
        d_boxes, d_scores, d_labels = det
        db = np.asarray(d_boxes, np.float64).reshape(-1, 4)
        ds = np.asarray(d_scores, np.float64).reshape(-1)
        dl = np.asarray(d_labels).reshape(-1)
        if len(ds) > max_dets:
            keep = np.argsort(-ds, kind="stable")[:max_dets]
            db, ds, dl = db[keep], ds[keep], dl[keep]
        g_boxes, g_labels = gt[0], gt[1]
        crowd = (
            np.asarray(gt[2], bool).reshape(-1)
            if len(gt) > 2
            else np.zeros(len(np.asarray(g_labels).reshape(-1)), bool)
        )
        norm_dets.append((db, ds, dl))
        norm_gts.append(
            (np.asarray(g_boxes, np.float64).reshape(-1, 4),
             np.asarray(g_labels).reshape(-1), crowd)
        )

    for ci in range(num_classes):
        per_image = []
        for (db, ds, dl), (gb, gl, crowd) in zip(norm_dets, norm_gts):
            d_pick = dl == ci
            g_pick = gl == ci
            per_image.append((db[d_pick], ds[d_pick], gb[g_pick], crowd[g_pick]))
        for ri, rname in enumerate(range_names):
            rng = area_ranges[rname]
            scores_l, tp_l, ig_l, n_gt = [], [], [], 0
            for db, ds, gb, crowd in per_image:
                s, tp, ig, ng = _match_image(db, ds, gb, crowd, rng, iou_thresholds)
                scores_l.append(s)
                tp_l.append(tp)
                ig_l.append(ig)
                n_gt += ng
            scores = np.concatenate(scores_l) if scores_l else np.zeros(0)
            tp = np.concatenate(tp_l, axis=1) if tp_l else np.zeros((T, 0), bool)
            ig = np.concatenate(ig_l, axis=1) if ig_l else np.zeros((T, 0), bool)
            for ti in range(T):
                aps[ri, ti, ci], ars[ri, ti, ci] = _ap_ar_from_matches(
                    scores, tp[ti], ig[ti], n_gt
                )

    def nanmean(x):
        return float(np.nanmean(x)) if not np.all(np.isnan(x)) else 0.0

    all_ri = range_names.index("all") if "all" in range_names else 0
    out = {
        "AP": nanmean(aps[all_ri]),
        "AP50": nanmean(aps[all_ri, 0]),
        "AP75": nanmean(aps[all_ri, 5]) if T > 5 else float("nan"),
        "AR": nanmean(ars[all_ri]),
        "per_class_AP": [nanmean(aps[all_ri, :, c]) for c in range(num_classes)],
    }
    for rname in range_names:
        if rname != "all":
            out[f"AP_{rname}"] = nanmean(aps[range_names.index(rname)])
    return out


class DetectionEvaluator:
    """Accumulating COCO-mAP harness (COCOEvalCallback role,
    eval_func.py:203-273)."""

    def __init__(self, num_classes: int, max_dets: int = 100):
        self.num_classes = num_classes
        self.max_dets = max_dets
        self.detections: List = []
        self.ground_truths: List = []

    def add_batch(self, pred_boxes, pred_scores, pred_labels, gt_boxes, gt_labels,
                  gt_iscrowd=None):
        for i in range(len(pred_boxes)):
            self.detections.append(
                (np.asarray(pred_boxes[i]), np.asarray(pred_scores[i]), np.asarray(pred_labels[i]))
            )
            gt = [np.asarray(gt_boxes[i]), np.asarray(gt_labels[i])]
            if gt_iscrowd is not None:
                gt.append(np.asarray(gt_iscrowd[i]))
            self.ground_truths.append(tuple(gt))

    def summarize(self) -> Dict[str, float]:
        return coco_map(
            self.detections, self.ground_truths, self.num_classes,
            max_dets=self.max_dets,
        )
