"""COCO-style mAP evaluation (reference coco/eval_func.py:203-273 role).

The reference delegates AP to pycocotools; this is a self-contained numpy
implementation of the COCO protocol — per-class greedy matching at IoU
thresholds 0.50:0.95:0.05, 101-point interpolated precision, averaged over
classes and thresholds — so detection training can be scored without the
pycocotools dependency (absent in this environment).

API:
- ``coco_map(detections, ground_truths, num_classes)`` where detections is a
  list (per image) of (boxes [N,4] tlbr, scores [N], labels [N]) and
  ground_truths a list of (boxes [M,4], labels [M]).
- ``DetectionEvaluator``: accumulate-per-batch harness (COCOEvalCallback
  role) — feed model outputs through detect.nms.DecodePredictions, then
  ``add_batch``, then ``summarize``.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU between [N,4] and [M,4] tlbr boxes."""
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    hw = np.clip(br - tl, 0, None)
    inter = hw[..., 0] * hw[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-12)


def _ap_from_matches(scores, matched, n_gt):
    """101-point interpolated AP from per-detection match flags."""
    if n_gt == 0:
        return np.nan
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    matched = matched[order]
    tp = np.cumsum(matched)
    fp = np.cumsum(~matched)
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1e-12)
    # precision envelope (monotone decreasing from the right)
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
    return float(prec_at.mean())


def coco_map(
    detections: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    ground_truths: Sequence[Tuple[np.ndarray, np.ndarray]],
    num_classes: int,
    iou_thresholds: np.ndarray = IOU_THRESHOLDS,
) -> Dict[str, float]:
    """COCO AP@[.5:.95], AP@.5, AP@.75 over a dataset."""
    aps = np.full((len(iou_thresholds), num_classes), np.nan)
    for ci in range(num_classes):
        # gather per-image detections/gt of this class
        all_scores, all_match_flags = [], [[] for _ in iou_thresholds]
        n_gt = 0
        for (d_boxes, d_scores, d_labels), (g_boxes, g_labels) in zip(detections, ground_truths):
            d_pick = np.asarray(d_labels) == ci
            g_pick = np.asarray(g_labels) == ci
            db = np.asarray(d_boxes, np.float64).reshape(-1, 4)[d_pick]
            ds = np.asarray(d_scores, np.float64)[d_pick]
            gb = np.asarray(g_boxes, np.float64).reshape(-1, 4)[g_pick]
            n_gt += len(gb)
            if len(db) == 0:
                continue
            order = np.argsort(-ds, kind="stable")
            db, ds = db[order], ds[order]
            ious = _iou_matrix(db, gb) if len(gb) else np.zeros((len(db), 0))
            for ti, thr in enumerate(iou_thresholds):
                taken = np.zeros(len(gb), bool)
                flags = np.zeros(len(db), bool)
                for di in range(len(db)):
                    if ious.shape[1] == 0:
                        break
                    cand = np.where(~taken & (ious[di] >= thr))[0]
                    if len(cand):
                        best = cand[np.argmax(ious[di][cand])]
                        taken[best] = True
                        flags[di] = True
                all_match_flags[ti].append(flags)
            all_scores.append(ds)
        scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
        for ti in range(len(iou_thresholds)):
            flags = np.concatenate(all_match_flags[ti]) if all_match_flags[ti] else np.zeros(0, bool)
            aps[ti, ci] = _ap_from_matches(scores, flags, n_gt)

    def nanmean(x):
        return float(np.nanmean(x)) if not np.all(np.isnan(x)) else 0.0

    return {
        "AP": nanmean(aps),
        "AP50": nanmean(aps[0]),
        "AP75": nanmean(aps[5]) if len(iou_thresholds) > 5 else float("nan"),
        "per_class_AP": [nanmean(aps[:, c]) for c in range(num_classes)],
    }


class DetectionEvaluator:
    """Accumulating COCO-mAP harness (COCOEvalCallback role,
    eval_func.py:203-273)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.detections: List = []
        self.ground_truths: List = []

    def add_batch(self, pred_boxes, pred_scores, pred_labels, gt_boxes, gt_labels):
        for i in range(len(pred_boxes)):
            self.detections.append(
                (np.asarray(pred_boxes[i]), np.asarray(pred_scores[i]), np.asarray(pred_labels[i]))
            )
            self.ground_truths.append((np.asarray(gt_boxes[i]), np.asarray(gt_labels[i])))

    def summarize(self) -> Dict[str, float]:
        return coco_map(self.detections, self.ground_truths, self.num_classes)
