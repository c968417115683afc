"""NMS + prediction decoding.

Parity surface: reference coco/eval_func.py DecodePredictions (:8-133):
top-k class/box selection, hard/soft (gaussian) NMS, global or per-class
(class-offset trick) modes. NMS is a sequential data-dependent loop — it runs
on host numpy over the tiny post-top-k set (the device side ends at
``decode_bboxes``), matching where the reference runs it too.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .anchors import decode_bboxes, get_anchor_free_anchors, get_anchors


def non_max_suppression(
    boxes: np.ndarray,
    scores: np.ndarray,
    max_output_size: int = 100,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.3,
    soft_nms_sigma: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """tf.image.non_max_suppression_with_scores semantics. Returns
    (selected indices, selected scores)."""
    boxes = np.asarray(boxes, np.float64)
    scores = np.asarray(scores, np.float64).copy()
    selected, selected_scores = [], []
    active = scores > score_threshold

    def iou_one_to_many(b, others):
        tl = np.maximum(others[:, :2], b[:2])
        br = np.minimum(others[:, 2:], b[2:])
        hw = np.maximum(br - tl, 0)
        inter = hw[:, 0] * hw[:, 1]
        area_b = max((b[2] - b[0]) * (b[3] - b[1]), 0)
        areas = np.maximum((others[:, 2] - others[:, 0]) * (others[:, 3] - others[:, 1]), 0)
        union = area_b + areas - inter
        return np.where(union > 0, inter / union, 0.0)

    while len(selected) < max_output_size and active.any():
        i = int(np.argmax(np.where(active, scores, -np.inf)))
        if scores[i] <= score_threshold:
            break
        selected.append(i)
        selected_scores.append(scores[i])
        active[i] = False
        idx = np.where(active)[0]
        if idx.size == 0:
            break
        ious = iou_one_to_many(boxes[i], boxes[idx])
        if soft_nms_sigma > 0:
            scores[idx] *= np.exp(-(ious**2) / soft_nms_sigma)
            active[idx] &= scores[idx] > score_threshold
        else:
            active[idx[ious > iou_threshold]] = False
    return np.asarray(selected, np.int64), np.asarray(selected_scores, np.float64)


class DecodePredictions:
    """Decode raw detector outputs -> (bboxes, labels, scores)."""

    def __init__(
        self,
        input_shape=(512, 512),
        pyramid_levels=(3, 7),
        anchors_mode: Optional[str] = None,
        anchor_scale=4,
        use_object_scores: bool = False,
    ):
        input_shape = input_shape[:2] if isinstance(input_shape, (list, tuple)) else (input_shape, input_shape)
        self.use_object_scores = use_object_scores
        if anchors_mode == "anchor_free":
            self.anchors = get_anchor_free_anchors(input_shape, pyramid_levels)
            self.use_object_scores = True
        else:
            self.anchors = get_anchors(input_shape, pyramid_levels, anchor_scale=anchor_scale)

    def __call__(
        self,
        preds: np.ndarray,
        score_threshold: float = 0.3,
        iou_or_sigma: float = 0.5,
        max_output_size: int = 100,
        method: str = "hard",
        mode: str = "global",
        topk: int = 0,
    ):
        """preds: (A, 4+C) or (B, A, 4+C). Returns per-image
        (bboxes, labels, scores) tuples."""
        preds = np.asarray(preds)
        if preds.ndim == 2:
            preds = preds[None]
        results = []
        sigma = iou_or_sigma if method == "gaussian" else 0.0
        iou_thr = 0.5 if method == "gaussian" else iou_or_sigma
        for pred in preds:
            if self.use_object_scores:
                obj = pred[:, -1:]
                pred = np.concatenate([pred[:, :4], pred[:, 4:-1] * obj], axis=-1)
            dd = np.asarray(decode_bboxes(pred, np.asarray(self.anchors)))
            boxes, cls = dd[:, :4], dd[:, 4:]
            scores = cls.max(-1)
            labels = cls.argmax(-1)
            if topk > 0:
                keep = np.argsort(-scores)[:topk]
                boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
            if mode == "per_class":
                # torchvision batched_nms class-offset trick (eval_func.py:79-86)
                offset = labels.astype(np.float64) * (boxes.max() + 1)
                nms_boxes = boxes + offset[:, None]
            else:
                nms_boxes = boxes
            idx, nms_scores = non_max_suppression(
                nms_boxes, scores, max_output_size, iou_thr, score_threshold, sigma
            )
            results.append((boxes[idx], labels[idx], nms_scores))
        return results if len(results) > 1 else results[0]
