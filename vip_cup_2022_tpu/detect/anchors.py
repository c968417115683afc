"""Detection anchors, IoU, and bbox coders.

Parity surface: reference keras_cv_attention_models/coco/anchors_func.py —
- ``get_feature_sizes`` ceil-mode pyramid sizes (:26-32)
- ``get_anchors`` efficientdet-style multi-scale/aspect anchors normalized to
  [0,1] (:35-80); ``get_anchor_free_anchors`` (:83-84)
- ``iou_nd`` (:164-176), center/corner coders (:178-188)
- ``decode_bboxes`` (exp hw coder; yolor 6-field variant) (:191-209)
- ``assign_anchor_classes_by_iou_with_bboxes`` IoU assignment with
  ignore band (:211-246)

Pure numpy/jnp functions; anchors are trace-time constants under jit.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

try:
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = np


def get_feature_sizes(input_shape, pyramid_levels=(3, 7)) -> List[Tuple[int, int]]:
    feature_sizes = [tuple(input_shape[:2])]
    for _ in range(max(pyramid_levels)):
        h, w = feature_sizes[-1]
        feature_sizes.append(((h - 1) // 2 + 1, (w - 1) // 2 + 1))
    return feature_sizes


def get_anchors(
    input_shape=(512, 512, 3),
    pyramid_levels=(3, 7),
    aspect_ratios=(1, 2, 0.5),
    num_scales=3,
    anchor_scale=4,
    grid_zero_start=False,
) -> np.ndarray:
    """(N, 4) [top, left, bottom, right] anchors normalized to [0, 1]."""
    scales = np.array([2 ** (i / num_scales) * anchor_scale for i in range(num_scales)])
    ar = np.asarray(aspect_ratios, np.float32)
    if ar.ndim == 1:
        sqrt_r = np.sqrt(ar)
        ww_r, hh_r = sqrt_r, 1.0 / sqrt_r
    else:
        ww_r, hh_r = ar[:, 0], ar[:, 1]
    base_hh = (scales[:, None] * hh_r[None]).reshape(-1)
    base_ww = (scales[:, None] * ww_r[None]).reshape(-1)
    base = np.stack([-base_hh / 2, -base_ww / 2, base_hh / 2, base_ww / 2], axis=1)

    levels = list(range(min(pyramid_levels), max(pyramid_levels) + 1))
    feature_sizes = get_feature_sizes(input_shape, levels)
    out = []
    for level in levels:
        s_h = feature_sizes[0][0] / feature_sizes[level][0]
        s_w = feature_sizes[0][1] / feature_sizes[level][1]
        top, left = (0.0, 0.0) if grid_zero_start else (s_h / 2, s_w / 2)
        hh = np.arange(top, input_shape[0], s_h)
        ww = np.arange(left, input_shape[1], s_w)
        wg, hg = np.meshgrid(ww, hh)
        grid = np.stack([hg, wg, hg, wg], 2).reshape(-1, 1, 4)
        anchors = base[None] * [s_h, s_w, s_h, s_w] + grid
        out.append(anchors.reshape(-1, 4))
    all_anchors = np.concatenate(out, axis=0)
    norm = np.array([input_shape[0], input_shape[1], input_shape[0], input_shape[1]], np.float32)
    return (all_anchors / norm).astype(np.float32)


def get_anchor_free_anchors(input_shape=(512, 512, 3), pyramid_levels=(3, 5), grid_zero_start=True):
    return get_anchors(input_shape, pyramid_levels, aspect_ratios=(1,), num_scales=1,
                       anchor_scale=1, grid_zero_start=grid_zero_start)


def iou_nd(bboxes, anchors):
    """IoU matrix [num_bboxes, num_anchors]; boxes as [t, l, b, r]."""
    a = jnp.expand_dims(anchors, 0)
    b = jnp.expand_dims(bboxes, 1)
    inter_tl = jnp.maximum(a[:, :, :2], b[:, :, :2])
    inter_br = jnp.minimum(a[:, :, 2:], b[:, :, 2:])
    inter_hw = jnp.maximum(inter_br - inter_tl, 0)
    inter = inter_hw[:, :, 0] * inter_hw[:, :, 1]
    area_b = (bboxes[:, 2] - bboxes[:, 0]) * (bboxes[:, 3] - bboxes[:, 1])
    area_a = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])
    union = jnp.expand_dims(area_b, 1) + jnp.expand_dims(area_a, 0) - inter
    return inter / union


def corners_to_center_yxhw(ss):
    return (ss[:, :2] + ss[:, 2:]) * 0.5, ss[:, 2:] - ss[:, :2]


def center_yxhw_to_corners(ss):
    tl = ss[:, :2] - ss[:, 2:] * 0.5
    br = tl + ss[:, 2:]
    return jnp.concatenate([tl, br], axis=-1)


def decode_bboxes(preds, anchors, return_centers: bool = False):
    """Anchor-relative regression -> corner boxes (anchors_func.py:191-209)."""
    preds_center, preds_hw, preds_others = preds[..., :2], preds[..., 2:4], preds[..., 4:]
    if anchors.shape[-1] == 6:  # yolor anchors [cy, cx, ah, aw, sy, sx]
        centers = preds_center * 2 * anchors[:, 4:] + anchors[:, :2]
        hw = (preds_hw * 2) ** 2 * anchors[:, 2:4]
    else:
        anchors_hw = anchors[:, 2:] - anchors[:, :2]
        anchors_center = (anchors[:, :2] + anchors[:, 2:]) * 0.5
        centers = preds_center * anchors_hw + anchors_center
        hw = jnp.exp(preds_hw) * anchors_hw
    if return_centers:
        return jnp.concatenate([centers, hw, preds_others], axis=-1)
    tl = centers - 0.5 * hw
    br = tl + hw
    return jnp.concatenate([tl, br, preds_others], axis=-1)


def assign_anchor_classes_by_iou_with_bboxes(
    bbox_labels: np.ndarray,
    anchors: np.ndarray,
    num_classes: int,
    ignore_threshold: float = 0.4,
    overlap_threshold: float = 0.5,
) -> np.ndarray:
    """Per-image anchor targets (anchors_func.py:211-246): returns
    (num_anchors, 4 + num_classes + 1) where the last column is the anchor
    mark (1 positive, 0 negative, -1 ignored). Host-side numpy (variable
    numbers of boxes)."""
    bbox_labels = np.asarray(bbox_labels, np.float32)
    valid = bbox_labels[bbox_labels[:, -1] > 0]
    num_anchors = anchors.shape[0]
    out = np.zeros((num_anchors, 4 + num_classes + 1), np.float32)
    if valid.shape[0] == 0:
        return out
    bboxes, labels = valid[:, :4], valid[:, 4].astype(np.int64)

    ious = np.asarray(iou_nd(bboxes, anchors))  # [nb, na]
    best_ids = ious.argmax(axis=0)
    best_ious = ious.max(axis=0)

    matched = np.where(best_ious > overlap_threshold)[0]
    matched = np.unique(np.concatenate([matched, ious.argmax(axis=-1)]))

    # encode regression targets for matched anchors
    a_ctr, a_hw = corners_to_center_yxhw(np.asarray(anchors))
    mark = np.where(best_ious > ignore_threshold, -1.0, 0.0)
    for idx in matched:
        bid = best_ids[idx]
        b_ctr = (bboxes[bid, :2] + bboxes[bid, 2:]) / 2
        b_hw = bboxes[bid, 2:] - bboxes[bid, :2]
        out[idx, 0:2] = (b_ctr - np.asarray(a_ctr)[idx]) / np.asarray(a_hw)[idx]
        out[idx, 2:4] = np.log(np.maximum(b_hw / np.asarray(a_hw)[idx], 1e-8))
        out[idx, 4 + labels[bid] - 1] = 1.0  # labels are 1-based (0 = background)
        mark[idx] = 1.0
    out[:, -1] = mark
    return out
