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
    import jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jax = None
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


# ---------------------------------------------------------------------------
# anchors-mode parameters + yolor anchors (anchors_func.py:12-23, :86-132)
# ---------------------------------------------------------------------------

EFFICIENTDET_MODE, ANCHOR_FREE_MODE, YOLOR_MODE = "efficientdet", "anchor_free", "yolor"


def get_anchors_mode_parameters(anchors_mode, use_object_scores="auto", num_anchors="auto", anchor_scale="auto"):
    """(anchors_func.py:12-23) resolve 'auto' head parameters per mode."""
    if anchors_mode == ANCHOR_FREE_MODE:
        use_object_scores = True if use_object_scores == "auto" else use_object_scores
        num_anchors = 1 if num_anchors == "auto" else num_anchors
        anchor_scale = 1 if anchor_scale == "auto" else anchor_scale
    elif anchors_mode == YOLOR_MODE:
        use_object_scores = True if use_object_scores == "auto" else use_object_scores
        num_anchors = 3 if num_anchors == "auto" else num_anchors
        anchor_scale = 1 if anchor_scale == "auto" else anchor_scale
    else:
        use_object_scores = False if use_object_scores == "auto" else use_object_scores
        num_anchors = 9 if num_anchors == "auto" else num_anchors
        anchor_scale = 4 if anchor_scale == "auto" else anchor_scale
    return use_object_scores, num_anchors, anchor_scale


_YOLOR_RATIOS_3 = [[[16.0, 12], [36, 19], [28, 40]], [[75, 36], [55, 76], [146, 72]],
                   [[110, 142], [243, 192], [401, 459]]]
_YOLOR_RATIOS_4 = [[[27.0, 19], [40, 44], [94, 38]], [[68, 96], [152, 86], [137, 180]],
                   [[301, 140], [264, 303], [542, 238]], [[615, 436], [380, 739], [792, 925]]]
_YOLOR_RATIOS_5 = [[[17.0, 13], [25, 22], [66, 27]], [[88, 57], [69, 112], [177, 69]],
                   [[138, 136], [114, 287], [275, 134]], [[248, 268], [504, 232], [416, 445]],
                   [[393, 812], [808, 477], [908, 1070]]]


def get_yolor_anchors(input_shape=(512, 512), pyramid_levels=(3, 5), offset=0.5, is_for_training=False):
    """(anchors_func.py:86-132) 6-field anchors [cy, cx, ah, aw, sy, sx] /
    input_shape, or (anchor_ratios, feature_sizes) for training."""
    span = max(pyramid_levels) - min(pyramid_levels)
    assert span < 5
    if span < 3:
        anchor_ratios = np.array(_YOLOR_RATIOS_3, np.float32)
    elif span < 4:
        anchor_ratios = np.array(_YOLOR_RATIOS_4, np.float32)
    else:
        anchor_ratios = np.array(_YOLOR_RATIOS_5, np.float32)

    levels = list(range(min(pyramid_levels), max(pyramid_levels) + 1))
    feature_sizes = get_feature_sizes(input_shape, levels)
    if is_for_training:
        scales = np.array([[[2.0**lv]] for lv in levels], np.float32)
        anchor_ratios = anchor_ratios[: len(levels)] / scales
        fs = np.array(feature_sizes[min(levels) : max(levels) + 1], np.float32)
        return anchor_ratios, fs

    all_anchors = []
    for level, anchor_ratio in zip(levels, anchor_ratios):
        stride_hh = feature_sizes[0][0] / feature_sizes[level][0]
        stride_ww = feature_sizes[0][1] / feature_sizes[level][1]
        hh_grid, ww_grid = np.meshgrid(
            np.arange(feature_sizes[level][0]), np.arange(feature_sizes[level][1]), indexing="ij"
        )
        grid = np.stack([hh_grid, ww_grid], 2).astype(np.float32) - offset
        grid = grid.reshape(-1, 1, 2)
        base = anchor_ratio[None, :, :]
        grid_nd = np.repeat(grid, base.shape[1], axis=1) * [stride_hh, stride_ww]
        base_nd = np.repeat(base, grid.shape[0], axis=0)
        stride_nd = np.zeros_like(grid_nd) + [stride_hh, stride_ww]
        anchors = np.concatenate([grid_nd, base_nd, stride_nd], axis=-1)
        all_anchors.append(anchors.reshape(-1, 6))
    all_anchors = np.concatenate(all_anchors, axis=0) / ([input_shape[0], input_shape[1]] * 3)
    return all_anchors.astype(np.float32)


def get_anchors_mode_by_anchors(input_shape, total_anchors, num_anchors="auto", pyramid_levels_min=3):
    """(anchors_func.py:134-147) infer mode from the model's anchor count."""
    feature_sizes = get_feature_sizes(input_shape, (pyramid_levels_min, pyramid_levels_min + 10))[pyramid_levels_min:]
    cumsum = np.cumsum([h * w for h, w in feature_sizes])
    if num_anchors == "auto":
        picks = np.array([1, 3, 9])
        num_anchors = int(picks[np.argmax(total_anchors < cumsum[-1] * picks)])
    dd = {1: ANCHOR_FREE_MODE, 3: YOLOR_MODE, 9: EFFICIENTDET_MODE}
    return dd[num_anchors], num_anchors


def get_pyramid_levels_by_anchors(input_shape, total_anchors, num_anchors="auto", pyramid_levels_min=3):
    """(anchors_func.py:149-160) infer pyramid levels from anchor count."""
    feature_sizes = get_feature_sizes(input_shape, (pyramid_levels_min, pyramid_levels_min + 10))[pyramid_levels_min:]
    cumsum = np.cumsum([h * w for h, w in feature_sizes])
    if num_anchors == "auto":
        _, num_anchors = get_anchors_mode_by_anchors(input_shape, total_anchors, num_anchors, pyramid_levels_min)
    total = total_anchors // num_anchors
    pyramid_levels_max = pyramid_levels_min + int(np.argmax(cumsum > total)) - 1
    return [pyramid_levels_min, pyramid_levels_max]


def yolor_assign_anchors(bbox_labels, anchor_ratios, feature_sizes, anchor_aspect_thresh=4.0, overlap_offset=0.5):
    """(anchors_func.py:249-314) yolor build_targets: per-level aspect-ratio
    pick + 3x3-neighbor center expansion, scattered to the anchor grid.

    Host-side numpy (runs in the data pipeline, like the reference's tf.data
    map); output is a static (total_anchors, C) target tensor for the jitted
    loss."""
    bbox_labels = np.asarray(bbox_labels, np.float32)
    bbox_labels = bbox_labels[bbox_labels[:, -1] > 0]
    bboxes, labels = bbox_labels[:, :4], bbox_labels[:, 4:]
    num_anchors = anchor_ratios.shape[1]
    num_out = bbox_labels.shape[-1]

    rrs = []
    for lid in range(len(feature_sizes)):
        anchor_ratio, feature_size = anchor_ratios[lid], np.asarray(feature_sizes[lid], np.float32)
        centers = (bboxes[:, :2] + bboxes[:, 2:]) / 2 * feature_size
        hws = (bboxes[:, 2:] - bboxes[:, :2]) * feature_size
        aspect = hws[None, :, :] / (anchor_ratio[:, None, :] + 1e-12)
        aspect_ok = np.maximum(aspect, 1 / (aspect + 1e-12)).max(-1) < anchor_aspect_thresh  # [na, nb]
        a_idx = np.repeat(np.arange(num_anchors)[:, None], bboxes.shape[0], axis=-1)[aspect_ok]
        picked = np.concatenate([centers, hws, labels], axis=-1)
        picked = np.repeat(picked[None], num_anchors, axis=0)[aspect_ok]

        ctr = picked[:, :2]
        top, left = ((ctr % 1 < overlap_offset) & (ctr > 1)).T
        bottom, right = ((ctr % 1 > (1 - overlap_offset)) & (ctr < (feature_size - 1))).T
        a_all = np.concatenate([a_idx, a_idx[top], a_idx[left], a_idx[bottom], a_idx[right]], 0)
        m_all = np.concatenate([picked, picked[top], picked[left], picked[bottom], picked[right]], 0)
        idx_all = np.concatenate(
            [
                picked[:, :2].astype(np.int32),
                (picked[top, :2] - [overlap_offset, 0]).astype(np.int32),
                (picked[left, :2] - [0, overlap_offset]).astype(np.int32),
                (picked[bottom, :2] + [overlap_offset, 0]).astype(np.int32),
                (picked[right, :2] + [0, overlap_offset]).astype(np.int32),
            ],
            0,
        )
        centers_true = m_all[:, :2] - idx_all.astype(np.float32)
        targets = np.concatenate([centers_true, m_all[:, 2:]], axis=-1)
        rr = np.zeros((int(feature_size[0]), int(feature_size[1]), num_anchors, num_out), np.float32)
        idx_all = np.clip(idx_all, 0, feature_size.astype(np.int32) - 1)
        rr[idx_all[:, 0], idx_all[:, 1], a_all] = targets
        rrs.append(rr.reshape(-1, num_out))
    return np.concatenate(rrs, axis=0)


class AnchorFreeAssignMatching:
    """SimOTA dynamic-k assignment (anchors_func.py:316-506, YOLOX).

    TPU-first reformulation: the reference compacts matched anchors with
    boolean gathers (dynamic shapes); here everything is computed DENSE over
    [max_boxes, num_anchors] with masks, so the whole assignment jits and
    vmaps. Returns per-anchor targets instead of ragged compact arrays:
    dict(object_true[A], bboxes_true[A,4], bboxes_true_encoded[A,4],
    labels_true[A,C] weighted by matched iou).
    """

    def __init__(self, input_shape, pyramid_levels=(3, 5), center_radius=2.5,
                 topk_ious_max=10, grid_zero_start=True, epsilon=1e-8):
        self.center_radius, self.topk_ious_max, self.epsilon = center_radius, topk_ious_max, epsilon
        anchors = get_anchors(input_shape, pyramid_levels, aspect_ratios=(1,),
                              num_scales=1, anchor_scale=1, grid_zero_start=grid_zero_start)
        anchors = np.asarray(anchors)
        self.anchors = anchors
        self.anchors_centers = (anchors[:, :2] + anchors[:, 2:]) * 0.5
        self.anchors_hws = anchors[:, 2:] - anchors[:, :2]

    def decode_bboxes(self, bboxes_pred, anchors_centers=None, anchors_hws=None):
        ac = self.anchors_centers if anchors_centers is None else anchors_centers
        ahw = self.anchors_hws if anchors_hws is None else anchors_hws
        center = bboxes_pred[..., :2] * ahw + ac
        hw = jnp.exp(bboxes_pred[..., 2:]) * ahw
        tl = center - 0.5 * hw
        return tl, tl + hw, center, hw

    def encode_bboxes(self, bboxes_true):
        hw = bboxes_true[..., 2:] - bboxes_true[..., :2]
        center = (bboxes_true[..., 2:] + bboxes_true[..., :2]) / 2.0
        enc_center = (center - self.anchors_centers) / self.anchors_hws
        enc_hw = jnp.log(hw / self.anchors_hws + self.epsilon)
        return jnp.concatenate([enc_center, enc_hw], axis=-1)

    def __call__(self, bbox_labels_true, bbox_labels_pred):
        eps = self.epsilon
        ac, ahw = jnp.asarray(self.anchors_centers), jnp.asarray(self.anchors_hws)
        valid = bbox_labels_true[:, -1] > 0  # [nb]
        bboxes_true = bbox_labels_true[:, :4]
        labels_true = bbox_labels_true[:, 4:-1]
        nb = bboxes_true.shape[0]

        # anchor-in-box / anchor-in-center masks [nb, A]
        in_bbox = jnp.all(
            (bboxes_true[:, None, :2] < ac[None]) & (bboxes_true[:, None, 2:] > ac[None]), -1
        )
        b_centers = (bboxes_true[:, None, :2] + bboxes_true[:, None, 2:]) * 0.5
        enlarge = ahw[None] * self.center_radius
        in_center = jnp.all(
            (ac[None] > b_centers - enlarge) & (ac[None] < b_centers + enlarge), -1
        )
        in_bbox = in_bbox & valid[:, None]
        in_center = in_center & valid[:, None]
        match_any = jnp.any(in_bbox | in_center, axis=0)  # [A]
        anchor_valid = in_bbox & in_center  # [nb, A]

        bboxes_pred = bbox_labels_pred[:, :4]
        labels_pred = bbox_labels_pred[:, 4:-1]
        object_pred = bbox_labels_pred[:, -1:]
        p_tl, p_br, _, p_hw = self.decode_bboxes(bboxes_pred)

        # ious [nb, A]
        inter_tl = jnp.maximum(p_tl[None], bboxes_true[:, None, :2])
        inter_br = jnp.minimum(p_br[None], bboxes_true[:, None, 2:])
        inter_hw = jnp.maximum(inter_br - inter_tl, 0.0)
        inter = inter_hw[..., 0] * inter_hw[..., 1]
        area_t = (bboxes_true[:, 2] - bboxes_true[:, 0]) * (bboxes_true[:, 3] - bboxes_true[:, 1])
        area_p = p_hw[:, 0] * p_hw[:, 1]
        ious = inter / (area_t[:, None] + area_p[None] - inter + eps)
        pair_ok = valid[:, None] & match_any[None]
        ious = jnp.where(pair_ok, ious, 0.0)

        obj_labels_pred = jnp.sqrt(jnp.maximum(labels_pred * object_pred, 0.0))
        lp = jnp.clip(obj_labels_pred, eps, 1.0 - eps)
        cls_loss = -(labels_true[:, None] * jnp.log(lp[None]) + (1 - labels_true[:, None]) * jnp.log(1 - lp[None]))
        cls_loss = cls_loss.sum(-1)
        cost = cls_loss + 3.0 * (-jnp.log(ious + eps)) + 1e5 * (~anchor_valid)
        cost = jnp.where(pair_ok, cost, 1e9)

        # dynamic-k per box (:437-450)
        k = min(self.topk_ious_max, ious.shape[-1])
        top_ious = jax.lax.top_k(ious, k)[0]
        dynamic_ks = jnp.maximum(top_ious.sum(-1), 1.0).astype(jnp.int32)
        ranks = jnp.argsort(jnp.argsort(cost, axis=-1), axis=-1)
        matched = (ranks < dynamic_ks[:, None]) & pair_ok & (cost < 1e8)

        # resolve anchors matched by multiple boxes: keep argmin cost (:429-435)
        conflict = matched.sum(0) > 1
        best_box = jnp.argmin(cost, axis=0)
        keep = jax.nn.one_hot(best_box, nb, dtype=bool).T
        matched = jnp.where(conflict[None], matched & keep, matched)

        object_true = jnp.any(matched, axis=0)  # [A]
        anchor_best = jnp.argmax(matched, axis=0)  # [A]
        pred_iou = (matched * ious).sum(0)  # [A]

        out_bboxes_true = bboxes_true[anchor_best]
        out_labels_true = labels_true[anchor_best] * pred_iou[:, None]
        out_encoded = self.encode_bboxes(out_bboxes_true)
        return {
            "object_true": object_true.astype(bbox_labels_pred.dtype),
            "bboxes_true": out_bboxes_true,
            "bboxes_true_encoded": out_encoded,
            "labels_true": out_labels_true,
        }
