"""Detection losses.

Parity surface: reference coco/losses.py —
- ``FocalLossWithBbox`` (:36-121): alpha/gamma focal BCE over non-ignored
  anchors + huber bbox loss over positives, both normalized by the positive
  count, bbox weighted 50x
- ``anchor_free_loss`` (:123-278): SimOTA-assigned BCE cls/obj + iou^2 bbox
- ``YolorLossWithBbox`` (:281-409): CIoU + per-level balance weights
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _huber(y_true, y_pred, delta: float):
    err = y_pred - y_true
    abs_err = jnp.abs(err)
    return jnp.where(
        abs_err <= delta, 0.5 * jnp.square(err), delta * abs_err - 0.5 * delta**2
    )


def focal_loss_with_bbox(
    y_true,
    y_pred,
    alpha: float = 0.25,
    gamma: float = 1.5,
    delta: float = 0.1,
    bbox_loss_weight: float = 50.0,
    label_smoothing: float = 0.0,
    from_logits: bool = False,
):
    """y_true: (B, A, 4 + C + 1) with trailing anchor mark {1, 0, -1};
    y_pred: (B, A, 4 + C). jit-friendly masked formulation (no gathers)."""
    bbox_pred, class_pred = y_pred[:, :, :4], y_pred[:, :, 4:]
    bbox_true, class_true = y_true[:, :, :4], y_true[:, :, 4:-1]
    mark = y_true[:, :, -1]
    not_ignored = (mark != -1).astype(jnp.float32)
    positive = (mark == 1).astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(positive), 1.0)

    cp = jax.nn.sigmoid(class_pred) if from_logits else class_pred
    cp = jnp.clip(cp.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    ct = class_true.astype(jnp.float32)
    cond = ct == 1.0
    alpha_factor = jnp.where(cond, alpha, 1.0 - alpha)
    p_t = jnp.where(cond, cp, 1.0 - cp)
    focal_factor = (1.0 - p_t) ** gamma
    if label_smoothing > 0:
        ct = ct * (1.0 - label_smoothing) + 0.5 * label_smoothing
    ce = -(ct * jnp.log(cp) + (1.0 - ct) * jnp.log(1.0 - cp))
    cls_loss = jnp.sum(alpha_factor * focal_factor * ce * not_ignored[:, :, None]) / num_pos

    # huber averaged over the 4 coords (tf.losses.huber semantics)
    bbox = jnp.mean(_huber(bbox_true, bbox_pred.astype(jnp.float32), delta), axis=-1)
    bbox_loss = jnp.sum(bbox * positive) / num_pos

    return cls_loss + bbox_loss * bbox_loss_weight


def bbox_iou(true_tl, true_br, true_hw, pred_tl, pred_br, pred_hw,
             use_ciou: bool = False, epsilon: float = 1e-8):
    """(coco/losses.py:6-33) IoU / CIoU over [..., 2] corner tensors."""
    import math

    inter_tl = jnp.maximum(true_tl, pred_tl)
    inter_br = jnp.minimum(true_br, pred_br)
    inter_hw = jnp.maximum(inter_br - inter_tl, 0.0)
    inter = inter_hw[..., 0] * inter_hw[..., 1]
    union = true_hw[..., 0] * true_hw[..., 1] + pred_hw[..., 0] * pred_hw[..., 1] - inter
    iou = inter / (union + epsilon)
    if not use_ciou:
        return iou
    outer_tl = jnp.minimum(true_tl, pred_tl)
    outer_br = jnp.maximum(true_br, pred_br)
    outer_hw = outer_br - outer_tl
    outer = outer_hw[..., 0] ** 2 + outer_hw[..., 1] ** 2 + epsilon
    rho_h = (true_tl[..., 0] + true_br[..., 0] - pred_tl[..., 0] - pred_br[..., 0]) ** 2
    rho_w = (true_tl[..., 1] + true_br[..., 1] - pred_tl[..., 1] - pred_br[..., 1]) ** 2
    rho = (rho_h + rho_w) / 4.0
    vv = (4 / math.pi**2) * (
        jnp.arctan(true_hw[..., 1] / (true_hw[..., 0] + epsilon))
        - jnp.arctan(pred_hw[..., 1] / (pred_hw[..., 0] + epsilon))
    ) ** 2
    alpha = jax.lax.stop_gradient(vv / ((1 + epsilon) - iou + vv))
    return iou - (rho / outer + vv * alpha)


def _bce(y_true, y_pred, epsilon=1e-7):
    p = jnp.clip(y_pred.astype(jnp.float32), epsilon, 1.0 - epsilon)
    t = y_true.astype(jnp.float32)
    return -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def anchor_free_loss(
    y_true,
    y_pred,
    assigner,
    use_l1_loss: bool = False,
    bbox_loss_weight: float = 5.0,
    label_smoothing: float = 0.0,
    from_logits: bool = False,
):
    """YOLOX AnchorFreeLoss (coco/losses.py:123-278). ``assigner`` is an
    :class:`~..detect.anchors.AnchorFreeAssignMatching`. y_true:
    (B, max_boxes, 4 + C + 1) padded with a trailing validity flag; y_pred:
    (B, A, 4 + C + 1). Fully masked/static: jit + vmap over the batch."""

    if from_logits:
        y_pred = jnp.concatenate(
            [y_pred[..., :4], jax.nn.sigmoid(y_pred[..., 4:])], axis=-1
        )

    def single(bbox_labels_true, bbox_labels_pred):
        a = assigner(bbox_labels_true, bbox_labels_pred)
        object_true = a["object_true"]
        bboxes_pred = bbox_labels_pred[:, :4]
        labels_pred = bbox_labels_pred[:, 4:-1]
        object_pred = bbox_labels_pred[:, -1]

        labels_true = a["labels_true"]
        if label_smoothing > 0:
            labels_true = labels_true * (1.0 - label_smoothing) + 0.5 * label_smoothing
        cls = (_bce(labels_true, labels_pred).sum(-1) * object_true).sum()
        obj = _bce(object_true, object_pred).sum()

        p_tl, p_br, _, p_hw = assigner.decode_bboxes(bboxes_pred)
        t_tl, t_br = a["bboxes_true"][:, :2], a["bboxes_true"][:, 2:]
        iou = bbox_iou(t_tl, t_br, t_br - t_tl, p_tl, p_br, p_hw, epsilon=assigner.epsilon)
        bbox = ((1.0 - iou**2) * object_true).sum()
        l1 = (jnp.abs(a["bboxes_true_encoded"] - bboxes_pred).sum(-1) * object_true).sum() if use_l1_loss else 0.0
        return cls, bbox, obj, l1, object_true.sum()

    cls, bbox, obj, l1, num_valid = jax.vmap(single)(y_true, y_pred)
    num_valid = jnp.maximum(num_valid.sum(), 1.0)
    cls, bbox, obj = cls.sum() / num_valid, bbox.sum() / num_valid, obj.sum() / num_valid
    l1 = (l1.sum() / num_valid) if use_l1_loss else 0.0
    return cls + obj + l1 + bbox * bbox_loss_weight


class YolorLossWithBbox:
    """YOLORLossWithBbox (coco/losses.py:281-409): CIoU bbox loss with the
    yolor 2x-sigmoid decode, per-level normalized cls loss, iou-weighted
    objectness with per-level balance weights."""

    def __init__(self, input_shape, pyramid_levels=(3, 5), gamma=0.0,
                 class_loss_weight=0.3, bbox_loss_weight=0.05,
                 object_loss_weight=0.7, label_smoothing=0.0, from_logits=False):
        from .anchors import get_feature_sizes, get_yolor_anchors

        num_levels = max(pyramid_levels) - min(pyramid_levels) + 1
        self.loss_scale = 3.0 / num_levels
        anchors = get_yolor_anchors(input_shape[:2], pyramid_levels, is_for_training=False)
        self.anchor_ratios = (anchors[:, 2:4] / anchors[:, 4:])[None]  # [1, A, 2]
        feature_sizes = get_feature_sizes(input_shape, pyramid_levels)[min(pyramid_levels) : max(pyramid_levels) + 1]
        balance = {3: [4.0, 1.0, 0.4], 4: [4.0, 1.0, 0.4, 0.1], 5: [4.0, 1.0, 0.5, 0.4, 0.1]}
        weights = []
        for fs, w in zip(feature_sizes, balance.get(num_levels, balance[5])):
            weights.extend([w] * (fs[0] * fs[1] * 3))
        self.object_level_weights = np.array(weights, np.float32)
        self.feature_split = [fs[0] * fs[1] * 3 for fs in feature_sizes]
        self.gamma, self.label_smoothing, self.from_logits = gamma, label_smoothing, from_logits
        self.class_loss_weight, self.bbox_loss_weight = class_loss_weight, bbox_loss_weight
        self.object_loss_weight = object_loss_weight

    def __call__(self, y_true, y_pred):
        if self.from_logits:
            y_pred = jax.nn.sigmoid(y_pred)
        mark = y_true[:, :, -1]
        pos = (mark == 1).astype(jnp.float32)  # [B, A]

        # per-level valid counts, broadcast back to every anchor of the level
        splits = np.cumsum(self.feature_split)[:-1]
        per_level = [jnp.zeros_like(m) + m.sum() for m in jnp.split(mark, splits, axis=-1)]
        num_valid_each = jnp.maximum(jnp.concatenate(per_level, axis=-1), 1.0)

        # ciou over positives (masked)
        t_center, t_hw = y_true[:, :, :2], y_true[:, :, 2:4]
        t_tl = t_center - t_hw / 2
        t_br = t_tl + t_hw
        p_center = y_pred[:, :, :2] * 2 - 0.5
        p_hw = (y_pred[:, :, 2:4] * 2) ** 2 * jnp.asarray(self.anchor_ratios)
        p_tl = p_center - p_hw / 2
        p_br = p_tl + p_hw
        iou = bbox_iou(t_tl, t_br, t_hw, p_tl, p_br, p_hw, use_ciou=True)
        bbox_loss = (((1.0 - iou) * pos) / num_valid_each).sum() * self.loss_scale

        object_true = jnp.maximum(iou, 0.0) * pos
        obj_loss = _bce(object_true, y_pred[:, :, -1]) * jnp.asarray(self.object_level_weights)
        obj_loss = obj_loss.mean() * self.loss_scale

        ct, cp = y_true[:, :, 4:-1], y_pred[:, :, 4:-1]
        if self.label_smoothing > 0:
            ct = ct * (1.0 - self.label_smoothing) + 0.5 * self.label_smoothing
        ce = _bce(ct, cp)
        if self.gamma > 0:
            p_t = jnp.where(y_true[:, :, 4:-1] == 1.0, cp, 1.0 - cp)
            ce = ce * (1.0 - p_t) ** self.gamma
        cls_loss = ((ce.mean(-1) * pos) / num_valid_each).sum() * self.loss_scale

        return (cls_loss * self.class_loss_weight + bbox_loss * self.bbox_loss_weight
                + obj_loss * self.object_loss_weight)


def class_accuracy_with_bbox(y_true, y_pred):
    """ClassAccuracyWithBbox metric (coco/losses.py:412-427): argmax accuracy
    over positive anchors."""
    mark = y_true[:, :, -1]
    pos = (mark == 1).astype(jnp.float32)
    correct = (jnp.argmax(y_true[:, :, 4:-1], -1) == jnp.argmax(y_pred[:, :, 4 : 4 + y_true.shape[-1] - 5], -1)).astype(jnp.float32)
    return (correct * pos).sum() / jnp.maximum(pos.sum(), 1.0)
