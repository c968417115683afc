"""Detection losses.

Parity surface: reference coco/losses.py —
- ``FocalLossWithBbox`` (:36-121): alpha/gamma focal BCE over non-ignored
  anchors + huber bbox loss over positives, both normalized by the positive
  count, bbox weighted 50x
- (AnchorFreeLoss / YOLORLossWithBbox tracked with their model families)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


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
