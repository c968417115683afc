"""Training losses.

Parity surface: kecam imagenet/losses.py (BinaryCrossEntropyTimm — numerically
matched to timm.loss.BinaryCrossEntropy per its doctest — and
DistillKLDivergenceLoss) plus standard label-smoothed CE used by the trainers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_cross_entropy_timm(
    y_true,
    y_pred,
    target_threshold: float = 0.0,
    label_smoothing: float = 0.0,
    from_logits: bool = True,
):
    """BCE with target thresholding (losses.py:5-33): targets binarized at
    ``target_threshold`` (mixup/cutmix soft targets -> hard multi-hot), then
    standard (optionally smoothed) binary cross entropy, mean over classes."""
    y_true = jnp.where(y_true > target_threshold, 1.0, 0.0)
    if label_smoothing:
        y_true = y_true * (1.0 - label_smoothing) + 0.5 * label_smoothing
    if from_logits:
        log_p = jax.nn.log_sigmoid(y_pred)
        log_not_p = jax.nn.log_sigmoid(-y_pred)
        per_class = -(y_true * log_p + (1.0 - y_true) * log_not_p)
    else:
        eps = 1e-7
        y_pred = jnp.clip(y_pred, eps, 1.0 - eps)
        per_class = -(y_true * jnp.log(y_pred) + (1.0 - y_true) * jnp.log(1.0 - y_pred))
    return jnp.mean(per_class, axis=-1)


def categorical_cross_entropy(y_true, logits, label_smoothing: float = 0.0):
    """Label-smoothed softmax CE over one-hot/soft targets."""
    nb = logits.shape[-1]
    if label_smoothing:
        y_true = y_true * (1.0 - label_smoothing) + label_smoothing / nb
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(y_true * logp, axis=-1)


def distill_kl_divergence(teacher_prob, student_prob, temperature: float = 10.0):
    """KL(teacher || student) with temperature softmax on both inputs
    (losses.py:37-59; inputs are probabilities/logits, softened again)."""
    t = jax.nn.softmax(teacher_prob / temperature, axis=-1)
    s = jax.nn.softmax(student_prob / temperature, axis=-1)
    eps = 1e-7
    return jnp.sum(t * (jnp.log(jnp.clip(t, eps, 1.0)) - jnp.log(jnp.clip(s, eps, 1.0))), axis=-1)


def binary_accuracy(y_true, y_pred, threshold: float = 0.5):
    return jnp.mean((y_pred > threshold) == (y_true > 0.5))


def balanced_accuracy(y_true, y_pred, threshold: float = 0.5):
    """Competition metric: mean of per-class recalls (README.md:43-47)."""
    pred = (y_pred > threshold).astype(jnp.float32)
    pos = y_true > 0.5
    tpr = jnp.sum(pred * pos) / jnp.maximum(jnp.sum(pos), 1)
    tnr = jnp.sum((1 - pred) * (1 - pos)) / jnp.maximum(jnp.sum(1 - pos), 1)
    return 0.5 * (tpr + tnr)
