"""Evaluation metrics.

Parity surface: the competition's balanced accuracy
(reference README.md:43-47, 0.7*Acc1 + 0.3*Acc2 scoring) and kecam's
top-1/top-5 evaluation (imagenet/eval_func.py:70-116).
"""
from __future__ import annotations

import numpy as np


def balanced_accuracy_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Mean of per-class recalls over the classes present in y_true."""
    y_true = np.asarray(y_true).astype(np.int64)
    y_pred = np.asarray(y_pred).astype(np.int64)
    classes = np.unique(y_true)
    recalls = [np.mean(y_pred[y_true == c] == c) for c in classes]
    return float(np.mean(recalls))


def top_k_accuracy(y_true: np.ndarray, probs: np.ndarray, k: int = 5) -> float:
    y_true = np.asarray(y_true).reshape(-1, 1)
    topk = np.argsort(-np.asarray(probs), axis=-1)[:, :k]
    return float(np.mean(np.any(topk == y_true, axis=-1)))


def competition_score(acc_test1: float, acc_test2: float) -> float:
    """Final score formula (README.md:43-47)."""
    return 0.7 * acc_test1 + 0.3 * acc_test2
