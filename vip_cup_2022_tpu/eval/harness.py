"""Evaluation harnesses.

- :func:`evaluate_csv`: run the ensemble engine over a labeled CSV and report
  balanced accuracy (the integration-test role of kecam's golden-accuracy
  harness, SURVEY.md §4.2).
- :func:`parity_diff`: compare two prediction CSVs / arrays (our output vs the
  reference's) — the per-layer/output diff tool SURVEY.md §7 calls for.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import pandas as pd

from .metrics import balanced_accuracy_score


def evaluate_csv(
    input_csv: str,
    label_column: str = "label",
    pred_csv: Optional[str] = None,
    threshold: float = 0.487,
) -> Dict[str, float]:
    """Balanced accuracy of a prediction CSV against a labeled input CSV.
    Both must carry a ``filename`` column; predictions under ``logit``."""
    truth = pd.read_csv(input_csv)
    preds = pd.read_csv(pred_csv)
    merged = truth.merge(preds, on="filename", how="inner", suffixes=("", "_pred"))
    y_true = merged[label_column].values.astype(np.int64)
    logit = merged["logit"].values.astype(np.float64)
    y_pred = (logit > threshold).astype(np.int64) if logit.max() > 1.0 or len(np.unique(logit)) > 2 else logit.astype(np.int64)
    return {
        "balanced_accuracy": balanced_accuracy_score(y_true, y_pred),
        "accuracy": float(np.mean(y_true == y_pred)),
        "n": int(len(merged)),
    }


def parity_diff(ours, reference, atol: float = 1e-4) -> Dict[str, float]:
    """Max/mean abs difference between two prediction arrays or CSVs."""
    def load(x):
        if isinstance(x, (str, os.PathLike)):
            df = pd.read_csv(x).sort_values("filename")
            return df["logit"].values.astype(np.float64)
        return np.asarray(x, np.float64)

    a, b = load(ours), load(reference)
    diff = np.abs(a - b)
    return {
        "max_abs_diff": float(diff.max()),
        "mean_abs_diff": float(diff.mean()),
        "n_exceed_atol": int((diff > atol).sum()),
        "n": int(diff.size),
    }
