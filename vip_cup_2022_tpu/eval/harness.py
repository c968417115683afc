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
    pred_format: str = "auto",
) -> Dict[str, float]:
    """Balanced accuracy of a prediction CSV against a labeled input CSV.
    Both must carry a ``filename`` column; predictions under ``logit``.

    ``pred_format``: ``"binary"`` (logit column is already 0/1 decisions,
    the CLI's output format), ``"raw"`` (probabilities — binarize at
    ``threshold``), or ``"auto"`` (legacy heuristic; ambiguous when raw
    probabilities happen to take <=2 distinct values — prefer explicit).
    """
    truth = pd.read_csv(input_csv)
    preds = pd.read_csv(pred_csv)
    merged = truth.merge(preds, on="filename", how="inner", suffixes=("", "_pred"))
    y_true = merged[label_column].values.astype(np.int64)
    logit = merged["logit"].values.astype(np.float64)
    if pred_format == "raw":
        binarize = True
    elif pred_format == "binary":
        binarize = False
    elif pred_format == "auto":
        binarize = logit.max() > 1.0 or len(np.unique(logit)) > 2
    else:
        raise ValueError(f"pred_format must be binary|raw|auto, got {pred_format!r}")
    y_pred = (logit > threshold).astype(np.int64) if binarize else logit.astype(np.int64)
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


def evaluation(
    module,
    variables,
    paths,
    labels,
    nb_classes: int,
    batch_size: int = 64,
    target_shape=(224, 224),
    central_crop: float = 0.95,
    resize_method: str = "bilinear",
):
    """Top-1/top-5 over an image list (kecam imagenet/eval_func.py:70-116
    role): central-crop eval pipeline + jitted forward."""
    import jax
    import jax.numpy as jnp

    from ..data.train_pipeline import EvalLoader
    from .metrics import top_k_accuracy

    loader = EvalLoader(
        paths, labels, nb_classes, batch_size, target_shape,
        central_crop=central_crop, resize_method=resize_method,
    )
    fwd = jax.jit(lambda v, x: module.apply(v, x.astype(jnp.float32) / 255.0))
    probs, trues = [], []
    for images, onehot in loader:
        out = fwd(variables, images)
        probs.append(np.asarray(out)[: len(onehot)])
        trues.append(onehot.argmax(-1))
    probs = np.concatenate(probs)
    trues = np.concatenate(trues)
    return {
        "top1": float(np.mean(probs.argmax(-1) == trues)),
        "top5": top_k_accuracy(trues, probs, k=5),
        "n": int(len(trues)),
    }
