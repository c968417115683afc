"""Cross-backend model interfaces for diffing implementations.

Parity surface: kecam imagenet/eval_func.py — ``TorchModelInterf`` (:7-21)
and ``parse_timm_log`` (:119-155). These are the reference's de-facto test
oracles (SURVEY.md §4.3): wrap a foreign-framework model behind a
numpy-in/numpy-out call so our evaluation harness and parity-diff tooling
can run either implementation interchangeably. The TFLite flavor is n/a
here (no TFLite runtime on TPU hosts); a JAX flavor is added for symmetry.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class TorchModelInterf:
    """NHWC numpy batches -> torch NCHW forward -> numpy logits."""

    def __init__(self, model, device: Optional[str] = None):
        try:
            import torch
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError("TorchModelInterf requires torch") from e
        self.torch = torch
        if device is None:
            device = "cuda:0" if torch.cuda.is_available() else "cpu"
        self.device = torch.device(device)
        self.model = model.to(self.device).eval()

    def __call__(self, imgs) -> np.ndarray:
        imgs = np.asarray(imgs, np.float32)
        with self.torch.no_grad():
            out = self.model(
                self.torch.from_numpy(imgs).permute([0, 3, 1, 2]).to(self.device).float()
            )
        return out.cpu().detach().numpy()


class JaxModelInterf:
    """NHWC numpy batches -> jitted Flax apply -> numpy logits (the 'ours'
    side of a cross-backend diff)."""

    def __init__(self, module, variables):
        import jax

        self._fn = jax.jit(lambda v, x: module.apply(v, x))
        self._variables = variables

    def __call__(self, imgs) -> np.ndarray:
        import jax.numpy as jnp

        return np.asarray(self._fn(self._variables, jnp.asarray(imgs, jnp.float32)))


def parse_timm_log(log_file: str, pick_keys: Optional[List[str]] = None) -> Dict[str, list]:
    """Extract loss/lr/val_loss/val_acc curves from a timm training log
    (eval_func.py:119-155 semantics: the epoch-end lines are identified by
    the bracketed step pattern of the last step of epoch 0)."""
    with open(log_file) as ff:
        lines = ff.readlines()

    def end_pattern(start_prefix: str, next_prefixes) -> str:
        started, previous = False, ""
        for line in lines:
            if line.startswith(start_prefix):
                started = True
                previous = line
            elif started and any(line.startswith(p) for p in next_prefixes):
                return previous.split("[")[1].split("]")[0].strip()
        return previous.split("[")[1].split("]")[0].strip() if previous else ""

    train_pattern = end_pattern("Train:", ("Test:",))
    test_pattern = ""
    started, previous = False, ""
    for line in lines:
        if line.startswith("Test:"):
            started = True
            previous = line
        elif started and not line.startswith("Test:"):
            test_pattern = previous.split("[")[1].split("]")[0].strip()
            break
    if started and not test_pattern:
        test_pattern = previous.split("[")[1].split("]")[0].strip()

    def value(line: str, start: str, end: str) -> float:
        chunk = line.split(start)[1].strip().split(end)[0]
        return float(chunk.split("(")[-1].split(")")[0])

    train_lines = [l for l in lines if l.startswith("Train:") and train_pattern in l]
    test_lines = [l for l in lines if l.startswith("Test:") and test_pattern in l]
    hh = {
        "loss": [value(l, "Loss:", "Time:") for l in train_lines],
        "lr": [value(l, "LR:", "Data:") for l in train_lines],
        "val_loss": [value(l, "Loss:", "Acc@1:") for l in test_lines],
        "val_acc": [value(l, "Acc@1:", "Acc@5:") for l in test_lines],
    }
    if hh["val_acc"] and hh["val_acc"][-1] > 1:
        hh["val_acc"] = [v / 100.0 for v in hh["val_acc"]]
    return hh if pick_keys is None else {k: hh[k] for k in pick_keys}
