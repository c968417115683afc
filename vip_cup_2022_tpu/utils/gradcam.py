"""Grad-CAM and saliency visualization.

Parity surface: reference models/gcvit/utils/gradcam.py:14-68
(``get_gradcam_model`` twin feature+prediction outputs, heatmap overlay) and
kecam visualizing/visualizing.py Grad-CAM(+v2) (:186-290).

JAX formulation: every model exposes ``features_only=True``; the classifier
head is re-applied as a closure over the head parameters, so
``d score / d features`` is one ``jax.grad`` — no graph surgery needed.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

HEAD_PARAM_NAMES = ("predictions", "head", "head_fc")


def _find_head(params):
    for name in HEAD_PARAM_NAMES:
        if name in params and "kernel" in params[name]:
            return params[name]
    raise KeyError(f"no classifier head found (looked for {HEAD_PARAM_NAMES})")


def make_gradcam_heatmap(module, variables, x, class_idx: Optional[int] = None):
    """Returns (heatmap [B, h, w] in [0,1], preds) — Grad-CAM on the final
    feature map."""
    feats = module.apply(variables, x, features_only=True)
    head = _find_head(variables["params"])
    kernel = jnp.asarray(head["kernel"])
    bias = jnp.asarray(head.get("bias", jnp.zeros(kernel.shape[-1])))

    def score_fn(f):
        pooled = jnp.mean(f.astype(jnp.float32), axis=(1, 2))
        logits = pooled @ kernel + bias
        if class_idx is None:
            idx = jnp.argmax(logits, axis=-1)
        else:
            idx = jnp.full((f.shape[0],), class_idx)
        return jnp.sum(jnp.take_along_axis(logits, idx[:, None], axis=-1)), logits

    (_, logits), grads = jax.value_and_grad(score_fn, has_aux=True)(feats)
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)  # GAP of gradients
    cam = jnp.sum(weights * feats.astype(jnp.float32), axis=-1)
    cam = jax.nn.relu(cam)
    cam = cam / jnp.maximum(jnp.max(cam, axis=(1, 2), keepdims=True), 1e-8)
    return cam, logits


def saliency_map(module, variables, x, class_idx: Optional[int] = None):
    """|d score / d input| max over channels (vanilla saliency)."""

    def score(x):
        out = module.apply(variables, x)
        out = out.astype(jnp.float32)
        idx = jnp.argmax(out, axis=-1) if class_idx is None else jnp.full((x.shape[0],), class_idx)
        return jnp.sum(jnp.take_along_axis(out, idx[:, None], axis=-1))

    grads = jax.grad(score)(x)
    sal = jnp.max(jnp.abs(grads), axis=-1)
    return sal / jnp.maximum(jnp.max(sal, axis=(1, 2), keepdims=True), 1e-8)


def overlay_heatmap(image01: np.ndarray, heatmap: np.ndarray, alpha: float = 0.4) -> np.ndarray:
    """Blend a [0,1] RGB image with a jet-colored heatmap (gradcam.py:44-68)."""
    from matplotlib import cm  # matplotlib ships with the base image

    h, w = image01.shape[:2]
    hm = np.asarray(heatmap, np.float32)
    if hm.shape != (h, w):
        from ..ops.resize import resize_matrix

        hm = np.einsum("oh,hw->ow", resize_matrix(hm.shape[0], h, "bilinear"), hm)
        hm = np.einsum("ow,hw->ho", resize_matrix(hm.shape[1], w, "bilinear"), hm)
    colored = cm.jet(np.clip(hm, 0, 1))[:, :, :3]
    return np.clip(image01 * (1 - alpha) + colored * alpha, 0, 1)
