"""Model visualization tools.

Parity surface: kecam visualizing/visualizing.py —
- ``visualize_filters`` gradient ascent (:121-185)
- attention-score rollout maps (:343-448; attention matrices recorded via
  flax ``sow`` in ops/attention.py)
(Grad-CAM lives in utils/gradcam.py; TensorBoard HParams plotting is a
notebook utility, n/a.)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def visualize_filters(
    module,
    variables,
    filter_index: int = 0,
    input_shape: Tuple[int, int] = (224, 224),
    iterations: int = 30,
    learning_rate: float = 10.0,
    seed: int = 0,
):
    """Gradient-ascent image that maximizes one channel of the final feature
    map (kecam visualize_filters)."""
    rng = jax.random.PRNGKey(seed)
    img = jax.random.uniform(rng, (1, *input_shape, 3), jnp.float32) * 0.25 + 0.375

    def loss_fn(img):
        feats = module.apply(variables, img, features_only=True)
        # mean activation of the target channel, border-cropped like kecam
        return jnp.mean(feats[..., filter_index])

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    losses = []
    for _ in range(iterations):
        loss, g = grad_fn(img)
        g = g / (jnp.sqrt(jnp.mean(jnp.square(g))) + 1e-8)  # normalized ascent
        img = img + learning_rate * g
        losses.append(float(loss))
    # de-process: center-crop border, normalize to [0,1]
    out = np.asarray(img[0])
    out = (out - out.min()) / max(out.max() - out.min(), 1e-8)
    return out, losses


def attention_rollout(
    attn_scores,
    discard_ratio: float = 0.9,
    head_fuse: str = "mean",
    num_prefix_tokens: int = 1,
):
    """Fuse per-layer attention matrices into a token->input saliency map
    (kecam plot_attention_score_maps rollout path).

    attn_scores: list of (B, heads, N, N) arrays (see get_attention_scores).
    Returns (B, N-prefix) rollout mass for the prefix (cls) token.
    """
    result = None
    for attn in attn_scores:
        a = np.asarray(attn, np.float32)
        if head_fuse == "max":
            fused = a.max(axis=1)
        else:
            fused = a.mean(axis=1)
        # discard the lowest attention links (keep cls column)
        if discard_ratio > 0:
            flat = fused.reshape(fused.shape[0], -1)
            k = int(flat.shape[-1] * discard_ratio)
            thresh = np.partition(flat, k, axis=-1)[:, k : k + 1]
            fused = np.where(fused.reshape(flat.shape) < thresh, 0.0, flat).reshape(fused.shape)
        identity = np.eye(fused.shape[-1])[None]
        a_hat = fused / np.maximum(fused.sum(axis=-1, keepdims=True), 1e-8) + identity
        a_hat = a_hat / a_hat.sum(axis=-1, keepdims=True)
        result = a_hat if result is None else a_hat @ result
    mask = result[:, 0, num_prefix_tokens:]  # cls token row
    return mask / np.maximum(mask.max(axis=-1, keepdims=True), 1e-8)


def get_attention_scores(module, variables, x):
    """Run a forward pass capturing every recorded attention matrix (flax
    ``sow`` in ops/attention.py)."""
    _, state = module.apply(variables, x, mutable=["intermediates"])

    scores = []

    def collect(tree):
        if isinstance(tree, dict):
            for key in sorted(tree.keys()):
                if key == "attention_scores":
                    scores.extend(tree[key])
                else:
                    collect(tree[key])

    collect(state["intermediates"])
    return scores
