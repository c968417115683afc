"""Mixup / CutMix batch augments.

Parity surface: kecam imagenet/data.py:100-217 —
- beta sampling via two gammas (:100-104)
- mixup: per-sample weight, ``max(w, 1-w)``, shuffled pairing (:107-131)
- cutmix: one beta sample per batch, random box possibly clipped at borders,
  weight recomputed from the realized box area (:134-196)
- min_mix_weight early-exit semantics (:115-117, :173-175)
- apply: random 0.5 switch between the two when both alphas set (:199-215)

All jit-friendly: the cutmix box is applied with a coordinate mask instead of
crop/pad ops, and the skip branches are lax.cond-free ``where`` selects.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sample_beta(rng, shape, alpha0, alpha1):
    k1, k2 = jax.random.split(rng)
    g1 = jax.random.gamma(k1, alpha1, shape)
    g2 = jax.random.gamma(k2, alpha0, shape)
    return g1 / (g1 + g2)


def mixup(rng, images, labels, alpha: float = 0.4, min_mix_weight: float = 0.0):
    b = images.shape[0]
    k_w, k_s = jax.random.split(rng)
    w = sample_beta(k_w, (b,), alpha, alpha)
    w = jnp.maximum(w, 1.0 - w)
    if min_mix_weight > 0:
        w = jnp.where(w > 1.0 - min_mix_weight, 1.0, w)
    perm = jax.random.permutation(k_s, b)
    iw = w.reshape(b, 1, 1, 1).astype(images.dtype)
    lw = w.reshape(b, 1).astype(jnp.float32)
    images = images * iw + images[perm] * (1.0 - iw)
    labels = labels.astype(jnp.float32) * lw + labels[perm].astype(jnp.float32) * (1.0 - lw)
    return images, labels


def cutmix(rng, images, labels, alpha: float = 0.5, min_mix_weight: float = 0.0):
    b, hh, ww, _ = images.shape
    k_w, k_y, k_x, k_s = jax.random.split(rng, 4)
    w0 = sample_beta(k_w, (), alpha, alpha)  # one per batch (data.py:157)
    cut_half = jnp.sqrt(1.0 - w0) / 2.0
    ch = jnp.maximum((cut_half * hh).astype(jnp.int32), 1)
    cw = jnp.maximum((cut_half * ww).astype(jnp.int32), 1)
    cy = jax.random.randint(k_y, (), 0, hh)
    cx = jax.random.randint(k_x, (), 0, ww)
    yl, yr = jnp.clip(cy - ch, 0, hh), jnp.clip(cy + ch, 0, hh)
    xl, xr = jnp.clip(cx - cw, 0, ww), jnp.clip(cx + cw, 0, ww)
    # realized mix weight from the clipped box area (data.py:160-161)
    w = 1.0 - ((yr - yl) * (xr - xl)).astype(jnp.float32) / float(hh * ww)

    skip = jnp.logical_or(w < min_mix_weight, 1.0 - w < min_mix_weight) if min_mix_weight > 0 else jnp.asarray(False)

    rows = jnp.arange(hh)[None, :, None, None]
    cols = jnp.arange(ww)[None, None, :, None]
    in_box = ((rows >= yl) & (rows < yr) & (cols >= xl) & (cols < xr)).astype(images.dtype)

    perm = jax.random.permutation(k_s, b)
    mixed = images * (1.0 - in_box) + images[perm] * in_box
    mixed_labels = labels.astype(jnp.float32) * w + labels[perm].astype(jnp.float32) * (1.0 - w)

    images = jnp.where(skip, images, mixed)
    labels = jnp.where(skip, labels.astype(jnp.float32), mixed_labels)
    return images, labels


def mixup_cutmix(rng, images, labels, mixup_alpha=0.1, cutmix_alpha=1.0, switch_prob=0.5):
    """Random per-batch switch (data.py:199-215)."""
    k_switch, k_op = jax.random.split(rng)
    if 0 < mixup_alpha <= 1 and 0 < cutmix_alpha <= 1:
        im1, lb1 = mixup(k_op, images, labels, alpha=mixup_alpha)
        im2, lb2 = cutmix(k_op, images, labels, alpha=cutmix_alpha)
        use_mixup = jax.random.uniform(k_switch) > switch_prob
        return (
            jnp.where(use_mixup, im1, im2),
            jnp.where(use_mixup, lb1, lb2),
        )
    if 0 < mixup_alpha <= 1:
        return mixup(k_op, images, labels, alpha=mixup_alpha)
    if 0 < cutmix_alpha <= 1:
        return cutmix(k_op, images, labels, alpha=cutmix_alpha)
    return images, labels


def rand_bbox_token(rng, height, width, scale=2, beta=1.0):
    """volo MixupToken.rand_bbox (volo.py:246-270): sample a token-grid mixup
    box (left, top, right, bottom) on the (height//scale, width//scale) grid."""
    lam = rng.beta(beta, beta)
    cut_rate = np.sqrt(1.0 - lam)
    s_h, s_w = height // scale, width // scale
    right = rng.randint(0, s_w)
    bottom = rng.randint(0, s_h)
    left = max(right - int(s_w * cut_rate) // 2, 0)
    top = max(bottom - int(s_h * cut_rate) // 2, 0)
    return left, top, right, bottom


def do_mixup_token(inputs, bbox):
    """volo MixupToken.do_mixup_token (volo.py:272-280): flip the batch inside
    the bbox region (token-level CutMix). Works on (B, H, W, C) or
    (B, H, W, nc) aux-label tensors; jit-friendly for static bbox."""
    left, top, right, bottom = bbox
    sub = inputs[:, :, left:right]
    mixed = jnp.concatenate([sub[:, :top], sub[::-1, top:bottom], sub[:, bottom:]], axis=1)
    return jnp.concatenate([inputs[:, :, :left], mixed, inputs[:, :, right:]], axis=2)
