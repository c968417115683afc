"""Inference-TTA and training augmentations as pure JAX ops.

Parity surface (reference dataset/augment.py):
- ``apply_augment`` gate p=0.8 then RandomFlip(h=.5, v=.5) + RandomGray(p=.3)
  (:153-182 — the only ACTIVE ops)
- defined-but-disabled ops kept for capability parity:
  ``ShiftScaleShearRotate`` affine (:68-107), ``JpegCompress`` (:110-113),
  ``RandomJitter`` (:122-129), ``Blur`` (:131-140), ``RandomBGR`` (:148-151)

All ops are batched (leading batch axis) and jit-friendly: per-sample random
decisions use ``jnp.where`` masks, never Python branches — the TPU-native
replacement for the reference's per-element tf.cond graphs.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_GRAY_W = (0.2989, 0.5870, 0.1140)  # ITU-R BT.601, same as tf.image.rgb_to_grayscale


def random_flip(rng, img, prob_hflip=0.5, prob_vflip=0.0):
    """Per-sample horizontal/vertical flips (augment.py:115-120)."""
    b = img.shape[0]
    k1, k2 = jax.random.split(rng)
    do_h = jax.random.uniform(k1, (b, 1, 1, 1)) < prob_hflip
    do_v = jax.random.uniform(k2, (b, 1, 1, 1)) < prob_vflip
    img = jnp.where(do_h, img[:, :, ::-1, :], img)
    img = jnp.where(do_v, img[:, ::-1, :, :], img)
    return img


def random_gray(rng, img, prob=0.5):
    """rgb->gray->rgb with probability ``prob`` (augment.py:142-146)."""
    b = img.shape[0]
    do = jax.random.uniform(rng, (b, 1, 1, 1)) < prob
    w = jnp.asarray(_GRAY_W, img.dtype)
    gray = jnp.sum(img * w, axis=-1, keepdims=True)
    return jnp.where(do, jnp.broadcast_to(gray, img.shape), img)


def random_bgr(rng, img, prob=0.5):
    b = img.shape[0]
    do = jax.random.uniform(rng, (b, 1, 1, 1)) < prob
    return jnp.where(do, img[..., ::-1], img)


def random_jitter(rng, img, hue=0.1, sat=(0.8, 1.2), cont=(0.8, 1.2), bri=0.1, prob=0.25):
    """Hue/saturation/contrast/brightness jitter (augment.py:122-129).

    Hue rotation implemented as a YIQ-space matrix (TF's rgb hue adjust
    equivalent); all factors sampled per sample.
    """
    b = img.shape[0]
    keys = jax.random.split(rng, 6)
    do = jax.random.uniform(keys[0], (b, 1, 1, 1)) < prob

    # brightness: x + delta
    delta = jax.random.uniform(keys[1], (b, 1, 1, 1), minval=-bri, maxval=bri)
    # contrast: (x - mean) * c + mean  (per-channel mean, TF semantics)
    cfac = jax.random.uniform(keys[2], (b, 1, 1, 1), minval=cont[0], maxval=cont[1])
    # saturation: lerp(gray, x, s)
    sfac = jax.random.uniform(keys[3], (b, 1, 1, 1), minval=sat[0], maxval=sat[1])
    # hue: rotate chroma plane
    theta = jax.random.uniform(keys[4], (b, 1, 1), minval=-hue, maxval=hue) * 2.0 * math.pi

    out = img
    # hue (YIQ rotation)
    yiq = jnp.asarray(
        [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]],
        img.dtype,
    )
    rgb_from_yiq = jnp.linalg.inv(yiq)
    x_yiq = jnp.einsum("ij,bhwj->bhwi", yiq, out)
    cos_t, sin_t = jnp.cos(theta)[..., None], jnp.sin(theta)[..., None]
    yy = x_yiq[..., 0:1]
    ii = x_yiq[..., 1:2] * cos_t - x_yiq[..., 2:3] * sin_t
    qq = x_yiq[..., 1:2] * sin_t + x_yiq[..., 2:3] * cos_t
    out = jnp.einsum("ij,bhwj->bhwi", rgb_from_yiq, jnp.concatenate([yy, ii, qq], -1))
    # saturation
    gray = jnp.sum(out * jnp.asarray(_GRAY_W, img.dtype), axis=-1, keepdims=True)
    out = gray + (out - gray) * sfac
    # contrast
    mean = jnp.mean(out, axis=(1, 2), keepdims=True)
    out = (out - mean) * cfac + mean
    # brightness
    out = out + delta
    out = jnp.clip(out, 0.0, 1.0)
    return jnp.where(do, out, img)


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    return k[:, None] * k[None, :]


def blur(rng, img, filter_size: int = 3, prob=1.0):
    """Gaussian blur (the TPU-friendly half of reference Blur augment.py:131-140;
    the median branch is host-side only in the reference and is approximated
    by gaussian here — both are disabled in the shipped pipeline)."""
    b, _, _, c = img.shape
    k = _gaussian_kernel(filter_size, sigma=1.0).astype(img.dtype)
    w = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    blurred = jax.lax.conv_general_dilated(
        img, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    do = jax.random.uniform(rng, (b, 1, 1, 1)) < prob
    return jnp.where(do, blurred, img)


def shift_scale_shear_rotate(
    rng,
    img,
    rot: float = 5.0,
    shr: float = 5.0,
    h_zoom: float = 50.0,
    v_zoom: float = 50.0,
    h_shift: float = 30.0,
    v_shift: float = 30.0,
    prob: float = 0.65,
):
    """Affine TTA/training transform (augment.py:68-107): shear+zoom+shift 3x3
    matrix then rotation, constant fill. Implemented as one gather-based
    bilinear warp (static shapes, no tfa dependency)."""
    b, h, w, _ = img.shape
    keys = jax.random.split(rng, 7)
    do = jax.random.uniform(keys[0], (b,)) < prob

    rot_d = rot * jax.random.normal(keys[1], (b,))
    shr_d = shr * jax.random.normal(keys[2], (b,))
    hz = 1.0 + jax.random.normal(keys[3], (b,)) / h_zoom
    wz = 1.0 + jax.random.normal(keys[4], (b,)) / v_zoom
    hs = h_shift * jax.random.normal(keys[5], (b,))
    ws = v_shift * jax.random.normal(keys[6], (b,))

    shear_r = shr_d * math.pi / 180.0
    rot_r = rot_d * math.pi / 180.0

    zeros, ones = jnp.zeros_like(hz), jnp.ones_like(hz)
    # shear @ zoom @ shift (reference get_mat :30-66), then rotation
    c2, s2 = jnp.cos(shear_r), jnp.sin(shear_r)
    shear_m = jnp.stack([ones, s2, zeros, zeros, c2, zeros, zeros, zeros, ones], -1).reshape(b, 3, 3)
    zoom_m = jnp.stack([1.0 / hz, zeros, zeros, zeros, 1.0 / wz, zeros, zeros, zeros, ones], -1).reshape(b, 3, 3)
    shift_m = jnp.stack([ones, zeros, hs, zeros, ones, ws, zeros, zeros, ones], -1).reshape(b, 3, 3)
    cr, sr = jnp.cos(-rot_r), jnp.sin(-rot_r)
    rot_m = jnp.stack([cr, sr, zeros, -sr, cr, zeros, zeros, zeros, ones], -1).reshape(b, 3, 3)
    m = rot_m @ shear_m @ zoom_m @ shift_m

    # warp: dst (y, x) centered coordinates -> src coordinates
    yy = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xx = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    grid = jnp.stack([gy.ravel(), gx.ravel(), jnp.ones(h * w)], 0)  # (3, HW)
    src = jnp.einsum("bij,jk->bik", jnp.linalg.inv(m), grid)  # inverse map
    sy = src[:, 0, :] + (h - 1) / 2.0
    sx = src[:, 1, :] + (w - 1) / 2.0

    def sample(im, sy, sx):
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        wy = sy - y0
        wx = sx - x0
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                yi = jnp.clip(y0 + dy, 0, h - 1).astype(jnp.int32)
                xi = jnp.clip(x0 + dx, 0, w - 1).astype(jnp.int32)
                val = im[yi, xi, :]
                valid = ((sy >= 0) & (sy <= h - 1) & (sx >= 0) & (sx <= w - 1))[:, None]
                wgt = ((wy * dy + (1 - wy) * (1 - dy)) * (wx * dx + (1 - wx) * (1 - dx)))[:, None]
                out = out + jnp.where(valid, val * wgt, 0.0)  # constant (zero) fill
        return out.reshape(h, w, im.shape[-1])

    warped = jax.vmap(sample)(img, sy, sx)
    return jnp.where(do[:, None, None, None], warped, img)


def apply_augment(
    rng,
    img,
    augment_prob: float = 0.80,
    hflip: float = 0.5,
    vflip: float = 0.5,
    gray_prob: float = 0.3,
):
    """The shipped TTA augmentation (augment.py:153-182): gate at 0.8, then
    flip(h=.5, v=.5) and gray(p=.3). Batched; per-sample gate."""
    b = img.shape[0]
    k_gate, k_flip, k_gray = jax.random.split(rng, 3)
    gate = jax.random.uniform(k_gate, (b, 1, 1, 1)) <= augment_prob
    aug = random_flip(k_flip, img, hflip, vflip)
    aug = random_gray(k_gray, aug, gray_prob)
    return jnp.where(gate, aug, img)
