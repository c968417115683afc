"""RandAugment / AutoAugment as pure JAX ops.

Parity surface: kecam imagenet/augment.py — the TF-graph op set
(rotate/shear/translate/posterize/solarize/solarize-add/equalize/invert/
color/contrast/brightness/sharpness/autocontrast/cutout, :222-600), the
policy machinery (:704-820), ``AutoAugment`` (:838) and ``RandAugment`` with
magnitude-std and two-layer application (:1028-1195; timm-equivalent).

TPU-native formulation: images are float [0,255] HWC inside the ops (matching
the reference's uint8-domain math), every op is shape-static, and per-sample
op selection is a ``lax.switch`` under ``vmap`` — no python branching, one
compiled program for the whole batch.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# pixel ops (operate on float images in [0, 255])
# ---------------------------------------------------------------------------


def _blend(a, b, factor):
    return jnp.clip(b + (a - b) * factor, 0.0, 255.0)


def autocontrast(img):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    out = (img - lo) * scale
    return jnp.where(hi > lo, jnp.clip(out, 0, 255), img)


def equalize(img):
    """Per-channel histogram equalization (PIL semantics, augment.py equalize)."""

    def chan(c):
        c8 = jnp.clip(c, 0, 255).astype(jnp.int32)
        histo = jnp.zeros((256,), jnp.int32).at[c8.reshape(-1)].add(1)
        nonzero = histo > 0
        # PIL: step = (total - last_nonzero_count) // 255
        last = histo[jnp.argmax(jnp.where(nonzero, jnp.arange(256), -1))]
        step = (jnp.sum(histo) - last) // 255
        lut = (jnp.cumsum(histo) + (step // 2)) // jnp.maximum(step, 1)
        lut = jnp.concatenate([jnp.zeros((1,), lut.dtype), lut[:-1]])
        lut = jnp.clip(lut, 0, 255)
        return jnp.where(step == 0, c, lut[c8].astype(c.dtype))

    return jnp.stack([chan(img[..., i]) for i in range(img.shape[-1])], axis=-1)


def invert(img):
    return 255.0 - img


def posterize(img, bits):
    shift = (8 - bits).astype(jnp.int32)
    c8 = jnp.clip(img, 0, 255).astype(jnp.int32)
    return ((c8 >> shift) << shift).astype(img.dtype)


def solarize(img, threshold=128.0):
    return jnp.where(img < threshold, img, 255.0 - img)


def solarize_add(img, addition=0.0, threshold=128.0):
    added = jnp.clip(img + addition, 0, 255)
    return jnp.where(img < threshold, added, img)


def color(img, factor):
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    gray = jnp.sum(img * w, axis=-1, keepdims=True)
    return _blend(img, jnp.broadcast_to(gray, img.shape), factor)


def contrast(img, factor):
    # reference quirk (imagenet/augment.py:296-297, inherited from the
    # upstream TF-TPU autoaugment): the blend target is
    # sum(histogram)/256 = num_pixels/256 — NOT the mean intensity.
    # Replicated for behavioral parity with reference-trained models.
    mean = img.shape[0] * img.shape[1] / 256.0
    return _blend(img, jnp.full_like(img, mean), factor)


def brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def sharpness(img, factor):
    """PIL smoothing kernel [[1,1,1],[1,5,1],[1,1,1]]/13, border unchanged."""
    k = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], img.dtype) / 13.0
    c = img.shape[-1]
    w = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    blurred = jax.lax.conv_general_dilated(
        img[None], w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )[0]
    h, wdt = img.shape[:2]
    rows = jnp.arange(h)[:, None, None]
    cols = jnp.arange(wdt)[None, :, None]
    interior = (rows > 0) & (rows < h - 1) & (cols > 0) & (cols < wdt - 1)
    blurred = jnp.where(interior, blurred, img)
    return _blend(img, blurred, factor)


def cutout(rng, img, pad_size, replace=128.0):
    h, w = img.shape[:2]
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    rows = jnp.arange(h)[:, None, None]
    cols = jnp.arange(w)[None, :, None]
    mask = (jnp.abs(rows - cy) < pad_size) & (jnp.abs(cols - cx) < pad_size)
    return jnp.where(mask, jnp.asarray(replace, img.dtype), img)


# ---------------------------------------------------------------------------
# geometric ops via one bilinear affine warp
# ---------------------------------------------------------------------------


def _affine_warp(img, m, replace=128.0):
    """Warp HWC image by the inverse 2x3 affine matrix ``m`` (dst->src),
    bilinear sampling, constant fill."""
    h, w = img.shape[:2]
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = m[0, 0] * xx + m[0, 1] * yy + m[0, 2]
    sy = m[1, 0] * xx + m[1, 1] * yy + m[1, 2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = jnp.clip(x0 + dx, 0, w - 1).astype(jnp.int32)
            yi = jnp.clip(y0 + dy, 0, h - 1).astype(jnp.int32)
            val = img[yi, xi, :]
            wgt = ((wx * dx + (1 - wx) * (1 - dx)) * (wy * dy + (1 - wy) * (1 - dy)))[..., None]
            out = out + val * wgt
    valid = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1))[..., None]
    return jnp.where(valid, out, jnp.asarray(replace, img.dtype))


def rotate(img, degrees, replace=128.0):
    h, w = img.shape[:2]
    rad = degrees * math.pi / 180.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    # dst->src rotation about center
    m = jnp.array(
        [
            [cos, sin, cx - cos * cx - sin * cy],
            [-sin, cos, cy + sin * cx - cos * cy],
        ]
    )
    return _affine_warp(img, m, replace)


def shear_x(img, level, replace=128.0):
    m = jnp.array([[1.0, level, 0.0], [0.0, 1.0, 0.0]])
    return _affine_warp(img, m, replace)


def shear_y(img, level, replace=128.0):
    m = jnp.array([[1.0, 0.0, 0.0], [level, 1.0, 0.0]])
    return _affine_warp(img, m, replace)


def translate_x(img, pixels, replace=128.0):
    m = jnp.array([[1.0, 0.0, pixels], [0.0, 1.0, 0.0]])
    return _affine_warp(img, m, replace)


def translate_y(img, pixels, replace=128.0):
    m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, pixels]])
    return _affine_warp(img, m, replace)


# ---------------------------------------------------------------------------
# RandAugment policy (timm/kecam parameterization, augment.py:1028-1195)
# ---------------------------------------------------------------------------

_MAX_LEVEL = 10.0


def _mag_to_arg(name, level):
    if name == "rotate":
        return level / _MAX_LEVEL * 30.0
    if name in ("shear_x", "shear_y"):
        return level / _MAX_LEVEL * 0.3
    if name in ("translate_x", "translate_y"):
        return level / _MAX_LEVEL * 0.45 * 100  # pixels on ~224 scale: 0.45*img
    if name in ("color", "contrast", "brightness", "sharpness"):
        return level / _MAX_LEVEL * 0.9 + 0.1  # enhance factor around 1.0
    if name == "posterize":
        return 8 - (level / _MAX_LEVEL * 4)
    if name == "solarize":
        return 256.0 - level / _MAX_LEVEL * 256.0
    if name == "solarize_add":
        return level / _MAX_LEVEL * 110.0
    return level


RAND_AUG_OPS = (
    "autocontrast", "equalize", "invert", "rotate", "posterize", "solarize",
    "color", "contrast", "brightness", "sharpness", "shear_x", "shear_y",
    "translate_x", "translate_y", "solarize_add",
)


def _apply_op(op_idx, rng, img, level, translate_pixels):
    """lax.switch over the op table; ops with signs flip randomly."""
    k_sign, k_op = jax.random.split(rng)
    sign = jnp.where(jax.random.uniform(k_sign) < 0.5, -1.0, 1.0)

    def f_autocontrast(x):
        return autocontrast(x)

    def f_equalize(x):
        return equalize(x)

    def f_invert(x):
        return invert(x)

    def f_rotate(x):
        return rotate(x, sign * _mag_to_arg("rotate", level))

    def f_posterize(x):
        return posterize(x, jnp.maximum(_mag_to_arg("posterize", level), 1.0))

    def f_solarize(x):
        return solarize(x, _mag_to_arg("solarize", level))

    def f_color(x):
        return color(x, 1.0 + sign * (_mag_to_arg("color", level) - 0.1))

    def f_contrast(x):
        return contrast(x, 1.0 + sign * (_mag_to_arg("contrast", level) - 0.1))

    def f_brightness(x):
        return brightness(x, 1.0 + sign * (_mag_to_arg("brightness", level) - 0.1))

    def f_sharpness(x):
        return sharpness(x, 1.0 + sign * (_mag_to_arg("sharpness", level) - 0.1))

    def f_shear_x(x):
        return shear_x(x, sign * _mag_to_arg("shear_x", level))

    def f_shear_y(x):
        return shear_y(x, sign * _mag_to_arg("shear_y", level))

    def f_translate_x(x):
        return translate_x(x, sign * level / _MAX_LEVEL * translate_pixels)

    def f_translate_y(x):
        return translate_y(x, sign * level / _MAX_LEVEL * translate_pixels)

    def f_solarize_add(x):
        return solarize_add(x, _mag_to_arg("solarize_add", level))

    fns = [
        f_autocontrast, f_equalize, f_invert, f_rotate, f_posterize, f_solarize,
        f_color, f_contrast, f_brightness, f_sharpness, f_shear_x, f_shear_y,
        f_translate_x, f_translate_y, f_solarize_add,
    ]
    return jax.lax.switch(op_idx, fns, img)


def rand_augment(
    rng,
    images,
    num_layers: int = 2,
    magnitude: float = 6.0,
    magnitude_std: float = 0.5,
    apply_probability: float = 0.5,
    translate_const: float = 0.45,
    use_cutout: bool = False,
    cutout_const: float = 40.0,
):
    """Batched RandAugment on [0,1] float images (converted to the 0-255
    domain internally, matching the reference's uint8-op math)."""
    b, h, w, _ = images.shape
    translate_pixels = translate_const * min(h, w) * _MAX_LEVEL / _MAX_LEVEL
    imgs255 = images.astype(jnp.float32) * 255.0

    def per_image(rng, img):
        def layer(carry, key):
            img = carry
            k_op, k_mag, k_gate, k_apply = jax.random.split(key, 4)
            op_idx = jax.random.randint(k_op, (), 0, len(RAND_AUG_OPS))
            level = magnitude + magnitude_std * jax.random.normal(k_mag)
            level = jnp.clip(level, 0.0, _MAX_LEVEL)
            out = _apply_op(op_idx, k_apply, img, level, translate_pixels)
            out = jnp.where(jax.random.uniform(k_gate) < apply_probability, out, img)
            return out, None

        keys = jax.random.split(rng, num_layers)
        img, _ = jax.lax.scan(layer, img, keys)
        if use_cutout:
            img = cutout(jax.random.fold_in(rng, 7), img, int(cutout_const))
        return img

    keys = jax.random.split(rng, b)
    out = jax.vmap(per_image)(keys, imgs255)
    return jnp.clip(out / 255.0, 0.0, 1.0).astype(images.dtype)


# ---------------------------------------------------------------------------
# AutoAugment (reference imagenet/augment.py:704-1025)
# ---------------------------------------------------------------------------

# (op, probability, magnitude) pairs; each sub-policy applies its two ops in
# sequence, each gated by its own Bernoulli draw (augment.py policy_v0 :938).
AUTOAUGMENT_POLICIES = {
    "v0": (
        (("Color", 0.4, 9), ("Equalize", 0.6, 3)),
        (("Solarize", 0.8, 3), ("Equalize", 0.4, 7)),
        (("Solarize", 0.4, 2), ("Solarize", 0.6, 2)),
        (("Color", 0.2, 0), ("Equalize", 0.8, 8)),
        (("Equalize", 0.4, 8), ("SolarizeAdd", 0.8, 3)),
        (("Color", 0.6, 1), ("Equalize", 1.0, 2)),
        (("Color", 0.4, 7), ("Equalize", 0.6, 0)),
        (("Posterize", 0.4, 6), ("AutoContrast", 0.4, 7)),
        (("Solarize", 0.6, 8), ("Color", 0.6, 9)),
        (("Equalize", 0.8, 4), ("Equalize", 0.0, 8)),
        (("Equalize", 1.0, 4), ("AutoContrast", 0.6, 2)),
        (("Posterize", 0.8, 2), ("Solarize", 0.6, 10)),
        (("Solarize", 0.6, 8), ("Equalize", 0.6, 1)),
        (("Equalize", 0.8, 1), ("ShearY", 0.8, 4)),
        (("Color", 0.4, 1), ("Rotate", 0.6, 8)),
        (("ShearX", 0.2, 9), ("Rotate", 0.6, 8)),
        (("Invert", 0.4, 9), ("Rotate", 0.6, 0)),
        (("Equalize", 1.0, 9), ("ShearY", 0.6, 3)),
        (("Solarize", 0.2, 4), ("Rotate", 0.8, 9)),
        (("Rotate", 1.0, 7), ("TranslateY", 0.8, 9)),
        (("ShearX", 0.0, 0), ("Solarize", 0.8, 4)),
        (("ShearY", 0.8, 0), ("Color", 0.6, 4)),
        (("Color", 1.0, 0), ("Rotate", 0.6, 2)),
        (("ShearY", 0.4, 7), ("SolarizeAdd", 0.6, 7)),
        (("Color", 0.8, 6), ("Rotate", 0.4, 5)),
    ),
}
# policy_simple = v0 with the geometric (custom-op) sub-policies removed
AUTOAUGMENT_POLICIES["simple"] = AUTOAUGMENT_POLICIES["v0"][:13]
# policy_positional = only the geometric sub-policies (augment.py :1003)
AUTOAUGMENT_POLICIES["positional"] = AUTOAUGMENT_POLICIES["v0"][13:]
AUTOAUGMENT_POLICIES["test"] = ((("TranslateX", 1.0, 4), ("Equalize", 1.0, 10)),)


def _auto_op(name, rng, img, level, cutout_const, translate_const):
    """One AutoAugment op with the v0 LEVEL_TO_ARG rules (augment.py:613-701).
    ``name``/``level`` are static; only the sign / cutout position draw rng."""
    lvl = level / _MAX_LEVEL
    sign = jnp.where(jax.random.uniform(rng) < 0.5, -1.0, 1.0)
    if name == "AutoContrast":
        return autocontrast(img)
    if name == "Equalize":
        return equalize(img)
    if name == "Invert":
        return invert(img)
    if name == "Rotate":
        return rotate(img, sign * lvl * 30.0)
    if name == "Posterize":
        return posterize(img, jnp.asarray(int(lvl * 4), jnp.float32))
    if name == "Solarize":
        return solarize(img, float(int(lvl * 256)))
    if name == "SolarizeAdd":
        return solarize_add(img, float(int(lvl * 110)))
    if name in ("Color", "Contrast", "Brightness", "Sharpness"):
        factor = lvl * 1.8 + 0.1  # _enhance_level_to_arg (no negate)
        return {"Color": color, "Contrast": contrast,
                "Brightness": brightness, "Sharpness": sharpness}[name](img, factor)
    if name == "ShearX":
        return shear_x(img, sign * lvl * 0.3)
    if name == "ShearY":
        return shear_y(img, sign * lvl * 0.3)
    if name == "TranslateX":
        return translate_x(img, sign * lvl * translate_const)
    if name == "TranslateY":
        return translate_y(img, sign * lvl * translate_const)
    if name == "Cutout":
        return cutout(rng, img, int(lvl * cutout_const))
    raise KeyError(f"unknown AutoAugment op {name!r}")


def auto_augment(
    rng,
    images,
    policy: str = "v0",
    cutout_const: float = 100.0,
    translate_const: float = 250.0,
):
    """Batched AutoAugment on [0,1] float images (AutoAugment paper policy;
    reference ``AutoAugment`` class, augment.py:838-1025). Per image one
    sub-policy is drawn uniformly (``lax.switch``) and its two ops applied in
    sequence, each gated by its static probability — the policy table is
    trace-time constant, so the whole batch is one compiled program."""
    if policy not in AUTOAUGMENT_POLICIES:
        raise ValueError(
            f"unknown policy {policy!r} (have {sorted(AUTOAUGMENT_POLICIES)})"
        )
    subs = AUTOAUGMENT_POLICIES[policy]
    b = images.shape[0]
    imgs255 = images.astype(jnp.float32) * 255.0

    def make_branch(sub):
        def branch(args):
            rng, img = args
            for i, (name, prob, level) in enumerate(sub):
                key = jax.random.fold_in(rng, i)
                k_gate, k_op = jax.random.split(key)
                out = _auto_op(name, k_op, img, float(level), cutout_const, translate_const)
                img = jnp.where(jax.random.uniform(k_gate) < prob, out, img)
            return img

        return branch

    branches = [make_branch(s) for s in subs]

    def per_image(rng, img):
        k_sel, k_ops = jax.random.split(rng)
        idx = jax.random.randint(k_sel, (), 0, len(subs))
        return jax.lax.switch(idx, branches, (k_ops, img))

    keys = jax.random.split(rng, b)
    out = jax.vmap(per_image)(keys, imgs255)
    return jnp.clip(out / 255.0, 0.0, 1.0).astype(images.dtype)
