"""Outlook attention (VOLO) — shared op.

Reference: keras_cv_attention_models/volo/volo.py:26-76 (outlook_attention) and
common_layers.py:419-455 / :459-525 (fold_by_conv2d_transpose /
CompatibleExtractPatches). Key parity details:
- attention weights predicted from an avg-pooled grid (VALID pooling when the
  input divides evenly, SAME otherwise), Dense WITH bias, divided by
  qk_scale = 1/sqrt(head_dim) — i.e. multiplied by sqrt(head_dim)
- unfold "SAME" = SYMMETRIC pad k//2 each side + VALID k x k stride-s patches
  (NOT TF's asymmetric SAME padding)
- fold = strided overlap-add, cropped at [k//2 : k//2 + H]

TPU mapping: the unfold is expressed as k*k strided slices (static shapes,
fuses into the attention einsum); the attention itself is a batched
(k2 x k2) @ (k2 x hd) einsum that XLA tiles onto the MXU; the fold is k*k
scatter-adds on a static canvas.

Must be called inside a flax ``@nn.compact`` context (it creates Dense
submodules named ``{name}v``, ``{name}attn``, ``{name}out``).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def outlook_attention(x, embed_dim, *, num_heads=8, kernel_size=3, strides=2,
                      dtype=None, name=""):
    b, height, width, _ = x.shape
    head_dim = embed_dim // num_heads
    scale = head_dim**-0.5
    k, s = kernel_size, strides
    p = k // 2
    # grid = VALID patches over the symmetric-(k//2)-padded input
    hh = (height + 2 * p - k) // s + 1
    ww = (width + 2 * p - k) // s + 1

    vv = nn.Dense(embed_dim, use_bias=False, dtype=dtype, name=name + "v")(x)

    pool_pad = "VALID" if height % s == 0 and width % s == 0 else "SAME"
    attn = nn.avg_pool(x, (s, s), strides=(s, s), padding=pool_pad,
                       count_include_pad=False)
    attn = nn.Dense(kernel_size**4 * num_heads, dtype=dtype, name=name + "attn")(attn) / scale
    attn = attn.reshape(b, hh, ww, num_heads, k * k, k * k)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)

    vp = jnp.pad(vv, ((0, 0), (p, p), (p, p), (0, 0)))
    patches = jnp.stack(
        [
            jnp.stack([vp[:, di : di + (hh - 1) * s + 1 : s, dj : dj + (ww - 1) * s + 1 : s, :] for dj in range(k)], axis=3)
            for di in range(k)
        ],
        axis=3,
    )  # (B, hh, ww, k, k, E)
    mm = patches.reshape(b, hh, ww, k * k, num_heads, head_dim)
    mm = jnp.transpose(mm, (0, 1, 2, 4, 3, 5))  # (B, hh, ww, heads, k2, hd)
    mm = jnp.einsum("bxyhpq,bxyhqd->bxyhpd", attn, mm)
    mm = jnp.transpose(mm, (0, 1, 2, 4, 3, 5)).reshape(b, hh, ww, k, k, embed_dim)

    # fold: overlap-add, crop [p : p+H] / [p : p+W]
    canvas = (hh - 1) * s + k
    out = jnp.zeros((b, canvas, canvas, embed_dim), mm.dtype)
    for di in range(k):
        for dj in range(k):
            out = out.at[:, di : di + (hh - 1) * s + 1 : s, dj : dj + (ww - 1) * s + 1 : s, :].add(
                mm[:, :, :, di, dj, :]
            )
    out = out[:, p : p + height, p : p + width, :]
    return nn.Dense(embed_dim, use_bias=True, dtype=dtype, name=name + "out")(out)
