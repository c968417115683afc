"""Attention primitives shared by the ViT families.

Parity surface: gcvit WindowAttention (models/gcvit/layers/attention.py:7-96,
incl. the global-query mode where qkv produces only KV and a shared query is
broadcast to every window), the relative-position-bias table + index scheme
(attention.py:40-51), and tfimm's plain ViT MHSA (architectures/vit.py:121-168).

TPU-native notes: windows are folded into the batch dimension so every matmul
is a large batched MXU contraction; softmax runs in f32; the rel-pos bias
gather is precomputed into a dense (heads, N, N) tensor at trace time.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(N, N) index into a ((2wh-1)*(2ww-1)) bias table (gcvit/swin scheme)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    xx = (rel[:, :, 0] + wh - 1) * (2 * ww - 1)
    yy = rel[:, :, 1] + ww - 1
    return (xx + yy).astype(np.int32)


class WindowAttention(nn.Module):
    """Windowed MHSA with relative position bias.

    Inputs: ``x`` of shape (B*nW, N, C); optionally ``q_global`` of shape
    (B, N, C) for global-query blocks (GCViT). When ``global_query`` is set the
    qkv projection emits KV only and the shared query is repeated across each
    image's windows (attention.py:62-66).
    """

    window_size: int
    num_heads: int
    global_query: bool = False
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, q_global=None, training: bool = False):
        b_, n, c = x.shape
        head_dim = c // self.num_heads
        scale = self.qk_scale or head_dim**-0.5
        qkv_size = 3 - int(self.global_query)

        qkv = nn.Dense(c * qkv_size, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, qkv_size, self.num_heads, head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # (qkv, B_, heads, N, hd)

        if self.global_query:
            assert q_global is not None
            k, v = qkv[0], qkv[1]
            b = q_global.shape[0]
            # one shared query per image, repeated over its windows
            q = jnp.repeat(q_global, b_ // b, axis=0)  # (B_, N, C)
            q = q.reshape(b_, n, self.num_heads, head_dim)
            q = jnp.transpose(q, (0, 2, 1, 3))
        else:
            q, k, v = qkv[0], qkv[1], qkv[2]

        ws = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
            jnp.float32,
        )
        idx = relative_position_index(ws, ws).reshape(-1)
        bias = table[idx].reshape(ws * ws, ws * ws, self.num_heads)
        bias = jnp.transpose(bias, (2, 0, 1))  # (heads, N, N)

        if not training or self.attn_drop == 0.0:
            # fused pallas kernel on TPU, einsum fallback elsewhere
            from .pallas.window_attention import window_attention as fused_attn

            out = fused_attn(q, k, v, bias, scale)
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
            attn = attn.astype(jnp.float32) + bias[None]
            attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            attn = nn.Dropout(self.attn_drop, deterministic=not training)(attn)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b_, n, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not training)(out)
        return out


class MultiHeadSelfAttention(nn.Module):
    """Plain ViT MHSA (tfimm vit.py:121-168): fused qkv projection, optional
    qk bias, f32 softmax."""

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim**-0.5
        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        # recorded for attention-rollout visualization (kecam visualizing
        # plot_attention_score_maps parity); retrieve via
        # module.apply(..., mutable=['intermediates'])
        self.sow("intermediates", "attention_scores", attn)
        attn = nn.Dropout(self.attn_drop, deterministic=not training)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not training)(out)
        return out
