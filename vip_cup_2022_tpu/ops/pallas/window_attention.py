"""Pallas TPU kernel: fused windowed attention.

The hot loop of the ViT ensemble members (SURVEY.md §3.3 — the window-attention
matmuls of GCViT; also Swin). Per (window-batch, head) program instance the
kernel keeps Q/K/V tiles and the NxN score matrix in VMEM, fusing
QK^T -> +bias -> softmax -> @V into one pass so the attention matrix never
round-trips to HBM (the XLA fallback materializes it between ops unless
fusion triggers).

Shapes are tiny (N = window^2 tokens <= 256, head_dim <= 64), so one
(window, head) tile per grid step fits comfortably in VMEM; scores compute in
f32 on the MXU via ``preferred_element_type``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:  # pallas requires a TPU-capable jaxlib; fall back cleanly elsewhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32) * scale  # (N, D)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (N, N) on MXU
    s = s + bias_ref[0].astype(jnp.float32)
    # numerically-stable softmax in VMEM
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    scale: float = 1.0,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ``softmax(q @ k^T * scale + bias) @ v``.

    Args:
        q, k, v: (B, H, N, D) — windows folded into B.
        bias: (H, N, N) relative-position bias (broadcast over B).
    Returns:
        (B, H, N, D) in v.dtype.
    """
    if use_pallas is None:
        import os

        # Measured on v5e (GCViTTiny@224, bf16, batch 256): XLA's batched-GEMM
        # lowering 1187 img/s vs 974 img/s for this one-(window,head)-per-
        # program kernel — the tiny 49x32 tiles underfill the MXU. Default to
        # XLA; opt in with VIPTPU_PALLAS=1 (multi-window blocking is the
        # planned kernel improvement).
        use_pallas = (
            _HAS_PALLAS
            and jax.default_backend() == "tpu"
            and int(os.environ.get("VIPTPU_PALLAS", "0")) == 1
        )
    if not (use_pallas or interpret):
        s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
        s = s + bias.astype(jnp.float32)[None]
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v)

    b, h, n, d = q.shape
    kernel = functools.partial(_attention_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), v.dtype),
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, n, n), lambda i, j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0)),
        interpret=interpret,
    )(q, k, v, bias)
