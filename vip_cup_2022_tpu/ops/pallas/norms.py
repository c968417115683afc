"""Fused LayerNorm as one pallas pass (TPU inference hot path).

XLA lowers the flax-style LN (f32 stats + apply over the channel axis) into
a convert + two reduce fusions + an apply fusion; at the big NHWC norm
boundaries this materializes an f32 copy of the activation and reads the
input ~3x (profiled: ConvNeXt stem/downsample norms ~5 ms, GCViT
downsample norms ~3 ms per 256-batch forward). This kernel reads the input
once and writes the normalized output once; stats are two-pass f32 over
the real channel width, bit-matching the f32 reference form
(reference batchnorm-free LN call sites, e.g. tfimm layers and
keras_cv_attention_models common_layers layer_norm).

Training still works: a jax.custom_vjp recomputes the reference XLA
forward for the backward pass, so gradients are exactly the reference
LN's (pallas kernels have no autodiff).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps):
    xf = x_ref[:].astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * g_ref[:] + b_ref[:]).astype(o_ref.dtype)


def _pallas_ln2(x2, g, b, eps, interpret=False):
    m, c = x2.shape
    row_tile = 1024
    if c < 128:
        row_tile *= 128 // c  # narrow-C tiles are lane-padded half-empty
    t = min(row_tile, max(8, -(-m // 8) * 8))
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(pl.cdiv(m, t),),
        in_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((t, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        interpret=interpret,
    )(x2, jnp.asarray(g, jnp.float32), jnp.asarray(b, jnp.float32))


def _ref_ln(x, g, b, eps):
    """Reference XLA LN (the module's f32 two-pass form) — used for the
    backward pass and as the non-TPU fallback."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * g + b).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layernorm(x, g, b, eps):
    """LN over the last axis; forward = one pallas pass, backward = the
    reference XLA gradients. x is (..., C); returns x.dtype."""
    shape = x.shape
    out = _pallas_ln2(x.reshape(-1, shape[-1]), g, b, eps)
    return out.reshape(shape)


def _fwd(x, g, b, eps):
    return fused_layernorm(x, g, b, eps), (x, g, b)


def _bwd(eps, res, dy):
    x, g, b = res
    _, vjp = jax.vjp(lambda x_, g_, b_: _ref_ln(x_, g_, b_, eps), x, g, b)
    return vjp(dy)


fused_layernorm.defvjp(_fwd, _bwd)
