"""Normalization layers.

Parity surface:
- ``batchnorm_with_activation`` (kecam common_layers.py:190-213; momentum 0.9,
  eps 1e-5 torch-mode / 1e-3 tf-mode, zero-gamma option, act_first)
- ``layer_norm`` (common_layers.py:215-220, eps 1e-5)
- ``group_norm`` (common_layers.py:222-227)
- ``EvoNormalization`` B0/S0/S0a (common_layers.py:75-187)
- tfimm ``Affine`` / kecam ``ChannelAffine`` layer-scale

Statistics are computed in float32 regardless of compute dtype (TPU policy).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .act import apply_activation

Dtype = Any

BATCH_NORM_DECAY = 0.9
BATCH_NORM_EPSILON = 1e-5
TF_BATCH_NORM_EPSILON = 1e-3
LAYER_NORM_EPSILON = 1e-5


class BatchNorm(nn.Module):
    """BatchNorm over the channel axis; Keras-compatible variable layout
    (gamma/beta/moving_mean/moving_variance)."""

    momentum: float = BATCH_NORM_DECAY
    epsilon: float = BATCH_NORM_EPSILON
    zero_gamma: bool = False
    use_scale: bool = True  # scale=False -> no gamma (tfimm EmbeddingModel bn)
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        ch = x.shape[-1]
        gamma_init = nn.initializers.zeros if self.zero_gamma else nn.initializers.ones
        if self.use_scale:
            gamma = self.param("gamma", gamma_init, (ch,), self.param_dtype)
        else:
            gamma = jnp.ones((ch,), self.param_dtype)
        beta = self.param("beta", nn.initializers.zeros, (ch,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "moving_mean", lambda: jnp.zeros((ch,), self.param_dtype)
        )
        ra_var = self.variable(
            "batch_stats", "moving_variance", lambda: jnp.ones((ch,), self.param_dtype)
        )

        if training:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.epsilon) * gamma
        y = (x.astype(jnp.float32) - mean) * inv + beta
        return y.astype(self.dtype or x.dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the last axis (eps 1e-5 default, matching kecam; tfimm
    architectures pass 1e-6 explicitly)."""

    epsilon: float = LAYER_NORM_EPSILON
    zero_gamma: bool = False
    use_scale: bool = True
    use_bias: bool = True
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        if (
            x.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and not self.is_initializing()
            and os.environ.get("VIPTPU_PALLAS_LN", "0") == "1"
        ):
            # NEGATIVE RESULT, default OFF: one pallas pass instead of
            # XLA's convert/reduce/apply fusions measured -23% ConvNeXt /
            # -15% GCViT at member level (v5e, 256-batch) — the custom call
            # is a fusion BARRIER, so the surrounding convs/residuals lose
            # their LN epilogue/prologue fusions, costing more than the
            # saved passes. Kept for shapes where a standalone LN is truly
            # unfused; custom_vjp keeps training gradients on the
            # reference path. CPU/f32 (parity oracles) never take this.
            from .pallas.norms import fused_layernorm

            init = (nn.initializers.zeros if self.zero_gamma
                    else nn.initializers.ones)
            gamma = (self.param("gamma", init, (ch,), self.param_dtype)
                     if self.use_scale else jnp.ones((ch,), jnp.float32))
            beta = (self.param("beta", nn.initializers.zeros, (ch,),
                               self.param_dtype)
                    if self.use_bias else jnp.zeros((ch,), jnp.float32))
            out = fused_layernorm(x, gamma, beta, self.epsilon)
            return out.astype(self.dtype or x.dtype)
        if x.dtype == jnp.bfloat16:
            # E[x^2]-E[x]^2 stats: every pass (both reduces and the apply)
            # consumes the bf16 input directly, so XLA fuses the f32 convert
            # into each instead of materializing a full f32 copy (profiled
            # 3.9 ms on GCViT's 256x112x112x64 stem norm for the two-pass
            # jnp.var form). f32-input paths (CPU parity oracles) keep the
            # two-pass form bit-for-bit.
            mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
            if os.environ.get("VIPTPU_LN_BF16_SQ", "0") == "1":
                # square in bf16, accumulate in f32: removes the last
                # explicit x.astype(f32) shared between ex2 and the apply,
                # which XLA CSEs into a materialized full f32 copy
                # (profiled: standalone 2.3 ms convert at ConvNeXt's
                # 99x99x96x256 s1->s2 boundary). Stats precision drops to
                # ~2^-9 relative on var — below the bf16 output rounding.
                # NEGATIVE RESULT, default off: member A/B measured a tie
                # (convnext 2,062 vs 2,073; gcvit 3,174 vs 3,212) — XLA
                # re-fuses the saved convert's cost elsewhere.
                ex2 = jnp.mean(jax.lax.square(x), axis=-1, keepdims=True,
                               dtype=jnp.float32)
            else:
                ex2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)),
                               axis=-1, keepdims=True)
            var = jnp.maximum(ex2 - mean * mean, 0.0)
            xf = x.astype(jnp.float32)
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            init = nn.initializers.zeros if self.zero_gamma else nn.initializers.ones
            gamma = self.param("gamma", init, (ch,), self.param_dtype)
            y = y * gamma
        if self.use_bias:
            beta = self.param("beta", nn.initializers.zeros, (ch,), self.param_dtype)
            y = y + beta
        return y.astype(self.dtype or x.dtype)


class GroupNorm(nn.Module):
    groups: int = 32
    epsilon: float = BATCH_NORM_EPSILON
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        g = min(self.groups, ch)
        while ch % g:
            g -= 1
        shape = x.shape[:-1] + (g, ch // g)
        xf = x.astype(jnp.float32).reshape(shape)
        axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(x.shape)
        gamma = self.param("gamma", nn.initializers.ones, (ch,), self.param_dtype)
        beta = self.param("beta", nn.initializers.zeros, (ch,), self.param_dtype)
        y = y * gamma + beta
        return y.astype(self.dtype or x.dtype)


class EvoNorm(nn.Module):
    """EvoNormalization B0 / S0 / S0a (kecam common_layers.py:75-187).

    num_groups <= 0 & nonlinearity  -> B0 (uses batch moving variance)
    num_groups  > 0 & nonlinearity  -> S0 (group std, x*sigmoid(v*x)/den)
    num_groups  > 0 & !nonlinearity -> S0a (x/den)
    """

    nonlinearity: bool = True
    num_groups: int = -1
    zero_gamma: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        ch = x.shape[-1]
        pshape = (1,) * (x.ndim - 1) + (ch,)
        gamma_init = nn.initializers.zeros if self.zero_gamma else nn.initializers.ones
        gamma = self.param("gamma", gamma_init, pshape, self.param_dtype)
        beta = self.param("beta", nn.initializers.zeros, pshape, self.param_dtype)

        xf = x.astype(jnp.float32)

        if self.num_groups > 0:
            groups = int(self.num_groups)
            while groups > 1 and ch % groups:
                groups -= 1
            gdim = ch // groups
            grouped = xf.reshape(*x.shape[:-1], groups, gdim)
            axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
            var = jnp.var(grouped, axis=axes, keepdims=True)  # (B,1,..,groups,1)
            std = jnp.sqrt(var + self.epsilon)
            den = jnp.repeat(std, gdim, axis=-1).reshape(
                x.shape[0], *((1,) * (x.ndim - 2)), ch
            )
            if self.nonlinearity:  # S0
                vv = self.param("vv", nn.initializers.ones, pshape, self.param_dtype)
                xf = xf * jax.nn.sigmoid(vv * xf) / den
            else:  # S0a
                xf = xf / den
        elif self.nonlinearity:  # B0
            moving_var = self.variable(
                "batch_stats", "moving_variance", lambda: jnp.ones(pshape, self.param_dtype)
            )
            if training:
                axes = tuple(range(x.ndim - 1))
                var = jnp.var(xf, axis=axes, keepdims=True)
                if not self.is_initializing():
                    moving_var.value = moving_var.value - (
                        (moving_var.value - var) * (1.0 - self.momentum)
                    )
            else:
                var = moving_var.value
            left = jnp.sqrt(var + self.epsilon)
            inst_axes = tuple(range(1, x.ndim - 1))
            inst_var = jnp.var(xf, axis=inst_axes, keepdims=True)
            vv = self.param("vv", nn.initializers.ones, pshape, self.param_dtype)
            right = vv * xf + jnp.sqrt(inst_var + self.epsilon)
            xf = xf / jnp.maximum(left, right)

        y = xf * gamma + beta
        return y.astype(self.dtype or x.dtype)


class ChannelAffine(nn.Module):
    """Per-channel learnable scale (+optional bias) — layer-scale gamma.

    Parity: kecam ChannelAffine (mlp_family), tfimm Affine (layers/norm.py),
    convnext/gcvit layer-scale gammas.
    """

    use_bias: bool = False
    weight_init_value: float = 1.0
    axis: int = -1
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[self.axis]
        w = self.param(
            "weight",
            nn.initializers.constant(self.weight_init_value),
            (ch,),
            self.param_dtype,
        )
        shape = [1] * x.ndim
        shape[self.axis] = ch
        y = x * w.reshape(shape).astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (ch,), self.param_dtype)
            y = y + b.reshape(shape).astype(x.dtype)
        return y


class BatchNormAct(nn.Module):
    """batchnorm (+ optional EvoNorm swap) followed/preceded by activation —
    the kecam ``batchnorm_with_activation`` composite (common_layers.py:190-213)."""

    activation: Optional[str] = None
    zero_gamma: bool = False
    epsilon: float = BATCH_NORM_EPSILON
    momentum: float = BATCH_NORM_DECAY
    act_first: bool = False
    use_evo_norm: bool = False
    evo_norm_group_size: int = -1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.use_evo_norm:
            num_groups = x.shape[-1] // self.evo_norm_group_size if self.evo_norm_group_size > 0 else -1
            return EvoNorm(
                nonlinearity=self.activation is not None,
                num_groups=num_groups,
                zero_gamma=self.zero_gamma,
                epsilon=self.epsilon,
                momentum=self.momentum,
                dtype=self.dtype,
                name="evo_norm",
            )(x, training=training)
        if self.act_first and self.activation:
            x = apply_activation(x, self.activation)
        x = BatchNorm(
            momentum=self.momentum,
            epsilon=self.epsilon,
            zero_gamma=self.zero_gamma,
            dtype=self.dtype,
            name="bn",
        )(x, training=training)
        if not self.act_first and self.activation:
            x = apply_activation(x, self.activation)
        return x
