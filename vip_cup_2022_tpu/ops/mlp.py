"""MLP blocks (transformer FFN family).

Parity: tfimm layers/transformers.py MLP/ConvMLP/GluMLP/GatedMLP +
SpatialGatingUnit; gcvit layers/feature.py Mlp.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .act import apply_activation
from .norms import LayerNorm

Dtype = Any


class Mlp(nn.Module):
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    activation: str = "gelu"
    drop_rate: float = 0.0
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_f = x.shape[-1]
        hidden = self.hidden_features or in_f
        out = self.out_features or in_f
        x = nn.Dense(hidden, use_bias=self.use_bias, dtype=self.dtype, name="fc1")(x)
        x = apply_activation(x, self.activation)
        x = nn.Dropout(self.drop_rate, deterministic=not training)(x)
        x = nn.Dense(out, use_bias=self.use_bias, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop_rate, deterministic=not training)(x)
        return x


class GluMlp(nn.Module):
    """Gated-linear-unit MLP (tfimm layers/transformers.py GluMLP)."""

    hidden_features: int = 0
    out_features: Optional[int] = None
    activation: str = "sigmoid"
    drop_rate: float = 0.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_f = x.shape[-1]
        hidden = self.hidden_features or in_f * 2
        out = self.out_features or in_f
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        gates, x = jnp.split(x, 2, axis=-1)
        x = x * apply_activation(gates, self.activation)
        x = nn.Dropout(self.drop_rate, deterministic=not training)(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop_rate, deterministic=not training)(x)
        return x


class SpatialGatingUnit(nn.Module):
    """gMLP spatial gating (tfimm layers/transformers.py SpatialGatingUnit)."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        u, v = jnp.split(x, 2, axis=-1)
        v = LayerNorm(name="norm")(v)
        # project over token axis: (B, N, C/2) -> transpose matmul
        n = v.shape[1]
        v = jnp.swapaxes(v, 1, 2)
        v = nn.Dense(n, dtype=self.dtype, name="proj", bias_init=nn.initializers.ones)(v)
        v = jnp.swapaxes(v, 1, 2)
        return u * v


class GatedMlp(nn.Module):
    """gMLP block FFN with spatial gating."""

    hidden_features: int = 0
    out_features: Optional[int] = None
    activation: str = "gelu"
    drop_rate: float = 0.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_f = x.shape[-1]
        hidden = self.hidden_features or in_f * 4
        out = self.out_features or in_f
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = apply_activation(x, self.activation)
        x = nn.Dropout(self.drop_rate, deterministic=not training)(x)
        x = SpatialGatingUnit(dtype=self.dtype, name="gate")(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop_rate, deterministic=not training)(x)
        return x
