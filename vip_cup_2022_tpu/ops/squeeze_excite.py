"""Channel-attention blocks: SE, ECA, global-context.

Parity surface: kecam ``se_module`` (common_layers.py:311-334), ``eca_module``
(:335-355), ``global_context_module`` (:286-310); tfimm ``SEModule`` /
``EcaModule`` (layers/attention.py:12-133).
"""
from __future__ import annotations

import math
from typing import Any, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from .act import apply_activation
from .conv import make_divisible
from .norms import LayerNorm

Dtype = Any


class SEModule(nn.Module):
    """Squeeze-and-Excitation. ``use_conv`` keeps 1x1-conv parameter layout
    (kecam default) vs Dense layout."""

    se_ratio: float = 0.25
    divisor: int = 8
    limit_round_down: float = 0.9
    activation: Union[str, Tuple[str, str]] = "relu"
    use_bias: bool = True
    use_conv: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        if isinstance(self.activation, (tuple, list)):
            hidden_act, out_act = self.activation
        else:
            hidden_act, out_act = self.activation, "sigmoid"
        reduction = make_divisible(ch * self.se_ratio, self.divisor, limit_round_down=self.limit_round_down)

        se = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        dense = lambda f, name: nn.Conv(f, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name=name)  # noqa: E731
        if self.use_conv:
            se = dense(reduction, "reduce_conv")(se)
        else:
            se = nn.Dense(reduction, use_bias=self.use_bias, dtype=self.dtype, name="reduce_dense")(se)
        se = apply_activation(se, hidden_act)
        if self.use_conv:
            se = dense(ch, "expand_conv")(se)
        else:
            se = nn.Dense(ch, use_bias=self.use_bias, dtype=self.dtype, name="expand_dense")(se)
        se = apply_activation(se, out_act)
        return x * se.astype(x.dtype)


class EcaModule(nn.Module):
    """Efficient Channel Attention: 1-D conv over the channel profile.

    Kernel size from channel count: ``t = int((log2(C) + beta) / gamma)``,
    ``k = max(t if t odd else t + 1, 3)`` (kecam common_layers.py:335-355).
    """

    gamma: float = 2.0
    beta: float = 1.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        tt = int((math.log2(float(ch)) + self.beta) / self.gamma)
        kernel_size = max(tt if tt % 2 else tt + 1, 3)
        pad = kernel_size // 2

        nnx = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)  # (B, C)
        nnx = jnp.pad(nnx, ((0, 0), (pad, pad)))
        nnx = nnx[:, :, None]  # (B, C+2p, 1) — conv over channel axis
        nnx = nn.Conv(
            1, (kernel_size,), padding="VALID", use_bias=False, dtype=self.dtype, name="conv1d"
        )(nnx)
        nnx = jnp.squeeze(nnx, axis=-1)
        nnx = apply_activation(nnx, "sigmoid")
        return x * nnx[:, None, None, :].astype(x.dtype)


class GlobalContext(nn.Module):
    """Global-context attention block (kecam common_layers.py:286-310)."""

    use_attn: bool = True
    ratio: float = 0.25
    divisor: int = 1
    activation: Union[str, Tuple[str, str]] = "relu"
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        b, h, w, ch = x.shape
        if isinstance(self.activation, (tuple, list)):
            hidden_act, out_act = self.activation
        else:
            hidden_act, out_act = self.activation, "sigmoid"
        reduction = make_divisible(ch * self.ratio, self.divisor, limit_round_down=0.0)

        if self.use_attn:
            attn = nn.Conv(1, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="attn_conv")(x)
            attn = attn.reshape(b, 1, 1, h * w)
            attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
            context = x.reshape(b, 1, h * w, ch)
            context = jnp.matmul(attn, context)  # (B,1,1,C)
        else:
            context = jnp.mean(x, axis=(1, 2), keepdims=True)

        mlp = nn.Conv(reduction, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="mlp_1_conv")(context)
        mlp = LayerNorm(name="ln")(mlp)
        mlp = apply_activation(mlp, hidden_act)
        mlp = nn.Conv(ch, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="mlp_2_conv")(mlp)
        mlp = apply_activation(mlp, out_act)
        return x * mlp.astype(x.dtype)
