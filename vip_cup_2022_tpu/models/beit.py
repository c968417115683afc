"""BEiT (kecam beit/beit.py).

Architecture parity:
- ``MultiHeadRelativePositionalEmbedding`` with cls-token rows/cols appended
  to the (2h-1)(2w-1) table (+3 entries) (:25-120)
- attention_block: bias-free fused qkv + separate q/v bias layers, scaled QK^T
  + rel-pos bias -> softmax -> V, output Dense with bias (:126-169)
- attention_mlp_block: pre-LN(1e-6) + ChannelAffine layer-scale gammas
  (:172-189)
- stem patch conv (with bias) + ClassToken; mean-pooling head over non-cls
  tokens then LN (:204-262)
- Base/Large patch16 (:268-283)

Layer names mirror kecam (generic mapper; ClassToken weight 'tokens').
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ChannelAffine, DropPath, LayerNorm, apply_activation
from .base import IMAGENET_INCEPTION_MEAN, IMAGENET_INCEPTION_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class BeitConfig(ModelConfig):
    depth: int = 12
    embed_dim: int = 768
    num_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 16
    attn_qv_bias: bool = True
    attn_out_bias: bool = True
    gamma_init_value: float = 0.1
    use_mean_pooling: bool = True
    drop_connect_rate: float = 0.0
    activation: str = "gelu"
    classifier_activation: Optional[str] = "softmax"
    mean: Optional[Tuple[float, ...]] = IMAGENET_INCEPTION_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_INCEPTION_STD


def _beit_rel_pos_index(height: int, width: int) -> np.ndarray:
    """(1+N, 1+N) index incl. the 3 cls-token entries (beit.py:50-80)."""
    hh, ww = np.meshgrid(np.arange(height), np.arange(width))  # xy mode (parity)
    coords = np.stack([hh, ww], axis=-1).reshape(-1, 2)
    rel = coords[:, None, :] - coords[None, :, :]
    rel_h = rel[:, :, 0] + height - 1
    rel_w = (rel[:, :, 1] + width - 1) * (2 * height - 1)
    idx = rel_h + rel_w
    nrd = (2 * height - 1) * (2 * width - 1) + 3
    top = np.full((1, idx.shape[1]), nrd - 3, idx.dtype)
    left = np.full((idx.shape[0], 1), nrd - 2, idx.dtype)
    corner = np.full((1, 1), nrd - 1, idx.dtype)
    idx = np.concatenate([top, idx], axis=0)
    left_corner = np.concatenate([corner, left], axis=0)
    return np.concatenate([left_corner, idx], axis=1).astype(np.int32)


class _Bias(nn.Module):
    @nn.compact
    def __call__(self, x):
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        return x + b.astype(x.dtype)


class _ClassToken(nn.Module):
    """kecam ClassToken (weight name 'tokens')."""

    @nn.compact
    def __call__(self, x):
        b, _, c = x.shape
        tokens = self.param("tokens", nn.initializers.truncated_normal(0.2), (1, 1, c), jnp.float32)
        return jnp.concatenate([jnp.broadcast_to(tokens, (b, 1, c)).astype(x.dtype), x], axis=1)


class _RelPosEmb(nn.Module):
    """kecam MultiHeadRelativePositionalEmbedding (weight 'positional_embedding')."""

    num_heads: int
    nrd: int
    idx: Any

    @nn.compact
    def __call__(self, attn):
        table = self.param(
            "positional_embedding", nn.initializers.zeros, (self.num_heads, self.nrd), jnp.float32
        )
        n = attn.shape[-1]
        return attn + table[:, self.idx.reshape(-1)].reshape(self.num_heads, n, n)[None]


class Beit(nn.Module):
    cfg: BeitConfig

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        b = x.shape[0]
        x = preprocess_input(x, cfg)
        x = nn.Conv(
            cfg.embed_dim, (cfg.patch_size,) * 2, strides=(cfg.patch_size,) * 2,
            padding="VALID", use_bias=True, dtype=cfg.dtype, name="stem_conv",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, cfg.embed_dim)
        x = _ClassToken(name="cls_token")(x)

        n = x.shape[1]
        key_dim = cfg.embed_dim // cfg.num_heads
        scale = float(1.0 / np.sqrt(key_dim))
        idx = _beit_rel_pos_index(gh, gw)
        nrd = (2 * gh - 1) * (2 * gw - 1) + 3

        from ..ops.drop import drop_connect_rates_split

        dcr = drop_connect_rates_split([cfg.depth], 0.0, cfg.drop_connect_rate)[0]
        for i in range(cfg.depth):
            name = f"block{i}_"
            y = LayerNorm(epsilon=1e-6, name=name + "attn_ln")(x)
            qkv = nn.Dense(cfg.embed_dim * 3, use_bias=False, dtype=cfg.dtype, name=name + "attn_qkv")(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if cfg.attn_qv_bias:
                q = _Bias(name=name + "attn_query_bias")(q)
                v = _Bias(name=name + "attn_value_bias")(v)
            q = jnp.transpose(q.reshape(b, n, cfg.num_heads, key_dim), (0, 2, 1, 3)) * scale
            k = jnp.transpose(k.reshape(b, n, cfg.num_heads, key_dim), (0, 2, 1, 3))
            v = jnp.transpose(v.reshape(b, n, cfg.num_heads, key_dim), (0, 2, 1, 3))
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
            attn = _RelPosEmb(cfg.num_heads, nrd, idx, name=name + "attn_pos_emb")(attn)
            attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, cfg.embed_dim)
            out = nn.Dense(cfg.embed_dim, use_bias=cfg.attn_out_bias, dtype=cfg.dtype, name=name + "attn_output")(out)
            out = ChannelAffine(use_bias=False, weight_init_value=cfg.gamma_init_value, name=name + "attn_gamma")(out)
            out = DropPath(dcr[i], name=name + "attn_drop")(out, training=training)
            x = x + out

            y = LayerNorm(epsilon=1e-6, name=name + "mlp_ln")(x)
            y = nn.Dense(int(cfg.embed_dim * cfg.mlp_ratio), dtype=cfg.dtype, name=name + "mlp_dense_1")(y)
            y = apply_activation(y, cfg.activation)
            y = nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name=name + "mlp_dense_2")(y)
            y = ChannelAffine(use_bias=False, weight_init_value=cfg.gamma_init_value, name=name + "mlp_gamma")(y)
            y = DropPath(dcr[i], name=name + "mlp_drop")(y, training=training)
            x = x + y

        if features_only:
            return x
        if cfg.use_mean_pooling:
            x = jnp.mean(x[:, 1:, :].astype(jnp.float32), axis=1)
            x = LayerNorm(epsilon=1e-6, name="out_ln")(x)
        else:
            x = LayerNorm(epsilon=1e-6, name="out_ln")(x)[:, 0]
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="predictions")(x.astype(jnp.float32))
        if cfg.classifier_activation:
            x = apply_activation(x, cfg.classifier_activation)
        return x


@register_model
def BeitBasePatch16():
    return Beit, BeitConfig(name="BeitBasePatch16")


@register_model
def BeitLargePatch16():
    return Beit, BeitConfig(
        name="BeitLargePatch16", embed_dim=1024, depth=24, num_heads=16,
        gamma_init_value=1e-5,
    )
