"""CaiT — Class-Attention in Image Transformers (tfimm architectures/cait.py).

Architecture parity:
- patch embed + pos embed (no cls token until the end, :370-388)
- nb_blocks x LayerScaleBlock with TalkingHeadAttention (:207-259: attention
  logits mixed across heads by proj_l before softmax and proj_w after) and
  per-branch layer-scale gammas (:261-316)
- cls token appended late, 2x LayerScaleBlockClassAttention (:97-204: q from
  cls token only, separate q/k/v projections), final LN, head on cls token
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import DropPath, LayerNorm, Mlp
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CaiTConfig(ModelConfig):
    patch_size: int = 16
    embed_dim: int = 768
    nb_blocks: int = 12
    nb_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_scale: float = 1e-4
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    act_layer: str = "gelu"
    classifier_activation: Optional[str] = "softmax"
    input_size: Tuple[int, int] = (224, 224)
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD

    @property
    def nb_patches(self) -> int:
        return (self.input_size[0] // self.patch_size) * (self.input_size[1] // self.patch_size)


class _TalkingHeadAttention(nn.Module):
    """cait.py:207-259."""

    nb_heads: int
    qkv_bias: bool
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hd = c // self.nb_heads
        scale = hd**-0.5
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = jnp.transpose(qkv.reshape(b, n, 3, self.nb_heads, hd), (2, 0, 3, 1, 4))
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        attn = nn.Dense(self.nb_heads, dtype=self.dtype, name="proj_l")(jnp.transpose(attn, (0, 2, 3, 1)))
        attn = jnp.transpose(attn, (0, 3, 1, 2))
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = nn.Dense(self.nb_heads, dtype=self.dtype, name="proj_w")(jnp.transpose(attn, (0, 2, 3, 1)))
        attn = jnp.transpose(attn, (0, 3, 1, 2))
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class _ClassAttention(nn.Module):
    """cait.py:97-147: query from the cls token only."""

    nb_heads: int
    qkv_bias: bool
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hd = c // self.nb_heads
        scale = hd**-0.5
        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(x[:, :1])
        q = jnp.transpose(q.reshape(b, 1, self.nb_heads, hd), (0, 2, 1, 3)) * scale
        k = jnp.transpose(nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="k")(x).reshape(b, n, self.nb_heads, hd), (0, 2, 1, 3))
        v = jnp.transpose(nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="v")(x).reshape(b, n, self.nb_heads, hd), (0, 2, 1, 3))
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, 1, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class _LayerScaleBlock(nn.Module):
    cfg: CaiTConfig
    drop_path_rate: float = 0.0
    class_attn: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        cfg = self.cfg
        g1 = self.param("gamma_1", nn.initializers.constant(cfg.init_scale), (cfg.embed_dim,), jnp.float32)
        g2 = self.param("gamma_2", nn.initializers.constant(cfg.init_scale), (cfg.embed_dim,), jnp.float32)
        if self.class_attn:
            x_cls = x[:, :1]
            u = LayerNorm(epsilon=cfg.norm_eps, name="norm1")(x)
            u = g1.astype(x.dtype) * _ClassAttention(cfg.nb_heads, cfg.qkv_bias, cfg.dtype, name="attn")(u)
            x_cls = x_cls + DropPath(self.drop_path_rate)(u, training=training)
            shortcut = x_cls
            y = LayerNorm(epsilon=cfg.norm_eps, name="norm2")(x_cls)
            y = Mlp(hidden_features=int(cfg.embed_dim * cfg.mlp_ratio), activation=cfg.act_layer,
                    dtype=cfg.dtype, name="mlp")(y, training=training)
            y = g2.astype(x.dtype) * y
            x_cls = shortcut + DropPath(self.drop_path_rate)(y, training=training)
            return jnp.concatenate([x_cls, x[:, 1:]], axis=1)

        shortcut = x
        y = LayerNorm(epsilon=cfg.norm_eps, name="norm1")(x)
        y = _TalkingHeadAttention(cfg.nb_heads, cfg.qkv_bias, cfg.dtype, name="attn")(y)
        x = shortcut + DropPath(self.drop_path_rate)(g1.astype(x.dtype) * y, training=training)
        shortcut = x
        y = LayerNorm(epsilon=cfg.norm_eps, name="norm2")(x)
        y = Mlp(hidden_features=int(cfg.embed_dim * cfg.mlp_ratio), activation=cfg.act_layer,
                dtype=cfg.dtype, name="mlp")(y, training=training)
        return shortcut + DropPath(self.drop_path_rate)(g2.astype(x.dtype) * y, training=training)


class CaiT(nn.Module):
    cfg: CaiTConfig

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        b = x.shape[0]
        x = preprocess_input(x, cfg)
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    dtype=cfg.dtype, name="patch_embed_proj")(x)
        x = x.reshape(b, -1, cfg.embed_dim)

        pos_embed = self.param("pos_embed", nn.initializers.zeros, (1, cfg.nb_patches, cfg.embed_dim), jnp.float32)
        x = x + pos_embed.astype(x.dtype)
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)

        for j in range(cfg.nb_blocks):
            x = _LayerScaleBlock(cfg, cfg.drop_path_rate, name=f"blocks_{j}")(x, training=training)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (b, 1, cfg.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        for j in range(2):
            x = _LayerScaleBlock(cfg, 0.0, class_attn=True, name=f"blocks_token_only_{j}")(x, training=training)

        x = LayerNorm(epsilon=cfg.norm_eps, name="norm")(x)
        if features_only:
            return x
        feat = x[:, 0].astype(jnp.float32)
        if cfg.nb_classes <= 0:
            return feat
        y = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head")(feat)
        if cfg.classifier_activation:
            from ..ops import apply_activation

            y = apply_activation(y, cfg.classifier_activation)
        return y


def _cait(name, input_size, embed_dim, nb_blocks, nb_heads, init_scale):
    return CaiT, CaiTConfig(
        name=name, input_size=input_size, embed_dim=embed_dim,
        nb_blocks=nb_blocks, nb_heads=nb_heads, init_scale=init_scale,
    )


@register_model
def cait_xxs24_224():
    return _cait("cait_xxs24_224", (224, 224), 192, 24, 4, 1e-5)


@register_model
def cait_xxs24_384():
    return _cait("cait_xxs24_384", (384, 384), 192, 24, 4, 1e-5)


@register_model
def cait_xxs36_224():
    return _cait("cait_xxs36_224", (224, 224), 192, 36, 4, 1e-5)


@register_model
def cait_xxs36_384():
    return _cait("cait_xxs36_384", (384, 384), 192, 36, 4, 1e-5)


@register_model
def cait_xs24_384():
    return _cait("cait_xs24_384", (384, 384), 288, 24, 6, 1e-5)


@register_model
def cait_s24_224():
    return _cait("cait_s24_224", (224, 224), 384, 24, 8, 1e-5)


@register_model
def cait_s24_384():
    return _cait("cait_s24_384", (384, 384), 384, 24, 8, 1e-5)


@register_model
def cait_s36_384():
    return _cait("cait_s36_384", (384, 384), 384, 36, 8, 1e-6)


@register_model
def cait_m36_384():
    return _cait("cait_m36_384", (384, 384), 768, 36, 16, 1e-6)


@register_model
def cait_m48_448():
    return _cait("cait_m48_448", (448, 448), 768, 48, 16, 1e-6)
