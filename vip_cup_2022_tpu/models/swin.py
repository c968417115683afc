"""Swin Transformer v1 (tfimm architectures/swin.py).

Architecture parity:
- patch embed (conv 'proj' + LN) -> 4 stages 'layers/{j}' of shifted-window
  blocks, PatchMerging downsample between stages (:330-363: even/odd strided
  concat -> LN -> Dense reduction)
- WindowAttention (:111-199): fused qkv, learned relative-position bias table
  indexed by the precomputed (2w-1)^2 index, additive shift mask
- cyclic shift via roll, shift disabled when grid <= window (:218-227)
- global average pool head (v1; unlike kecam swin-v2's cosine attention this
  uses dot-product attention with pre-norm blocks)

The shift masks and relative-position indices are trace-time numpy constants
(the reference stores them as non-trainable tf.Variables; the h5 conversion
skips them).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import DropPath, LayerNorm, Mlp, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SwinConfig(ModelConfig):
    patch_size: int = 4
    embed_dim: int = 96
    nb_blocks: Tuple[int, ...] = (2, 2, 6, 2)
    nb_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    norm_eps: float = 1e-5
    act_layer: str = "gelu"
    classifier_activation: Optional[str] = "softmax"
    input_size: Tuple[int, int] = (224, 224)
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


def _rel_pos_index(window_size: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window_size), np.arange(window_size), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window_size - 1
    rel[:, :, 1] += window_size - 1
    rel[:, :, 0] *= 2 * window_size - 1
    return rel.sum(-1)


def _shift_mask(h: int, w: int, window_size: int, shift_size: int) -> np.ndarray:
    img_mask = np.zeros((1, h, w, 1), np.float32)
    slices = (slice(0, -window_size), slice(-window_size, -shift_size), slice(-shift_size, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, h // window_size, window_size, w // window_size, window_size, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size * window_size)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class _WindowAttention(nn.Module):
    """swin.py:111-199."""

    embed_dim: int
    nb_heads: int
    window_size: int
    qkv_bias: bool
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, mask):
        # x: (B*nW, n, C); mask: (nW, n, n) or None
        bn, n, c = x.shape
        hd = c // self.nb_heads
        scale = (self.embed_dim // self.nb_heads) ** -0.5
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = jnp.transpose(qkv.reshape(bn, n, 3, self.nb_heads, hd), (2, 0, 3, 1, 4))
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)

        table = self.param(
            "relative_position_bias_table", nn.initializers.zeros,
            ((2 * self.window_size - 1) ** 2, self.nb_heads), jnp.float32,
        )
        idx = _rel_pos_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(n, n, self.nb_heads)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, self.nb_heads, n, n) + mask[None, :, None]
            attn = attn.reshape(-1, self.nb_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bn, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class _SwinBlock(nn.Module):
    cfg: SwinConfig
    input_size: Tuple[int, int]
    embed_dim: int
    nb_heads: int
    drop_path_rate: float
    shift_size: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        cfg = self.cfg
        h, w = self.input_size
        window_size, shift_size = cfg.window_size, self.shift_size
        if min(self.input_size) <= window_size:
            shift_size, window_size = 0, min(self.input_size)
        b, n, c = x.shape

        shortcut = x
        y = LayerNorm(epsilon=cfg.norm_eps, name="norm1")(x)
        y = y.reshape(b, h, w, c)
        if shift_size > 0:
            y = jnp.roll(y, (-shift_size, -shift_size), axis=(1, 2))
        y = y.reshape(b, h // window_size, window_size, w // window_size, window_size, c)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(-1, window_size * window_size, c)
        mask = jnp.asarray(_shift_mask(h, w, window_size, shift_size)) if shift_size > 0 else None
        y = _WindowAttention(self.embed_dim, self.nb_heads, window_size, cfg.qkv_bias,
                             cfg.dtype, name="attn")(y, mask)
        y = y.reshape(b, h // window_size, w // window_size, window_size, window_size, c)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, h, w, c)
        if shift_size > 0:
            y = jnp.roll(y, (shift_size, shift_size), axis=(1, 2))
        y = y.reshape(b, n, c)
        x = shortcut + DropPath(self.drop_path_rate)(y, training=training)

        shortcut = x
        y = LayerNorm(epsilon=cfg.norm_eps, name="norm2")(x)
        y = Mlp(hidden_features=int(self.embed_dim * cfg.mlp_ratio),
                activation=cfg.act_layer, dtype=cfg.dtype, name="mlp")(y, training=training)
        return shortcut + DropPath(self.drop_path_rate)(y, training=training)


class _PatchMerging(nn.Module):
    """swin.py:330-363: even/odd concat -> LN -> Dense(2C, no bias)."""

    cfg: SwinConfig
    input_size: Tuple[int, int]
    embed_dim: int

    @nn.compact
    def __call__(self, x):
        h, w = self.input_size
        b, n, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1
        )
        x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
        x = LayerNorm(epsilon=self.cfg.norm_eps, name="norm")(x)
        return nn.Dense(2 * self.embed_dim, use_bias=False, dtype=self.cfg.dtype,
                        name="reduction")(x)


class _SwinStage(nn.Module):
    cfg: SwinConfig
    input_size: Tuple[int, int]
    embed_dim: int
    nb_blocks: int
    nb_heads: int
    dpr: Tuple[float, ...]
    downsample: bool

    @nn.compact
    def __call__(self, x, training: bool = False):
        cfg = self.cfg
        for idx in range(self.nb_blocks):
            x = _SwinBlock(
                cfg, self.input_size, self.embed_dim, self.nb_heads, self.dpr[idx],
                shift_size=0 if idx % 2 == 0 else cfg.window_size // 2,
                name=f"blocks_{idx}",
            )(x, training=training)
        if self.downsample:
            x = _PatchMerging(cfg, self.input_size, self.embed_dim, name="downsample")(x)
        return x


class Swin(nn.Module):
    cfg: SwinConfig

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        b = x.shape[0]
        x = preprocess_input(x, cfg)
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    dtype=cfg.dtype, name="patch_embed_proj")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, cfg.embed_dim)
        x = LayerNorm(epsilon=cfg.norm_eps, name="patch_embed_norm")(x)
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)

        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.nb_blocks))
        start = 0
        nb_stages = len(cfg.nb_blocks)
        for j in range(nb_stages):
            rates = tuple(float(r) for r in dpr[start : start + cfg.nb_blocks[j]])
            start += cfg.nb_blocks[j]
            x = _SwinStage(
                cfg, (gh // 2**j, gw // 2**j), int(cfg.embed_dim * 2**j),
                cfg.nb_blocks[j], cfg.nb_heads[j], rates,
                downsample=j < nb_stages - 1, name=f"layers_{j}",
            )(x, training=training)

        x = LayerNorm(epsilon=cfg.norm_eps, name="norm")(x)
        if features_only:
            return x
        feat = jnp.mean(x.astype(jnp.float32), axis=1)
        if cfg.nb_classes <= 0:
            return feat
        y = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head")(feat)
        if cfg.classifier_activation:
            y = apply_activation(y, cfg.classifier_activation)
        return y


def _swin(name, input_size, embed_dim, nb_blocks, nb_heads, window_size, nb_classes=1000):
    return Swin, SwinConfig(
        name=name, input_size=input_size, embed_dim=embed_dim, nb_blocks=nb_blocks,
        nb_heads=nb_heads, window_size=window_size, nb_classes=nb_classes,
    )


@register_model
def swin_tiny_patch4_window7_224():
    return _swin("swin_tiny_patch4_window7_224", (224, 224), 96, (2, 2, 6, 2), (3, 6, 12, 24), 7)


@register_model
def swin_small_patch4_window7_224():
    return _swin("swin_small_patch4_window7_224", (224, 224), 96, (2, 2, 18, 2), (3, 6, 12, 24), 7)


@register_model
def swin_base_patch4_window7_224():
    return _swin("swin_base_patch4_window7_224", (224, 224), 128, (2, 2, 18, 2), (4, 8, 16, 32), 7)


@register_model
def swin_base_patch4_window12_384():
    return _swin("swin_base_patch4_window12_384", (384, 384), 128, (2, 2, 18, 2), (4, 8, 16, 32), 12)


@register_model
def swin_large_patch4_window7_224():
    return _swin("swin_large_patch4_window7_224", (224, 224), 192, (2, 2, 18, 2), (6, 12, 24, 48), 7)


@register_model
def swin_large_patch4_window12_384():
    return _swin("swin_large_patch4_window12_384", (384, 384), 192, (2, 2, 18, 2), (6, 12, 24, 48), 12)
