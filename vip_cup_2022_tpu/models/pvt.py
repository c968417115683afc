"""PVT v1 + v2 — Pyramid Vision Transformers (tfimm architectures/pvt.py,
pvt_v2.py).

Architecture parity:
- v1 (pvt.py): per-stage non-overlapping patch embed (conv 'proj' + LN 1e-5)
  + learned pos embeds (pos_embed{j}); blocks with SpatialReductionAttention
  (:111-189: q from tokens, kv from an sr_ratio-strided conv reduction + LN);
  cls token added in the LAST stage only; head on cls token
- v2 (pvt_v2.py): OVERLAPPING patch embeds (7/4 then 3/2, zero-pad k//2);
  no pos embeds / cls token; MLP gains a depthwise 3x3 'dwconv' between fc1
  and act (:77-139); per-stage trailing norm{j}; global-average-pool head
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import DropPath, LayerNorm, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class PVTConfig(ModelConfig):
    patch_size: Tuple[int, ...] = (4, 2, 2, 2)
    embed_dim: Tuple[int, ...] = (64, 128, 256, 512)
    nb_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    nb_heads: Tuple[int, ...] = (1, 2, 5, 8)
    mlp_ratio: Tuple[float, ...] = (8.0, 8.0, 4.0, 4.0)
    sr_ratio: Tuple[int, ...] = (8, 4, 2, 1)
    qkv_bias: bool = True
    v2: bool = False
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    act_layer: str = "gelu"
    classifier_activation: Optional[str] = "softmax"
    input_size: Tuple[int, int] = (224, 224)
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class _SRAttention(nn.Module):
    """SpatialReductionAttention (pvt.py:111-189 / pvt_v2.py:142-236)."""

    nb_heads: int
    sr_ratio: int
    qkv_bias: bool
    v2: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, grid_size):
        b, n, c = x.shape
        if c % self.nb_heads:
            raise ValueError(f"embed_dim={c} should be divisible by nb_heads={self.nb_heads}")
        hd = c // self.nb_heads
        scale = hd**-0.5
        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(x)
        q = jnp.transpose(q.reshape(b, n, self.nb_heads, hd), (0, 2, 1, 3))

        kv_in = x
        if self.sr_ratio > 1:
            img = x.reshape(b, grid_size[0], grid_size[1], c)
            img = nn.Conv(c, (self.sr_ratio, self.sr_ratio),
                          strides=(self.sr_ratio, self.sr_ratio), padding="VALID",
                          dtype=self.dtype, name="sr")(img)
            kv_in = img.reshape(b, -1, c)
            kv_in = LayerNorm(epsilon=1e-5, name="norm")(kv_in)
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="kv")(kv_in)
        kv = jnp.transpose(kv.reshape(b, -1, 2, self.nb_heads, hd), (2, 0, 3, 1, 4))
        k, v = kv[0], kv[1]
        attn = scale * jnp.einsum("bhnd,bhmd->bhnm", q, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class _DWConv(nn.Module):
    """pvt_v2.py:77-99: dw3x3 on token grid; nested 'dwconv/dwconv' names."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, grid_size):
        b, n, h = x.shape
        img = x.reshape(b, grid_size[0], grid_size[1], h)
        img = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
        img = nn.Conv(h, (3, 3), padding="VALID", feature_group_count=h,
                      use_bias=True, dtype=self.dtype, name="dwconv")(img)
        return img.reshape(b, n, h)


class _PvtMlp(nn.Module):
    hidden: int
    out: int
    v2: bool
    act_layer: str
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, grid_size):
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        if self.v2:
            y = _DWConv(self.dtype, name="dwconv")(y, grid_size)
        y = apply_activation(y, self.act_layer)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(y)


class _Block(nn.Module):
    cfg: PVTConfig
    stage: int
    drop_path_rate: float

    @nn.compact
    def __call__(self, x, grid_size, training: bool = False):
        cfg = self.cfg
        j = self.stage
        shortcut = x
        y = LayerNorm(epsilon=cfg.norm_eps, name="norm1")(x)
        y = _SRAttention(cfg.nb_heads[j], cfg.sr_ratio[j], cfg.qkv_bias, cfg.v2,
                         cfg.dtype, name="attn")(y, grid_size)
        x = shortcut + DropPath(self.drop_path_rate)(y, training=training)
        shortcut = x
        y = LayerNorm(epsilon=cfg.norm_eps, name="norm2")(x)
        y = _PvtMlp(int(cfg.embed_dim[j] * cfg.mlp_ratio[j]), cfg.embed_dim[j],
                    cfg.v2, cfg.act_layer, cfg.dtype, name="mlp")(y, grid_size)
        return shortcut + DropPath(self.drop_path_rate)(y, training=training)


class PVT(nn.Module):
    cfg: PVTConfig

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        b = x.shape[0]
        x = preprocess_input(x, cfg)
        nb_stages = len(cfg.nb_blocks)
        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.nb_blocks))
        k = 0
        for j in range(nb_stages):
            if cfg.v2:
                ps = 7 if j == 0 else 3
                stride = 4 if j == 0 else 2
                p = ps // 2
                x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            else:
                ps = stride = cfg.patch_size[j]
            x = nn.Conv(cfg.embed_dim[j], (ps, ps), strides=(stride, stride),
                        padding="VALID", dtype=cfg.dtype, name=f"patch_embed{j + 1}_proj")(x)
            gh, gw = x.shape[1], x.shape[2]
            x = x.reshape(b, gh * gw, cfg.embed_dim[j])
            x = LayerNorm(epsilon=1e-5, name=f"patch_embed{j + 1}_norm")(x)

            if not cfg.v2:
                nb_tokens = 1 if j == nb_stages - 1 else 0
                if nb_tokens:
                    cls_token = self.param("cls_token", nn.initializers.zeros,
                                           (1, 1, cfg.embed_dim[j]), jnp.float32)
                    cls = jnp.broadcast_to(cls_token.astype(x.dtype), (b, 1, cfg.embed_dim[j]))
                    x = jnp.concatenate([cls, x], axis=1)
                pos = self.param(f"pos_embed{j + 1}", nn.initializers.zeros,
                                 (1, gh * gw + nb_tokens, cfg.embed_dim[j]), jnp.float32)
                x = x + pos.astype(x.dtype)
                x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)

            for bk in range(cfg.nb_blocks[j]):
                x = _Block(cfg, j, float(dpr[k]), name=f"block{j + 1}_{bk}")(
                    x, (gh, gw), training=training
                )
                k += 1

            if cfg.v2:
                x = LayerNorm(epsilon=cfg.norm_eps, name=f"norm{j + 1}")(x)
            if j != nb_stages - 1:
                x = x.reshape(b, gh, gw, cfg.embed_dim[j])

        if cfg.v2:
            feat = jnp.mean(x.astype(jnp.float32), axis=1)
        else:
            x = LayerNorm(epsilon=cfg.norm_eps, name="norm")(x)
            feat = x[:, 0].astype(jnp.float32)
        if features_only:
            return feat
        if cfg.nb_classes <= 0:
            return feat
        y = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head")(feat)
        if cfg.classifier_activation:
            y = apply_activation(y, cfg.classifier_activation)
        return y


def _pvt(name, embed_dim, nb_blocks, **kw):
    return PVT, PVTConfig(name=name, embed_dim=embed_dim, nb_blocks=nb_blocks, **kw)


@register_model
def pvt_tiny():
    return _pvt("pvt_tiny", (64, 128, 320, 512), (2, 2, 2, 2))


@register_model
def pvt_small():
    return _pvt("pvt_small", (64, 128, 320, 512), (3, 4, 6, 3))


@register_model
def pvt_medium():
    return _pvt("pvt_medium", (64, 128, 320, 512), (3, 4, 18, 3))


@register_model
def pvt_large():
    return _pvt("pvt_large", (64, 128, 320, 512), (3, 8, 27, 3))


@register_model
def pvt_v2_b0():
    return _pvt("pvt_v2_b0", (32, 64, 160, 256), (2, 2, 2, 2), v2=True)


@register_model
def pvt_v2_b1():
    return _pvt("pvt_v2_b1", (64, 128, 320, 512), (2, 2, 2, 2), v2=True)


@register_model
def pvt_v2_b2():
    return _pvt("pvt_v2_b2", (64, 128, 320, 512), (3, 4, 6, 3), v2=True)


@register_model
def pvt_v2_b3():
    return _pvt("pvt_v2_b3", (64, 128, 320, 512), (3, 4, 18, 3), v2=True)


@register_model
def pvt_v2_b4():
    return _pvt("pvt_v2_b4", (64, 128, 320, 512), (3, 8, 27, 3), v2=True)


@register_model
def pvt_v2_b5():
    return _pvt("pvt_v2_b5", (64, 128, 320, 512), (3, 6, 40, 3), v2=True,
                mlp_ratio=(4.0, 4.0, 4.0, 4.0))
