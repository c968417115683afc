"""VOLO — Vision Outlooker (kecam volo/volo.py).

Architecture parity (volo.py:294-416):
- patch stem (:291-301): 7x7/2 conv + 2x 3x3 convs, BN+relu each, then a
  patch conv k=patch_size//2 stride=patch_size//2 WITH bias
- stage 1: outlook-attention blocks (:26-76) at stride-2 grid
- 2x2/2 downsample conv (WITH bias) + learned 2-D positional embedding
  (:190-211)
- stage 2: MHSA blocks using keras MultiHeadAttention semantics
  (use_bias=False everywhere, separate trailing BiasLayer :117-139)
- class-attention blocks (:144-163, attention_type="class"): query = cls
  token only, result concatenated back with the spatial tokens
- heads (:375-410): default = token_head(cls) + 0.5 * max(aux_head(tokens));
  mean_classifier_top / token_classifier_top / token_label_top variants
- raw logits output (no classifier activation); rescale_mode "torch"

MixupToken (:246-287) is a train-time token-labeling augmentation; the
equivalent capability lives in train/mixup.py (batch-level mixup/cutmix).

TPU notes: outlook attention via ops/outlook.py (static strided slices +
batched MXU einsums); MHSA over the flattened 196-token grid is a plain
bf16-friendly batched attention.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import BatchNorm, DropPath, LayerNorm, apply_activation
from ..ops.outlook import outlook_attention
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VOLOConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (4, 14)
    embed_dims: Tuple[int, ...] = (192, 384)
    num_heads: Tuple[int, ...] = (6, 12)
    mlp_ratios: Tuple[int, ...] = (3, 3)
    stem_hidden_dim: int = 64
    patch_size: int = 8
    classifiers: int = 2
    first_attn_type: str = "outlook"
    mlp_activation: str = "gelu"
    stem_activation: str = "relu"
    drop_connect_rate: float = 0.0
    mean_classifier_top: bool = False
    token_classifier_top: bool = False
    token_label_top: bool = False
    classifier_activation: Optional[str] = None  # raw logits (volo.py:409)
    input_size: Tuple[int, int] = (224, 224)
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class _KerasMHA(nn.Module):
    """keras.layers.MultiHeadAttention(use_bias=False) param layout:
    query/key/value kernels (C, heads, kd), attention_output (heads, kd, out).
    Scores scaled by 1/sqrt(kd)."""

    num_heads: int
    key_dim: int
    output_dim: int
    dtype: Dtype = None

    class _W(nn.Module):
        shape: Tuple[int, ...]

        @nn.compact
        def __call__(self):
            return self.param("kernel", nn.initializers.xavier_uniform(), self.shape, jnp.float32)

    @nn.compact
    def __call__(self, query, kv):
        h, kd = self.num_heads, self.key_dim
        wq = self._W((query.shape[-1], h, kd), name="query")()
        wk = self._W((kv.shape[-1], h, kd), name="key")()
        wv = self._W((kv.shape[-1], h, kd), name="value")()
        wo = self._W((h, kd, self.output_dim), name="attention_output")()
        dt = self.dtype or query.dtype
        q = jnp.einsum("bnc,chd->bnhd", query, wq.astype(dt)) * (kd**-0.5)
        k = jnp.einsum("bmc,chd->bmhd", kv, wk.astype(dt))
        v = jnp.einsum("bmc,chd->bmhd", kv, wv.astype(dt))
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(dt)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        return jnp.einsum("bnhd,hdo->bno", out, wo.astype(dt))


class _Bias(nn.Module):
    """volo BiasLayer (volo.py:117-139): output-dense bias kept separate."""

    @nn.compact
    def __call__(self, x):
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        return x + b.astype(x.dtype)


class _PosEmb(nn.Module):
    """volo PositionalEmbedding (volo.py:190-211): (1, H, W, C) learned."""

    @nn.compact
    def __call__(self, x):
        pp = self.param(
            "positional_embedding",
            nn.initializers.truncated_normal(0.2),
            (1, x.shape[1], x.shape[2], x.shape[3]),
            jnp.float32,
        )
        return x + pp.astype(x.dtype)


class _ClassToken(nn.Module):
    """volo ClassToken (volo.py:228-243): weight name 'tokens'."""

    @nn.compact
    def __call__(self, x):
        tok = self.param("tokens", nn.initializers.truncated_normal(0.2), (1, 1, x.shape[-1]), jnp.float32)
        tok = jnp.broadcast_to(tok.astype(x.dtype), (x.shape[0], 1, x.shape[-1]))
        return jnp.concatenate([tok, x], axis=1)


class VOLO(nn.Module):
    cfg: VOLOConfig

    def _attn_mlp_block(self, x, embed_dim, num_heads, mlp_ratio, attention_type,
                        drop_rate, name, training):
        """volo attention_mlp_block (volo.py:142-187)."""
        cfg = self.cfg
        nn_0 = x[:, :1] if attention_type == "class" else x
        y = LayerNorm(epsilon=1e-5, name=name + "LN")(x)
        if attention_type == "outlook":
            y = outlook_attention(y, embed_dim, num_heads=num_heads, dtype=cfg.dtype, name=name + "attn_")
        elif attention_type == "class":
            y = _KerasMHA(num_heads, embed_dim // num_heads, embed_dim, cfg.dtype,
                          name=name + "attn_mhsa")(y[:, :1, :], y)
            y = _Bias(name=name + "attn_bias")(y)
        elif attention_type == "mhsa":
            b, hh, ww, c = y.shape
            t = y.reshape(b, hh * ww, c)
            t = _KerasMHA(num_heads, embed_dim // num_heads, embed_dim, cfg.dtype,
                          name=name + "attn_mhsa")(t, t)
            t = _Bias(name=name + "attn_bias")(t)
            y = t.reshape(b, hh, ww, embed_dim)
        y = DropPath(drop_rate, name=name + "drop_1")(y, training=training)
        x1 = nn_0 + y

        m = LayerNorm(epsilon=1e-5, name=name + "mlp_LN")(x1)
        m = nn.Dense(embed_dim * mlp_ratio, dtype=cfg.dtype, name=name + "mlp_dense_1")(m)
        m = apply_activation(m, cfg.mlp_activation)
        m = nn.Dense(embed_dim, dtype=cfg.dtype, name=name + "mlp_dense_2")(m)
        m = DropPath(drop_rate, name=name + "drop_2")(m, training=training)
        out = x1 + m

        if attention_type == "class":
            out = jnp.concatenate([out, x[:, 1:]], axis=1)
        return out

    def _stem(self, x, training):
        """volo patch_stem (volo.py:291-301)."""
        cfg = self.cfg
        dt = cfg.dtype

        def conv_bn(x, f, k, s, name):
            p = k // 2
            if p:
                x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            x = nn.Conv(f, (k, k), strides=(s, s), padding="VALID", use_bias=False,
                        dtype=dt, name=name + "conv")(x)
            x = BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dt, name=name + "bn")(x, training=training)
            return apply_activation(x, cfg.stem_activation)

        x = conv_bn(x, cfg.stem_hidden_dim, 7, 2, "stem_1_")
        x = conv_bn(x, cfg.stem_hidden_dim, 3, 1, "stem_2_")
        x = conv_bn(x, cfg.stem_hidden_dim, 3, 1, "stem_3_")
        step = cfg.patch_size // 2
        return nn.Conv(cfg.embed_dims[0], (step, step), strides=(step, step), padding="VALID",
                       use_bias=True, dtype=dt, name="stem_patch_conv")(x)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        x = self._stem(x, training)

        total = sum(cfg.num_blocks)
        gid = 0
        for ii in range(cfg.num_blocks[0]):
            rate = cfg.drop_connect_rate * gid / total
            gid += 1
            x = self._attn_mlp_block(x, cfg.embed_dims[0], cfg.num_heads[0], cfg.mlp_ratios[0],
                                     cfg.first_attn_type, rate, f"outlook_block{ii}_", training)

        x = nn.Conv(cfg.embed_dims[0] * 2, (2, 2), strides=(2, 2), padding="VALID",
                    use_bias=True, dtype=cfg.dtype, name="downsample_conv")(x)
        x = _PosEmb(name="positional_embedding")(x)

        for ii in range(cfg.num_blocks[1]):
            rate = cfg.drop_connect_rate * gid / total
            gid += 1
            x = self._attn_mlp_block(x, cfg.embed_dims[1], cfg.num_heads[1], cfg.mlp_ratios[1],
                                     "mhsa", rate, f"MHSA_block{ii}_", training)

        if features_only or cfg.nb_classes <= 0:
            return x

        b, hh, ww, c = x.shape
        t = x.reshape(b, hh * ww, c)
        t = _ClassToken(name="class_token")(t)
        for ii in range(cfg.classifiers):
            t = self._attn_mlp_block(t, cfg.embed_dims[-1], cfg.num_heads[-1], cfg.mlp_ratios[-1],
                                     "class", 0.0, f"classfiers{ii}_", training)
        t = LayerNorm(epsilon=1e-5, name="pre_out_LN")(t)

        if cfg.mean_classifier_top:
            pooled = jnp.mean(t.astype(jnp.float32), axis=1)
            out = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="token_head")(pooled)
        elif cfg.token_classifier_top:
            out = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="token_head")(t[:, 0].astype(jnp.float32))
        elif cfg.token_label_top:
            cls = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="token_head")(t[:, 0].astype(jnp.float32))
            aux = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="aux_head")(t[:, 1:].astype(jnp.float32))
            return cls, aux
        else:
            cls = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="token_head")(t[:, 0].astype(jnp.float32))
            aux = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="aux_head")(t[:, 1:].astype(jnp.float32))
            out = cls + jnp.max(aux, axis=1) * 0.5
        if cfg.classifier_activation:
            out = apply_activation(out, cfg.classifier_activation)
        return out


def _volo(name, num_blocks, embed_dims, num_heads, mlp_ratios, stem_hidden_dim=64):
    return VOLO, VOLOConfig(
        name=name, num_blocks=num_blocks, embed_dims=embed_dims,
        num_heads=num_heads, mlp_ratios=mlp_ratios, stem_hidden_dim=stem_hidden_dim,
    )


@register_model
def VOLO_d1():
    return _volo("volo_d1", (4, 14), (192, 384), (6, 12), (3, 3))


@register_model
def VOLO_d2():
    return _volo("volo_d2", (6, 18), (256, 512), (8, 16), (3, 3))


@register_model
def VOLO_d3():
    return _volo("volo_d3", (8, 28), (256, 512), (8, 16), (3, 3))


@register_model
def VOLO_d4():
    return _volo("volo_d4", (8, 28), (384, 768), (12, 16), (3, 3))


@register_model
def VOLO_d5():
    return _volo("volo_d5", (12, 36), (384, 768), (12, 16), (4, 4), stem_hidden_dim=128)
