"""CMT — CNN-meets-Transformer (kecam cmt/cmt.py).

Architecture parity:
- block = LPU (dw3x3 residual) -> LN + light MHSA -> LN + IRFFN (:148-170)
- light MHSA (:73-135): scaled query Dense, sr-ratio depthwise downsample +
  LN for KV, fused key_value Dense with the torch (dim, head, kv) reshape
  split, BEiT-style no-cls rel-pos bias sliced to the KV columns
- IRFFN (:138-146): expand 1x1 -> (dw3x3 + x) -> project, act-FIRST BNs
- 3-conv stem with act-first BNs; conv2x2 s2 + LN stage downsample
- variants Tiny + *_torch XS/Small/Base (with per-stack BiasPositionalEmbedding
  and BN'd sr — tracked; Tiny flavor implemented)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import BatchNorm, DropPath, LayerNorm, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .coatnet import _rel_pos_index_no_cls
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CMTConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (2, 2, 10, 2)
    out_channels: Tuple[int, ...] = (46, 92, 184, 368)
    stem_width: int = 16
    num_heads: Tuple[int, ...] = (1, 2, 4, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    ffn_expansion: float = 3.6
    qkv_bias: bool = False  # CMT_torch flavor (cmt.py:195-200)
    attn_out_bias: bool = False
    attn_use_bn: bool = False
    use_block_pos_emb: bool = False
    feature_activation: Optional[str] = None
    feature_act_first: bool = True
    output_num_features: int = 1280
    activation: str = "gelu"
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    input_size: Tuple[int, int] = (160, 160)
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class _RelPosEmbSliced(nn.Module):
    """kecam MultiHeadRelativePositionalEmbedding with_cls_token=False,
    index sliced to the last kv columns (beit.py:60-66)."""

    num_heads: int
    height: int
    width: int
    kv_blocks: int

    @nn.compact
    def __call__(self, attn):
        nrd = (2 * self.height - 1) * (2 * self.width - 1)
        table = self.param("positional_embedding", nn.initializers.zeros, (self.num_heads, nrd), jnp.float32)
        idx = _rel_pos_index_no_cls(self.height, self.width)
        if self.kv_blocks != idx.shape[1]:
            idx = idx[:, -self.kv_blocks :]
        n, m = idx.shape
        return attn + table[:, idx.reshape(-1)].reshape(self.num_heads, n, m)[None].astype(attn.dtype)


class _BiasPosEmb(nn.Module):
    """cmt BiasPositionalEmbedding (cmt.py:25-55): dense learned
    (heads, N, M) attention bias shared across a stack's blocks."""

    num_heads: int
    n: int
    m: int

    @nn.compact
    def __call__(self, attn):
        bb = self.param("positional_embedding", nn.initializers.zeros,
                        (self.num_heads, self.n, self.m), jnp.float32)
        return attn + bb[None].astype(attn.dtype)


class CMT(nn.Module):
    cfg: CMTConfig

    def _act_first_bn(self, x, act, name, training):
        """batchnorm_with_activation(act_first=True): activation THEN BN."""
        if act:
            x = apply_activation(x, act)
        return BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.cfg.dtype, name=name + "bn")(x, training=training)

    def _conv(self, x, f, k, s, name, use_bias=True, groups=1, pad=True):
        if k > 1 and pad:
            p = k // 2
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        return nn.Conv(f, (k, k), strides=(s, s), padding="VALID", use_bias=use_bias,
                       feature_group_count=groups, dtype=self.cfg.dtype, name=name)(x)

    def _light_mhsa(self, x, num_heads, sr_ratio, name, training, block_pos_emb=None):
        cfg = self.cfg
        b, hh, ww, c = x.shape
        key_dim = c // num_heads
        scale = key_dim**-0.5
        emb = num_heads * key_dim

        q = nn.Dense(emb, use_bias=cfg.qkv_bias, dtype=cfg.dtype, name=name + "query")(x) * scale
        q = jnp.transpose(q.reshape(b, hh * ww, num_heads, key_dim), (0, 2, 1, 3))

        if sr_ratio > 1:
            kv_in = self._conv(x, c, sr_ratio, sr_ratio, name + "kv_sr_dw_conv", use_bias=cfg.qkv_bias, groups=c, pad=False)
            if cfg.attn_use_bn:  # CMT_torch: BN instead of LN (cmt.py light_mhsa :24)
                kv_in = BatchNorm(momentum=0.9, epsilon=1e-5, dtype=cfg.dtype,
                                  name=name + "kv_sr_bn")(kv_in, training=training)
            else:
                kv_in = LayerNorm(epsilon=1e-5, name=name + "kv_sr_ln")(kv_in)
        else:
            kv_in = x
        kvh, kvw = kv_in.shape[1], kv_in.shape[2]
        kv = nn.Dense(emb * 2, use_bias=cfg.qkv_bias, dtype=cfg.dtype, name=name + "key_value")(kv_in)
        # torch (dim, head, kv) reshape split (:102-105)
        kv = kv.reshape(b, kvh * kvw, key_dim, num_heads, 2)
        k = jnp.transpose(kv[:, :, :, :, 0], (0, 3, 2, 1))  # (b, heads, kd, M)
        v = jnp.transpose(kv[:, :, :, :, 1], (0, 3, 1, 2))  # (b, heads, M, kd)

        attn = jnp.einsum("bhnd,bhdm->bhnm", q, k).astype(jnp.float32)
        if block_pos_emb is not None:
            attn = block_pos_emb(attn)
        else:
            attn = _RelPosEmbSliced(num_heads, hh, ww, kvh * kvw, name=name + "pos_emb")(attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, hh, ww, emb)
        return nn.Dense(c, use_bias=cfg.attn_out_bias, dtype=cfg.dtype, name=name + "output")(out)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        act = cfg.activation
        x = preprocess_input(x, cfg)
        x = self._conv(x, cfg.stem_width, 3, 2, "stem_1_conv")
        x = self._act_first_bn(x, act, "stem_1_", training)
        x = self._conv(x, cfg.stem_width, 3, 1, "stem_2_conv")
        x = self._act_first_bn(x, act, "stem_2_", training)
        x = self._conv(x, cfg.stem_width, 3, 1, "stem_3_conv")
        x = self._act_first_bn(x, act, "stem_3_", training)

        total = sum(cfg.num_blocks)
        gid = 0
        for sid, (nb, out_c, nh, sr) in enumerate(
            zip(cfg.num_blocks, cfg.out_channels, cfg.num_heads, cfg.sr_ratios)
        ):
            sname = f"stack{sid + 1}_"
            x = self._conv(x, out_c, 2, 2, sname + "down_sampleconv", pad=False)
            x = LayerNorm(epsilon=1e-5, name=sname + "ln")(x)
            if cfg.use_block_pos_emb:  # CMT_torch per-stack shared bias (cmt.py:223-227)
                hh_s, ww_s = x.shape[1], x.shape[2]
                block_pos_emb = _BiasPosEmb(
                    nh, hh_s * ww_s, (hh_s // sr) * (ww_s // sr), name=sname + "pos_emb"
                )
            else:
                block_pos_emb = None
            for bid in range(nb):
                name = sname + f"block{bid + 1}_"
                rate = cfg.drop_connect_rate * gid / total
                gid += 1
                # LPU
                lpu = self._conv(x, out_c, 3, 1, name + "dw_conv", groups=out_c)
                x = x + lpu
                # light MHSA
                a = LayerNorm(epsilon=1e-5, name=name + "attn_ln")(x)
                a = self._light_mhsa(a, nh, sr, name + "light_mhsa_", training,
                                     block_pos_emb=block_pos_emb)
                a = DropPath(rate, name=name + "attn_drop")(a, training=training)
                x = x + a
                # IRFFN
                f = LayerNorm(epsilon=1e-5, name=name + "ffn_ln")(x)
                f = self._conv(f, int(out_c * cfg.ffn_expansion), 1, 1, name + "ffn_1_conv")
                f = self._act_first_bn(f, act, name + "ffn_1_", training)
                dw = self._conv(f, f.shape[-1], 3, 1, name + "ffn_dw_conv", groups=f.shape[-1])
                f = f + dw
                f = self._act_first_bn(f, act, name + "ffn_2_", training)
                f = self._conv(f, out_c, 1, 1, name + "ffn_3_conv")
                f = self._act_first_bn(f, None, name + "ffn_3_", training)
                f = DropPath(rate, name=name + "ffn_drop")(f, training=training)
                x = x + f

        if cfg.output_num_features > 0:
            x = self._conv(x, cfg.output_num_features, 1, 1, "features_conv", pad=False)
            feat_act = cfg.feature_activation or act
            if cfg.feature_act_first:
                x = self._act_first_bn(x, feat_act, "features_", training)
            else:  # CMT_torch: BN then activation (cmt.py:240-241)
                x = BatchNorm(momentum=0.9, epsilon=1e-5, dtype=cfg.dtype,
                              name="features_bn")(x, training=training)
                x = apply_activation(x, feat_act)
        if features_only:
            return x
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)
        x = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="predictions")(x)
        if cfg.classifier_activation:
            x = apply_activation(x, cfg.classifier_activation)
        return x


@register_model
def CMTTiny():
    return CMT, CMTConfig(name="CMTTiny")


def _cmt_torch(name, num_blocks, out_channels, stem_width, ffn_expansion, input_size):
    return CMT, CMTConfig(
        name=name, num_blocks=num_blocks, out_channels=out_channels,
        stem_width=stem_width, ffn_expansion=ffn_expansion, input_size=input_size,
        qkv_bias=True, attn_out_bias=True, attn_use_bn=True, use_block_pos_emb=True,
        feature_activation="swish", feature_act_first=False,
    )


@register_model
def CMTTiny_torch():
    return _cmt_torch("cmt_tiny_torch", (2, 2, 10, 2), (46, 92, 184, 368), 16, 3.6, (160, 160))


@register_model
def CMTXS_torch():
    return _cmt_torch("cmt_xs_torch", (3, 3, 12, 3), (52, 104, 208, 416), 16, 3.77, (192, 192))


@register_model
def CMTSmall_torch():
    return _cmt_torch("cmt_small_torch", (3, 3, 16, 3), (64, 128, 256, 512), 32, 4.0, (224, 224))


@register_model
def CMTBase_torch():
    return _cmt_torch("cmt_base_torch", (4, 4, 20, 4), (76, 152, 304, 608), 38, 4.0, (256, 256))
