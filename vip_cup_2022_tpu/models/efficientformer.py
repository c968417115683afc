"""EfficientFormer (kecam efficientformer/efficientformer.py).

Architecture parity:
- ``meta_block`` (:24-48): pool-diff token mixer (AvgPool3x3 - x) in conv
  stages + conv MLP with BN; LN + LeViT-style MHSA (multi-head positional
  bias) + dense MLP in the final attention blocks; layer-scale gammas
- stem: two conv3x3 s2 + BN + relu (:73-77); conv3x3 s2 + BN downsamples
- twin heads (head + distill_head), averaged at inference in the reference's
  decode (L1/L3/L7, :115-131)
- LeViT components: ``MultiHeadPositionalEmbedding`` (levit.py:24-78) and
  ``scaled_dot_product_attention`` (levit.py:81-103)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import BatchNorm, ChannelAffine, DropPath, LayerNorm, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


def mhpe_index(q_blocks, kk_blocks, query_height=-1) -> np.ndarray:
    """LeViT MultiHeadPositionalEmbedding bb_pos (levit.py:30-56)."""
    if query_height == -1:
        qh = qw = int(np.sqrt(q_blocks))
    else:
        qh, qw = query_height, q_blocks // query_height
    strides = int(np.ceil(np.sqrt(kk_blocks / q_blocks)))
    kh = qh * strides
    while kk_blocks % kh != 0:
        kh -= 1
    kw = kk_blocks // kh
    x1, y1 = np.meshgrid(range(qh), range(qw))  # xy (parity)
    x2, y2 = np.meshgrid(range(kh), range(kw))
    aa = np.concatenate([x1.reshape(-1, 1), y1.reshape(-1, 1)], axis=-1)
    bb = np.concatenate([x2.reshape(-1, 1), y2.reshape(-1, 1)], axis=-1)
    cc = [np.abs(bb - ii * strides) for ii in aa]
    return np.stack([ii[:, 0] + ii[:, 1] * kh for ii in cc]).astype(np.int32)


class MultiHeadPositionalEmbedding(nn.Module):
    query_height: int = -1

    @nn.compact
    def __call__(self, attn):
        _, num_heads, qq, kk = attn.shape
        bb = self.param("positional_embedding", nn.initializers.zeros, (kk, num_heads), jnp.float32)
        idx = mhpe_index(qq, kk, self.query_height)
        pos = bb[idx.reshape(-1)].reshape(qq, kk, num_heads)
        return attn + jnp.transpose(pos, (2, 0, 1))[None].astype(attn.dtype)


@dataclasses.dataclass(frozen=True)
class EfficientFormerConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (3, 2, 6, 4)
    out_channels: Tuple[int, ...] = (48, 96, 224, 448)
    num_attn_blocks_in_last_stack: int = 1
    stem_activation: str = "relu"
    mlp_ratio: int = 4
    layer_scale: float = 1e-5
    activation: str = "gelu"
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    use_distillation: bool = True
    classifier_activation: Optional[str] = None
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class EfficientFormer(nn.Module):
    cfg: EfficientFormerConfig

    def _conv_bn(self, x, f, k, s, act, name, training, use_bias=True):
        if k > 1:
            p = k // 2
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        x = nn.Conv(f, (k, k), strides=(s, s), padding="VALID", use_bias=use_bias,
                    dtype=self.cfg.dtype, name=name + "conv")(x)
        x = BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.cfg.dtype, name=name + "bn")(x, training=training)
        return apply_activation(x, act) if act else x

    def _mhsa(self, x, name, training):
        """levit mhsa_with_multi_head_position, use_bn=False, key_dim=32,
        attn_ratio=4 (efficientformer meta_block :28-30)."""
        cfg = self.cfg
        num_heads, key_dim, attn_ratio = 8, 32, 4
        b, h, w, c = x.shape
        embed = key_dim * num_heads
        qkv_dim = (attn_ratio + 2) * embed
        qkv = nn.Dense(qkv_dim, use_bias=True, dtype=cfg.dtype, name=name + "qkv")(x)
        qkv = qkv.reshape(b, h * w, num_heads, qkv_dim // num_heads)
        qkv = jnp.transpose(qkv, (0, 2, 1, 3))
        q, k, v = jnp.split(qkv, [key_dim, 2 * key_dim], axis=-1)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (key_dim**-0.5)
        attn = MultiHeadPositionalEmbedding(query_height=h, name=name + "attn_pos")(attn.astype(jnp.float32))
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, h, w, num_heads * key_dim * attn_ratio)
        return nn.Dense(c, use_bias=True, dtype=cfg.dtype, name=name + "out")(out)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        sw = cfg.out_channels[0]
        x = self._conv_bn(x, sw // 2, 3, 2, cfg.stem_activation, "stem_1_", training)
        x = self._conv_bn(x, sw, 3, 2, cfg.stem_activation, "stem_2_", training)

        total = sum(cfg.num_blocks)
        gid = 0
        for sid, (nb, out_c) in enumerate(zip(cfg.num_blocks, cfg.out_channels)):
            sname = f"stack{sid + 1}_"
            if sid > 0:
                x = self._conv_bn(x, out_c, 3, 2, None, sname + "downsample_", training)
            for bid in range(nb):
                name = sname + f"block{bid + 1}_"
                rate = cfg.drop_connect_rate * gid / total
                gid += 1
                is_attn = sid == len(cfg.num_blocks) - 1 and bid >= nb - cfg.num_attn_blocks_in_last_stack
                if is_attn:
                    y = LayerNorm(epsilon=1e-5, name=name + "attn_ln")(x)
                    y = self._mhsa(y, name, training)
                else:
                    y = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME", count_include_pad=False) - x
                if cfg.layer_scale >= 0:
                    y = ChannelAffine(use_bias=False, weight_init_value=cfg.layer_scale, name=name + "attn_gamma")(y)
                y = DropPath(rate, name=name + "attn_drop")(y, training=training)
                x = x + y
                if is_attn:
                    m = LayerNorm(epsilon=1e-5, name=name + "mlp_ln")(x)
                    m = nn.Dense(x.shape[-1] * cfg.mlp_ratio, dtype=cfg.dtype, name=name + "Dense_0")(m)
                    m = apply_activation(m, cfg.activation)
                    m = nn.Dense(x.shape[-1], dtype=cfg.dtype, name=name + "Dense_1")(m)
                else:
                    m = self._conv_bn(x, x.shape[-1] * cfg.mlp_ratio, 1, 1, cfg.activation, name + "mlp_1_", training)
                    m = self._conv_bn(m, x.shape[-1], 1, 1, None, name + "mlp_2_", training)
                if cfg.layer_scale >= 0:
                    m = ChannelAffine(use_bias=False, weight_init_value=cfg.layer_scale, name=name + "mlp_gamma")(m)
                m = DropPath(rate, name=name + "mlp_drop")(m, training=training)
                x = x + m

        if features_only:
            return x
        x = LayerNorm(epsilon=1e-5, name="pre_output_ln")(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)
        out = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head")(x)
        if cfg.use_distillation:
            distill = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="distill_head")(x)
            out = (out + distill) / 2.0  # inference-mode average
        if cfg.classifier_activation:
            out = apply_activation(out, cfg.classifier_activation)
        return out


@register_model
def EfficientFormerL1():
    return EfficientFormer, EfficientFormerConfig(name="EfficientFormerL1")


@register_model
def EfficientFormerL3():
    return EfficientFormer, EfficientFormerConfig(
        name="EfficientFormerL3", num_blocks=(4, 4, 12, 6),
        out_channels=(64, 128, 320, 512), num_attn_blocks_in_last_stack=4,
    )


@register_model
def EfficientFormerL7():
    return EfficientFormer, EfficientFormerConfig(
        name="EfficientFormerL7", num_blocks=(6, 6, 18, 8),
        out_channels=(96, 192, 384, 768), num_attn_blocks_in_last_stack=8,
    )
