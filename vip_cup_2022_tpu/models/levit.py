"""LeViT (kecam levit/levit.py).

Architecture parity:
- BN-after-Dense everywhere (qkv_bn, out_bn zero-gamma, mlp 1_/2_ bn)
- ``MultiHeadPositionalEmbedding`` attention bias (:24-78; shared impl in
  models/efficientformer.py)
- ``scaled_dot_product_attention`` with activation before the out Dense
  (:81-103)
- strided downsample attention: q from a ::stride slice, attn_ratio doubled
  (:126-150)
- 4-conv stem /16 (:168-177); GAP + BN + twin (head, distill_head) (:203-215)
- sizes 128S/128/192/256/384 (:223-260)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import BatchNorm, DropPath, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .efficientformer import MultiHeadPositionalEmbedding
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LeViTConfig(ModelConfig):
    patch_channel: int = 128
    out_channels: Tuple[int, ...] = (256, 384, 384)
    num_heads: Tuple[int, ...] = (4, 6, 8)
    depthes: Tuple[int, ...] = (2, 3, 4)
    key_dims: Tuple[int, ...] = (16, 16, 16)
    attn_ratios: Tuple[int, ...] = (2, 2, 2)
    mlp_ratios: Tuple[int, ...] = (2, 2, 2)
    strides: Tuple[int, ...] = (2, 2, 0)
    activation: str = "hard_swish"
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    use_distillation: bool = True
    classifier_activation: Optional[str] = None
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class LeViT(nn.Module):
    cfg: LeViTConfig

    def _bn(self, x, name, training, zero_gamma=False):
        return BatchNorm(momentum=0.9, epsilon=1e-5, zero_gamma=zero_gamma,
                         dtype=self.cfg.dtype, name=name)(x, training=training)

    def _sdpa(self, q, k, v, key_dim, out_shape, name, training):
        """levit scaled_dot_product_attention (:81-103)."""
        cfg = self.cfg
        height, width, out_dim = out_shape
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (key_dim**-0.5)
        attn = MultiHeadPositionalEmbedding(query_height=height, name=name + "attn_pos")(attn.astype(jnp.float32))
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        b = out.shape[0]
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, height, width, -1)
        out = apply_activation(out, cfg.activation)
        out = nn.Dense(out_dim, use_bias=False, dtype=cfg.dtype, name=name + "out")(out)
        return self._bn(out, name + "out_bn", training, zero_gamma=True)

    def _mhsa(self, x, num_heads, key_dim, output_dim, attn_ratio, name, training):
        cfg = self.cfg
        b, h, w, c = x.shape
        embed = key_dim * num_heads
        qkv_dim = (attn_ratio + 2) * embed
        qkv = nn.Dense(qkv_dim, use_bias=False, dtype=cfg.dtype, name=name + "qkv")(x)
        qkv = self._bn(qkv, name + "qkv_bn", training)
        qkv = qkv.reshape(b, h * w, num_heads, qkv_dim // num_heads)
        qkv = jnp.transpose(qkv, (0, 2, 1, 3))
        q, k, v = jnp.split(qkv, [key_dim, 2 * key_dim], axis=-1)
        return self._sdpa(q, k, v, key_dim, (h, w, output_dim), name, training)

    def _mhsa_strided(self, x, num_heads, key_dim, output_dim, attn_ratio, stride, name, training):
        cfg = self.cfg
        b, h0, w0, c = x.shape
        embed = key_dim * num_heads
        q_in = x[:, ::stride, ::stride, :] if stride > 1 else x
        h, w = q_in.shape[1], q_in.shape[2]
        q = nn.Dense(embed, use_bias=False, dtype=cfg.dtype, name=name + "q")(q_in)
        q = self._bn(q, name + "q_bn", training)
        q = jnp.transpose(q.reshape(b, h * w, num_heads, key_dim), (0, 2, 1, 3))
        kv_dim = (attn_ratio + 1) * embed
        kv = nn.Dense(kv_dim, use_bias=False, dtype=cfg.dtype, name=name + "kv")(x)
        kv = self._bn(kv, name + "kv_bn", training)
        kv = kv.reshape(b, h0 * w0, num_heads, kv_dim // num_heads)
        kv = jnp.transpose(kv, (0, 2, 1, 3))
        k, v = jnp.split(kv, [key_dim], axis=-1)
        return self._sdpa(q, k, v, key_dim, (h, w, output_dim), name, training)

    def _res_mlp(self, x, ratio, rate, name, training):
        c = x.shape[-1]
        y = nn.Dense(c * ratio, use_bias=False, dtype=self.cfg.dtype, name=name + "1_dense")(x)
        y = self._bn(y, name + "1_bn", training)
        y = apply_activation(y, self.cfg.activation)
        y = nn.Dense(c, use_bias=False, dtype=self.cfg.dtype, name=name + "2_dense")(y)
        y = self._bn(y, name + "2_bn", training)
        y = DropPath(rate, name=name + "drop")(y, training=training)
        return x + y

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        sw = cfg.patch_channel
        for i, f in enumerate([sw // 8, sw // 4, sw // 2, sw]):
            p = 1
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding="VALID", use_bias=False,
                        dtype=cfg.dtype, name=f"stem_{i + 1}_conv")(x)
            x = self._bn(x, f"stem_{i + 1}_bn", training)
            if i < 3:
                x = apply_activation(x, cfg.activation)

        gid, total = 0, sum(cfg.depthes)
        for sid, (out_c, nh, depth, kd, ar, mr, stride) in enumerate(
            zip(cfg.out_channels, cfg.num_heads, cfg.depthes, cfg.key_dims,
                cfg.attn_ratios, cfg.mlp_ratios, cfg.strides)
        ):
            sname = f"stack{sid + 1}_"
            embed = x.shape[-1]
            rate = 0.0
            for bid in range(depth):
                name = sname + f"block{bid + 1}_"
                rate = cfg.drop_connect_rate * (gid + bid) / total
                y = self._mhsa(x, nh, kd, embed, ar, name, training)
                y = DropPath(rate, name=name + "attn_drop")(y, training=training)
                x = x + y
                if mr > 0:
                    x = self._res_mlp(x, mr, rate, name + "mlp_", training)
            gid += depth
            if embed != out_c:
                name = sname + "downsample_"
                ds_heads = embed // kd
                x = self._mhsa_strided(x, ds_heads, kd, out_c, ar * stride, stride, name, training)
                if mr > 0:
                    x = self._res_mlp(x, mr, rate, name + "mlp_", training)

        if features_only:
            return x
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)
        h = self._bn(x, "head_bn", training)
        out = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head")(h)
        if cfg.use_distillation:
            d = self._bn(x, "distill_head_bn", training)
            distill = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="distill_head")(d)
            out = (out + distill) / 2.0
        if cfg.classifier_activation:
            out = apply_activation(out, cfg.classifier_activation)
        return out


@register_model
def LeViT128S():
    return LeViT, LeViTConfig(name="LeViT128S")


@register_model
def LeViT128():
    return LeViT, LeViTConfig(name="LeViT128", num_heads=(4, 8, 12), depthes=(4, 4, 4))


@register_model
def LeViT192():
    return LeViT, LeViTConfig(
        name="LeViT192", patch_channel=192, out_channels=(288, 384, 384),
        num_heads=(3, 5, 6), depthes=(4, 4, 4), key_dims=(32, 32, 32),
    )


@register_model
def LeViT256():
    return LeViT, LeViTConfig(
        name="LeViT256", patch_channel=256, out_channels=(384, 512, 512),
        num_heads=(4, 6, 8), depthes=(4, 4, 4), key_dims=(32, 32, 32),
    )


@register_model
def LeViT384():
    return LeViT, LeViTConfig(
        name="LeViT384", patch_channel=384, out_channels=(512, 768, 768),
        num_heads=(6, 9, 12), depthes=(4, 4, 4), key_dims=(32, 32, 32),
    )
