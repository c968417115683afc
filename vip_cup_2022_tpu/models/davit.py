"""DaViT — dual (spatial window + channel group) attention (kecam davit/davit.py).

Architecture parity:
- window attention with ceil-mode bottom/right padding (:52-85) using the
  shared MHSA (uniformer.py:32-58; qkv+out bias)
- channel-group attention with the torch weight split order (value, query,
  key) and key_dim x key_dim scores (:19-49)
- conv positional encodings (dw3x3 + residual) before attn and ffn (:88-95)
- stem conv7x7 s4 + LN; LN + conv2x2 s2 downsample (TF SAME padding)
- window_size = ceil(input / 32); sizes T/S/B/L/H/G (:170-206)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import ChannelAffine, DropPath, LayerNorm, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class DaViTConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (2, 2, 6, 2)
    out_channels: Tuple[int, ...] = (96, 192, 384, 768)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    stem_patch_size: int = 4
    window_ratio: int = 32
    mlp_ratio: int = 4
    layer_scale: float = -1.0
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class DaViT(nn.Module):
    cfg: DaViTConfig

    def _mhsa(self, x, num_heads, name):
        """uniformer multi_head_self_attention, qkv+out bias."""
        cfg = self.cfg
        b, h, w, c = x.shape
        key_dim = c // num_heads
        scale = key_dim**-0.5
        qkv = nn.Dense(c * 3, use_bias=True, dtype=cfg.dtype, name=name + "qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, num_heads, key_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, h, w, c)
        return nn.Dense(c, use_bias=True, dtype=cfg.dtype, name=name + "output")(out)

    def _channel_attn(self, x, num_heads, name):
        """multi_head_self_attention_channel (:19-49); torch split order
        (value, query, key)."""
        cfg = self.cfg
        b, h, w, c = x.shape
        key_dim = c // num_heads
        scale = key_dim**-0.5
        qkv = nn.Dense(c * 3, use_bias=True, dtype=cfg.dtype, name=name + "qkv")(x)
        qkv = qkv.reshape(b, h * w, 3 * c)
        v, q, k = jnp.split(qkv, 3, axis=-1)
        q = jnp.transpose(q.reshape(b, h * w, num_heads, key_dim), (0, 2, 3, 1))  # (b,h,kd,N)
        k = jnp.transpose(k.reshape(b, h * w, num_heads, key_dim), (0, 2, 1, 3))  # (b,h,N,kd)
        v = jnp.transpose(v.reshape(b, h * w, num_heads, key_dim), (0, 2, 3, 1))  # (b,h,kd,N)
        attn = jnp.einsum("bhdn,bhnm->bhdm", q, k) * scale  # (b,h,kd,kd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhdm,bhmn->bhdn", attn, v)  # (b,h,kd,N)
        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, h, w, c)
        return nn.Dense(c, use_bias=True, dtype=cfg.dtype, name=name + "output")(out)

    def _window_attention(self, x, window_size, num_heads, name):
        b, h, w, c = x.shape
        wh = min(window_size[0], h)
        ww = min(window_size[1], w)
        ph, pw = -(-h // wh), -(-w // ww)
        pad_h, pad_w = ph * wh - h, pw * ww - w
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        xw = x.reshape(b, ph, wh, pw, ww, c).transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh, ww, c)
        xw = self._mhsa(xw, num_heads, name)
        x = xw.reshape(b, ph, pw, wh, ww, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, ph * wh, pw * ww, c)
        if pad_h or pad_w:
            x = x[:, :h, :w, :]
        return x

    def _cpe(self, x, name):
        """conv_positional_encoding (:88-95): dw3x3 + residual."""
        ch = x.shape[-1]
        y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = nn.Conv(ch, (3, 3), padding="VALID", feature_group_count=ch, use_bias=True,
                    dtype=self.cfg.dtype, name=name + "dw_conv")(y)
        return x + y

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        p = 7 // 2
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        x = nn.Conv(cfg.out_channels[0], (7, 7), strides=(cfg.stem_patch_size,) * 2,
                    padding="VALID", use_bias=True, dtype=cfg.dtype, name="stem_conv")(x)
        x = LayerNorm(epsilon=1e-5, name="stem_ln")(x)
        window_size = (
            -(-cfg.input_size[0] // cfg.window_ratio),
            -(-cfg.input_size[1] // cfg.window_ratio),
        )

        total = sum(cfg.num_blocks)
        gid = 0
        for sid, (nb, out_c, nh) in enumerate(zip(cfg.num_blocks, cfg.out_channels, cfg.num_heads)):
            sname = f"stack{sid + 1}_"
            if sid > 0:
                x = LayerNorm(epsilon=1e-5, name=sname + "downsample_ln")(x)
                x = nn.Conv(out_c, (2, 2), strides=(2, 2), padding="SAME", use_bias=True,
                            dtype=cfg.dtype, name=sname + "downsample_conv")(x)
            for bid in range(nb):
                name = sname + f"block{bid + 1}_"
                rate = cfg.drop_connect_rate * gid / total
                gid += 1
                use_channel = bid % 2 == 1
                x = self._cpe(x, name + "pre_attn_cpe_")
                y = LayerNorm(epsilon=1e-5, name=name + "attn_ln")(x)
                if use_channel:
                    y = self._channel_attn(y, nh, name + "channel_attn_")
                else:
                    y = self._window_attention(y, window_size, nh, name + "attn_")
                if cfg.layer_scale >= 0:
                    y = ChannelAffine(use_bias=False, weight_init_value=cfg.layer_scale, name=name + "1_gamma")(y)
                y = DropPath(rate, name=name + "attn_drop")(y, training=training)
                x = x + y
                x = self._cpe(x, name + "pre_ffn_cpe_")
                m = LayerNorm(epsilon=1e-5, name=name + "mlp_ln")(x)
                m = nn.Dense(int(out_c * cfg.mlp_ratio), dtype=cfg.dtype, name=name + "mlp_Dense_0")(m)
                m = apply_activation(m, "gelu")
                m = nn.Dense(out_c, dtype=cfg.dtype, name=name + "mlp_Dense_1")(m)
                if cfg.layer_scale >= 0:
                    m = ChannelAffine(use_bias=False, weight_init_value=cfg.layer_scale, name=name + "2_gamma")(m)
                m = DropPath(rate, name=name + "mlp_drop")(m, training=training)
                x = x + m
        x = LayerNorm(epsilon=1e-5, name="pre_output_ln")(x)

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
def DaViT_T():
    return DaViT, DaViTConfig(name="DaViT_T")


@register_model
def DaViT_S():
    return DaViT, DaViTConfig(name="DaViT_S", num_blocks=(2, 2, 18, 2))


@register_model
def DaViT_B():
    return DaViT, DaViTConfig(
        name="DaViT_B", num_blocks=(2, 2, 18, 2),
        out_channels=(128, 256, 512, 1024), num_heads=(4, 8, 16, 32),
    )


@register_model
def DaViT_L():
    return DaViT, DaViTConfig(
        name="DaViT_L", num_blocks=(2, 2, 18, 2), input_size=(384, 384),
        out_channels=(192, 384, 768, 1536), num_heads=(6, 12, 24, 48),
    )
