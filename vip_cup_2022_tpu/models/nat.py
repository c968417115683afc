"""NAT — Neighborhood Attention Transformer (kecam nat/nat.py).

Architecture parity:
- ``neighborhood_attention`` (:60-117): per-query k x k neighborhood keys
  extracted at stride 1 with replicate padding of the patch grid; queries are
  (1, key_dim) rows against (key_dim, k^2) neighborhoods
- ``MultiHeadRelativePositionalKernelBias`` (:19-57): (2k-1)^2 table indexed
  per query position with edge clamping, flipped ordering preserved
- conv tokenizer stem (two conv3x3 s2 + LN); conv3x3 s2 + LN downsamples
- sizes mini/tiny/small/base (:176-200)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ChannelAffine, DropPath, LayerNorm, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


def _kernel_bias_coords(height: int, width: int, size: int) -> np.ndarray:
    """(h*w, size^2) index into the (2size-1)^2 table (nat.py:33-43)."""
    pos_size = 2 * size - 1
    idx = np.arange(size)
    coords = (idx[:, None] * pos_size + idx).reshape(-1)
    bias_hh = np.concatenate([idx[: size // 2], np.repeat(idx[size // 2], height - size + 1), idx[size // 2 + 1 :]])
    bias_ww = np.concatenate([idx[: size // 2], np.repeat(idx[size // 2], width - size + 1), idx[size // 2 + 1 :]])
    bias_hw = bias_hh[:, None] * pos_size + bias_ww
    bias_coords = bias_hw.reshape(-1)[:, None] + coords
    return bias_coords.reshape(-1, size * size)[::-1].astype(np.int32)  # flip


class _KernelBias(nn.Module):
    num_heads: int
    size: int
    height: int
    width: int

    @nn.compact
    def __call__(self, attn):
        # attn: (B, h*w, heads, 1, size^2)
        pos_size = 2 * self.size - 1
        table = self.param(
            "positional_embedding", nn.initializers.truncated_normal(0.02),
            (self.num_heads, pos_size * pos_size), jnp.float32,
        )
        coords = _kernel_bias_coords(self.height, self.width, self.size)
        bias = table[:, coords.reshape(-1)].reshape(self.num_heads, -1, self.size * self.size)
        bias = jnp.transpose(bias, (1, 0, 2))[None, :, :, None, :]  # (1, hw, heads, 1, k2)
        return attn + bias.astype(attn.dtype)


@dataclasses.dataclass(frozen=True)
class NATConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (3, 4, 6, 5)
    out_channels: Tuple[int, ...] = (64, 128, 256, 512)
    num_heads: Tuple[int, ...] = (2, 4, 8, 16)
    attn_kernel_size: int = 7
    mlp_ratio: float = 3.0
    layer_scale: float = -1.0
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class NAT(nn.Module):
    cfg: NATConfig

    def _neighborhood_attention(self, x, kernel_size, num_heads, name):
        cfg = self.cfg
        b, hh, ww, c = x.shape
        pad_h, pad_w = max(0, kernel_size - hh), max(0, kernel_size - ww)
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            hh, ww = x.shape[1], x.shape[2]
        key_dim = c // num_heads
        qkv_out = num_heads * key_dim
        scale = key_dim**-0.5

        qkv = nn.Dense(qkv_out * 3, use_bias=True, dtype=cfg.dtype, name=name + "qkv")(x)
        q, kv = jnp.split(qkv, [qkv_out], axis=-1)
        q = q.reshape(b, hh * ww, num_heads, 1, key_dim)

        # kernel_size x kernel_size patches stride 1 VALID, then replicate-pad
        # the patch grid (nat.py:82-88)
        oh, ow = hh - kernel_size + 1, ww - kernel_size + 1
        patches = jnp.stack(
            [
                jnp.stack([kv[:, di : di + oh, dj : dj + ow, :] for dj in range(kernel_size)], axis=3)
                for di in range(kernel_size)
            ],
            axis=3,
        )  # (B, oh, ow, k, k, 2C)
        padded = (kernel_size - 1) // 2
        patches = jnp.concatenate(
            [jnp.repeat(patches[:, :1], padded, axis=1), patches, jnp.repeat(patches[:, -1:], padded, axis=1)], axis=1
        )
        patches = jnp.concatenate(
            [jnp.repeat(patches[:, :, :1], padded, axis=2), patches, jnp.repeat(patches[:, :, -1:], padded, axis=2)], axis=2
        )
        k2 = kernel_size * kernel_size
        patches = patches.reshape(b, hh * ww, k2, 2 * qkv_out)
        k, v = jnp.split(patches, 2, axis=-1)
        k = k.reshape(b, hh * ww, k2, num_heads, key_dim)
        k = jnp.transpose(k, (0, 1, 3, 4, 2))  # (B, hw, heads, kd, k2)
        v = v.reshape(b, hh * ww, k2, num_heads, key_dim)
        v = jnp.transpose(v, (0, 1, 3, 2, 4))  # (B, hw, heads, k2, kd)

        attn = jnp.einsum("bnhqd,bnhdk->bnhqk", q, k) * scale  # (B, hw, heads, 1, k2)
        attn = _KernelBias(num_heads, kernel_size, hh, ww, name=name + "pos")(attn.astype(jnp.float32))
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bnhqk,bnhkd->bnhqd", attn, v)
        out = out.reshape(b, hh, ww, num_heads * key_dim)
        if pad_h or pad_w:
            out = out[:, : hh - pad_h, : ww - pad_w, :]
        return nn.Dense(c, use_bias=True, dtype=cfg.dtype, name=name + "output")(out)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        sw = cfg.out_channels[0]
        for i, f in enumerate([sw // 2, sw]):
            p = 1
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding="VALID", use_bias=True,
                        dtype=cfg.dtype, name=f"stem_{i + 1}_conv")(x)
        x = LayerNorm(epsilon=1e-5, name="stem_ln")(x)

        total = sum(cfg.num_blocks)
        gid = 0
        for sid, (nb, out_c, nh) in enumerate(zip(cfg.num_blocks, cfg.out_channels, cfg.num_heads)):
            sname = f"stack{sid + 1}_"
            if sid > 0:
                p = 1
                x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
                x = nn.Conv(out_c, (3, 3), strides=(2, 2), padding="VALID", use_bias=False,
                            dtype=cfg.dtype, name=sname + "downsample_conv")(x)
                x = LayerNorm(epsilon=1e-5, name=sname + "downsample_ln")(x)
            for bid in range(nb):
                name = sname + f"block{bid + 1}_"
                rate = cfg.drop_connect_rate * gid / total
                gid += 1
                y = LayerNorm(epsilon=1e-5, name=name + "attn_ln")(x)
                y = self._neighborhood_attention(y, cfg.attn_kernel_size, nh, name + "attn_")
                if cfg.layer_scale >= 0:
                    y = ChannelAffine(use_bias=False, weight_init_value=cfg.layer_scale, name=name + "1_gamma")(y)
                y = DropPath(rate, name=name + "attn_drop")(y, training=training)
                x = x + y
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
def NAT_Mini():
    return NAT, NATConfig(name="NAT_Mini")


@register_model
def NAT_Tiny():
    return NAT, NATConfig(name="NAT_Tiny", num_blocks=(3, 4, 18, 5))


@register_model
def NAT_Small():
    return NAT, NATConfig(
        name="NAT_Small", num_blocks=(3, 4, 18, 5), num_heads=(3, 6, 12, 24),
        out_channels=(96, 192, 384, 768), mlp_ratio=2.0, layer_scale=1e-5,
    )


@register_model
def NAT_Base():
    return NAT, NATConfig(
        name="NAT_Base", num_blocks=(3, 4, 18, 5), num_heads=(4, 8, 16, 32),
        out_channels=(128, 256, 512, 1024), mlp_ratio=2.0, layer_scale=1e-5,
    )
