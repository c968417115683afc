"""EdgeNeXt (kecam edgenext/edgenext.py).

Architecture parity:
- ``conv_encoder``: dw-conv(k per stage) + LN + MLP + layer-scale residual
  (:131-137)
- ``split_depthwise_transpose_attention`` (STDA, :103-128): res2net-style
  cascaded dw-conv splits, optional Fourier positional encoding, XCA
  (cross-covariance attention over channels with per-head temperature), and
  an inverted-bottleneck tail
- ``PositionalEncodingFourier`` (:22-56): sin/cos grid projected by a learned
  (2*filters, C) matrix
- stem patch conv4x4+LN; LN+conv2x2 downsample (:163-177); GAP+LN head
- sizes xx_small/x_small/small (:200-218)
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ChannelAffine, DropPath, LayerNorm, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class EdgeNeXtConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (2, 2, 6, 2)
    out_channels: Tuple[int, ...] = (24, 48, 88, 168)
    num_heads: Any = 4
    num_stda_layers: Tuple[int, ...] = (0, 1, 1, 1)
    stda_split: Tuple[int, ...] = (2, 2, 3, 4)
    stda_use_pos_emb: Tuple[bool, ...] = (False, True, False, False)
    conv_kernel_size: Tuple[int, ...] = (3, 5, 7, 9)
    mlp_ratio: int = 4
    stem_patch_size: int = 4
    layer_scale: float = 1e-6
    activation: str = "gelu"
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


def _fourier_embedding(height, width, filters=32, temperature=1e4):
    eps, scale = 1e-6, 2 * math.pi
    hh = (np.arange(height, dtype=np.float64) + 1) / (height + eps) * scale
    ww = (np.arange(width, dtype=np.float64) + 1) / (width + eps) * scale
    dim_t = temperature ** (2 * (np.arange(filters) // 2) / filters)
    pos_hh = hh[:, None] / dim_t
    pos_ww = ww[:, None] / dim_t
    pos_hh = np.stack([np.sin(pos_hh[:, 0::2]), np.cos(pos_hh[:, 1::2])], axis=-1)
    pos_ww = np.stack([np.sin(pos_ww[:, 0::2]), np.cos(pos_ww[:, 1::2])], axis=-1)
    pos_hh = np.repeat(pos_hh.reshape(height, 1, -1), width, axis=1)
    pos_ww = np.repeat(pos_ww.reshape(1, width, -1), height, axis=0)
    return np.concatenate([pos_hh, pos_ww], axis=-1).astype(np.float32)  # (H, W, 2f)


class _FourierPos(nn.Module):
    filters: int = 32

    @nn.compact
    def __call__(self, x):
        _, h, w, c = x.shape
        emb = jnp.asarray(_fourier_embedding(h, w, self.filters))
        ww = self.param("ww", nn.initializers.lecun_normal(), (self.filters * 2, c), jnp.float32)
        bb = self.param("bb", nn.initializers.zeros, (c,), jnp.float32)
        return x + (emb @ ww + bb).astype(x.dtype)


class _Temperature(nn.Module):
    """ChannelAffine(axis=1) on the head axis (weight shape (heads, 1, 1))."""

    num_heads: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.num_heads, 1, 1), jnp.float32)
        return x * w.astype(x.dtype)


class EdgeNeXt(nn.Module):
    cfg: EdgeNeXtConfig

    def _mlp_ln_block(self, x, name, training):
        """norm_inverted_bottleneck (:59-66): LN -> MLP -> gamma."""
        cfg = self.cfg
        c = x.shape[-1]
        y = LayerNorm(epsilon=1e-6, name=name + "ln")(x)
        y = nn.Dense(c * cfg.mlp_ratio, dtype=cfg.dtype, name=name + "Dense_0")(y)
        y = apply_activation(y, cfg.activation)
        y = nn.Dense(c, dtype=cfg.dtype, name=name + "Dense_1")(y)
        if cfg.layer_scale >= 0:
            y = ChannelAffine(use_bias=False, weight_init_value=cfg.layer_scale, name=name + "gamma")(y)
        return y

    def _dw(self, x, k, name):
        ch = x.shape[-1]
        p = k // 2
        y = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        return nn.Conv(ch, (k, k), padding="VALID", feature_group_count=ch,
                       use_bias=True, dtype=self.cfg.dtype, name=name + "dw_conv")(y)

    def _xca(self, x, num_heads, name):
        """cross_covariance_attention (:69-100)."""
        cfg = self.cfg
        b, h, w, c = x.shape
        key_dim = c // num_heads
        qkv = nn.Dense(key_dim * num_heads * 3, use_bias=True, dtype=cfg.dtype, name=name + "qkv")(x)
        qkv = qkv.reshape(b, h * w, -1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = jnp.transpose(q.reshape(b, h * w, num_heads, key_dim), (0, 2, 3, 1))  # (b,h,kd,N)
        k = jnp.transpose(k.reshape(b, h * w, num_heads, key_dim), (0, 2, 1, 3))  # (b,h,N,kd)
        v = jnp.transpose(v.reshape(b, h * w, num_heads, key_dim), (0, 2, 3, 1))  # (b,h,kd,N)

        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        qn = qf * jax.lax.rsqrt(jnp.maximum(jnp.sum(qf**2, axis=-1, keepdims=True), 1e-6))
        kn = kf * jax.lax.rsqrt(jnp.maximum(jnp.sum(kf**2, axis=-2, keepdims=True), 1e-6))
        attn = jnp.einsum("bhdn,bhnm->bhdm", qn, kn)  # (b,h,kd,kd)
        attn = _Temperature(num_heads, name=name + "temperature_no_weight_decay")(attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhdm,bhmn->bhdn", attn, v)  # (b,h,kd,N)
        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, h, w, num_heads * key_dim)
        return nn.Dense(num_heads * key_dim, use_bias=True, dtype=cfg.dtype, name=name + "output")(out)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        x = nn.Conv(cfg.out_channels[0], (cfg.stem_patch_size,) * 2,
                    strides=(cfg.stem_patch_size,) * 2, padding="VALID", use_bias=True,
                    dtype=cfg.dtype, name="stem_conv")(x)
        x = LayerNorm(epsilon=1e-6, name="stem_ln")(x)

        total = sum(cfg.num_blocks)
        gid = 0
        for sid, (nb, out_c, n_stda) in enumerate(zip(cfg.num_blocks, cfg.out_channels, cfg.num_stda_layers)):
            sname = f"stack{sid + 1}_"
            if sid > 0:
                x = LayerNorm(epsilon=1e-6, name=sname + "downsample_ln")(x)
                x = nn.Conv(out_c, (2, 2), strides=(2, 2), padding="VALID", use_bias=True,
                            dtype=cfg.dtype, name=sname + "downsample_conv")(x)
            for bid in range(nb):
                name = sname + f"block{bid + 1}_"
                rate = cfg.drop_connect_rate * gid / total
                gid += 1
                if bid > nb - n_stda - 1:
                    # STDA block (:103-128)
                    bname = name + "stda_"
                    split = cfg.stda_split[sid]
                    c = x.shape[-1]
                    sub = int(math.ceil(c / split))
                    spx = x[:, :, :, : (split - 1) * sub]
                    remainder = x[:, :, :, (split - 1) * sub :]
                    parts = jnp.split(spx, split - 1, axis=-1) if split > 1 else []
                    gathered = []
                    sp = None
                    for i, p in enumerate(parts):
                        sp = p if i == 0 else sp + p
                        sp = self._dw(sp, 3, bname + f"spx_{i + 1}_")
                        gathered.append(sp)
                    gathered.append(remainder)
                    attn = jnp.concatenate(gathered, axis=-1)
                    if cfg.stda_use_pos_emb[sid]:
                        attn = _FourierPos(name=bname + "pos")(attn)
                    nh = cfg.num_heads[sid] if isinstance(cfg.num_heads, (list, tuple)) else cfg.num_heads
                    y = LayerNorm(epsilon=1e-6, name=bname + "xca_ln")(attn)
                    y = self._xca(y, nh, bname + "xca_")
                    if cfg.layer_scale >= 0:
                        y = ChannelAffine(use_bias=False, weight_init_value=cfg.layer_scale, name=bname + "xca_gamma")(y)
                    y = DropPath(rate, name=bname + "xca_drop")(y, training=training)
                    y = attn + y  # xca residual onto the conv/pos features
                    # IR branch from y; the BLOCK residual is the raw input
                    # (edgenext.py:125-128: return Add([inputs, ir_branch]))
                    ir = self._mlp_ln_block(y, bname + "ir_", training)
                    ir = DropPath(rate, name=bname + "ir_drop")(ir, training=training)
                    x = x + ir
                else:
                    bname = name + "conv_"
                    y = self._dw(x, cfg.conv_kernel_size[sid], bname)
                    y = self._mlp_ln_block(y, bname, training)
                    y = DropPath(rate, name=bname + "drop")(y, training=training)
                    x = x + y

        if features_only:
            return x
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = LayerNorm(epsilon=1e-6, name="pre_output_ln")(x)
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)
        x = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="predictions")(x)
        if cfg.classifier_activation:
            x = apply_activation(x, cfg.classifier_activation)
        return x


@register_model
def EdgeNeXt_XX_Small():
    return EdgeNeXt, EdgeNeXtConfig(name="EdgeNeXt_XX_Small", input_size=(256, 256))


@register_model
def EdgeNeXt_X_Small():
    return EdgeNeXt, EdgeNeXtConfig(
        name="EdgeNeXt_X_Small", num_blocks=(3, 3, 9, 3),
        out_channels=(32, 64, 100, 192), input_size=(256, 256),
    )


@register_model
def EdgeNeXt_Small():
    return EdgeNeXt, EdgeNeXtConfig(
        name="EdgeNeXt_Small", num_blocks=(3, 3, 9, 3),
        out_channels=(48, 96, 160, 304), num_heads=8, input_size=(256, 256),
    )
