"""CoAtNet (kecam coatnet/coatnet.py) — MBConv early stages, relative-position
MHSA late stages.

Architecture parity:
- ``res_MBConv`` (:66-100): BN preact, maxpool+1x1 shortcut, expand 1x1 ->
  dw3x3 (strides on the dw by default) -> SE(ratio/expansion) -> pw 1x1
- ``res_mhsa`` (:120-146): LN preact, pooled tokens, MHSA with the BEiT-style
  (no cls token) MultiHeadRelativePositionalEmbedding, value head dim =
  key_dim
- ``res_ffn`` (:103-117): LN + two 1x1 convs, residual to the un-normed input
- stem: conv3x3 s2 + BN + act + conv3x3 (:224-227)
- sizes CoAtNetT/0..7 (:200-281)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import BatchNorm, DropPath, LayerNorm, apply_activation, make_divisible
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CoAtNetConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (2, 3, 5, 2)
    out_channels: Tuple[int, ...] = (96, 192, 384, 768)
    stem_width: int = 64
    block_types: Tuple[str, ...] = ("conv", "conv", "transform", "transform")
    strides: Tuple[int, ...] = (2, 2, 2, 2)
    expansion: int = 4
    se_ratio: float = 0.25
    head_dimension: int = 32
    use_dw_strides: bool = True
    activation: str = "gelu"
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


def _rel_pos_index_no_cls(height: int, width: int) -> np.ndarray:
    hh, ww = np.meshgrid(np.arange(height), np.arange(width))  # xy (parity)
    coords = np.stack([hh, ww], axis=-1).reshape(-1, 2)
    rel = coords[:, None, :] - coords[None, :, :]
    rel_h = rel[:, :, 0] + height - 1
    rel_w = (rel[:, :, 1] + width - 1) * (2 * height - 1)
    return (rel_h + rel_w).astype(np.int32)


class _RelPosEmb(nn.Module):
    """kecam MultiHeadRelativePositionalEmbedding, with_cls_token=False."""

    num_heads: int
    height: int
    width: int

    @nn.compact
    def __call__(self, attn):
        nrd = (2 * self.height - 1) * (2 * self.width - 1)
        table = self.param("positional_embedding", nn.initializers.zeros, (self.num_heads, nrd), jnp.float32)
        idx = _rel_pos_index_no_cls(self.height, self.width)
        n = attn.shape[-1]
        return attn + table[:, idx.reshape(-1)].reshape(self.num_heads, n, n)[None].astype(attn.dtype)


class CoAtNet(nn.Module):
    cfg: CoAtNetConfig

    def _conv(self, x, f, k, s, name, groups=1):
        if k > 1:
            p = k // 2
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        return nn.Conv(f, (k, k), strides=(s, s), padding="VALID", use_bias=False,
                       feature_group_count=groups, dtype=self.cfg.dtype, name=name + "conv")(x)

    def _bn_act(self, x, act, name, training):
        x = BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.cfg.dtype, name=name + "bn")(x, training=training)
        return apply_activation(x, act) if act else x

    def _mhsa(self, x, out_shape, name):
        cfg = self.cfg
        b, hh, ww, c = x.shape
        key_dim = cfg.head_dimension
        num_heads = c // key_dim
        scale = key_dim**-0.5
        qkv = nn.Conv(num_heads * key_dim * 3, (1, 1), use_bias=False, dtype=cfg.dtype, name=name + "qkv_conv")(x)
        qkv = qkv.reshape(b, hh * ww, 3 * num_heads * key_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = jnp.transpose(q.reshape(b, hh * ww, num_heads, key_dim), (0, 2, 1, 3))
        k = jnp.transpose(k.reshape(b, hh * ww, num_heads, key_dim), (0, 2, 1, 3))
        v = jnp.transpose(v.reshape(b, hh * ww, num_heads, key_dim), (0, 2, 1, 3))
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = _RelPosEmb(num_heads, hh, ww, name=name + "pos_emb")(attn.astype(jnp.float32))
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, hh, ww, num_heads * key_dim)
        return nn.Dense(out_shape, use_bias=False, dtype=cfg.dtype, name=name + "output")(out)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        act = cfg.activation
        x = preprocess_input(x, cfg)
        x = self._conv(x, cfg.stem_width, 3, 2, "stem_1_")
        x = self._bn_act(x, act, "stem_1_", training)
        x = self._conv(x, cfg.stem_width, 3, 1, "stem_2_")

        total = sum(cfg.num_blocks)
        gid = 0
        for sid, (nb, out_c, btype) in enumerate(zip(cfg.num_blocks, cfg.out_channels, cfg.block_types)):
            is_conv = btype[0].lower() == "c"
            s_stride = cfg.strides[sid] if isinstance(cfg.strides, (list, tuple)) else cfg.strides
            for bid in range(nb):
                name = f"stack_{sid + 1}_block_{bid + 1}_"
                stride = s_stride if bid == 0 else 1
                conv_shortcut = bid == 0
                rate = cfg.drop_connect_rate * gid / total
                gid += 1
                if is_conv:
                    # res_MBConv (:66-100)
                    pre = self._bn_act(x, None, name + "preact_", training)
                    if conv_shortcut:
                        sc = nn.max_pool(x, (stride, stride), strides=(stride, stride), padding="SAME") if stride > 1 else x
                        sc = self._conv(sc, out_c, 1, 1, name + "shortcut_")
                    else:
                        sc = x
                    in_c = x.shape[-1]
                    y = self._conv(pre, in_c * cfg.expansion, 1, 1, name + "expand_")
                    y = self._bn_act(y, act, name + "expand_", training)
                    ch = y.shape[-1]
                    p = 1
                    y = jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)))
                    y = nn.Conv(ch, (3, 3), strides=(stride, stride), padding="VALID",
                                feature_group_count=ch, use_bias=False, dtype=cfg.dtype, name=name + "MB_dw_conv")(y)
                    y = self._bn_act(y, act, name + "MB_dw_", training)
                    if cfg.se_ratio:
                        ratio = cfg.se_ratio / cfg.expansion
                        ch = y.shape[-1]
                        red = make_divisible(ch * ratio, 8)
                        se = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(y.dtype)
                        se = nn.Conv(red, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "se_1_conv")(se)
                        se = apply_activation(se, act)
                        se = nn.Conv(ch, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "se_2_conv")(se)
                        se = apply_activation(se, "sigmoid")
                        y = y * se
                    y = self._conv(y, out_c, 1, 1, name + "MB_pw_")
                    y = DropPath(rate, name=name + "drop")(y, training=training)
                    x = sc + y
                else:
                    # res_mhsa (:120-146)
                    pre = LayerNorm(epsilon=1e-5, name=name + "preact_ln")(x)
                    if conv_shortcut:
                        sc = nn.max_pool(x, (stride, stride), strides=(stride, stride), padding="SAME") if stride > 1 else x
                        sc = self._conv(sc, out_c, 1, 1, name + "shortcut_")
                    else:
                        sc = x
                    y = pre
                    if stride != 1:
                        y = nn.max_pool(y, (2, 2), strides=(stride, stride), padding="SAME")
                    y = self._mhsa(y, out_c, name + "mhsa_")
                    y = DropPath(rate, name=name + "drop")(y, training=training)
                    x = sc + y
                    # res_ffn (:103-117)
                    f = LayerNorm(epsilon=1e-5, name=name + "ffn_preact_ln")(x)
                    f = nn.Conv(x.shape[-1] * cfg.expansion, (1, 1), use_bias=False, dtype=cfg.dtype, name=name + "ffn_1_conv")(f)
                    f = apply_activation(f, act)
                    f = nn.Conv(x.shape[-1], (1, 1), use_bias=False, dtype=cfg.dtype, name=name + "ffn_2_conv")(f)
                    f = DropPath(rate, name=name + "ffn_drop")(f, training=training)
                    x = x + f

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


def _coatnet(name, num_blocks, out_channels, stem_width, **kw):
    return CoAtNet, CoAtNetConfig(
        name=name, num_blocks=num_blocks, out_channels=out_channels,
        stem_width=stem_width, **kw,
    )


@register_model
def CoAtNetT():
    return _coatnet("CoAtNetT", (3, 4, 6, 3), (64, 128, 256, 512), 64)


@register_model
def CoAtNet0():
    return _coatnet("CoAtNet0", (2, 3, 5, 2), (96, 192, 384, 768), 64)


@register_model
def CoAtNet1():
    return _coatnet("CoAtNet1", (2, 6, 14, 2), (96, 192, 384, 768), 64, drop_connect_rate=0.3)


@register_model
def CoAtNet2():
    return _coatnet("CoAtNet2", (2, 6, 14, 2), (128, 256, 512, 1024), 128, drop_connect_rate=0.5)


@register_model
def CoAtNet3():
    return _coatnet("CoAtNet3", (2, 6, 14, 2), (192, 384, 768, 1536), 192, drop_connect_rate=0.7)


@register_model
def CoAtNet4():
    return _coatnet("CoAtNet4", (2, 12, 28, 2), (192, 384, 768, 1536), 192, drop_connect_rate=0.2)
