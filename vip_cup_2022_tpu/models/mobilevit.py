"""MobileViT V1 (kecam mobilevit/mobilevit.py; V2's linear attention is
tracked for the next round).

Architecture parity:
- ``bottle_in_linear_out_block`` MBConv (:30-46)
- ``transformer_pre/post_process`` (:96-151): conv projections, bilinear
  resize to the patch multiple, and the exact 4D reshape/transpose patch
  fold/unfold (patches into the batch axis)
- ``mhsa_mlp_block`` (:57-93): LN(1e-5) + shared MHSA (qkv+out bias) + MLP
  ratio 2; V1 fusion concat in post-process
- head: features conv1x1+BN + GAP (output_block); rescale 'raw01' (inputs are
  plain [0,1], no mean/std)
- sizes XXS/XS/S (:231-253)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import BatchNorm, DropPath, LayerNorm, apply_activation, make_divisible
from ..ops.resize import resize
from .base import ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class MobileViTConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (1, 3, 3, 5, 4)
    out_channels: Tuple[int, ...] = (32, 64, 96, 128, 160)
    attn_channels: Any = 1.5
    block_types: Tuple[str, ...] = ("conv", "conv", "transform", "transform", "transform")
    strides: Tuple[int, ...] = (1, 2, 2, 2, 2)
    expand_ratio: int = 4
    stem_width: int = 16
    patch_size: int = 2
    output_num_features: int = 640
    activation: str = "swish"
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    input_size: Tuple[int, int] = (256, 256)
    mean: Optional[Tuple[float, ...]] = None  # rescale_mode 'raw01'
    std: Optional[Tuple[float, ...]] = None


class MobileViT(nn.Module):
    cfg: MobileViTConfig

    def _conv_bn(self, x, f, k, s, act, name, training, groups=1, use_bn=True):
        if k > 1:
            p = k // 2
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        x = nn.Conv(f, (k, k), strides=(s, s), padding="VALID", use_bias=False,
                    feature_group_count=groups, dtype=self.cfg.dtype, name=name + "conv")(x)
        if use_bn:
            x = BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.cfg.dtype, name=name + "bn")(x, training=training)
        return apply_activation(x, act) if act else x

    def _mb_block(self, x, out_c, stride, shortcut, rate, name, training):
        cfg = self.cfg
        hidden = int(x.shape[-1] * cfg.expand_ratio)
        y = self._conv_bn(x, hidden, 1, 1, cfg.activation, name + "deep_1_", training)
        # depthwise layer is named 'deep_2_dw_conv' but its BN is 'deep_2_bn'
        p = 1
        y = jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)))
        y = nn.Conv(hidden, (3, 3), strides=(stride, stride), padding="VALID", use_bias=False,
                    feature_group_count=hidden, dtype=cfg.dtype, name=name + "deep_2_dw_conv")(y)
        y = BatchNorm(momentum=0.9, epsilon=1e-5, dtype=cfg.dtype, name=name + "deep_2_bn")(y, training=training)
        y = apply_activation(y, cfg.activation)
        y = self._conv_bn(y, out_c, 1, 1, None, name + "deep_3_", training)
        y = DropPath(rate, name=name + "deep_drop")(y, training=training)
        return x + y if shortcut else y

    def _mhsa(self, x, name):
        cfg = self.cfg
        b, h, w, c = x.shape
        num_heads = 4
        key_dim = c // num_heads
        qkv = nn.Dense(c * 3, use_bias=True, dtype=cfg.dtype, name=name + "qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, num_heads, key_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q, k, v = qkv[0] * (key_dim**-0.5), qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, h, w, c)
        return nn.Dense(c, use_bias=True, dtype=cfg.dtype, name=name + "output")(out)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        ps = cfg.patch_size
        x = preprocess_input(x, cfg)
        x = self._conv_bn(x, cfg.stem_width, 3, 2, cfg.activation, "stem_", training)

        total = sum(cfg.num_blocks)
        gid = 0
        for sid, (nb, out_c, btype, stride0) in enumerate(
            zip(cfg.num_blocks, cfg.out_channels, cfg.block_types, cfg.strides)
        ):
            sname = f"stack{sid + 1}_"
            is_conv = btype[0].lower() == "c"
            if isinstance(cfg.attn_channels, (list, tuple)):
                attn_c = cfg.attn_channels[sid]
            else:
                attn_c = make_divisible(cfg.attn_channels * out_c, divisor=8)
            pre_attn = None
            patch_hh = patch_ww = 0
            for bid in range(nb):
                name = sname + f"block{bid + 1}_"
                stride = stride0 if bid == 0 else 1
                shortcut = stride == 1 and x.shape[-1] == out_c
                rate = cfg.drop_connect_rate * gid / total
                gid += 1
                if is_conv or bid == 0:
                    x = self._mb_block(x, out_c, stride, shortcut, rate, name, training)
                else:
                    if bid == 1:  # pre-process (:96-123, V1 order)
                        pre_attn = x
                        y = self._conv_bn(x, x.shape[-1], 3, 1, cfg.activation, name + "pre_1_", training)
                        y = nn.Conv(attn_c, (1, 1), padding="VALID", use_bias=False,
                                    dtype=cfg.dtype, name=name + "pre_2_conv")(y)
                        patch_hh = -(-y.shape[1] // ps)
                        patch_ww = -(-y.shape[2] // ps)
                        if patch_hh * ps != y.shape[1] or patch_ww * ps != y.shape[2]:
                            y = resize(y, (patch_hh * ps, patch_ww * ps), method="bilinear")
                        # exact reference fold (patches -> batch)
                        y = y.reshape(-1, patch_ww, ps, attn_c)
                        y = jnp.transpose(y, (0, 2, 1, 3))
                        y = y.reshape(-1, patch_hh, ps * ps, patch_ww * attn_c)
                        y = jnp.transpose(y, (0, 2, 1, 3))
                        x = y.reshape(-1, patch_hh, patch_ww, attn_c)
                    # mhsa_mlp_block (:57-93)
                    a = LayerNorm(epsilon=1e-5, name=name + "attn_ln")(x)
                    a = self._mhsa(a, name + "attn_mhsa_")
                    x = x + a
                    m = LayerNorm(epsilon=1e-5, name=name + "mlp_ln")(x)
                    m = nn.Dense(int(attn_c * 2), dtype=cfg.dtype, name=name + "mlp_Dense_0")(m)
                    m = apply_activation(m, cfg.activation)
                    m = nn.Dense(attn_c, dtype=cfg.dtype, name=name + "mlp_Dense_1")(m)
                    x = x + m
                    if bid == nb - 1:  # post-process (:126-151)
                        x = LayerNorm(epsilon=1e-5, name=name + "post_ln")(x)
                        c = x.shape[-1]
                        y = x.reshape(-1, ps * ps, patch_hh, patch_ww * c)
                        y = jnp.transpose(y, (0, 2, 1, 3))
                        y = y.reshape(-1, ps, patch_ww, c)
                        y = jnp.transpose(y, (0, 2, 1, 3))
                        y = y.reshape(-1, patch_hh * ps, patch_ww * ps, c)
                        if y.shape[1] != pre_attn.shape[1] or y.shape[2] != pre_attn.shape[2]:
                            y = resize(y, (pre_attn.shape[1], pre_attn.shape[2]), method="bilinear")
                        y = self._conv_bn(y, out_c, 1, 1, cfg.activation, name + "post_1_", training)
                        y = jnp.concatenate([pre_attn, y], axis=-1)
                        x = self._conv_bn(y, out_c, 3, 1, cfg.activation, name + "post_2_", training)

        if cfg.output_num_features > 0:
            x = self._conv_bn(
                x, make_divisible(cfg.output_num_features, 8), 1, 1, cfg.activation,
                "features_", training,
            )
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
def MobileViT_XXS():
    return MobileViT, MobileViTConfig(
        name="MobileViT_XXS", out_channels=(16, 24, 48, 64, 80),
        attn_channels=(0, 0, 64, 80, 96), output_num_features=320, expand_ratio=2,
    )


@register_model
def MobileViT_XS():
    return MobileViT, MobileViTConfig(
        name="MobileViT_XS", out_channels=(32, 48, 64, 80, 96),
        attn_channels=1.5, output_num_features=384,
    )


@register_model
def MobileViT_S():
    return MobileViT, MobileViTConfig(name="MobileViT_S")
