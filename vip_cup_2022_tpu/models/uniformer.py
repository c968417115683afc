"""Uniformer (kecam uniformer/uniformer.py) — convolutional early stages,
transformer late stages.

Architecture parity:
- block (:60-96): dwconv3x3 positional residual; conv stages = BN -> 1x1 ->
  dw5x5 -> 1x1; transformer stages = LN -> MHSA; conv-vs-dense MLP; optional
  ChannelAffine layer-scale
- stems (:99-110): patch conv4x4+LN (default) or dual conv3x3+BN
- downsample between stacks: conv2x2+LN (or conv3x3+BN for conv stem) (:151-158)
- post BN + avg-pool head (:160, output_block)
- token-label aux head (MixupToken) tracked for the token-labeling round
- sizes Small/Base x head_dim 32/64 (:189-230)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import BatchNorm, ChannelAffine, DropPath, LayerNorm, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UniformerConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (3, 4, 8, 3)
    out_channels: Tuple[int, ...] = (64, 128, 320, 512)
    head_dimension: int = 64
    use_conv_stem: bool = False
    block_types: Tuple[str, ...] = ("conv", "conv", "transform", "transform")
    qkv_bias: bool = True
    mlp_ratio: float = 4.0
    layer_scale: float = -1.0
    activation: str = "gelu"
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class Uniformer(nn.Module):
    cfg: UniformerConfig

    def _conv(self, x, f, k, s, name, use_bias=True, groups=1, pad_same=True):
        if k > 1 and pad_same:
            p = k // 2
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        return nn.Conv(
            f, (k, k), strides=(s, s), padding="VALID", use_bias=use_bias,
            feature_group_count=groups, dtype=self.cfg.dtype, name=name,
        )(x)

    def _bn(self, x, name, training):
        return BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.cfg.dtype, name=name)(
            x, training=training
        )

    def _mhsa(self, x, num_heads, name):
        cfg = self.cfg
        b, h, w, c = x.shape
        key_dim = c // num_heads
        scale = key_dim**-0.5
        qkv = nn.Dense(c * 3, use_bias=cfg.qkv_bias, dtype=cfg.dtype, name=name + "qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, num_heads, key_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, h, w, c)
        return nn.Dense(c, use_bias=True, dtype=cfg.dtype, name=name + "output")(out)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)

        stem_width = cfg.out_channels[0]
        if cfg.use_conv_stem:
            x = self._conv(x, stem_width // 2, 3, 2, "stem_1_conv")
            x = self._bn(x, "stem_1_bn", training)
            x = apply_activation(x, cfg.activation)
            x = self._conv(x, stem_width, 3, 2, "stem_2_conv")
            x = self._bn(x, "stem_2_bn", training)
        else:
            x = self._conv(x, stem_width, 4, 4, "stem_conv", pad_same=False)
            x = LayerNorm(epsilon=1e-6, name="stem_ln")(x)

        total = sum(cfg.num_blocks)
        gid = 0
        for sid, (nb, out_c, btype) in enumerate(
            zip(cfg.num_blocks, cfg.out_channels, cfg.block_types)
        ):
            sname = f"stack{sid + 1}_"
            is_conv = btype[0].lower() == "c"
            num_heads = 0 if is_conv else out_c // cfg.head_dimension
            if sid > 0:
                if cfg.use_conv_stem:
                    x = self._conv(x, out_c, 3, 2, sname + "downsample_conv")
                    x = self._bn(x, sname + "downsample_bn", training)
                else:
                    x = self._conv(x, out_c, 2, 2, sname + "downsample_conv", pad_same=False)
                    x = LayerNorm(epsilon=1e-6, name=sname + "downsample_ln")(x)
            for bid in range(nb):
                name = sname + f"block{bid + 1}_"
                rate = cfg.drop_connect_rate * gid / total
                c = x.shape[-1]
                pos = self._conv(x, c, 3, 1, name + "pos_emb_dw_conv", groups=c)
                x = x + pos
                if is_conv:
                    attn = self._bn(x, name + "attn_bn", training)
                    attn = self._conv(attn, out_c, 1, 1, name + "attn_1_conv", pad_same=False)
                    attn = self._conv(attn, out_c, 5, 1, name + "attn_dw_conv", groups=out_c)
                    attn = self._conv(attn, out_c, 1, 1, name + "attn_2_conv", pad_same=False)
                else:
                    attn = LayerNorm(epsilon=1e-6, name=name + "attn_ln")(x)
                    attn = self._mhsa(attn, num_heads, name + "attn_mhsa_")
                if cfg.layer_scale >= 0:
                    attn = ChannelAffine(use_bias=False, weight_init_value=cfg.layer_scale, name=name + "1_gamma")(attn)
                attn = DropPath(rate, name=name + "attn_drop")(attn, training=training)
                x = x + attn
                if is_conv:
                    mlp = self._bn(x, name + "mlp_bn", training)
                    mlp = self._conv(mlp, int(out_c * cfg.mlp_ratio), 1, 1, name + "mlp_Conv_0", pad_same=False)
                    mlp = apply_activation(mlp, cfg.activation)
                    mlp = self._conv(mlp, out_c, 1, 1, name + "mlp_Conv_1", pad_same=False)
                else:
                    mlp = LayerNorm(epsilon=1e-6, name=name + "mlp_ln")(x)
                    mlp = nn.Dense(int(out_c * cfg.mlp_ratio), dtype=cfg.dtype, name=name + "mlp_Dense_0")(mlp)
                    mlp = apply_activation(mlp, cfg.activation)
                    mlp = nn.Dense(out_c, dtype=cfg.dtype, name=name + "mlp_Dense_1")(mlp)
                if cfg.layer_scale >= 0:
                    mlp = ChannelAffine(use_bias=False, weight_init_value=cfg.layer_scale, name=name + "2_gamma")(mlp)
                mlp = DropPath(rate, name=name + "mlp_drop")(mlp, training=training)
                x = x + mlp
                gid += 1
        x = self._bn(x, "post_bn", training)

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
def UniformerSmall32():
    return Uniformer, UniformerConfig(name="UniformerSmall32", head_dimension=32)


@register_model
def UniformerSmall64():
    return Uniformer, UniformerConfig(name="UniformerSmall64")


@register_model
def UniformerSmallPlus32():
    return Uniformer, UniformerConfig(
        name="UniformerSmallPlus32", num_blocks=(3, 5, 9, 3), head_dimension=32,
        use_conv_stem=True,
    )


@register_model
def UniformerBase32():
    return Uniformer, UniformerConfig(
        name="UniformerBase32", num_blocks=(5, 8, 20, 7), head_dimension=32,
    )


@register_model
def UniformerBase64():
    return Uniformer, UniformerConfig(
        name="UniformerBase64", num_blocks=(5, 8, 20, 7),
    )


@register_model
def UniformerLarge64():
    return Uniformer, UniformerConfig(
        name="UniformerLarge64", num_blocks=(5, 10, 24, 7),
        out_channels=(128, 192, 448, 640), layer_scale=1e-6,
    )
