"""ResNet-V2 / BiT — pre-activation ResNet with weight-standardized convs and
GroupNorm (tfimm architectures/resnetv2.py).

Architecture parity:
- stem (:299-347): StdConv 7x7/2 (+ GN+relu when not preact), zero-pad-1 +
  3x3/2 maxpool ('fixed' BiT stem)
- PreActBottleneck (:88-179): GN+relu pre-activation feeding both the
  1-3-1 StdConv residual branch and the 1x1 downsample projection
- Bottleneck (:181-265, preact=False flavor used by ViT-hybrid)
- final GN+relu (preact), avg-pool ClassifierHead 'head/fc' (:393-399)
- width_factor scales all channel counts via make_divisible (:80-85)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import GroupNorm, StdConv, apply_activation, make_divisible
from .base import IMAGENET_INCEPTION_MEAN, IMAGENET_INCEPTION_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ResNetV2Config(ModelConfig):
    nb_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    nb_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    width_factor: int = 1
    preact: bool = True
    stem_width: int = 64
    stem_type: str = "fixed"
    conv_padding: str = "symmetric"
    act_layer: str = "relu"
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    input_size: Tuple[int, int] = (448, 448)
    mean: Optional[Tuple[float, ...]] = IMAGENET_INCEPTION_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_INCEPTION_STD


def _pad(cfg):
    return "torch" if cfg.conv_padding == "symmetric" else "same"


class _Stem(nn.Module):
    cfg: ResNetV2Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        width = make_divisible(cfg.stem_width * cfg.width_factor, 8)
        x = StdConv(width, 7, 2, padding=_pad(cfg), use_bias=False, dtype=cfg.dtype, name="conv")(x)
        if not cfg.preact:
            x = GroupNorm(32, 1e-5, dtype=cfg.dtype, name="norm")(x)
            x = apply_activation(x, cfg.act_layer)
        if cfg.stem_type == "fixed":
            # BiT 'fixed' stem ZERO-pads before the maxpool (resnetv2.py:328),
            # which differs from -inf padding at negative-valued borders
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        # 'same' stem: TF SAME maxpool
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")


class _Downsample(nn.Module):
    cfg: ResNetV2Config
    nb_channels: int
    strides: int

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = StdConv(self.nb_channels, 1, self.strides, padding=_pad(cfg), use_bias=False,
                    dtype=cfg.dtype, name="conv")(x)
        if not cfg.preact:
            x = GroupNorm(32, 1e-5, dtype=cfg.dtype, name="norm")(x)
        return x


class _Bottleneck(nn.Module):
    """Pre-act (resnetv2.py:88-179) or post-act (:181-265) bottleneck."""

    cfg: ResNetV2Config
    nb_channels: int
    strides: int
    downsample: bool

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        mid = make_divisible(self.nb_channels * 0.25, 8)

        def conv(y, f, k, s, name):
            return StdConv(f, k, s, padding=_pad(cfg), use_bias=False, dtype=cfg.dtype, name=name)(y)

        def gn(y, name):
            return GroupNorm(32, 1e-5, dtype=cfg.dtype, name=name)(y)

        if cfg.preact:
            y = apply_activation(gn(x, "norm1"), cfg.act_layer)
            shortcut = _Downsample(cfg, self.nb_channels, self.strides, name="downsample")(y) if self.downsample else x
            z = conv(y, mid, 1, 1, "conv1")
            z = apply_activation(gn(z, "norm2"), cfg.act_layer)
            z = conv(z, mid, 3, self.strides, "conv2")
            z = apply_activation(gn(z, "norm3"), cfg.act_layer)
            z = conv(z, self.nb_channels, 1, 1, "conv3")
            return z + shortcut

        shortcut = _Downsample(cfg, self.nb_channels, self.strides, name="downsample")(x) if self.downsample else x
        z = apply_activation(gn(conv(x, mid, 1, 1, "conv1"), "norm1"), cfg.act_layer)
        z = apply_activation(gn(conv(z, mid, 3, self.strides, "conv2"), "norm2"), cfg.act_layer)
        z = gn(conv(z, self.nb_channels, 1, 1, "conv3"), "norm3")
        return apply_activation(z + shortcut, cfg.act_layer)


class _Stage(nn.Module):
    cfg: ResNetV2Config
    nb_channels: int
    nb_blocks: int
    first_stride: int

    @nn.compact
    def __call__(self, x):
        for k in range(self.nb_blocks):
            x = _Bottleneck(
                self.cfg, self.nb_channels,
                strides=self.first_stride if k == 0 else 1,
                downsample=k == 0, name=f"blocks_{k}",
            )(x)
        return x


class _Head(nn.Module):
    cfg: ResNetV2Config

    @nn.compact
    def __call__(self, x, training: bool = False):
        cfg = self.cfg
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)
        return nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="fc")(x)


class ResNetV2(nn.Module):
    cfg: ResNetV2Config

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        x = _Stem(cfg, name="stem")(x)
        for j in range(len(cfg.nb_blocks)):
            ch = make_divisible(cfg.nb_channels[j] * cfg.width_factor, 8)
            x = _Stage(cfg, ch, cfg.nb_blocks[j], first_stride=2 if j > 0 else 1,
                       name=f"stages_{j}")(x)
        if cfg.preact:
            x = GroupNorm(32, 1e-5, dtype=cfg.dtype, name="norm")(x)
            x = apply_activation(x, cfg.act_layer)
        if features_only:
            return x
        if cfg.nb_classes <= 0:
            return jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        y = _Head(cfg, name="head")(x, training=training)
        if cfg.classifier_activation:
            y = apply_activation(y, cfg.classifier_activation)
        return y


def _rv2(name, nb_blocks, width_factor, input_size=(448, 448), nb_classes=1000):
    return ResNetV2, ResNetV2Config(
        name=name, nb_blocks=nb_blocks, width_factor=width_factor,
        input_size=input_size, nb_classes=nb_classes,
    )


@register_model
def resnetv2_50x1_bitm():
    return _rv2("resnetv2_50x1_bitm", (3, 4, 6, 3), 1)


@register_model
def resnetv2_50x3_bitm():
    return _rv2("resnetv2_50x3_bitm", (3, 4, 6, 3), 3)


@register_model
def resnetv2_101x1_bitm():
    return _rv2("resnetv2_101x1_bitm", (3, 4, 23, 3), 1)


@register_model
def resnetv2_101x3_bitm():
    return _rv2("resnetv2_101x3_bitm", (3, 4, 23, 3), 3)


@register_model
def resnetv2_152x2_bitm():
    return _rv2("resnetv2_152x2_bitm", (3, 8, 36, 3), 2)


@register_model
def resnetv2_152x4_bitm():
    return _rv2("resnetv2_152x4_bitm", (3, 8, 36, 3), 4, input_size=(480, 480))


@register_model
def resnetv2_50x1_bitm_in21k():
    return _rv2("resnetv2_50x1_bitm_in21k", (3, 4, 6, 3), 1, (224, 224), nb_classes=21843)


@register_model
def resnetv2_50x3_bitm_in21k():
    return _rv2("resnetv2_50x3_bitm_in21k", (3, 4, 6, 3), 3, (224, 224), nb_classes=21843)


@register_model
def resnetv2_101x1_bitm_in21k():
    return _rv2("resnetv2_101x1_bitm_in21k", (3, 4, 23, 3), 1, (224, 224), nb_classes=21843)
