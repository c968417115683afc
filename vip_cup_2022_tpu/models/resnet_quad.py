"""ResNet51Q / ResNet61Q (kecam resnet_family/resnet_quad.py).

Parity:
- quad stem (common_layers.py quad_stem): 3x3/2 + 3x3 + 3x3 convs then a
  3x3/2 conv, optional act between (stem_act), trailing BN+act
- quad_block (:13-41): optional edge 1x1 (when grouped), grouped 3x3 (stride),
  optional extra grouped 3x3, 1x1 expand with zero-gamma BN, residual add +
  activation; conv shortcut on channel/stride change
- features conv (2048) + avgpool head; rescale 'torch'
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import BatchNorm, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ResNetQConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (2, 4, 6, 4)
    out_channels: Tuple[int, ...] = (64, 128, 384, 384 * 4)
    stem_width: int = 128
    stem_act: bool = False
    expansion: Any = (4, 4, 4, 1)
    groups_div: Any = (32, 32, 32, 1)
    extra_conv: Any = False
    num_features: int = 2048
    strides: Any = 2
    stem_downsample: bool = False
    activation: str = "swish"
    drop_connect_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    input_size: Tuple[int, int] = (224, 224)
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


def _per(v, i):
    return v[i] if isinstance(v, (list, tuple)) else v


class ResNetQ(nn.Module):
    cfg: ResNetQConfig

    def _conv(self, x, f, k, s, name, groups=1):
        p = k // 2
        if p:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        return nn.Conv(f, (k, k), strides=(s, s), padding="VALID", use_bias=False,
                       feature_group_count=groups, dtype=self.cfg.dtype, name=name + "conv")(x)

    def _bn(self, x, act, name, training, zero_gamma=False):
        x = BatchNorm(momentum=0.9, epsilon=1e-5, zero_gamma=zero_gamma,
                      dtype=self.cfg.dtype, name=name + "bn")(x, training=training)
        return apply_activation(x, act) if act else x

    def _quad_block(self, x, filters, groups_div, stride, conv_shortcut, expansion,
                    extra_conv, name, training):
        cfg = self.cfg
        act = cfg.activation
        expanded = filters * expansion
        groups = filters // groups_div if groups_div != 0 else 1
        if conv_shortcut:
            sc = self._conv(x, expanded, 1, stride, name + "shortcut_")
            sc = self._bn(sc, None, name + "shortcut_", training)
        else:
            sc = x
        y = x
        if groups != 1:  # edge block
            y = self._conv(y, filters, 1, 1, name + "1_")
            y = self._bn(y, act, name + "1_", training)
        y = self._conv(y, filters, 3, stride, name + "groups_", groups=groups)
        y = self._bn(y, act, name + "2_", training)
        if extra_conv:
            y = self._conv(y, filters, 3, 1, name + "extra_groups_", groups=groups)
            y = self._bn(y, act, name + "extra_2_", training)
        y = self._conv(y, expanded, 1, 1, name + "3_")
        y = self._bn(y, None, name + "3_", training, zero_gamma=True)
        return apply_activation(sc + y, act)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        act = cfg.activation
        x = preprocess_input(x, cfg)
        # quad_stem (aotnet.py:245-255): BN after conv3 always; after conv1/2
        # only when stem_act
        sw = cfg.stem_width
        x = self._conv(x, sw // 8, 3, 2, "stem_1_")
        if cfg.stem_act:
            x = self._bn(x, act, "stem_1_", training)
        x = self._conv(x, sw // 4, 3, 1, "stem_2_")
        if cfg.stem_act:
            x = self._bn(x, act, "stem_2_", training)
        x = self._conv(x, sw // 2, 3, 1, "stem_3_")
        x = self._bn(x, act, "stem_3_", training)
        x = self._conv(x, sw, 3, 2, "stem_4_")
        x = self._bn(x, act, "stem_", training)
        if cfg.stem_downsample:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        strides = cfg.strides if isinstance(cfg.strides, (list, tuple)) else (1, 2, 2, cfg.strides)
        for sid, (nb, out_c, stride) in enumerate(zip(cfg.num_blocks, cfg.out_channels, strides)):
            name = f"stack{sid + 1}_"
            exp = _per(cfg.expansion, sid)
            extra = _per(cfg.extra_conv, sid)
            gdiv = _per(cfg.groups_div, sid)
            for bid in range(nb):
                cs = bid == 0 and (stride != 1 or x.shape[-1] != out_c * exp)
                x = self._quad_block(x, out_c, gdiv, stride if bid == 0 else 1, cs,
                                     exp, extra, name + f"block{bid + 1}_", training)

        if cfg.num_features:
            x = self._conv(x, cfg.num_features, 1, 1, "features_")
            x = self._bn(x, act, "features_", training)
        if features_only:
            return x
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="predictions")(x)
        if cfg.classifier_activation:
            x = apply_activation(x, cfg.classifier_activation)
        return x


@register_model
def ResNet51Q():
    return ResNetQ, ResNetQConfig(name="resnet51q")


@register_model
def ResNet61Q():
    return ResNetQ, ResNetQConfig(
        name="resnet61q", num_blocks=(1, 4, 6, 4), out_channels=(256, 128, 384, 384 * 4),
        stem_act=True, expansion=(1, 4, 4, 1), groups_div=(0, 32, 32, 1), extra_conv=True,
    )
