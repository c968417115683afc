"""ResNet-RS family (ensemble member: ResNetRS50-200x200).

Architecture parity with reference models/resnet_rs/resnet_rs_model.py
(sebastian-sz Keras port of tensorflow/tpu ResNet-RS):
- ResNet-D four-conv stem with ``first_strides`` knob (:87-142, :346)
- ``Conv2DFixedPadding`` = torch-style symmetric padding (:64-84)
- conv-style SE with reduction ``max(1, int(in_filters * 4 * se_ratio))``
  and expansion ``4 * in_filters`` (:145-183)
- bottleneck with avg-pool-projection shortcut on stride 2 (:186-282)
- linear stochastic-depth schedule (model_utils.py:6-17)
- per-depth block table (block_args.py:1-44)

TPU-native design: NHWC Flax module, BN statistics in f32, convs tiled by XLA
onto the MXU; stochastic depth only active in training.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import BatchNorm, Conv, DropPath, apply_activation
from .base import ModelConfig, preprocess_input
from .registry import register_model

BLOCK_ARGS: Dict[int, List[Dict[str, int]]] = {
    50: [(64, 3), (128, 4), (256, 6), (512, 3)],
    101: [(64, 3), (128, 4), (256, 23), (512, 3)],
    152: [(64, 3), (128, 8), (256, 36), (512, 3)],
    200: [(64, 3), (128, 24), (256, 36), (512, 3)],
    270: [(64, 4), (128, 29), (256, 53), (512, 4)],
    350: [(64, 4), (128, 36), (256, 72), (512, 4)],
    420: [(64, 4), (128, 44), (256, 87), (512, 4)],
}
BLOCK_ARGS = {k: [{"input_filters": f, "num_repeats": r} for f, r in v] for k, v in BLOCK_ARGS.items()}


@dataclasses.dataclass(frozen=True)
class ResNetRSConfig(ModelConfig):
    depth: int = 50
    bn_momentum: float = 0.0  # reference default arg 0.0 (EMA-style)
    bn_epsilon: float = 1e-5
    activation: str = "relu"
    se_ratio: float = 0.25
    drop_rate: float = 0.25
    drop_path_rate: float = 0.0  # drop_connect_rate; 0.0 in all public ctors


class SE(nn.Module):
    """ResNet-RS-specific SE (reference resnet_rs_model.py:145-183):
    reduction from the *bottleneck* filter count, not the activation width."""

    in_filters: int
    se_ratio: float
    expand_ratio: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        se = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        reduced = max(1, int(self.in_filters * 4 * self.se_ratio))
        se = nn.Conv(reduced, (1, 1), use_bias=True, dtype=self.dtype, name="se_reduce")(se)
        se = apply_activation(se, "relu")
        se = nn.Conv(4 * self.in_filters * self.expand_ratio, (1, 1), use_bias=True, dtype=self.dtype, name="se_expand")(se)
        se = apply_activation(se, "sigmoid")
        return x * se


class BottleneckBlock(nn.Module):
    cfg: ResNetRSConfig
    filters: int
    strides: int
    use_projection: bool
    survival_probability: float

    @nn.compact
    def __call__(self, x, training: bool = False):
        cfg = self.cfg
        bn = lambda name: BatchNorm(  # noqa: E731
            momentum=cfg.bn_momentum, epsilon=cfg.bn_epsilon, dtype=cfg.dtype, name=name
        )
        shortcut = x
        if self.use_projection:
            filters_out = self.filters * 4
            if self.strides == 2:
                # avg-pool projection (ResNet-D); TF 'SAME' pooling on even
                # input == exact 2x2/2 pooling for our static even shapes
                shortcut = nn.avg_pool(
                    x, (2, 2), strides=(2, 2), padding="SAME", count_include_pad=False
                )
                shortcut = Conv(filters_out, 1, 1, name="projection_conv")(shortcut)
            else:
                shortcut = Conv(filters_out, 1, self.strides, name="projection_conv")(x)
            shortcut = bn("projection_batch_norm")(shortcut, training=training)

        y = Conv(self.filters, 1, 1, dtype=cfg.dtype, name="conv_1")(x)
        y = bn("batch_norm_1")(y, training=training)
        y = apply_activation(y, cfg.activation)
        y = Conv(self.filters, 3, self.strides, dtype=cfg.dtype, name="conv_2")(y)
        y = bn("batch_norm_2")(y, training=training)
        y = apply_activation(y, cfg.activation)
        y = Conv(self.filters * 4, 1, 1, dtype=cfg.dtype, name="conv_3")(y)
        y = bn("batch_norm_3")(y, training=training)

        if 0 < cfg.se_ratio < 1:
            y = SE(self.filters, cfg.se_ratio, dtype=cfg.dtype, name="se")(y)

        if self.survival_probability:
            y = DropPath(self.survival_probability, name="drop")(y, training=training)

        return apply_activation(y + shortcut, cfg.activation)


class ResNetRS(nn.Module):
    """ResNet-RS backbone + classifier head.

    ``features_only=True`` returns the pre-pool feature map (the reference's
    forward_features/forward_head split, gcvit.py:97-112 convention).
    """

    cfg: ResNetRSConfig

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        x = self._features(x, training)
        if features_only:
            return x
        return self._head(x, training)

    def _features(self, x, training: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)

        # ResNet-D stem: 3 convs at 32/32/64 then strided conv replacing maxpool
        for i, (f, s) in enumerate([(32, cfg.first_strides), (32, 1), (64, 1), (64, 2)]):
            x = Conv(f, 3, s, dtype=cfg.dtype, name=f"stem_conv_{i + 1}")(x)
            x = BatchNorm(
                momentum=cfg.bn_momentum, epsilon=cfg.bn_epsilon, dtype=cfg.dtype,
                name=f"stem_batch_norm_{i + 1}",
            )(x, training=training)
            x = apply_activation(x, cfg.activation)

        block_args = BLOCK_ARGS[cfg.depth]
        for i, args in enumerate(block_args):
            # reference schedule: init_rate * block_num / total (model_utils.py:6-17)
            survival_probability = cfg.drop_path_rate * float(i + 2) / (len(block_args) + 1)
            strides = 1 if i == 0 else 2
            for j in range(args["num_repeats"]):
                x = BottleneckBlock(
                    cfg,
                    filters=args["input_filters"],
                    strides=strides if j == 0 else 1,
                    use_projection=j == 0,
                    survival_probability=survival_probability,
                    name=f"c{i + 2}_block_{j}",
                )(x, training=training)
        return x

    def _head(self, x, training: bool = False):
        cfg = self.cfg
        if cfg.pool == "avg":
            x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        elif cfg.pool == "max":
            x = jnp.max(x, axis=(1, 2)).astype(jnp.float32)
        else:
            return x
        if cfg.nb_classes <= 0:
            return x.astype(cfg.dtype or jnp.float32)
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)
        x = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="predictions")(x)
        if cfg.classifier_activation:
            x = apply_activation(x, cfg.classifier_activation)
        return x


def _cfg(depth: int, name: str, **kw) -> Tuple[type, ResNetRSConfig]:
    return ResNetRS, ResNetRSConfig(name=name, depth=depth, **kw)


@register_model
def resnetrs50():
    return _cfg(50, "resnetrs50")


@register_model
def resnetrs101():
    return _cfg(101, "resnetrs101")


@register_model
def resnetrs152():
    return _cfg(152, "resnetrs152")


@register_model
def resnetrs200():
    return _cfg(200, "resnetrs200")


@register_model
def resnetrs270():
    return _cfg(270, "resnetrs270")


@register_model
def resnetrs350():
    return _cfg(350, "resnetrs350")


@register_model
def resnetrs420():
    return _cfg(420, "resnetrs420")


# Manifest aliases matching the reference checkpoint directory names
# (ckpts/ckpts.json + main.py NAME2BS keys).
@register_model
def ResNetRS50():
    return _cfg(50, "ResNetRS50")


@register_model
def ResNetRS200():
    return _cfg(200, "ResNetRS200")
