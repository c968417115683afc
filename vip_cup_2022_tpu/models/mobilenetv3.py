"""MobileNetV3 family (kecam mobilenetv3_family/mobilenetv3.py).

Architecture parity:
- reuses the kecam ``inverted_residual_block`` semantics (efficientnet_v2.py
  :47-108) in torch mode with V3 specifics: per-stage expand lists, SE with
  (relu, hard_sigmoid_torch) activations, divisor 8, expanded se ratio
  (se_ratio * expand passed in, divided back by expand inside — :73-99)
- stem conv3x3 s2 + hard_swish; optional pre_output 1x1; avg-pool->features
  1x1 conv head (:38-49, :132-146)
- Large/Small x width ratios (:150-189); LCNet/FBNetV3/TinyNet variants are
  tracked for the next round (same block, different tables).

Layer names mirror kecam (generic h5 mapper applies).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import BatchNorm, DropPath, apply_activation, make_divisible
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class MobileNetV3Config(ModelConfig):
    num_blocks: Tuple[int, ...] = (1, 2, 3, 4, 2, 3)
    out_channels: Tuple[float, ...] = (16, 24, 40, 80, 112, 160)
    expands: Tuple[Any, ...] = (1, (4, 3), 3, (6, 2.5, 2.3, 2.3), 6, 6)
    kernel_sizes: Tuple[int, ...] = (3, 3, 5, 3, 3, 5)
    strides: Tuple[int, ...] = (1, 2, 2, 2, 1, 2)
    activations: Tuple[str, ...] = ("relu", "relu", "relu", "hard_swish", "hard_swish", "hard_swish")
    se_ratios: Tuple[float, ...] = (0, 0, 0.25, 0, 0.25, 0.25)
    se_activation: Tuple[str, str] = ("relu", "hard_sigmoid_torch")
    se_divisor: int = 8
    se_limit_round_down: float = 0.9
    use_expanded_se_ratio: bool = True
    width_ratio: float = 1.0
    stem_width: int = 16
    fix_stem: bool = False
    stem_feature_activation: str = "hard_swish"
    disable_shortcut: bool = False
    use_blocks_output_activation: bool = False
    output_num_features: int = 1280
    use_additional_output_conv: bool = True
    use_output_feature_bias: bool = True
    use_avg_pool_conv_output: bool = True
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class MobileNetV3(nn.Module):
    cfg: MobileNetV3Config

    def _conv(self, x, filters, kernel, stride, name, use_bias=False, groups=1):
        if kernel > 1:
            p = kernel // 2
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        return nn.Conv(
            filters, (kernel, kernel), strides=(stride, stride), padding="VALID",
            use_bias=use_bias, feature_group_count=groups, dtype=self.cfg.dtype,
            name=name,
        )(x)

    def _bn_act(self, x, act, name, training):
        x = BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.cfg.dtype, name=name + "bn")(
            x, training=training
        )
        return apply_activation(x, act) if act else x

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        stem = cfg.stem_width if cfg.fix_stem else make_divisible(cfg.stem_width * cfg.width_ratio, 8)
        x = self._conv(x, stem, 3, 2, "stem_conv")
        x = self._bn_act(x, cfg.stem_feature_activation, "stem_", training)

        pre_out = stem
        gid, total = 0, sum(cfg.num_blocks)
        cur_expand = 1
        for sid, (nb, out_c, ksize, stride0) in enumerate(
            zip(cfg.num_blocks, cfg.out_channels, cfg.kernel_sizes, cfg.strides)
        ):
            out = make_divisible(out_c * cfg.width_ratio, 8)
            act = cfg.activations[sid] if isinstance(cfg.activations, (list, tuple)) else cfg.activations
            expand = cfg.expands[sid] if isinstance(cfg.expands, (list, tuple)) else cfg.expands
            se_ratio = cfg.se_ratios[sid] if isinstance(cfg.se_ratios, (list, tuple)) else cfg.se_ratios
            for bid in range(nb):
                name = f"stack{sid + 1}_block{bid + 1}_"
                stride = stride0 if bid == 0 else 1
                shortcut = out == pre_out and stride == 1 and not cfg.disable_shortcut
                cur_expand = (
                    expand[min(bid, len(expand) - 1)] if isinstance(expand, (list, tuple)) else expand
                )
                cur_se = se_ratio * cur_expand if cfg.use_expanded_se_ratio else se_ratio
                drop_rate = cfg.drop_connect_rate * gid / total

                inp = x
                in_ch = x.shape[-1]
                hidden = make_divisible(in_ch * cur_expand, 8)
                if cur_expand != 1:
                    x = nn.Conv(hidden, (1, 1), padding="VALID", use_bias=False, dtype=cfg.dtype, name=name + "sortcut_conv")(x)
                    x = self._bn_act(x, act, name + "sortcut_", training)
                ch = x.shape[-1]
                x = self._conv(x, ch, ksize, stride, name + "MB_dw_", groups=ch)
                x = self._bn_act(x, act, name + "MB_dw_", training)

                if cur_se > 0:
                    hidden_act, out_act = cfg.se_activation if cfg.se_activation else (act, "sigmoid")
                    reduction = make_divisible(
                        ch * cur_se / cur_expand, cfg.se_divisor, limit_round_down=cfg.se_limit_round_down
                    )
                    se = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
                    se = nn.Conv(reduction, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "se_1_conv")(se)
                    se = apply_activation(se, hidden_act)
                    se = nn.Conv(ch, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "se_2_conv")(se)
                    se = apply_activation(se, out_act)
                    x = x * se

                x = nn.Conv(out, (1, 1), padding="VALID", use_bias=False, dtype=cfg.dtype, name=name + "MB_pw_conv")(x)
                x = self._bn_act(x, None, name + "MB_pw_", training)
                if shortcut:
                    x = DropPath(drop_rate, name=name + "drop")(x, training=training)
                    x = x + inp
                if cfg.use_blocks_output_activation:
                    x = apply_activation(x, act)
                pre_out = out
                gid += 1

        if cfg.use_additional_output_conv:
            pre = make_divisible(cfg.out_channels[-1] * cur_expand * cfg.width_ratio, 8)
            x = nn.Conv(pre, (1, 1), padding="VALID", use_bias=False, dtype=cfg.dtype, name="pre_output_conv")(x)
            x = self._bn_act(x, cfg.stem_feature_activation, "pre_output_", training)

        if features_only:
            return x

        if cfg.use_avg_pool_conv_output:
            x = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
            if cfg.output_num_features > 0:
                x = nn.Conv(
                    make_divisible(cfg.output_num_features, 8), (1, 1),
                    use_bias=cfg.use_output_feature_bias, dtype=cfg.dtype, name="features_conv",
                )(x)
                x = apply_activation(x, cfg.stem_feature_activation)
            x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        else:
            if cfg.output_num_features > 0:
                x = nn.Conv(
                    make_divisible(cfg.output_num_features, 8), (1, 1),
                    use_bias=cfg.use_output_feature_bias, dtype=cfg.dtype, name="features_conv",
                )(x)
                x = self._bn_act(x, cfg.stem_feature_activation, "features_", training)
            x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)
        x = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="predictions")(x)
        if cfg.classifier_activation:
            x = apply_activation(x, cfg.classifier_activation)
        return x


_SMALL = dict(
    num_blocks=(1, 2, 3, 2, 3),
    out_channels=(16, 24, 40, 48, 96),
    expands=(1, (4.5, 3.67), (4, 6, 6), 3, 6),
    kernel_sizes=(3, 3, 5, 5, 5),
    strides=(2, 2, 2, 1, 2),
    activations=("relu", "relu", "hard_swish", "hard_swish", "hard_swish"),
    se_ratios=(0.25, 0, 0.25, 0.25, 0.25),
    output_num_features=1024,
)


@register_model
def MobileNetV3Large100():
    return MobileNetV3, MobileNetV3Config(name="MobileNetV3Large100")


@register_model
def MobileNetV3Large075():
    return MobileNetV3, MobileNetV3Config(name="MobileNetV3Large075", width_ratio=0.75)


@register_model
def MobileNetV3Small100():
    return MobileNetV3, MobileNetV3Config(name="MobileNetV3Small100", **_SMALL)


@register_model
def MobileNetV3Small075():
    return MobileNetV3, MobileNetV3Config(name="MobileNetV3Small075", width_ratio=0.75, **_SMALL)


@register_model
def MobileNetV3Small050():
    return MobileNetV3, MobileNetV3Config(
        name="MobileNetV3Small050", width_ratio=0.5, fix_stem=True, **_SMALL
    )
