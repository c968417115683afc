"""NFNets — normalizer-free networks (ensemble member ECA_NFNetL0-200x200;
NAME2BS also lists ECA_NFNetL2).

Architecture parity with reference keras_cv_attention_models/nfnets/nfnets.py:
- ``ScaledStandardizedConv2D`` weight-standardized conv with gain+gamma
  (:42-81; implemented in ops/conv.py ScaledStdConv)
- variance-preserving activation gammas (:23-38; gamma in act for F-series,
  gamma in conv for L-series — ``gamma_in_act`` :222-226)
- NF-block with beta/alpha signal scaling, grouped 3x3s, SE/ECA with 2x gain,
  ZeroInitGain residual (:116-168)
- stem 4-conv (:183-192), per-stack beta schedule (:244-250)
- F0-F7 (:272-305) and light L0/ECA-L0..L3 (:308-345; channel_ratio 0.25,
  group_size 64, torch padding, no zero-init gain, gamma in conv)

Module names mirror kecam layer names (generic kecam h5 mapper applies).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import NON_LINEAR_GAMMA, DropPath, ZeroInitGain, apply_activation, make_divisible
from ..ops.conv import ScaledStdConv
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class NFNetConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (1, 2, 6, 3)
    attn_type: str = "se"  # 'se' | 'eca'
    stem_width: int = 128
    out_channels: Tuple[int, ...] = (256, 512, 1536, 1536)
    channel_ratio: float = 0.5
    num_features_factor: float = 2.0
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    se_ratio: float = 0.5
    group_size: int = 128
    use_zero_init_gain: bool = True
    torch_padding: bool = False
    gamma_in_act: bool = True
    alpha: float = 0.2
    width_factor: float = 1.0
    activation: str = "gelu"
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class NFNet(nn.Module):
    cfg: NFNetConfig

    def _conv(self, x, filters, kernel, stride, gamma, name, groups=1):
        cfg = self.cfg
        if cfg.torch_padding and kernel > 1:
            # torch symmetric k//2 padding, expressed as the conv's own
            # explicit (lo, hi) padding — identical zeros, but XLA folds it
            # into the convolution window instead of materializing a padded
            # copy (profiled 1.3 ms of pads + 1.4 ms of copies per
            # ECA_NFNetL0 forward for the jnp.pad form)
            p = kernel // 2
            padding = ((p, p), (p, p))
        else:
            padding = "SAME" if kernel > 1 else "VALID"
        return ScaledStdConv(
            features=filters, kernel_size=kernel, strides=stride, padding=padding,
            groups=max(1, groups), gamma=gamma, dtype=cfg.dtype, name=name + "conv",
        )(x)

    def _act(self, x, gamma):
        y = apply_activation(x, self.cfg.activation)
        return y if gamma == 1.0 else y * gamma

    def _se(self, x, name):
        cfg = self.cfg
        ch = x.shape[-1]
        reduction = make_divisible(ch * cfg.se_ratio, 8)
        se = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        se = nn.Conv(reduction, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "1_conv")(se)
        se = apply_activation(se, "relu")
        se = nn.Conv(ch, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "2_conv")(se)
        se = apply_activation(se, "sigmoid")
        return x * se

    def _eca(self, x, name):
        ch = x.shape[-1]
        tt = int((math.log2(float(ch)) + 1.0) / 2.0)
        k = max(tt if tt % 2 else tt + 1, 3)
        pad = k // 2
        v = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
        v = jnp.pad(v, ((0, 0), (pad, pad)))[:, :, None]
        v = nn.Conv(1, (k,), padding="VALID", use_bias=False, dtype=self.cfg.dtype, name=name + "conv1d")(v)
        v = apply_activation(jnp.squeeze(v, -1), "sigmoid")
        return x * v[:, None, None, :]

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        base_gamma = NON_LINEAR_GAMMA.get(cfg.activation.split("/")[0], 1.0)
        if cfg.gamma_in_act:
            conv_gamma, act_gamma = 1.0, base_gamma
        else:
            conv_gamma, act_gamma = base_gamma, 1.0

        x = preprocess_input(x, cfg)
        sw = make_divisible(cfg.stem_width * cfg.width_factor, 8)
        for i, (f, s) in enumerate([(sw // 8, cfg.first_strides), (sw // 4, 1), (sw // 2, 1), (sw, 2)]):
            x = self._conv(x, f, 3, s, conv_gamma, f"stem_{i + 1}_")
            if i < 3:
                x = self._act(x, act_gamma)

        from ..ops.drop import drop_connect_rates_split

        beta_list = [(1 + cfg.alpha**2 * i) ** -0.5 for i in range(max(cfg.num_blocks) + 1)]
        dcr = drop_connect_rates_split(cfg.num_blocks, 0.0, cfg.drop_connect_rate)
        pre_beta = 1.0
        attn_gain = 2.0
        for sid, (num_block, out_channel, stride) in enumerate(
            zip(cfg.num_blocks, cfg.out_channels, cfg.strides)
        ):
            out = make_divisible(out_channel * cfg.width_factor, 8)
            betas = list(beta_list[: num_block + 1])
            betas[0] = pre_beta
            for bid in range(num_block):
                name = f"stack{sid + 1}_block{bid + 1}_"
                cur_stride = stride if bid == 0 else 1
                beta = betas[bid]
                drop_rate = dcr[sid][bid]

                hidden = int(out * cfg.channel_ratio)
                preact = self._act(x, act_gamma) * beta

                if cur_stride > 1 or x.shape[-1] != out:
                    sc = preact
                    if cur_stride > 1:
                        sc = nn.avg_pool(
                            sc, (cur_stride, cur_stride), strides=(cur_stride, cur_stride),
                            padding="SAME", count_include_pad=False,
                        )
                    shortcut = self._conv(sc, out, 1, 1, conv_gamma, name + "shortcut_")
                else:
                    shortcut = x

                groups = hidden // cfg.group_size
                deep = self._conv(preact, hidden, 1, 1, conv_gamma, name + "deep_1_")
                deep = self._act(deep, act_gamma)
                deep = self._conv(deep, hidden, 3, cur_stride, conv_gamma, name + "deep_2_", groups=groups)
                deep = self._act(deep, act_gamma)
                deep = self._conv(deep, hidden, 3, 1, conv_gamma, name + "deep_3_", groups=groups)
                deep = self._act(deep, act_gamma)
                deep = self._conv(deep, out, 1, 1, conv_gamma, name + "deep_4_")
                if cfg.se_ratio > 0 and cfg.attn_type == "se":
                    deep = self._se(deep, name + "se_") * attn_gain
                elif cfg.attn_type == "eca":
                    deep = self._eca(deep, name + "eca_") * attn_gain
                deep = DropPath(drop_rate, name=name + "drop")(deep, training=training)
                if cfg.use_zero_init_gain:
                    deep = ZeroInitGain(name=name + "deep_gain")(deep)
                x = shortcut + deep * cfg.alpha
            pre_beta = betas[-1]

        if cfg.num_features_factor > 0:
            post = make_divisible(cfg.num_features_factor * cfg.out_channels[-1] * cfg.width_factor, 8)
            x = self._conv(x, post, 1, 1, conv_gamma, "post_")
        x = self._act(x, act_gamma)

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


def _f(name, num_blocks, input_size, drop_rate):
    return NFNet, NFNetConfig(
        name=name, num_blocks=num_blocks, input_size=input_size, drop_rate=drop_rate
    )


@register_model
def NFNetF0():
    return _f("NFNetF0", (1, 2, 6, 3), (256, 256), 0.2)


@register_model
def NFNetF1():
    return _f("NFNetF1", (2, 4, 12, 6), (320, 320), 0.3)


@register_model
def NFNetF2():
    return _f("NFNetF2", (3, 6, 18, 9), (352, 352), 0.4)


@register_model
def NFNetF3():
    return _f("NFNetF3", (4, 8, 24, 12), (416, 416), 0.4)


@register_model
def NFNetF4():
    return _f("NFNetF4", (5, 10, 30, 15), (512, 512), 0.5)


@register_model
def NFNetF5():
    return _f("NFNetF5", (6, 12, 36, 18), (544, 544), 0.5)


@register_model
def NFNetF6():
    return _f("NFNetF6", (7, 14, 42, 21), (576, 576), 0.5)


_LIGHT = dict(
    channel_ratio=0.25, group_size=64, torch_padding=True,
    use_zero_init_gain=False, gamma_in_act=False, activation="swish",
    drop_rate=0.2,
)


@register_model
def NFNetL0():
    return NFNet, NFNetConfig(
        name="NFNetL0", num_blocks=(1, 2, 6, 3), input_size=(288, 288),
        se_ratio=0.25, num_features_factor=1.5, **_LIGHT,
    )


@register_model
def ECA_NFNetL0():
    return NFNet, NFNetConfig(
        name="ECA_NFNetL0", num_blocks=(1, 2, 6, 3), input_size=(288, 288),
        attn_type="eca", num_features_factor=1.5, **_LIGHT,
    )


@register_model
def ECA_NFNetL1():
    return NFNet, NFNetConfig(
        name="ECA_NFNetL1", num_blocks=(2, 4, 12, 6), input_size=(320, 320),
        attn_type="eca", **_LIGHT,
    )


@register_model
def ECA_NFNetL2():
    return NFNet, NFNetConfig(
        name="ECA_NFNetL2", num_blocks=(3, 6, 18, 9), input_size=(384, 384),
        attn_type="eca", **_LIGHT,
    )


@register_model
def ECA_NFNetL3():
    return NFNet, NFNetConfig(
        name="ECA_NFNetL3", num_blocks=(4, 8, 24, 12), input_size=(448, 448),
        attn_type="eca", **_LIGHT,
    )
