"""RegNetY / RegNetZ (kecam resnet_family/regnet.py) — thin AotNet configs.

Parity: RegNetY (:20-37) = kernel_3x3 stem, hidden ratio 1, per-block
se_ratio lists scaled by the input/output channel ratio, se_divisor 1.
RegNetZ (:87-200) = timm bottle_in mode (first hidden ratio of each stack
uses the previous stack's channels), linear block output, no shortcut conv,
group_size convs, relu SE, features conv head. *_EVO (EvoNorm) variants are
tracked but not registered (EvoNorm group flavor pending in aotnet).
"""
from __future__ import annotations

from .aotnet import AotNet, AotNetConfig
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD
from .registry import register_model


def _regnety(name, num_blocks, out_channels, stem_width=32, se_ratio=0.25):
    se = [
        [se_ratio * stem_width / out_channels[0]] + [se_ratio] * num_blocks[0],
        [se_ratio * out_channels[0] / out_channels[1]] + [se_ratio] * num_blocks[1],
        [se_ratio * out_channels[1] / out_channels[2]] + [se_ratio] * num_blocks[2],
        [se_ratio * out_channels[2] / out_channels[3]] + [se_ratio] * num_blocks[3],
    ]
    return AotNet, AotNetConfig(
        name=name, num_blocks=tuple(num_blocks), out_channels=tuple(out_channels),
        strides=(2, 2, 2, 2), stem_type="kernel_3x3", stem_width=stem_width,
        stem_downsample=False, hidden_channel_ratio=1, se_ratio=tuple(tuple(s) for s in se),
        attn_params={"se_divisor": 1}, activation="relu",
        mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD,
    )


@register_model
def RegNetY032():
    return _regnety("regnety_032", [2, 5, 13, 1], [72, 216, 576, 1512])


@register_model
def RegNetY040():
    return _regnety("regnety_040", [2, 6, 12, 2], [128, 192, 512, 1088])


@register_model
def RegNetY064():
    return _regnety("regnety_064", [2, 7, 14, 2], [144, 288, 576, 1296])


@register_model
def RegNetY080():
    return _regnety("regnety_080", [2, 4, 10, 1], [168, 448, 896, 2016])


@register_model
def RegNetY160():
    return _regnety("regnety_160", [2, 4, 11, 1], [224, 448, 1232, 3024])


@register_model
def RegNetY320():
    return _regnety("regnety_320", [2, 5, 12, 1], [232, 696, 1392, 3712])


def _regnetz(name, num_blocks, out_channels, hidden_channel_ratio, group_size,
             strides, stem_type="kernel_3x3", stem_width=32, stem_last_strides=1,
             output_num_features=1536, input_size=(224, 224)):
    return AotNet, AotNetConfig(
        name=name, num_blocks=tuple(num_blocks), out_channels=tuple(out_channels),
        strides=tuple(strides), stem_type=stem_type, stem_width=stem_width,
        stem_downsample=False, stem_last_strides=stem_last_strides,
        hidden_channel_ratio=tuple(tuple(r) for r in hidden_channel_ratio),
        use_block_output_activation=False, se_ratio=0.25,
        attn_params={"activation": "relu"}, group_size=group_size,
        shortcut_type=None, output_num_features=output_num_features,
        activation="swish", input_size=input_size,
        mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD,
    )


@register_model
def RegNetZB16():
    return _regnetz(
        "regnetz_b16", [2, 6, 12, 2], [48, 96, 192, 288],
        [[32 * 3 / 48, 3], [1.5] + [3] * 5, [1.5] + [3] * 11, [192 * 3 / 288, 3]],
        group_size=16, strides=[2, 2, 2, 2],
    )


@register_model
def RegNetZC16():
    return _regnetz(
        "regnetz_c16", [2, 6, 12, 2], [48, 96, 192, 288],
        [[32 * 4 / 48, 4], [2] + [4] * 5, [2] + [4] * 11, [192 * 4 / 288, 4]],
        group_size=16, strides=[2, 2, 2, 2], input_size=(256, 256),
    )


@register_model
def RegNetZD32():
    return _regnetz(
        "regnetz_d32", [3, 6, 12, 3], [64, 128, 256, 384],
        [[64 * 4 / 64, 4, 4], [2] + [4] * 5, [2] + [4] * 11, [256 * 4 / 384, 4, 4]],
        group_size=32, strides=[1, 2, 2, 2], stem_type="tiered", stem_width=64,
        stem_last_strides=2, output_num_features=1792, input_size=(256, 256),
    )


@register_model
def RegNetZD8():
    return _regnetz(
        "regnetz_d8", [3, 6, 12, 3], [64, 128, 256, 384],
        [[64 * 4 / 64, 4, 4], [64 * 4 / 128] + [4] * 5, [128 * 4 / 256] + [4] * 11, [256 * 4 / 384, 4, 4]],
        group_size=8, strides=[1, 2, 2, 2], stem_type="tiered", stem_width=64,
        stem_last_strides=2, output_num_features=1792, input_size=(256, 256),
    )


@register_model
def RegNetZE8():
    return _regnetz(
        "regnetz_e8", [3, 8, 16, 3], [96, 192, 384, 512],
        [[64 * 4 / 96, 4, 4], [96 * 4 / 192] + [4] * 7, [192 * 4 / 384] + [4] * 15, [384 * 4 / 512, 4, 4]],
        group_size=8, strides=[1, 2, 2, 2], stem_type="tiered", stem_width=64,
        stem_last_strides=2, output_num_features=2048, input_size=(256, 256),
    )


def _evo(base_fn, name, stem_type=None):
    import dataclasses

    cls, cfg = base_fn()
    kw = dict(name=name, use_evo_norm=True, evo_norm_group_size=16, bn_epsilon=1e-3)
    if stem_type:
        kw["stem_type"] = stem_type
    return cls, dataclasses.replace(cfg, **kw)


@register_model
def RegNetZC16_EVO():
    return _evo(RegNetZC16, "regnetz_c16_evo")


@register_model
def RegNetZD8_EVO():
    return _evo(RegNetZD8, "regnetz_d8_evo", stem_type="deep2")
