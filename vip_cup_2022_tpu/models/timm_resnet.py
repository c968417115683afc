"""timm-style ResNet / ResNeXt / SE- / ECA- / Blur- variants (tfimm
architectures/resnet.py).

Architecture parity:
- BasicBlock (:102-189) / Bottleneck (:192-265): conv-bn-act chains with
  optional SE (attention.py:12-76, rd via make_divisible round_limit=0) or
  ECA (:78-133, dynamic kernel from log2(C)), optional BlurPool anti-alias
  on the stride (blurpool.py:5-60: REFLECT pad + fixed binomial kernel)
- downsample_avg (:295-312, pool+1x1+bn) / downsample_conv (:315-330)
- stems (:470-512): single 7x7, 'deep'/'deep_tiered' triple-3x3, optional
  replace_stem_pool conv, optional blurpooled stem pool
- width = floor(channels * base_width/64) * cardinality (wide/resnext)
- ClassifierHead module named 'remove' with Dense 'fc' (timm h5 layout)

Weight mapping note: names like 'resnet50' collide with the kecam-mapper
prefix 'resnet*', so these families are converted with the EXPLICIT
``mapper="timm_resnet"`` argument of :func:`weights.keras_h5.convert_keras_h5`
(or a manifest sidecar {"mapper": "timm_resnet"}); the unambiguous prefixes
(tv_/wide_/ig_/ssl_/swsl_/ecaresnet/seresne/resnetblur) auto-route.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import BatchNorm, DropPath, apply_activation, make_divisible
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class TimmResNetConfig(ModelConfig):
    block: str = "basic_block"
    nb_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    nb_channels: Tuple[int, ...] = (64, 128, 256, 512)
    cardinality: int = 1
    base_width: int = 64
    downsample_mode: str = "conv"
    zero_init_last_bn: bool = True
    stem_width: int = 64
    stem_type: str = ""
    replace_stem_pool: bool = False
    down_kernel_size: int = 1
    act_layer: str = "relu"
    aa_layer: str = ""
    attn_layer: str = ""
    se_ratio: float = 0.0625
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    input_size: Tuple[int, int] = (224, 224)
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


def _blur_pool(x, stride=2, kernel_size=3):
    """BlurPool2D (layers/blurpool.py:5-60): REFLECT pad + binomial dw conv."""
    if kernel_size == 3:
        bk = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32)
    else:
        bk = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]).astype(np.float32)
    bk = bk / bk.sum()
    c = x.shape[-1]
    kern = jnp.asarray(np.tile(bk[:, :, None, None], (1, 1, 1, c)), x.dtype)
    p = (kernel_size + stride) // 2 - 1
    x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x, kern, (stride, stride), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class _SE(nn.Module):
    """tfimm SEModule (attention.py:12-76), named children fc1/fc2."""

    rd_ratio: float
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        rd = make_divisible(c * self.rd_ratio, 8, limit_round_down=0.0)
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        y = nn.Conv(rd, (1, 1), use_bias=True, dtype=self.dtype, name="fc1")(y)
        y = apply_activation(y, "relu")
        y = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(y)
        return x * apply_activation(y, "sigmoid")


class _Eca(nn.Module):
    """tfimm EcaModule (attention.py:78-133): k from log2(C)."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        t = int(abs(math.log(c, 2) + 1) / 2)
        k = max(t if t % 2 else t + 1, 3)
        p = (k - 1) // 2
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)[:, :, None]
        y = jnp.pad(y, ((0, 0), (p, p), (0, 0)))
        y = nn.Conv(1, (k,), padding="VALID", use_bias=False, dtype=self.dtype, name="conv")(y)
        y = apply_activation(y, "sigmoid")
        return x * jnp.transpose(y, (0, 2, 1))[:, None]


class _Block(nn.Module):
    cfg: TimmResNetConfig
    nb_channels: int
    stride: int
    downsample: bool
    drop_path_rate: float

    def _conv(self, x, f, k, s, name, groups=1):
        p = k // 2
        if p:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        return nn.Conv(f, (k, k), strides=(s, s), padding="VALID", use_bias=False,
                       feature_group_count=groups, dtype=self.cfg.dtype, name=name)(x)

    def _bn(self, x, name, training, zero_gamma=False):
        return BatchNorm(momentum=0.9, epsilon=1e-5, zero_gamma=zero_gamma,
                         dtype=self.cfg.dtype, name=name)(x, training=training)

    def _downsample(self, x, out_ch, training):
        """downsample_avg (:295-312) / downsample_conv (:315-330)."""
        cfg = self.cfg
        if cfg.downsample_mode == "avg":
            if self.stride != 1:
                x = nn.avg_pool(x, (2, 2), strides=(self.stride, self.stride),
                                padding="SAME", count_include_pad=False)
            x = nn.Conv(out_ch, (1, 1), padding="VALID", use_bias=False,
                        dtype=cfg.dtype, name="downsample_1")(x)
            return self._bn(x, "downsample_2", training)
        p = (self.stride + cfg.down_kernel_size) // 2 - 1
        if p:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        x = nn.Conv(out_ch, (cfg.down_kernel_size, cfg.down_kernel_size),
                    strides=(self.stride, self.stride), padding="VALID",
                    use_bias=False, dtype=cfg.dtype, name="downsample_0")(x)
        return self._bn(x, "downsample_1", training)

    @nn.compact
    def __call__(self, x, training: bool = False):
        cfg = self.cfg
        act = cfg.act_layer
        use_aa = bool(cfg.aa_layer) and self.stride == 2
        expansion = 1 if cfg.block == "basic_block" else 4
        out_ch = self.nb_channels * expansion
        shortcut = self._downsample(x, out_ch, training) if self.downsample else x

        if cfg.block == "basic_block":
            y = self._conv(x, self.nb_channels, 3, 1 if use_aa else self.stride, "conv1")
            y = apply_activation(self._bn(y, "bn1", training), act)
            if use_aa:
                y = _blur_pool(y, self.stride)
            y = self._conv(y, out_ch, 3, 1, "conv2")
            y = self._bn(y, "bn2", training, zero_gamma=cfg.zero_init_last_bn)
        else:
            width = int(math.floor(self.nb_channels * (cfg.base_width / 64)) * cfg.cardinality)
            y = self._conv(x, width, 1, 1, "conv1")
            y = apply_activation(self._bn(y, "bn1", training), act)
            y = self._conv(y, width, 3, 1 if use_aa else self.stride, "conv2", groups=cfg.cardinality)
            y = apply_activation(self._bn(y, "bn2", training), act)
            if use_aa:
                y = _blur_pool(y, self.stride)
            y = self._conv(y, out_ch, 1, 1, "conv3")
            y = self._bn(y, "bn3", training, zero_gamma=cfg.zero_init_last_bn)

        if cfg.attn_layer == "se":
            y = _SE(cfg.se_ratio, cfg.dtype, name="se")(y)
        elif cfg.attn_layer == "eca":
            y = _Eca(cfg.dtype, name="se")(y)
        y = DropPath(self.drop_path_rate)(y, training=training)
        return apply_activation(y + shortcut, act)


class TimmResNet(nn.Module):
    cfg: TimmResNetConfig

    def _bn(self, x, name, training):
        return BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.cfg.dtype,
                         name=name)(x, training=training)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        act = cfg.act_layer
        x = preprocess_input(x, cfg)

        def conv(x, f, k, s, name):
            p = k // 2
            if p:
                x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            return nn.Conv(f, (k, k), strides=(s, s), padding="VALID", use_bias=False,
                           dtype=cfg.dtype, name=name)(x)

        if cfg.stem_type in ("deep", "deep_tiered"):
            in_ch = cfg.stem_width * 2
            chns = ((3 * (cfg.stem_width // 4), cfg.stem_width)
                    if cfg.stem_type == "deep_tiered" else (cfg.stem_width, cfg.stem_width))
            x = conv(x, chns[0], 3, 2, "conv1_0")
            x = apply_activation(self._bn(x, "conv1_1", training), act)
            x = conv(x, chns[1], 3, 1, "conv1_3")
            x = apply_activation(self._bn(x, "conv1_4", training), act)
            x = conv(x, in_ch, 3, 1, "conv1_6")
        else:
            in_ch = 64
            x = conv(x, in_ch, 7, 2, "conv1")
        x = apply_activation(self._bn(x, "bn1", training), act)

        if cfg.replace_stem_pool:
            x = conv(x, in_ch, 3, 2, "maxpool_0")
            x = apply_activation(self._bn(x, "maxpool_1", training), act)
        elif cfg.aa_layer:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            x = nn.max_pool(x, (3, 3), strides=(1, 1), padding="VALID")
            x = _blur_pool(x, 2)
        else:
            # relu output is >= 0, so zero padding == -inf padding for max
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        expansion = 1 if cfg.block == "basic_block" else 4
        total = sum(cfg.nb_blocks)
        gid = 0
        for j in range(4):
            out_ch = cfg.nb_channels[j] * expansion
            for k in range(cfg.nb_blocks[j]):
                stride = 1 if j == 0 or k > 0 else 2
                need_ds = k == 0 and (stride != 1 or in_ch != out_ch)
                dpr = cfg.drop_path_rate * gid / max(total - 1, 1)
                x = _Block(cfg, cfg.nb_channels[j], stride, need_ds, dpr,
                           name=f"layer{j + 1}_{k}")(x, training=training)
                in_ch = out_ch
                gid += 1

        if features_only:
            return x
        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if cfg.nb_classes <= 0:
            return feat

        class _Head(nn.Module):
            cfg_: TimmResNetConfig

            @nn.compact
            def __call__(self, f, training: bool = False):
                f = nn.Dropout(self.cfg_.drop_rate, deterministic=not training)(f)
                return nn.Dense(self.cfg_.nb_classes, dtype=jnp.float32, name="fc")(f)

        y = _Head(cfg, name="remove")(feat, training=training)
        if cfg.classifier_activation:
            y = apply_activation(y, cfg.classifier_activation)
        return y


def _tr(name, **kw):
    return TimmResNet, TimmResNetConfig(name=name, **kw)


@register_model
def resnet18():
    return _tr("resnet18", block="basic_block", nb_blocks=(2, 2, 2, 2))


@register_model
def resnet26():
    return _tr("resnet26", block="bottleneck", nb_blocks=(2, 2, 2, 2))


@register_model
def resnet26d():
    return _tr("resnet26d", block="bottleneck", nb_blocks=(2, 2, 2, 2),
               stem_width=32, stem_type="deep", downsample_mode="avg")


@register_model
def resnet26t():
    return _tr("resnet26t", block="bottleneck", nb_blocks=(2, 2, 2, 2), input_size=(256, 256),
               stem_width=32, stem_type="deep_tiered", downsample_mode="avg")


@register_model
def resnet34():
    return _tr("resnet34", block="basic_block", nb_blocks=(3, 4, 6, 3))


@register_model
def resnet34d():
    return _tr("resnet34d", block="basic_block", nb_blocks=(3, 4, 6, 3),
               stem_width=32, stem_type="deep", downsample_mode="avg")


@register_model
def resnet50():
    return _tr("resnet50", block="bottleneck", nb_blocks=(3, 4, 6, 3))


@register_model
def resnet101():
    return _tr("resnet101", block="bottleneck", nb_blocks=(3, 4, 23, 3))


@register_model
def resnet152():
    return _tr("resnet152", block="bottleneck", nb_blocks=(3, 8, 36, 3))


@register_model
def resnet200d():
    return _tr("resnet200d", block="bottleneck", nb_blocks=(3, 24, 36, 3), input_size=(256, 256),
               stem_width=32, stem_type="deep", downsample_mode="avg")


@register_model
def wide_resnet50_2():
    return _tr("wide_resnet50_2", block="bottleneck", nb_blocks=(3, 4, 6, 3), base_width=128)


@register_model
def wide_resnet101_2():
    return _tr("wide_resnet101_2", block="bottleneck", nb_blocks=(3, 4, 23, 3), base_width=128)


@register_model
def resnext50_32x4d():
    return _tr("resnext50_32x4d", block="bottleneck", nb_blocks=(3, 4, 6, 3),
               cardinality=32, base_width=4)


@register_model
def resnext101_32x8d():
    return _tr("resnext101_32x8d", block="bottleneck", nb_blocks=(3, 4, 23, 3),
               cardinality=32, base_width=8)


@register_model
def seresnet50():
    return _tr("seresnet50", block="bottleneck", nb_blocks=(3, 4, 6, 3), attn_layer="se")


@register_model
def seresnext50_32x4d():
    return _tr("seresnext50_32x4d", block="bottleneck", nb_blocks=(3, 4, 6, 3),
               cardinality=32, base_width=4, attn_layer="se")


@register_model
def ecaresnet26t():
    return _tr("ecaresnet26t", block="bottleneck", nb_blocks=(2, 2, 2, 2), input_size=(256, 256),
               stem_width=32, stem_type="deep_tiered", downsample_mode="avg", attn_layer="eca")


@register_model
def ecaresnet50d():
    return _tr("ecaresnet50d", block="bottleneck", nb_blocks=(3, 4, 6, 3),
               stem_width=32, stem_type="deep", downsample_mode="avg", attn_layer="eca")


@register_model
def ecaresnet101d():
    return _tr("ecaresnet101d", block="bottleneck", nb_blocks=(3, 4, 23, 3),
               stem_width=32, stem_type="deep", downsample_mode="avg", attn_layer="eca")


@register_model
def resnetblur50():
    return _tr("resnetblur50", block="bottleneck", nb_blocks=(3, 4, 6, 3), aa_layer="blur_pool")
