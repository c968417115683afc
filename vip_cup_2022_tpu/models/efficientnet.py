"""EfficientNet V1 + V2 (ensemble members EfficientNetV2T-200x200 and
EfficientNetV1B4-224x224; NAME2BS also lists V2M/V2L).

Architecture parity with reference kecam efficientnet/efficientnet_v2.py:
- ``inverted_residual_block`` (:47-108): fused (3x3 expand) vs MB
  (1x1 expand + depthwise) paths, SE with ratio ``se_ratio / expand`` and
  divisor 1, pw-linear output, additive shortcut with linear drop-connect
- ``EfficientNetV2`` assembly (:111-193): stem make_divisible(first_conv, 8),
  per-stack fused='auto' (fused iff se_ratio == 0), post 1x1 conv, GAP head
- torch-vs-tf mode: BN eps 1e-5 vs 1e-3, symmetric vs SAME padding
  (:73, :84-88)
- V1 wrapper with width/depth scaling (efficientnet_v1.py:9-37)
- rescale modes: 'torch' -> ImageNet mean/std on [0,1]; 'tf' -> x*255/128-1

Module names mirror the kecam functional layer names exactly (stem_conv,
stack_{i}_block{j}_MB_dw_, se_1_conv, ...), so the generic kecam h5 mapper
converts checkpoints with no per-family table.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import BatchNorm, DropPath, apply_activation, make_divisible
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any

TF_BN_EPS = 1e-3
TORCH_BN_EPS = 1e-5

RESCALE_STATS = {
    "torch": (IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD),
    "tf": ((128 / 255,) * 3, (128 / 255,) * 3),  # x*255/128 - 1
    "raw": (None, None),
}


@dataclasses.dataclass(frozen=True)
class EfficientNetConfig(ModelConfig):
    expands: Tuple[float, ...] = (1, 4, 4, 4, 6, 6)
    out_channels: Tuple[float, ...] = (16, 32, 48, 96, 112, 192)
    depthes: Tuple[int, ...] = (1, 2, 2, 3, 5, 8)
    strides: Tuple[int, ...] = (1, 2, 2, 2, 1, 2)
    se_ratios: Tuple[float, ...] = (0, 0, 0, 0.25, 0.25, 0.25)
    kernel_sizes: Tuple[int, ...] = (3,) * 6
    is_fused: Union[str, Tuple[bool, ...]] = "auto"
    first_conv_filter: float = 32
    output_conv_filter: float = 1280
    is_torch_mode: bool = False
    use_global_context_instead_of_se: bool = False
    drop_connect_rate: float = 0.0
    activation: str = "swish"
    drop_rate: float = 0.2  # head dropout
    rescale_mode: str = "torch"
    classifier_activation: Optional[str] = "softmax"

    def __post_init__(self):
        mean, std = RESCALE_STATS[self.rescale_mode]
        object.__setattr__(self, "mean", mean)
        object.__setattr__(self, "std", std)


def _conv_nb(parent, x, filters, kernel, stride, torch_mode, name, dtype):
    """conv2d_no_bias with kecam padding semantics (common_layers.py:230-250)."""
    if torch_mode and kernel // 2 > 0:
        # explicit (lo, hi) conv padding instead of a materialized jnp.pad
        # copy (XLA folds it into the conv window; same zeros)
        pad = kernel // 2
        padding = ((pad, pad), (pad, pad))
    else:
        padding = "SAME" if kernel > 1 or stride > 1 else "VALID"
    return nn.Conv(
        filters, (kernel, kernel), strides=(stride, stride), padding=padding,
        use_bias=False, dtype=dtype, name=name,
    )(x)


class EfficientNet(nn.Module):
    cfg: EfficientNetConfig

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False,
                 feature_names: tuple = ()):
        """feature_names: block-output names ("stack_2_block1_output", ...) to
        return as a pyramid list (the role of kecam's named feature layers,
        efficientdet.py:163-169)."""
        cfg = self.cfg
        dt = cfg.dtype
        feats = {}
        bn_eps = TORCH_BN_EPS if cfg.is_torch_mode else TF_BN_EPS

        def bn_act(x, act, name):
            x = BatchNorm(momentum=0.9, epsilon=bn_eps, dtype=dt, name=name + "bn")(
                x, training=training
            )
            return apply_activation(x, act) if act else x

        x = preprocess_input(x, cfg)
        stem = make_divisible(cfg.first_conv_filter, 8)
        x = _conv_nb(self, x, stem, 3, cfg.first_strides, cfg.is_torch_mode, "stem_conv", dt)
        x = bn_act(x, cfg.activation, "stem_")

        pre_out = stem
        gid = 0
        total = sum(cfg.depthes)
        for sid, (expand, out_c, depth, stride0, se_ratio, ksize) in enumerate(
            zip(cfg.expands, cfg.out_channels, cfg.depthes, cfg.strides, cfg.se_ratios, cfg.kernel_sizes)
        ):
            out = make_divisible(out_c, 8)
            if cfg.is_fused == "auto":
                fused = se_ratio == 0
            else:
                fused = cfg.is_fused[sid] if isinstance(cfg.is_fused, (tuple, list)) else bool(cfg.is_fused)
            for bid in range(depth):
                name = f"stack_{sid}_block{bid}_"
                stride = stride0 if bid == 0 else 1
                shortcut = out == pre_out and stride == 1
                drop_rate = cfg.drop_connect_rate * gid / total
                inp = x
                in_ch = x.shape[-1]
                hidden = make_divisible(in_ch * expand, 8)

                if fused and expand != 1:
                    x = _conv_nb(self, x, hidden, 3, stride, cfg.is_torch_mode, name + "sortcut_conv", dt)
                    x = bn_act(x, cfg.activation, name + "sortcut_")
                elif expand != 1:
                    x = nn.Conv(hidden, (1, 1), padding="VALID", use_bias=False, dtype=dt, name=name + "sortcut_conv")(x)
                    x = bn_act(x, cfg.activation, name + "sortcut_")

                if not fused:
                    if cfg.is_torch_mode and ksize // 2 > 0:
                        p = ksize // 2
                        pad = ((p, p), (p, p))
                    else:
                        pad = "SAME"
                    from ..ops.conv import apply_depthwise_conv

                    x = apply_depthwise_conv(
                        self, x, ksize, stride, pad, name + "MB_dw_", dtype=dt
                    )
                    x = bn_act(x, cfg.activation, name + "MB_dw_")

                if se_ratio > 0 and cfg.use_global_context_instead_of_se:
                    # kecam global_context_module (common_layers.py:286-310)
                    from ..ops.norms import LayerNorm

                    bdim, hh, wwidth, ch = x.shape
                    reduction = make_divisible(ch * se_ratio / expand, 1, limit_round_down=0.0)
                    attn = nn.Conv(1, (1, 1), use_bias=True, dtype=dt, name=name + "gc_attn_conv")(x)
                    attn = attn.reshape(bdim, 1, 1, hh * wwidth)
                    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
                    context = jnp.matmul(attn, x.reshape(bdim, 1, hh * wwidth, ch))
                    mlp = nn.Conv(reduction, (1, 1), use_bias=True, dtype=dt, name=name + "gc_mlp_1_conv")(context)
                    mlp = LayerNorm(name=name + "gc_ln")(mlp)
                    mlp = apply_activation(mlp, cfg.activation)
                    mlp = nn.Conv(ch, (1, 1), use_bias=True, dtype=dt, name=name + "gc_mlp_2_conv")(mlp)
                    mlp = apply_activation(mlp, "sigmoid")
                    x = x * mlp
                elif se_ratio > 0:
                    # kecam se_module (common_layers.py:311-334), divisor=1
                    ch = x.shape[-1]
                    reduction = make_divisible(ch * se_ratio / expand, 1)
                    se = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
                    se = nn.Conv(reduction, (1, 1), use_bias=True, dtype=dt, name=name + "se_1_conv")(se)
                    se = apply_activation(se, cfg.activation)
                    se = nn.Conv(ch, (1, 1), use_bias=True, dtype=dt, name=name + "se_2_conv")(se)
                    se = apply_activation(se, "sigmoid")
                    x = x * se

                if fused and expand == 1:
                    x = _conv_nb(self, x, out, 3, stride, cfg.is_torch_mode, name + "fu_conv", dt)
                    x = bn_act(x, cfg.activation, name + "fu_")
                else:
                    x = nn.Conv(out, (1, 1), padding="VALID", use_bias=False, dtype=dt, name=name + "MB_pw_conv")(x)
                    x = bn_act(x, None, name + "MB_pw_")

                if shortcut:
                    x = DropPath(drop_rate, name=name + "drop")(x, training=training)
                    x = x + inp
                feats[name + "output"] = x
                pre_out = out
                gid += 1

        if cfg.output_conv_filter > 0:
            post = make_divisible(cfg.output_conv_filter, 8)
            x = nn.Conv(post, (1, 1), padding="VALID", use_bias=False, dtype=dt, name="post_conv")(x)
            x = bn_act(x, cfg.activation, "post_")

        if feature_names:
            missing_names = [n for n in feature_names if n not in feats]
            if missing_names:
                raise KeyError(
                    f"unknown feature names {missing_names}; available: {sorted(feats)}"
                )
            return [feats[n] for n in feature_names]
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


def _v2(name, **kw):
    return EfficientNet, EfficientNetConfig(name=name, **kw)


@register_model
def EfficientNetV2B0():
    return _v2("EfficientNetV2B0", input_size=(224, 224))


@register_model
def EfficientNetV2B1():
    return _v2("EfficientNetV2B1", input_size=(240, 240), depthes=(2, 3, 3, 4, 6, 9))


@register_model
def EfficientNetV2B2():
    return _v2(
        "EfficientNetV2B2", input_size=(260, 260),
        out_channels=(16, 32, 56, 104, 120, 208), depthes=(2, 3, 3, 4, 6, 10),
        output_conv_filter=1408, drop_rate=0.3,
    )


@register_model
def EfficientNetV2B3():
    return _v2(
        "EfficientNetV2B3", input_size=(300, 300),
        out_channels=(16, 40, 56, 112, 136, 232), depthes=(2, 3, 3, 5, 7, 12),
        first_conv_filter=40, output_conv_filter=1536, drop_rate=0.3,
    )


_V2T = dict(
    out_channels=(24, 40, 48, 104, 128, 208), depthes=(2, 4, 4, 6, 9, 14),
    first_conv_filter=24, output_conv_filter=1024, is_torch_mode=True,
)


@register_model
def EfficientNetV2T():
    return _v2("EfficientNetV2T", input_size=(288, 288), **_V2T)


@register_model
def EfficientNetV2T_GC():
    return _v2(
        "EfficientNetV2T_GC", input_size=(288, 288),
        use_global_context_instead_of_se=True, **_V2T,
    )


@register_model
def EfficientNetV2S():
    return _v2(
        "EfficientNetV2S", input_size=(384, 384),
        out_channels=(24, 48, 64, 128, 160, 256), depthes=(2, 4, 4, 6, 9, 15),
        first_conv_filter=24, rescale_mode="tf",
    )


_V2_LARGE = dict(
    expands=(1, 4, 4, 4, 6, 6, 6), strides=(1, 2, 2, 2, 1, 2, 1),
    se_ratios=(0, 0, 0, 0.25, 0.25, 0.25, 0.25), kernel_sizes=(3,) * 7,
    rescale_mode="tf",
)


@register_model
def EfficientNetV2M():
    return _v2(
        "EfficientNetV2M", input_size=(480, 480),
        out_channels=(24, 48, 80, 160, 176, 304, 512), depthes=(3, 5, 5, 7, 14, 18, 5),
        first_conv_filter=24, drop_rate=0.3, **_V2_LARGE,
    )


@register_model
def EfficientNetV2L():
    return _v2(
        "EfficientNetV2L", input_size=(480, 480),
        out_channels=(32, 64, 96, 192, 224, 384, 640), depthes=(4, 7, 7, 10, 19, 25, 7),
        drop_rate=0.4, **_V2_LARGE,
    )


@register_model
def EfficientNetV2XL():
    return _v2(
        "EfficientNetV2XL", input_size=(512, 512),
        out_channels=(32, 64, 96, 192, 256, 512, 640), depthes=(4, 8, 8, 16, 24, 32, 8),
        drop_rate=0.4, **_V2_LARGE,
    )


# ---------------------------------------------------------------------------
# V1 (efficientnet_v1.py): width/depth scaling over the B0 table
# ---------------------------------------------------------------------------

def _v1_dims(width, depth, fix_head_stem=False):
    out_channels = tuple(c * width for c in (16, 24, 40, 80, 112, 192, 320))
    depthes = tuple(int(math.ceil(d * depth)) for d in (1, 2, 2, 3, 3, 4, 1))
    if fix_head_stem:
        depthes = (1,) + depthes[1:-1] + (1,)
        first_conv, output_conv = 32, 1280
    else:
        first_conv, output_conv = 32 * width, 1280 * width
    return out_channels, depthes, first_conv, output_conv


def _v1(name, width, depth, input_size, drop_rate, lite=False, **kw):
    out_channels, depthes, first_conv, output_conv = _v1_dims(width, depth, fix_head_stem=lite)
    cfg = EfficientNetConfig(
        name=name,
        input_size=input_size,
        expands=(1, 6, 6, 6, 6, 6, 6),
        out_channels=out_channels,
        depthes=depthes,
        strides=(1, 2, 2, 2, 1, 2, 1),
        se_ratios=(0,) * 7 if lite else (0.25,) * 7,
        kernel_sizes=(3, 3, 5, 3, 5, 5, 3),
        is_fused=False if lite else "auto",
        first_conv_filter=first_conv,
        output_conv_filter=output_conv,
        drop_connect_rate=0.2,
        drop_rate=drop_rate,
        **kw,
    )
    return EfficientNet, cfg


@register_model
def EfficientNetV1B0():
    return _v1("EfficientNetV1B0", 1.0, 1.0, (224, 224), 0.2)


@register_model
def EfficientNetV1B1():
    return _v1("EfficientNetV1B1", 1.0, 1.1, (240, 240), 0.2)


@register_model
def EfficientNetV1B2():
    return _v1("EfficientNetV1B2", 1.1, 1.2, (260, 260), 0.3)


@register_model
def EfficientNetV1B3():
    return _v1("EfficientNetV1B3", 1.2, 1.4, (300, 300), 0.3)


@register_model
def EfficientNetV1B4():
    return _v1("EfficientNetV1B4", 1.4, 1.8, (380, 380), 0.4)


@register_model
def EfficientNetV1B5():
    return _v1("EfficientNetV1B5", 1.6, 2.2, (456, 456), 0.4)


@register_model
def EfficientNetV1B6():
    return _v1("EfficientNetV1B6", 1.8, 2.6, (528, 528), 0.5)


@register_model
def EfficientNetV1B7():
    return _v1("EfficientNetV1B7", 2.0, 3.1, (600, 600), 0.5)


@register_model
def EfficientNetV1L2():
    return _v1("EfficientNetV1L2", 4.3, 5.3, (800, 800), 0.5)


@register_model
def EfficientNetV1Lite0():
    return _v1("EfficientNetV1Lite0", 1.0, 1.0, (320, 320), 0.2, lite=True)


@register_model
def EfficientNetV1Lite1():
    return _v1("EfficientNetV1Lite1", 1.0, 1.1, (384, 384), 0.2, lite=True)


@register_model
def EfficientNetV1Lite2():
    return _v1("EfficientNetV1Lite2", 1.1, 1.2, (448, 448), 0.3, lite=True)


@register_model
def EfficientNetV1Lite3():
    return _v1("EfficientNetV1Lite3", 1.2, 1.4, (512, 512), 0.3, lite=True)


@register_model
def EfficientNetV1Lite4():
    return _v1("EfficientNetV1Lite4", 1.4, 1.8, (640, 640), 0.3, lite=True)
