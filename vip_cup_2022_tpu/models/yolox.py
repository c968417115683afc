"""YOLOX — anchor-free detector with CSPDarknet backbone (kecam yolox/yolox.py).

Architecture parity:
- CSPDarknet (:24-114): focus stem (space-to-depth concat tl/bl/tr/br), 4
  dark stacks (conv3x3/2 -> [SPP on last] -> csp_stack), BN eps 1e-3
  momentum 0.03
- csp_stack (:49-61): short/deep 1x1 branches, deep runs csp_blocks
  (1x1 -> 3x3 [+residual]), concat -> 1x1 output
- spatial_pyramid_pooling (:64-70): 1x1 -> maxpool 5/9/13 stride-1 concat
  -> 1x1
- path-aggregation FPN (:117-156): two upsample merges (nearest 2x) + two
  downsample merges, csp_stack(expansion .5, no shortcut) at each merge
- decoupled head (:162-200): per-level stem 1x1, cls and reg towers (2x
  conv3x3), class/object outs sigmoid with bias init -log((1-p)/p), p=0.01,
  regression raw; outputs concat (B, sum(h*w*na), 4 + classes [+ 1])
- variants Nano(depthwise)/Tiny/S/M/L/X via depth/width multipliers (:257-278)

Post-processing lives in detect/ (anchors.py get_anchor_free_anchors +
decode_bboxes, nms.py DecodePredictions) — same split as the reference's
coco/anchors_func + eval_func.

TPU notes: all convs static-shape NHWC; nearest 2x upsample is a pure
reshape/broadcast (no gather); heads emit one fused (B, N, D) tensor.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import BatchNorm, apply_activation
from .base import ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any

BN_EPS = 1e-3
BN_MOMENTUM = 0.03  # keras semantics: moving = m*moving + (1-m)*batch


@dataclasses.dataclass(frozen=True)
class YOLOXConfig(ModelConfig):
    # Optional registry backbone instead of CSPDarknet (yolox.py:230-239):
    # feature_names are the backbone's pyramid block outputs; width_mul < 0
    # means min(feature channels)/256 like the reference's auto mode.
    backbone_name: str = ""
    backbone_feature_names: Tuple[str, ...] = ()
    depth_mul: float = 1.0
    width_mul: float = 1.0
    use_depthwise_conv: bool = False
    anchors_mode: str = "anchor_free"
    num_anchors: int = 1
    use_object_scores: bool = True
    activation: str = "swish"
    pyramid_levels_min: int = 3
    nb_classes: int = 80
    classifier_activation: Optional[str] = None
    input_size: Tuple[int, int] = (640, 640)
    mean: Optional[Tuple[float, ...]] = None  # rescale_mode "raw"
    std: Optional[Tuple[float, ...]] = None


class YOLOX(nn.Module):
    cfg: YOLOXConfig

    def _conv_bn(self, x, filters, k, s, name, training, use_depthwise=False):
        """conv_dw_pw_block (yolox.py:29-37)."""
        cfg = self.cfg

        def bn_act(x, name):
            x = BatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=cfg.dtype,
                          name=name + "bn")(x, training=training)
            return apply_activation(x, cfg.activation)

        if use_depthwise:
            p = k // 2
            if p:
                x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            c = x.shape[-1]
            x = nn.Conv(c, (k, k), strides=(s, s), padding="VALID", use_bias=False,
                        feature_group_count=c, dtype=cfg.dtype, name=name + "dw_conv")(x)
            x = bn_act(x, name + "dw_")
            k, s = 1, 1
        p = k // 2
        if p:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        x = nn.Conv(filters, (k, k), strides=(s, s), padding="VALID", use_bias=False,
                    dtype=cfg.dtype, name=name + "conv")(x)
        return bn_act(x, name)

    def _csp_block(self, x, use_shortcut, name, training):
        cfg = self.cfg
        c = x.shape[-1]
        y = self._conv_bn(x, int(c * 1), 1, 1, name + "1_", training)
        y = self._conv_bn(y, c, 3, 1, name + "2_", training, cfg.use_depthwise_conv)
        return x + y if use_shortcut else y

    def _csp_stack(self, x, depth, out_channels, expansion, use_shortcut, name, training):
        cfg = self.cfg
        out_channels = x.shape[-1] if out_channels == -1 else out_channels
        hidden = int(out_channels * expansion)
        short = self._conv_bn(x, hidden, 1, 1, name + "short_", training)
        deep = self._conv_bn(x, hidden, 1, 1, name + "deep_", training)
        for i in range(depth):
            deep = self._csp_block(deep, use_shortcut, name + f"block{i + 1}_", training)
        out = jnp.concatenate([deep, short], axis=-1)
        return self._conv_bn(out, out_channels, 1, 1, name + "output_", training)

    def _spp(self, x, name, training):
        c = x.shape[-1]
        y = self._conv_bn(x, c // 2, 1, 1, name + "1_", training)
        pools = []
        for k in (5, 9, 13):
            p = k // 2
            padded = jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)), constant_values=-jnp.inf)
            pools.append(nn.max_pool(padded, (k, k), strides=(1, 1), padding="VALID"))
        y = jnp.concatenate([y, *pools], axis=-1)
        return self._conv_bn(y, c, 1, 1, name + "2_", training)

    def _focus_stem(self, x, filters, name, training):
        """focus_stem (yolox.py:73-87): space-to-depth, concat tl/bl/tr/br."""
        tl = x[:, ::2, ::2]
        tr = x[:, ::2, 1::2]
        bl = x[:, 1::2, ::2]
        br = x[:, 1::2, 1::2]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return self._conv_bn(x, filters, 3, 1, name, training)

    def _backbone(self, x, training):
        """CSPDarknet (yolox.py:90-114), out_features [-3, -2, -1]."""
        cfg = self.cfg
        base_c = int(cfg.width_mul * 64)
        base_d = max(round(cfg.depth_mul * 3), 1)
        x = self._focus_stem(x, base_c, "stem_", training)
        features = []
        depths = [base_d, base_d * 3, base_d * 3, base_d]
        channels = [base_c * 2, base_c * 4, base_c * 8, base_c * 16]
        for i, (ch, d) in enumerate(zip(channels, depths)):
            name = f"stack{i + 1}_"
            x = self._conv_bn(x, ch, 3, 2, name, training, cfg.use_depthwise_conv)
            if i == 3:
                x = self._spp(x, name + "spp_", training)
            x = self._csp_stack(x, d, -1, 0.5, i != 3, name, training)
            features.append(x)
        return features[-3:]

    def _upsample_merge(self, a, b, csp_depth, name, training):
        """upsample_merge (yolox.py:120-129): returns (fpn_out, merged)."""
        target_c = b.shape[-1]
        fpn_out = self._conv_bn(a, target_c, 1, 1, name + "fpn_", training)
        up = jnp.repeat(jnp.repeat(fpn_out, 2, axis=1), 2, axis=2)
        merged = jnp.concatenate([up, b], axis=-1)
        merged = self._csp_stack(merged, csp_depth, target_c, 0.5, False, name, training)
        return fpn_out, merged

    def _downsample_merge(self, a, b, csp_depth, name, training):
        cfg = self.cfg
        a = self._conv_bn(a, b.shape[-1], 3, 2, name + "down_", training, cfg.use_depthwise_conv)
        merged = jnp.concatenate([a, b], axis=-1)
        return self._csp_stack(merged, csp_depth, merged.shape[-1], 0.5, False, name, training)

    def _pafpn(self, features, training):
        csp_depth = max(round(self.cfg.depth_mul * 3), 1)
        p3, p4, p5 = features
        fpn_out0, f_out0 = self._upsample_merge(p5, p4, csp_depth, "pafpn_c3p4_", training)
        fpn_out1, pan_out2 = self._upsample_merge(f_out0, p3, csp_depth, "pafpn_c3p3_", training)
        pan_out1 = self._downsample_merge(pan_out2, fpn_out1, csp_depth, "pafpn_c3n3_", training)
        pan_out0 = self._downsample_merge(pan_out1, fpn_out0, csp_depth, "pafpn_c3n4_", training)
        return [pan_out2, pan_out1, pan_out0]

    def _head_single(self, x, out_channels, name, training):
        """yolox_head_single (yolox.py:162-188)."""
        cfg = self.cfg
        nc, na = cfg.nb_classes, cfg.num_anchors
        bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        stem = self._conv_bn(x, out_channels, 1, 1, name + "stem_", training)

        cls_nn = self._conv_bn(stem, out_channels, 3, 1, name + "cls_1_", training, cfg.use_depthwise_conv)
        cls_nn = self._conv_bn(cls_nn, out_channels, 3, 1, name + "cls_2_", training, cfg.use_depthwise_conv)
        cls_out = nn.Conv(nc * na, (1, 1), use_bias=True, bias_init=bias_init,
                          dtype=jnp.float32, name=name + "class_out")(cls_nn.astype(jnp.float32))
        cls_out = nn.sigmoid(cls_out).reshape(x.shape[0], -1, nc)

        reg_nn = self._conv_bn(stem, out_channels, 3, 1, name + "reg_1_", training, cfg.use_depthwise_conv)
        reg_nn = self._conv_bn(reg_nn, out_channels, 3, 1, name + "reg_2_", training, cfg.use_depthwise_conv)
        reg_out = nn.Conv(4 * na, (1, 1), use_bias=True, dtype=jnp.float32,
                          name=name + "regression_out")(reg_nn.astype(jnp.float32))
        reg_out = reg_out.reshape(x.shape[0], -1, 4)

        if cfg.use_object_scores:
            obj = nn.Conv(na, (1, 1), use_bias=True, bias_init=bias_init,
                          dtype=jnp.float32, name=name + "object_out")(reg_nn.astype(jnp.float32))
            obj = nn.sigmoid(obj).reshape(x.shape[0], -1, 1)
            return jnp.concatenate([reg_out, cls_out, obj], axis=-1)
        return jnp.concatenate([reg_out, cls_out], axis=-1)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        if cfg.backbone_name:
            import dataclasses as _dc

            from .registry import model_entry

            bcls, bcfg = model_entry(cfg.backbone_name)
            bcfg = _dc.replace(bcfg, nb_classes=0, input_size=cfg.input_size,
                               mean=None, std=None, dtype=cfg.dtype)
            features = bcls(bcfg, name="backbone")(
                x, training=training, feature_names=cfg.backbone_feature_names
            )
            width_mul = (cfg.width_mul if cfg.width_mul > 0
                         else min(f.shape[-1] for f in features) / 256)
        else:
            features = self._backbone(x, training)
            width_mul = cfg.width_mul
        if features_only:
            return features
        fpn = self._pafpn(features, training)
        out_ch = int(256 * width_mul)
        outs = [
            self._head_single(f, out_ch, f"head_{i + 1}_", training)
            for i, f in enumerate(fpn)
        ]
        return jnp.concatenate(outs, axis=1).astype(jnp.float32)


def _yolox(name, depth_mul, width_mul, input_size=(640, 640), use_depthwise_conv=False):
    return YOLOX, YOLOXConfig(
        name=name, depth_mul=depth_mul, width_mul=width_mul,
        input_size=input_size, use_depthwise_conv=use_depthwise_conv,
    )


@register_model
def YOLOXNano():
    return _yolox("yolox_nano", 0.33, 0.25, (416, 416), use_depthwise_conv=True)


@register_model
def YOLOXTiny():
    return _yolox("yolox_tiny", 0.33, 0.375, (416, 416))


@register_model
def YOLOXS():
    return _yolox("yolox_s", 0.33, 0.5)


@register_model
def YOLOXM():
    return _yolox("yolox_m", 0.67, 0.75)


@register_model
def YOLOXL():
    return _yolox("yolox_l", 1.0, 1.0)


@register_model
def YOLOXX():
    return _yolox("yolox_x", 1.33, 1.25)
