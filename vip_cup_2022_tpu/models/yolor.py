"""YOLOR — You Only Learn One Representation detector (kecam yolor/yolor.py).

Architecture parity:
- CSPDarknet yolor flavor (:128-175): conv/conv/csp_block stem (or focus stem
  for P6+), per-stack downsample (conv3x3/2 or csp_conv_downsample :119-125),
  csp_stack with use_pre/use_post/use_shortcut_bn switches (:52-77),
  res_spatial_pyramid_pooling on the last stack (:80-101, reversed pool
  concat), BN eps 1e-4 momentum 0.03
- path-aggregation FPN (:181-226): generic over 3 (CSP/CSPX) or 4 (P6..D6)
  pyramid levels; up path 'p4p5_'/'p3p4p5_' names, down path 'c3n3_'...;
  csp_stack(expansion 1.0, use_pre, no post) at every merge
- implicit-knowledge head (:232-260): conv3x3 -> BiasLayer 'shift_channel'
  (implicit add) -> 1x1 conv -> ChannelAffine 'control_channel' (implicit
  mul), per-anchor reshape, sigmoid over the concatenated output
- anchors_mode 'yolor': 3 anchors/level; decode lives in detect/anchors.py
  (yolor 6-field decode) + detect/nms.py

TPU notes: static NHWC convs throughout; nearest 2x upsample as broadcast
repeat; whole head emits one fused (B, N, 5+classes) tensor.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import BatchNorm, ChannelAffine, apply_activation
from .base import ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any

BN_EPS = 1e-4
BN_MOMENTUM = 0.03


@dataclasses.dataclass(frozen=True)
class YOLORConfig(ModelConfig):
    # Optional registry backbone instead of yolor CSPDarknet (yolor.py:295-305)
    backbone_name: str = ""
    backbone_feature_names: Tuple[str, ...] = ()
    csp_depthes: Tuple[int, ...] = (2, 8, 8, 4)
    csp_channels: Tuple[int, ...] = (128, 256, 512, 1024)
    stem_width: int = -1  # -1 -> csp_channels[0] // 2
    use_focus_stem: bool = False
    ssp_depth: int = 2
    csp_use_pre: bool = False
    csp_use_post: bool = True
    use_csp_downsample: bool = False
    use_shortcut_bn: bool = True
    fpn_depth: int = 2
    num_pyramid_levels: int = 3  # len(features_pick)
    num_anchors: int = 3
    activation: str = "swish"
    classifier_activation: Optional[str] = "sigmoid"
    nb_classes: int = 80
    input_size: Tuple[int, int] = (640, 640)
    mean: Optional[Tuple[float, ...]] = None  # rescale_mode "raw01"
    std: Optional[Tuple[float, ...]] = None


class _Bias(nn.Module):
    """kecam BiasLayer: implicit-knowledge additive channel shift."""

    @nn.compact
    def __call__(self, x):
        b = self.param("bias", nn.initializers.truncated_normal(0.2), (x.shape[-1],), jnp.float32)
        return x + b.astype(x.dtype)


class YOLOR(nn.Module):
    cfg: YOLORConfig

    def _conv_bn(self, x, filters, k, s, name, training):
        cfg = self.cfg
        p = k // 2
        if p:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        x = nn.Conv(filters, (k, k), strides=(s, s), padding="VALID", use_bias=False,
                    dtype=cfg.dtype, name=name + "conv")(x)
        x = BatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=cfg.dtype,
                      name=name + "bn")(x, training=training)
        return apply_activation(x, cfg.activation)

    def _conv_nb(self, x, filters, name):
        return nn.Conv(filters, (1, 1), padding="VALID", use_bias=False,
                       dtype=self.cfg.dtype, name=name + "conv")(x)

    def _csp_block(self, x, expansion, use_shortcut, name, training):
        c = x.shape[-1]
        y = self._conv_bn(x, int(c * expansion), 1, 1, name + "1_", training)
        y = self._conv_bn(y, c, 3, 1, name + "2_", training)
        return x + y if use_shortcut else y

    def _csp_stack(self, x, depth, out_channels, expansion, use_shortcut,
                   use_pre, use_post, name, training):
        """yolor csp_stack (yolor.py:52-77)."""
        cfg = self.cfg
        out_channels = x.shape[-1] if out_channels == -1 else out_channels
        hidden = int(out_channels * expansion)
        if use_pre:
            x = self._conv_bn(x, hidden, 1, 1, name + "pre_", training)
        if cfg.use_shortcut_bn:
            short = self._conv_bn(x, hidden, 1, 1, name + "short_", training)
        else:
            short = self._conv_nb(x, hidden, name + "short_")
        deep = x if use_pre else self._conv_bn(x, hidden, 1, 1, name + "deep_pre_", training)
        for i in range(depth):
            deep = self._csp_block(deep, 1, use_shortcut, name + f"block{i + 1}_", training)
        if use_post:
            deep = self._conv_bn(deep, hidden, 1, 1, name + "deep_post_", training)
        out = jnp.concatenate([deep, short], axis=-1)
        if not cfg.use_shortcut_bn:
            out = BatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=cfg.dtype,
                            name=name + "concat_bn")(out, training=training)
            out = apply_activation(out, cfg.activation)
        return self._conv_bn(out, out_channels, 1, 1, name + "output_", training)

    def _res_spp(self, x, depth, name, training):
        """res_spatial_pyramid_pooling (yolor.py:80-101)."""
        cfg = self.cfg
        hidden = int(x.shape[-1] * 0.5)
        if cfg.use_shortcut_bn:
            short = self._conv_bn(x, hidden, 1, 1, name + "short_", training)
        else:
            short = self._conv_nb(x, hidden, name + "short_")
        deep = self._conv_bn(x, hidden, 1, 1, name + "pre_1_", training)
        deep = self._conv_bn(deep, hidden, 3, 1, name + "pre_2_", training)
        deep = self._conv_bn(deep, hidden, 1, 1, name + "pre_3_", training)
        pools = []
        for k in (5, 9, 13):
            p = k // 2
            padded = jnp.pad(deep, ((0, 0), (p, p), (p, p), (0, 0)), constant_values=-jnp.inf)
            pools.append(nn.max_pool(padded, (k, k), strides=(1, 1), padding="VALID"))
        deep = jnp.concatenate([deep, *pools][::-1], axis=-1)  # reversed (yolor.py:92)
        for i in range(depth - 1):
            deep = self._conv_bn(deep, hidden, 1, 1, name + f"post_{i * 2 + 1}_", training)
            deep = self._conv_bn(deep, hidden, 3, 1, name + f"post_{i * 2 + 2}_", training)
        out = jnp.concatenate([deep, short], axis=-1)
        if not cfg.use_shortcut_bn:
            out = BatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=cfg.dtype,
                            name=name + "concat_bn")(out, training=training)
            out = apply_activation(out, cfg.activation)
        return self._conv_bn(out, hidden, 1, 1, name + "output_", training)

    def _csp_conv_downsample(self, x, filters, name, training):
        """DownC (yolor.py:119-125)."""
        h, w = x.shape[1], x.shape[2]
        ph, pw = (2 - h % 2) % 2, (2 - w % 2) % 2
        if ph or pw:
            padded = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-jnp.inf)
        else:
            padded = x
        max_down = nn.max_pool(padded, (2, 2), strides=(2, 2), padding="VALID")
        max_down = self._conv_bn(max_down, filters // 2, 1, 1, name + "max_down_", training)
        conv_down = self._conv_bn(x, x.shape[-1], 1, 1, name + "conv_down_1_", training)
        conv_down = self._conv_bn(conv_down, filters // 2, 3, 2, name + "conv_down_2_", training)
        return jnp.concatenate([conv_down, max_down], axis=-1)

    def _focus_stem(self, x, filters, name, training):
        tl = x[:, ::2, ::2]
        tr = x[:, ::2, 1::2]
        bl = x[:, 1::2, ::2]
        br = x[:, 1::2, 1::2]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return self._conv_bn(x, filters, 3, 1, name, training)

    def _backbone(self, x, training):
        """yolor CSPDarknet (yolor.py:128-175)."""
        cfg = self.cfg
        stem_width = cfg.stem_width if cfg.stem_width > 0 else cfg.csp_channels[0] // 2
        if cfg.use_focus_stem:
            x = self._focus_stem(x, stem_width, "stem_", training)
        else:
            x = self._conv_bn(x, 32, 3, 1, "stem_1_", training)
            x = self._conv_bn(x, stem_width, 3, 2, "stem_2_", training)
            x = self._csp_block(x, 0.5, True, "stem_3_", training)
        features = [x]
        n = len(cfg.csp_depthes)
        for i, (ch, depth) in enumerate(zip(cfg.csp_channels, cfg.csp_depthes)):
            name = f"stack{i + 1}_"
            if cfg.use_csp_downsample:
                x = self._csp_conv_downsample(x, ch, name, training)
            else:
                x = self._conv_bn(x, ch, 3, 2, name + "downsample_", training)
            x = self._csp_stack(x, depth, -1, 0.5, True, cfg.csp_use_pre,
                                cfg.csp_use_post, name, training)
            if i == n - 1:
                x = self._res_spp(x, cfg.ssp_depth, name + "spp_", training)
            features.append(x)
        return features[-cfg.num_pyramid_levels :]

    def _upsample_merge(self, low, up, name, training):
        """upsample_merge (yolor.py:181-191): low = higher-res feature."""
        cfg = self.cfg
        u = self._conv_bn(up, low.shape[-1], 1, 1, name + "up_", training)
        u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
        merged = jnp.concatenate([low, u], axis=-1)
        return self._csp_stack(merged, cfg.fpn_depth, merged.shape[-1] // 2, 1.0,
                               False, True, False, name, training)

    def _downsample_merge(self, down, skip, name, training):
        cfg = self.cfg
        if cfg.use_csp_downsample:
            down = self._csp_conv_downsample(down, skip.shape[-1], name, training)
        else:
            down = self._conv_bn(down, skip.shape[-1], 3, 2, name + "down_", training)
        merged = jnp.concatenate([down, skip], axis=-1)
        return self._csp_stack(merged, cfg.fpn_depth, merged.shape[-1] // 2, 1.0,
                               False, True, False, name, training)

    def _pafpn(self, features, training):
        """path_aggregation_fpn (yolor.py:194-226), generic over 3-4 levels."""
        upsamples = [features[-1]]
        p_name = f"p{len(features) + 2}_"
        for i, f in enumerate(features[:-1][::-1]):
            cur = f"p{len(features) + 1 - i}"
            nn_ = self._conv_bn(f, f.shape[-1] // 2, 1, 1, f"pafpn_{cur}_down_", training)
            p_name = cur + p_name
            upsamples.append(self._upsample_merge(nn_, upsamples[-1], "pafpn_" + p_name, training))
        downsamples = [upsamples[-1]]
        for i, f in enumerate(upsamples[:-1][::-1]):
            downsamples.append(
                self._downsample_merge(downsamples[-1], f, f"pafpn_c3n{i + 3}_", training)
            )
        return downsamples

    def _head_single(self, x, filters, name, training):
        """yolor_head_single (yolor.py:232-245): implicit add + implicit mul."""
        cfg = self.cfg
        nc, na = cfg.nb_classes, cfg.num_anchors
        y = self._conv_bn(x, filters, 3, 1, name + "1_", training)
        y = _Bias(name=name + "shift_channel")(y)
        out_ch = nc + 5
        y = nn.Conv(out_ch * na, (1, 1), use_bias=True, dtype=jnp.float32,
                    name=name + "2_conv")(y.astype(jnp.float32))
        y = ChannelAffine(use_bias=False, weight_init_value=1.0,
                          name=name + "control_channel")(y)
        return y.reshape(x.shape[0], -1, out_ch)

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
        else:
            features = self._backbone(x, training)
        if features_only:
            return features
        fpn = self._pafpn(features, training)
        outs = [
            self._head_single(f, int(f.shape[-1] * 2), f"head_{i + 1}_", training)
            for i, f in enumerate(fpn)
        ]
        out = jnp.concatenate(outs, axis=1).astype(jnp.float32)
        if cfg.classifier_activation:
            out = apply_activation(out, cfg.classifier_activation)
        return out


@register_model
def YOLOR_CSP():
    return YOLOR, YOLORConfig(name="yolor_csp")


@register_model
def YOLOR_CSPX():
    return YOLOR, YOLORConfig(
        name="yolor_csp_x", csp_depthes=(3, 10, 10, 5),
        csp_channels=(160, 320, 640, 1280), fpn_depth=3, ssp_depth=3,
    )


@register_model
def YOLOR_P6():
    return YOLOR, YOLORConfig(
        name="yolor_p6", csp_depthes=(3, 7, 7, 3, 3),
        csp_channels=(128, 256, 384, 512, 640), num_pyramid_levels=4,
        fpn_depth=3, ssp_depth=2, use_focus_stem=True, csp_use_post=False,
        input_size=(1280, 1280),
    )


@register_model
def YOLOR_W6():
    return YOLOR, YOLORConfig(
        name="yolor_w6", csp_depthes=(3, 7, 7, 3, 3),
        csp_channels=(128, 256, 512, 768, 1024), num_pyramid_levels=4,
        fpn_depth=3, ssp_depth=2, use_focus_stem=True, csp_use_post=False,
        input_size=(1280, 1280),
    )


@register_model
def YOLOR_E6():
    return YOLOR, YOLORConfig(
        name="yolor_e6", csp_depthes=(3, 7, 7, 3, 3),
        csp_channels=(160, 320, 640, 960, 1280), num_pyramid_levels=4,
        fpn_depth=3, ssp_depth=2, use_focus_stem=True, csp_use_post=False,
        use_csp_downsample=True, use_shortcut_bn=False, input_size=(1280, 1280),
    )


@register_model
def YOLOR_D6():
    return YOLOR, YOLORConfig(
        name="yolor_d6", csp_depthes=(3, 15, 15, 7, 7),
        csp_channels=(160, 320, 640, 960, 1280), num_pyramid_levels=4,
        fpn_depth=3, ssp_depth=2, use_focus_stem=True, csp_use_post=False,
        use_csp_downsample=True, use_shortcut_bn=False, input_size=(1280, 1280),
    )
