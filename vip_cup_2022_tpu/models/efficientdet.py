"""EfficientDet D0-D7X / Lite0-4 (kecam efficientdet/efficientdet.py).

Architecture parity:
- EfficientNetV1 backbone with three named pyramid features (:163-169) +
  additional p6/p7 levels via 1x1-conv-BN align + stride-2 maxpool (:171-176)
- BiFPN (:79-101): top-down pass then bottom-up pass, each fusion =
  [align] -> ReluWeightedSum (:29-51, relu-normalized gains; plain Add for
  D6+/Lite) -> activation -> SeparableConv -> BN
- heads (:104-133): per-head conv towers SHARED across levels with per-level
  BNs, shared final head conv; regressor raw (4), classifier sigmoid
  (bias init -log((1-p)/p), p=0.01); output concat (B, N, 4 + classes)
- anchors_mode 'efficientdet': 9 anchors/level, no objectness
- decode via detect/anchors.py get_anchors + detect/nms.py DecodePredictions

TPU notes: shared head towers are applied per level inside one jit program;
nearest upsample uses ops/resize.py matmul matrices (exact TF half-pixel
nearest, handles odd grids); BN eps 1e-3, momentum 0.99.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import BatchNorm, apply_activation
from ..ops.resize import resize
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import model_entry, register_model

Dtype = Any

BN_EPS = 1e-3


@dataclasses.dataclass(frozen=True)
class EfficientDetConfig(ModelConfig):
    backbone_name: str = "EfficientNetV1B0"
    backbone_activation: str = "swish"
    feature_names: Tuple[str, ...] = (
        "stack_2_block1_output", "stack_4_block2_output", "stack_6_block0_output",
    )
    additional_features: int = 2
    fpn_depth: int = 3
    head_depth: int = 3
    num_channels: int = 64
    use_weighted_sum: bool = True
    use_sep_conv: bool = True
    num_anchors: int = 9
    use_object_scores: bool = False
    activation: str = "swish"
    classifier_activation: Optional[str] = "sigmoid"
    nb_classes: int = 90
    input_size: Tuple[int, int] = (512, 512)
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN  # rescale "torch"
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class _SepConv(nn.Module):
    """keras SeparableConv2D k3 SAME: params depthwise 'kernel' (flax layout),
    'pointwise_kernel', 'bias'."""

    features: int
    dtype: Dtype = None
    bias_init_value: float = 0.0

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        dw = self.param("kernel", nn.initializers.lecun_normal(), (3, 3, 1, c), jnp.float32)
        pw = self.param("pointwise_kernel", nn.initializers.lecun_normal(), (1, 1, c, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.constant(self.bias_init_value), (self.features,), jnp.float32)
        dt = self.dtype or x.dtype
        import jax.lax as lax

        y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = lax.conv_general_dilated(
            y.astype(dt), dw.astype(dt), (1, 1), "VALID", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = lax.conv_general_dilated(
            y, pw.astype(dt), (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y + b.astype(dt)


class _WSum(nn.Module):
    """ReluWeightedSum (efficientdet.py:29-51)."""

    n: int
    epsilon: float = 1e-4

    @nn.compact
    def __call__(self, inputs):
        gain = self.param("gain", nn.initializers.ones, (self.n,), jnp.float32)
        gain = nn.relu(gain)
        gain = gain / (gain.sum() + self.epsilon)
        out = inputs[0] * gain[0].astype(inputs[0].dtype)
        for i in range(1, self.n):
            out = out + inputs[i] * gain[i].astype(inputs[0].dtype)
        return out


def _tf_same_maxpool(x, k, s):
    """TF SAME maxpool (asymmetric padding, -inf fill)."""
    pads = []
    for dim in (1, 2):
        size = x.shape[dim]
        out = -(-size // s)
        pad_total = max((out - 1) * s + k - size, 0)
        pads.append((pad_total // 2, pad_total - pad_total // 2))
    x = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)), constant_values=-jnp.inf)
    return nn.max_pool(x, (k, k), strides=(s, s), padding="VALID")


class EfficientDet(nn.Module):
    cfg: EfficientDetConfig

    def _align(self, x, name, training):
        cfg = self.cfg
        if x.shape[-1] == cfg.num_channels:
            return x
        x = nn.Conv(cfg.num_channels, (1, 1), use_bias=True, dtype=cfg.dtype,
                    name=name + "channel_conv")(x)
        return BatchNorm(momentum=0.99, epsilon=BN_EPS, dtype=cfg.dtype,
                         name=name + "channel_bn")(x, training=training)

    def _resample_fuse(self, inputs, name, training):
        cfg = self.cfg
        inputs = [self._align(inputs[0], name, training)] + list(inputs[1:])
        if cfg.use_weighted_sum:
            y = _WSum(len(inputs), name=name + "wsm")(inputs)
        else:
            y = inputs[0]
            for t in inputs[1:]:
                y = y + t
        y = apply_activation(y, cfg.activation)
        if cfg.use_sep_conv:
            y = _SepConv(cfg.num_channels, cfg.dtype, name=name + "sepconv")(y)
        else:
            y = nn.Conv(cfg.num_channels, (3, 3), padding="SAME", use_bias=True,
                        dtype=cfg.dtype, name=name + "conv")(y)
        return BatchNorm(momentum=0.99, epsilon=BN_EPS, dtype=cfg.dtype,
                         name=name + "bn")(y, training=training)

    def _bi_fpn(self, features, name, training):
        """bi_fpn (efficientdet.py:79-101)."""
        n = len(features)
        up_features = [features[-1]]
        for i, feature in enumerate(features[:-1][::-1]):
            cur = name + f"p{n - i + 1}_up_"
            up = resize(up_features[-1], feature.shape[1:3], method="nearest")
            up_features.append(self._resample_fuse([feature, up], cur, training))

        out_features = [up_features[-1]]
        mids = up_features[1:-1][::-1]
        for i, feature in enumerate(features[1:]):
            cur = name + f"p{n - 1 + i}_out_"
            down = _tf_same_maxpool(out_features[-1], 3, 2)
            fusion = [feature, down] if i == len(mids) else [feature, mids[i], down]
            out_features.append(self._resample_fuse(fusion, cur, training))
        return out_features

    def _head(self, features, out_dim, bias_init_value, head_activation, name, training):
        """det_header_pre + det_header_post (efficientdet.py:104-133):
        conv towers and the final head conv are SHARED across levels."""
        cfg = self.cfg
        if cfg.use_sep_conv:
            towers = [
                _SepConv(cfg.num_channels, cfg.dtype, name=name + f"{d + 1}_sepconv")
                for d in range(cfg.head_depth)
            ]
            head = _SepConv(out_dim * cfg.num_anchors, jnp.float32, bias_init_value,
                            name=name + "head")
        else:
            towers = [
                nn.Conv(cfg.num_channels, (3, 3), padding="SAME", use_bias=True,
                        dtype=cfg.dtype, name=name + f"{d + 1}_conv")
                for d in range(cfg.head_depth)
            ]
            head = nn.Conv(out_dim * cfg.num_anchors, (3, 3), padding="SAME", use_bias=True,
                           bias_init=nn.initializers.constant(bias_init_value),
                           dtype=jnp.float32, name=name + "conv_head")

        outs = []
        for fid, f in enumerate(features):
            y = f
            for d in range(cfg.head_depth):
                y = towers[d](y)
                y = BatchNorm(momentum=0.99, epsilon=BN_EPS, dtype=cfg.dtype,
                              name=name + f"{d + 1}_{fid + 1}_bn")(y, training=training)
                y = apply_activation(y, cfg.activation)
            y = head(y.astype(jnp.float32))
            outs.append(y.reshape(y.shape[0], -1, out_dim))
        out = jnp.concatenate(outs, axis=1)
        if head_activation:
            out = apply_activation(out, head_activation)
        return out

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)

        bcls, bcfg = model_entry(cfg.backbone_name)
        bcfg = dataclasses.replace(
            bcfg, nb_classes=0, output_conv_filter=0, activation=cfg.backbone_activation,
            input_size=cfg.input_size, rescale_mode="raw", dtype=cfg.dtype,
        )
        features = bcls(bcfg, name="backbone")(
            x, training=training, feature_names=cfg.feature_names
        )

        for i in range(cfg.additional_features):
            cur = f"p{i + 5}_p{i + 6}_"
            extra = self._align(features[-1], cur, training)
            features.append(_tf_same_maxpool(extra, 3, 2))

        for i in range(cfg.fpn_depth):
            features = self._bi_fpn(features, f"biFPN_{i + 1}_", training)
        if features_only:
            return features

        neg_log = -math.log((1 - 0.01) / 0.01)
        bboxes_out = self._head(features, 4, 0.0, None, "regressor_", training)
        outs = [bboxes_out]
        if cfg.nb_classes > 0:
            outs.append(self._head(features, cfg.nb_classes, neg_log,
                                   cfg.classifier_activation, "classifier_", training))
        if cfg.use_object_scores:
            outs.append(self._head(features, 1, neg_log,
                                   cfg.classifier_activation, "object_", training))
        return jnp.concatenate(outs, axis=-1).astype(jnp.float32)


def _det(name, backbone, feats, input_size, fpn_depth, head_depth, num_channels,
         use_weighted_sum=True, additional_features=2, activation="swish",
         mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD):
    return EfficientDet, EfficientDetConfig(
        name=name, backbone_name=backbone, backbone_activation=activation,
        feature_names=feats, input_size=input_size, fpn_depth=fpn_depth,
        head_depth=head_depth, num_channels=num_channels,
        use_weighted_sum=use_weighted_sum, additional_features=additional_features,
        activation=activation, mean=mean, std=std,
    )


_F_D0 = ("stack_2_block1_output", "stack_4_block2_output", "stack_6_block0_output")
_F_D1 = ("stack_2_block2_output", "stack_4_block3_output", "stack_6_block1_output")
_F_D3 = ("stack_2_block2_output", "stack_4_block4_output", "stack_6_block1_output")
_F_D4 = ("stack_2_block3_output", "stack_4_block5_output", "stack_6_block1_output")
_F_D5 = ("stack_2_block4_output", "stack_4_block6_output", "stack_6_block2_output")
_F_D6 = ("stack_2_block5_output", "stack_4_block7_output", "stack_6_block2_output")
_F_D7X = ("stack_2_block6_output", "stack_4_block9_output", "stack_6_block3_output")

# EfficientNetV1Lite last stack has a single block
_F_L0 = ("stack_2_block1_output", "stack_4_block2_output", "stack_6_block0_output")
_F_L1 = ("stack_2_block2_output", "stack_4_block3_output", "stack_6_block0_output")
_F_L3 = ("stack_2_block2_output", "stack_4_block4_output", "stack_6_block0_output")
_F_L4 = ("stack_2_block3_output", "stack_4_block5_output", "stack_6_block0_output")

_TF_STATS = dict(mean=(127.5, 127.5, 127.5), std=(127.5, 127.5, 127.5))


@register_model
def EfficientDetD0():
    return _det("efficientdet_d0", "EfficientNetV1B0", _F_D0, (512, 512), 3, 3, 64)


@register_model
def EfficientDetD1():
    return _det("efficientdet_d1", "EfficientNetV1B1", _F_D1, (640, 640), 4, 3, 88)


@register_model
def EfficientDetD2():
    return _det("efficientdet_d2", "EfficientNetV1B2", _F_D1, (768, 768), 5, 3, 112)


@register_model
def EfficientDetD3():
    return _det("efficientdet_d3", "EfficientNetV1B3", _F_D3, (896, 896), 6, 4, 160)


@register_model
def EfficientDetD4():
    return _det("efficientdet_d4", "EfficientNetV1B4", _F_D4, (1024, 1024), 7, 4, 224)


@register_model
def EfficientDetD5():
    return _det("efficientdet_d5", "EfficientNetV1B5", _F_D5, (1280, 1280), 7, 4, 288)


@register_model
def EfficientDetD6():
    return _det("efficientdet_d6", "EfficientNetV1B6", _F_D6, (1280, 1280), 8, 5, 384,
                use_weighted_sum=False)


@register_model
def EfficientDetD7():
    return _det("efficientdet_d7", "EfficientNetV1B6", _F_D6, (1536, 1536), 8, 5, 384,
                use_weighted_sum=False)


@register_model
def EfficientDetD7X():
    return _det("efficientdet_d7x", "EfficientNetV1B7", _F_D7X, (1536, 1536), 8, 5, 384,
                use_weighted_sum=False, additional_features=3)


@register_model
def EfficientDetLite0():
    return _det("efficientdet_lite0", "EfficientNetV1Lite0", _F_L0, (320, 320), 3, 3, 64,
                use_weighted_sum=False, activation="relu6", **_TF_STATS)


@register_model
def EfficientDetLite1():
    return _det("efficientdet_lite1", "EfficientNetV1Lite1", _F_L1, (384, 384), 4, 3, 88,
                use_weighted_sum=False, activation="relu6", **_TF_STATS)


@register_model
def EfficientDetLite2():
    return _det("efficientdet_lite2", "EfficientNetV1Lite2", _F_L1, (448, 448), 5, 3, 112,
                use_weighted_sum=False, activation="relu6", **_TF_STATS)


@register_model
def EfficientDetLite3():
    return _det("efficientdet_lite3", "EfficientNetV1Lite3", _F_L3, (512, 512), 6, 4, 160,
                use_weighted_sum=False, activation="relu6", **_TF_STATS)


@register_model
def EfficientDetLite3X():
    return _det("efficientdet_lite3x", "EfficientNetV1Lite3", _F_L3, (640, 640), 6, 4, 200,
                use_weighted_sum=False, activation="relu6", **_TF_STATS)


@register_model
def EfficientDetLite4():
    return _det("efficientdet_lite4", "EfficientNetV1Lite4", _F_L4, (640, 640), 7, 4, 224,
                use_weighted_sum=False, activation="relu6", **_TF_STATS)
