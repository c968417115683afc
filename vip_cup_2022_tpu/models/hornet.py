"""HorNet — recursive gated convolutions, optional FFT global filters
(NAME2BS lists HorNetBase-200x200).

Architecture parity with reference keras_cv_attention_models/hornet/hornet.py:
- ``gnconv`` recursive gating (:84-104): 1x1 pre conv to 2C, geometric channel
  split (C/2^i reversed), depthwise-7x7 (or global-local filter) * scale,
  progressive pointwise-gated products, 1x1 output
- ``global_local_filter`` (:53-81): LN -> split -> [dwconv3x3 | rfft2d ->
  complex weight multiply -> irfft2d] -> channel-interleave -> LN
- ``ComplexDense`` (:27-50): (2, H, W//2+1, C/2) real/imag weight
- block: LN -> gnconv -> layer-scale gamma -> residual; LN -> MLP -> gamma
  (:107-120); stem conv4x4 s(first_strides*2)+LN; LN+conv2x2 downsample
- sizes tiny/small/base/large (+GF variants with filters in stages 3-4)

TPU notes: XLA lowers jnp.fft.rfft2/irfft2 natively (f32); everything else is
MXU matmuls + depthwise convs. Names mirror kecam layers (generic mapper).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..ops import ChannelAffine, DropPath, LayerNorm, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class HorNetConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (2, 3, 18, 2)
    embed_dim: int = 64
    mlp_ratio: float = 4.0
    gn_split: Tuple[int, ...] = (2, 3, 4, 5)
    use_global_local_filter: Any = False
    scale: float = 0.3333333
    layer_scale: float = 1e-6
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    activation: str = "gelu"
    classifier_activation: Optional[str] = "softmax"
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class ComplexDense(nn.Module):
    """Elementwise complex multiply in the rFFT domain (hornet.py:27-50)."""

    @nn.compact
    def __call__(self, x_re, x_im):
        h, w, c = x_re.shape[1:]
        weight = self.param(
            "complex_weight", nn.initializers.normal(0.02), (2, h, w, c), jnp.float32
        )
        w_re, w_im = weight[0], weight[1]
        return x_re * w_re - x_im * w_im, x_re * w_im + x_im * w_re


class HorNet(nn.Module):
    cfg: HorNetConfig

    def _dw(self, x, kernel, name, use_bias):
        ch = x.shape[-1]
        p = kernel // 2
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        return nn.Conv(
            ch, (kernel, kernel), padding="VALID", feature_group_count=ch,
            use_bias=use_bias, dtype=self.cfg.dtype, name=name + "dw_conv",
        )(x)

    def _global_local_filter(self, x, name):
        cfg = self.cfg
        _, h, w, c = x.shape
        y = LayerNorm(name=name + "pre_ln")(x)
        dw, fft = jnp.split(y, 2, axis=-1)
        dw = self._dw(dw, 3, name, use_bias=False)

        f = jnp.fft.rfft2(fft.astype(jnp.float32), axes=(1, 2))
        f_re, f_im = ComplexDense(name=name + "complex_dense")(jnp.real(f), jnp.imag(f))
        f = jnp.fft.irfft2(f_re + 1j * f_im, s=(h, w), axes=(1, 2)).astype(x.dtype)

        # channel interleave (hornet.py:77-79)
        out = jnp.stack([dw, f], axis=-1).reshape(-1, h, w, c)
        return LayerNorm(name=name + "post_ln")(out)

    def _gnconv(self, x, use_gf, gn_split, scale, name, training):
        cfg = self.cfg
        c = x.shape[-1]
        y = nn.Conv(c * 2, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "pre_conv")(x)
        split_dims = [c // (2**i) for i in range(gn_split)][::-1]
        pw_first, dw_list = jnp.split(y, [split_dims[0]], axis=-1)

        if use_gf:
            dw_list = self._global_local_filter(dw_list, name + "gf_")
        else:
            dw_list = self._dw(dw_list, 7, name + "list_", use_bias=True)
        dw_list = dw_list * scale

        import numpy as np

        splits = jnp.split(dw_list, np.cumsum(split_dims)[:-1].tolist(), axis=-1)
        y = pw_first * splits[0]
        for i, dw in enumerate(splits[1:], start=1):
            pw = nn.Conv(dw.shape[-1], (1, 1), use_bias=True, dtype=cfg.dtype, name=name + f"pw{i}_conv")(y)
            y = pw * dw
        return nn.Conv(c, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "output_conv")(y)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        x = nn.Conv(
            cfg.embed_dim, (4, 4), strides=(cfg.first_strides * 2,) * 2, padding="VALID",
            use_bias=True, dtype=cfg.dtype, name="stem_conv",
        )(x)
        x = LayerNorm(name="stem_ln")(x)

        total = sum(cfg.num_blocks)
        gid = 0
        for sid, nb in enumerate(cfg.num_blocks):
            sname = f"stack{sid + 1}_"
            if sid > 0:
                x = LayerNorm(name=sname + "ln")(x)
                x = nn.Conv(x.shape[-1] * 2, (2, 2), strides=(2, 2), padding="VALID",
                            use_bias=True, dtype=cfg.dtype, name=sname + "conv")(x)
            use_gf = (
                cfg.use_global_local_filter[sid]
                if isinstance(cfg.use_global_local_filter, (list, tuple))
                else cfg.use_global_local_filter
            )
            gn_split = cfg.gn_split[sid] if isinstance(cfg.gn_split, (list, tuple)) else cfg.gn_split
            for bid in range(nb):
                bname = sname + f"block{bid + 1}_"
                drop_rate = cfg.drop_connect_rate * gid / total
                attn = LayerNorm(name=bname + "attn_ln")(x)
                attn = self._gnconv(attn, use_gf, gn_split, cfg.scale, bname + "gnconv_", training)
                if cfg.layer_scale >= 0:
                    attn = ChannelAffine(use_bias=False, weight_init_value=cfg.layer_scale, name=bname + "1_gamma")(attn)
                attn = DropPath(drop_rate, name=bname + "attn_drop")(attn, training=training)
                x = x + attn
                mlp = LayerNorm(name=bname + "mlp_ln")(x)
                mlp = nn.Dense(int(x.shape[-1] * cfg.mlp_ratio), dtype=cfg.dtype, name=bname + "mlp_Dense_0")(mlp)
                mlp = apply_activation(mlp, cfg.activation)
                mlp = nn.Dense(x.shape[-1], dtype=cfg.dtype, name=bname + "mlp_Dense_1")(mlp)
                if cfg.layer_scale >= 0:
                    mlp = ChannelAffine(use_bias=False, weight_init_value=cfg.layer_scale, name=bname + "2_gamma")(mlp)
                mlp = DropPath(drop_rate, name=bname + "mlp_drop")(mlp, training=training)
                x = x + mlp
                gid += 1

        if features_only:
            return x
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)
        x = LayerNorm(name="pre_output_ln")(x)
        x = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="predictions")(x)
        if cfg.classifier_activation:
            x = apply_activation(x, cfg.classifier_activation)
        return x


def _hornet(name, embed_dim=64, gf=False, **kw):
    return HorNet, HorNetConfig(
        name=name,
        embed_dim=embed_dim,
        use_global_local_filter=(False, False, True, True) if gf else False,
        **kw,
    )


@register_model
def HorNetTiny():
    return _hornet("HorNetTiny")


@register_model
def HorNetTinyGF():
    return _hornet("HorNetTinyGF", gf=True)


@register_model
def HorNetSmall():
    return _hornet("HorNetSmall", embed_dim=96)


@register_model
def HorNetSmallGF():
    return _hornet("HorNetSmallGF", embed_dim=96, gf=True)


@register_model
def HorNetBase():
    return _hornet("HorNetBase", embed_dim=128)


@register_model
def HorNetBaseGF():
    return _hornet("HorNetBaseGF", embed_dim=128, gf=True)


@register_model
def HorNetLarge():
    return _hornet("HorNetLarge", embed_dim=192, nb_classes=21841)


@register_model
def HorNetLargeGF():
    return _hornet("HorNetLargeGF", embed_dim=192, gf=True, nb_classes=21841)
