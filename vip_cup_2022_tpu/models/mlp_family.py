"""MLP family: MLP-Mixer, ResMLP, gMLP.

Architecture parity with reference keras_cv_attention_models/mlp_family/:
- mlp_mixer.py: mixer_block = LN -> token-permute MLP -> LN -> channel MLP
  (:41-55), Dense_0/Dense_1 names, SAME-padded stem conv, 'tf' rescale
- res_mlp.py: ChannelAffine norms + gamma layer-scales, token Dense mixing
  (:57-76)
- gated_mlp.py: spatial gating unit with LN + ones-bias token Dense (:19-44)
- size tables s32..h14 / 12-36 / tiny16-b16

(kecam's wave_mlp is tracked for a later round.)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import ChannelAffine, DropPath, LayerNorm, apply_activation
from .base import ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any

from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD  # noqa: E402

TF_MEAN = (128 / 255,) * 3  # 'tf' rescale: x*255/128 - 1
TF_STD = (128 / 255,) * 3


@dataclasses.dataclass(frozen=True)
class MlpFamilyConfig(ModelConfig):
    kind: str = "mixer"  # mixer | resmlp | gmlp
    num_blocks: int = 8
    patch_size: int = 32
    stem_width: int = 512
    tokens_mlp_dim: int = 256
    channels_mlp_dim: int = 2048
    activation: str = "gelu"
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    mean: Optional[Tuple[float, ...]] = TF_MEAN
    std: Optional[Tuple[float, ...]] = TF_STD


class _Affine(nn.Module):
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        y = x * w.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            y = y + b.astype(x.dtype)
        return y


class MlpFamily(nn.Module):
    cfg: MlpFamilyConfig

    def _dense(self, x, units, name, **kw):
        return nn.Dense(units, dtype=self.cfg.dtype, name=name, **kw)(x)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        pad = "SAME" if cfg.kind == "mixer" else "VALID"
        x = nn.Conv(
            cfg.stem_width, (cfg.patch_size,) * 2, strides=(cfg.patch_size,) * 2,
            padding=pad, dtype=cfg.dtype, name="stem",
        )(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)

        for i in range(cfg.num_blocks):
            rate = cfg.drop_connect_rate * i / cfg.num_blocks
            if cfg.kind == "mixer":
                name = f"MixerBlock_{i}_"
                y = LayerNorm(epsilon=1e-5, name=name + "LayerNorm_0")(x)
                y = jnp.swapaxes(y, 1, 2)
                y = self._dense(y, cfg.tokens_mlp_dim, name + "token_mixing_Dense_0")
                y = apply_activation(y, cfg.activation)
                y = self._dense(y, x.shape[1], name + "token_mixing_Dense_1")
                y = jnp.swapaxes(y, 1, 2)
                x = x + DropPath(rate, name=name + "token_drop")(y, training=training)
                y = LayerNorm(epsilon=1e-5, name=name + "LayerNorm_1")(x)
                y = self._dense(y, cfg.channels_mlp_dim, name + "channel_mixing_Dense_0")
                y = apply_activation(y, cfg.activation)
                y = self._dense(y, c, name + "channel_mixing_Dense_1")
                x = x + DropPath(rate, name=name + "channel_drop")(y, training=training)
            elif cfg.kind == "resmlp":
                name = f"ResMlpBlock_{i + 1}_"
                y = _Affine(use_bias=True, name=name + "norm_1")(x)
                y = jnp.swapaxes(y, 1, 2)
                y = self._dense(y, y.shape[-1], name + "token_mixing")
                y = jnp.swapaxes(y, 1, 2)
                y = _Affine(use_bias=False, name=name + "gamma_1")(y)
                x = x + DropPath(rate, name=name + "token_drop")(y, training=training)
                y = _Affine(use_bias=True, name=name + "norm_2")(x)
                y = self._dense(y, cfg.channels_mlp_dim, name + "channel_mixing_1")
                y = apply_activation(y, cfg.activation)
                y = self._dense(y, c, name + "channel_mixing_2")
                y = _Affine(use_bias=False, name=name + "gamma_2")(y)
                x = x + DropPath(rate, name=name + "channel_drop")(y, training=training)
            else:  # gmlp
                name = f"gmlp_{i + 1}_"
                y = LayerNorm(epsilon=1e-5, name=name + "pre_ln")(x)
                y = self._dense(y, cfg.channels_mlp_dim, name + "pre_dense")
                y = apply_activation(y, cfg.activation)
                uu, vv = jnp.split(y, 2, axis=-1)
                vv = LayerNorm(epsilon=1e-5, name=name + "vv_ln")(vv)
                vv = jnp.swapaxes(vv, 1, 2)
                vv = nn.Dense(
                    vv.shape[-1],
                    kernel_init=nn.initializers.truncated_normal(1e-6),
                    bias_init=nn.initializers.ones,
                    dtype=cfg.dtype,
                    name=name + "vv_dense",
                )(vv)
                vv = jnp.swapaxes(vv, 1, 2)
                y = self._dense(uu * vv, c, name + "gated_dense")
                x = x + DropPath(rate, name=name + "drop")(y, training=training)

        if cfg.kind == "mixer":
            x = LayerNorm(epsilon=1e-5, name="pre_head_layer_norm")(x)
        elif cfg.kind == "resmlp":
            x = _Affine(use_bias=True, name="pre_head_norm")(x)
        else:
            x = LayerNorm(epsilon=1e-5, name="pre_head_norm")(x)

        if features_only:
            return x
        x = jnp.mean(x.astype(jnp.float32), axis=1)
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)
        head_name = "head" if cfg.kind == "mixer" else "predictions"
        x = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name=head_name)(x)
        if cfg.classifier_activation:
            x = apply_activation(x, cfg.classifier_activation)
        return x


_MIXER = {
    "s32": (8, 32, 512, 256, 2048),
    "s16": (8, 16, 512, 256, 2048),
    "b32": (12, 32, 768, 384, 3072),
    "b16": (12, 16, 768, 384, 3072),
    "l32": (24, 32, 1024, 512, 4096),
    "l16": (24, 16, 1024, 512, 4096),
    "h14": (32, 14, 1280, 640, 5120),
}


def _mixer(name, key):
    nb, ps, sw, tok, ch = _MIXER[key]
    return MlpFamily, MlpFamilyConfig(
        name=name, kind="mixer", num_blocks=nb, patch_size=ps, stem_width=sw,
        tokens_mlp_dim=tok, channels_mlp_dim=ch,
    )


for _key in _MIXER:
    def _f(key=_key):
        return _mixer(f"MLPMixer{key.upper()}", key)

    _f.__name__ = f"MLPMixer{_key.upper()}"
    register_model(_f)


def _resmlp(name, nb, sw=384, patch=16):
    return MlpFamily, MlpFamilyConfig(
        name=name, kind="resmlp", num_blocks=nb, patch_size=patch, stem_width=sw,
        channels_mlp_dim=sw * 4,
    )


@register_model
def ResMLP12():
    return _resmlp("ResMLP12", 12)


@register_model
def ResMLP24():
    return _resmlp("ResMLP24", 24)


@register_model
def ResMLP36():
    return _resmlp("ResMLP36", 36)


@register_model
def ResMLP_B24():
    return _resmlp("ResMLP_B24", 24, sw=768, patch=8)


def _gmlp(name, sw):
    return MlpFamily, MlpFamilyConfig(
        name=name, kind="gmlp", num_blocks=30, patch_size=16, stem_width=sw,
        channels_mlp_dim=sw * 6,
    )


@register_model
def GMLPTiny16():
    return _gmlp("GMLPTiny16", 128)


@register_model
def GMLPS16():
    return _gmlp("GMLPS16", 256)


@register_model
def GMLPB16():
    return _gmlp("GMLPB16", 512)


# ---------------------------------------------------------------------------
# WaveMLP (kecam mlp_family/wave_mlp.py): phase-aware token mixing
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class WaveMLPConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (2, 2, 4, 2)
    out_channels: Tuple[int, ...] = (64, 128, 320, 512)
    mlp_ratios: Tuple[int, ...] = (4, 4, 4, 4)
    use_group_norm: bool = False
    qkv_bias: bool = False
    activation: str = "gelu"
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"


class WaveMLP(nn.Module):
    cfg: WaveMLPConfig

    def _norm(self, x, name, training):
        from ..ops import BatchNorm, GroupNorm

        if self.cfg.use_group_norm:
            return GroupNorm(groups=1, epsilon=1e-5, name=name + "group_norm")(x)
        return BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.cfg.dtype, name=name + "bn")(x, training=training)

    def _conv(self, x, f, k, s, name, use_bias=False, groups=1):
        kh, kw = (k, k) if isinstance(k, int) else k
        if kh > 1 or kw > 1:
            x = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
        return nn.Conv(f, (kh, kw), strides=(s, s), padding="VALID", use_bias=use_bias,
                       feature_group_count=groups, dtype=self.cfg.dtype, name=name + "conv")(x)

    def _token_mixing(self, x, name, training):
        """phase_aware_token_mixing (wave_mlp.py:37-76)."""
        cfg = self.cfg
        c = x.shape[-1]
        th = self._conv(x, c, 1, 1, name + "theta_h_", use_bias=True)
        th = self._norm(th, name + "theta_h_", training)
        th = apply_activation(th, "relu")
        h = self._conv(x, c, 1, 1, name + "height_", use_bias=cfg.qkv_bias)
        h = jnp.concatenate([h * jnp.cos(th), h * jnp.sin(th)], axis=-1)
        h = self._conv(h, c, (1, 7), 1, name + "height_down_", groups=c)

        tw = self._conv(x, c, 1, 1, name + "theta_w_", use_bias=True)
        tw = self._norm(tw, name + "theta_w_", training)
        tw = apply_activation(tw, "relu")
        w = self._conv(x, c, 1, 1, name + "width_", use_bias=cfg.qkv_bias)
        w = jnp.concatenate([w * jnp.cos(tw), w * jnp.sin(tw)], axis=-1)
        w = self._conv(w, c, (7, 1), 1, name + "width_down_", groups=c)

        ch = self._conv(x, c, 1, 1, name + "channel_", use_bias=cfg.qkv_bias)

        combined = h + w + ch
        a = jnp.mean(combined.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        a = nn.Conv(c // 4, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "reweight_Conv_0")(a)
        a = apply_activation(a, cfg.activation)
        a = nn.Conv(c * 3, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "reweight_Conv_1")(a)
        a = a.reshape(a.shape[0], 1, 1, c, 3)
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = h * a[..., 0] + w * a[..., 1] + ch * a[..., 2]
        return self._conv(attn, c, 1, 1, name + "out_", use_bias=True)

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        x = nn.Conv(cfg.out_channels[0], (7, 7), strides=(4, 4), padding="VALID",
                    use_bias=True, dtype=cfg.dtype, name="stem_conv")(x)
        x = self._norm(x, "stem_", training)

        total = sum(cfg.num_blocks)
        gid = 0
        for sid, (nb, out_c, ratio) in enumerate(zip(cfg.num_blocks, cfg.out_channels, cfg.mlp_ratios)):
            sname = f"stack{sid + 1}_"
            if sid > 0:
                x = self._conv(x, out_c, 3, 2, sname + "down_sample_", use_bias=True)
                x = self._norm(x, sname + "down_sample_", training)
            for bid in range(nb):
                name = sname + f"block{bid + 1}_"
                rate = cfg.drop_connect_rate * gid / total
                gid += 1
                attn = self._norm(x, name + "attn_", training)
                attn = self._token_mixing(attn, name + "attn_", training)
                attn = DropPath(rate, name=name + "attn_drop")(attn, training=training)
                x = x + attn
                mlp = self._norm(x, name + "mlp_", training)
                mlp = nn.Conv(int(out_c * ratio), (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "mlp_Conv_0")(mlp)
                mlp = apply_activation(mlp, cfg.activation)
                mlp = nn.Conv(out_c, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "mlp_Conv_1")(mlp)
                mlp = DropPath(rate, name=name + "mlp_drop")(mlp, training=training)
                x = x + mlp

        if features_only:
            return x
        x = self._norm(x, "output_", training)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)
        x = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="predictions")(x)
        if cfg.classifier_activation:
            x = apply_activation(x, cfg.classifier_activation)
        return x


@register_model
def WaveMLP_T():
    return WaveMLP, WaveMLPConfig(name="WaveMLP_T")


@register_model
def WaveMLP_S():
    return WaveMLP, WaveMLPConfig(
        name="WaveMLP_S", num_blocks=(2, 3, 10, 3), use_group_norm=True,
    )


@register_model
def WaveMLP_M():
    return WaveMLP, WaveMLPConfig(
        name="WaveMLP_M", num_blocks=(3, 4, 18, 3), use_group_norm=True,
    )
