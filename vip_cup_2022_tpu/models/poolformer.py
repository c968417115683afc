"""PoolFormer + ConvMixer (tfimm architectures/poolformer.py, convmixer.py).

PoolFormer parity:
- block: GN(1 group) -> (avgpool3x3 - x) token mixer -> layer_scale ->
  residual; GN -> conv MLP -> layer_scale -> residual (:119-203)
- patch_embed conv7 s4 pad2; conv3 s2 pad1 downsamples named network/{2j+1}
  (:220-268); final GN -> GAP -> head (:291-350)
- sizes s12..m48 (:355-420)

ConvMixer parity (convmixer.py):
- stem convK sK + act + BN; blocks: dw conv (SAME) + act + BN residual, then
  1x1 + act + BN (:41-108); 768_32(relu) / 1024_20_ks9_p14 / 1536_20
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import BatchNorm, DropPath, GroupNorm, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class PoolFormerConfig(ModelConfig):
    embed_dim: Tuple[int, ...] = (64, 128, 320, 512)
    nb_blocks: Tuple[int, ...] = (2, 2, 6, 2)
    mlp_ratio: Tuple[float, ...] = (4.0, 4.0, 4.0, 4.0)
    drop_path_rate: float = 0.0
    act_layer: str = "gelu"
    init_scale: float = 1e-5
    crop_pct: float = 0.95
    classifier_activation: Optional[str] = "softmax"


class PoolFormer(nn.Module):
    cfg: PoolFormerConfig

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        x = nn.Conv(cfg.embed_dim[0], (7, 7), strides=(4, 4), padding="VALID",
                    use_bias=True, dtype=cfg.dtype, name="patch_embed_proj")(x)

        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.nb_blocks))
        pos = 0
        for j, nb in enumerate(cfg.nb_blocks):
            for k in range(nb):
                name = f"network_{2 * j}_{k}_"
                c = cfg.embed_dim[j]
                shortcut = x
                y = GroupNorm(groups=1, epsilon=1e-5, name=name + "norm1")(x)
                y = nn.avg_pool(y, (3, 3), strides=(1, 1), padding="SAME", count_include_pad=False) - y
                ls1 = self.param(name + "layer_scale_1", nn.initializers.constant(cfg.init_scale), (c,), jnp.float32)
                y = y * ls1.astype(y.dtype)
                y = DropPath(float(dpr[pos]), name=name + "drop1")(y, training=training)
                x = shortcut + y
                shortcut = x
                y = GroupNorm(groups=1, epsilon=1e-5, name=name + "norm2")(x)
                y = nn.Conv(int(c * cfg.mlp_ratio[j]), (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "mlp_fc1")(y)
                y = apply_activation(y, cfg.act_layer)
                y = nn.Conv(c, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "mlp_fc2")(y)
                ls2 = self.param(name + "layer_scale_2", nn.initializers.constant(cfg.init_scale), (c,), jnp.float32)
                y = y * ls2.astype(y.dtype)
                y = DropPath(float(dpr[pos]), name=name + "drop2")(y, training=training)
                x = shortcut + y
                pos += 1
            if j < len(cfg.nb_blocks) - 1:
                x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
                x = nn.Conv(cfg.embed_dim[j + 1], (3, 3), strides=(2, 2), padding="VALID",
                            use_bias=True, dtype=cfg.dtype, name=f"network_{2 * j + 1}_proj")(x)

        x = GroupNorm(groups=1, epsilon=1e-5, name="norm")(x)
        if features_only:
            return x
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head")(x)
        if cfg.classifier_activation:
            x = apply_activation(x, cfg.classifier_activation)
        return x


def _pf(name, nb, dims=(64, 128, 320, 512), init_scale=1e-5):
    return PoolFormer, PoolFormerConfig(name=name, nb_blocks=nb, embed_dim=dims, init_scale=init_scale)


@register_model
def poolformer_s12():
    return _pf("poolformer_s12", (2, 2, 6, 2))


@register_model
def poolformer_s24():
    return _pf("poolformer_s24", (4, 4, 12, 4))


@register_model
def poolformer_s36():
    return _pf("poolformer_s36", (6, 6, 18, 6), init_scale=1e-6)


@register_model
def poolformer_m36():
    return _pf("poolformer_m36", (6, 6, 18, 6), (96, 192, 384, 768), init_scale=1e-6)


@register_model
def poolformer_m48():
    return _pf("poolformer_m48", (8, 8, 24, 8), (96, 192, 384, 768), init_scale=1e-6)


# ---------------------------------------------------------------------------
# ConvMixer
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConvMixerConfig(ModelConfig):
    embed_dim: int = 768
    depth: int = 32
    patch_size: int = 7
    kernel_size: int = 7
    act_layer: str = "relu"
    classifier_activation: Optional[str] = "softmax"


class ConvMixer(nn.Module):
    cfg: ConvMixerConfig

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size,) * 2, strides=(cfg.patch_size,) * 2,
                    padding="VALID", use_bias=True, dtype=cfg.dtype, name="stem_0")(x)
        x = apply_activation(x, cfg.act_layer)
        x = BatchNorm(momentum=0.9, epsilon=1e-5, dtype=cfg.dtype, name="stem_2")(x, training=training)

        for j in range(cfg.depth):
            name = f"blocks_{j}_"
            shortcut = x
            y = nn.Conv(cfg.embed_dim, (cfg.kernel_size,) * 2, padding="SAME",
                        feature_group_count=cfg.embed_dim, use_bias=True,
                        dtype=cfg.dtype, name=name + "0_fn_0")(x)
            y = apply_activation(y, cfg.act_layer)
            y = BatchNorm(momentum=0.9, epsilon=1e-5, dtype=cfg.dtype, name=name + "0_fn_2")(y, training=training)
            x = shortcut + y
            x = nn.Conv(cfg.embed_dim, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "1")(x)
            x = apply_activation(x, cfg.act_layer)
            x = BatchNorm(momentum=0.9, epsilon=1e-5, dtype=cfg.dtype, name=name + "3")(x, training=training)

        if features_only:
            return x
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head")(x)
        if cfg.classifier_activation:
            x = apply_activation(x, cfg.classifier_activation)
        return x


@register_model
def convmixer_768_32():
    return ConvMixer, ConvMixerConfig(name="convmixer_768_32", mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))


@register_model
def convmixer_1024_20_ks9_p14():
    return ConvMixer, ConvMixerConfig(
        name="convmixer_1024_20_ks9_p14", embed_dim=1024, depth=20,
        patch_size=14, kernel_size=9, act_layer="gelu",
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
    )


@register_model
def convmixer_1536_20():
    return ConvMixer, ConvMixerConfig(
        name="convmixer_1536_20", embed_dim=1536, depth=20, patch_size=7,
        kernel_size=9, act_layer="gelu", mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
    )
