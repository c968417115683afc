"""PiT — Pooling-based Vision Transformer (tfimm architectures/pit.py).

Architecture parity:
- conv patch embed (k=patch_size, stride=8) + NCHW-stored grid pos embed
  (:266-281, kept NCHW for weight-transfer fidelity) + cls (/dist) tokens
- 3 stages of ViT blocks (:230-243) joined by ConvHeadPooling (:147-189):
  grouped conv (k=stride+1, s=stride, groups=in_channels) on the spatial
  tokens + Dense on the cls tokens
- final LN over the special tokens only; distilled variants stack
  (head, head_dist) outputs (:380-387)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import LayerNorm
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model
from .vit import ViTBlock, ViTConfig

Dtype = Any


@dataclasses.dataclass(frozen=True)
class PiTConfig(ModelConfig):
    patch_size: int = 16
    stride: int = 8
    embed_dim: Tuple[int, ...] = (64, 128, 256)
    nb_blocks: Tuple[int, ...] = (2, 6, 4)
    nb_heads: Tuple[int, ...] = (2, 4, 8)
    mlp_ratio: float = 4.0
    distilled: bool = False
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    act_layer: str = "gelu"
    classifier_activation: Optional[str] = "softmax"
    input_size: Tuple[int, int] = (224, 224)
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD

    @property
    def nb_tokens(self) -> int:
        return 2 if self.distilled else 1

    @property
    def grid_size(self) -> Tuple[int, int]:
        h = (self.input_size[0] - self.patch_size) // self.stride + 1
        w = (self.input_size[1] - self.patch_size) // self.stride + 1
        return h, w


class _ConvHeadPooling(nn.Module):
    """pit.py:147-189."""

    nb_tokens: int
    in_channels: int
    out_channels: int
    stride: int = 2
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, input_size):
        b, _, c = x.shape
        tokens, spatial = x[:, : self.nb_tokens], x[:, self.nb_tokens :]
        spatial = spatial.reshape(b, input_size[0], input_size[1], c)
        p = self.stride // 2
        spatial = jnp.pad(spatial, ((0, 0), (p, p), (p, p), (0, 0)))
        spatial = nn.Conv(self.out_channels, (self.stride + 1, self.stride + 1),
                          strides=(self.stride, self.stride), padding="VALID",
                          feature_group_count=self.in_channels, dtype=self.dtype,
                          name="conv")(spatial)
        tokens = nn.Dense(self.out_channels, dtype=self.dtype, name="fc")(tokens)
        out_size = (spatial.shape[1], spatial.shape[2])
        spatial = spatial.reshape(b, -1, self.out_channels)
        return jnp.concatenate([tokens, spatial], axis=1), out_size


class _PiTStage(nn.Module):
    """Named 'transformers_{j}' so block paths match the tfimm h5 layout."""

    cfg: PiTConfig
    stage: int
    dpr: Tuple[float, ...]

    @nn.compact
    def __call__(self, x, input_size, training: bool = False):
        cfg = self.cfg
        j = self.stage
        block_cfg = ViTConfig(
            name="", embed_dim=cfg.embed_dim[j], nb_heads=cfg.nb_heads[j],
            mlp_ratio=cfg.mlp_ratio, qkv_bias=True, norm_eps=cfg.norm_eps,
            act_layer=cfg.act_layer, drop_rate=cfg.drop_rate, dtype=cfg.dtype,
        )
        for k in range(cfg.nb_blocks[j]):
            x = ViTBlock(block_cfg, drop_path_rate=self.dpr[k], name=f"blocks_{k}")(
                x, training=training
            )
        if j < len(cfg.nb_blocks) - 1:
            x, input_size = _ConvHeadPooling(
                cfg.nb_tokens, cfg.embed_dim[j], cfg.embed_dim[j + 1],
                dtype=cfg.dtype, name="pool",
            )(x, input_size)
        return x, input_size


class PiT(nn.Module):
    cfg: PiTConfig

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        b = x.shape[0]
        x = preprocess_input(x, cfg)
        x = nn.Conv(cfg.embed_dim[0], (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.stride, cfg.stride), padding="VALID",
                    dtype=cfg.dtype, name="patch_embed_conv")(x)
        gh, gw = x.shape[1], x.shape[2]
        # NCHW layout kept for timm weight-transfer fidelity (pit.py:268-276)
        pos_embed = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                               (1, cfg.embed_dim[0], gh, gw), jnp.float32)
        x = x + jnp.transpose(pos_embed, (0, 2, 3, 1)).astype(x.dtype)
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)

        cls_token = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                               (1, cfg.nb_tokens, cfg.embed_dim[0]), jnp.float32)
        tokens = jnp.broadcast_to(cls_token.astype(x.dtype), (b, cfg.nb_tokens, cfg.embed_dim[0]))
        x = jnp.concatenate([tokens, x.reshape(b, gh * gw, cfg.embed_dim[0])], axis=1)

        import numpy as np

        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.nb_blocks))
        dpr = np.split(dpr, np.cumsum(cfg.nb_blocks))
        size = (gh, gw)
        for j in range(len(cfg.nb_blocks)):
            x, size = _PiTStage(cfg, j, tuple(dpr[j]), name=f"transformers_{j}")(
                x, size, training=training
            )

        x = x[:, : cfg.nb_tokens]
        x = LayerNorm(epsilon=cfg.norm_eps, name="norm")(x)
        if features_only:
            return x
        if cfg.nb_classes <= 0:
            return x if cfg.distilled else x[:, 0]
        from ..ops import apply_activation

        if cfg.distilled:
            y = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head")(x[:, 0].astype(jnp.float32))
            y_dist = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head_dist")(x[:, 1].astype(jnp.float32))
            out = jnp.stack([y, y_dist], axis=1)
            if cfg.classifier_activation:
                out = apply_activation(out, cfg.classifier_activation)
            return out
        out = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head")(x[:, 0].astype(jnp.float32))
        if cfg.classifier_activation:
            out = apply_activation(out, cfg.classifier_activation)
        return out


def _pit(name, embed_dim, nb_blocks, nb_heads, distilled=False):
    return PiT, PiTConfig(
        name=name, embed_dim=embed_dim, nb_blocks=nb_blocks, nb_heads=nb_heads,
        distilled=distilled,
    )


@register_model
def pit_ti_224():
    return _pit("pit_ti_224", (64, 128, 256), (2, 6, 4), (2, 4, 8))


@register_model
def pit_xs_224():
    return _pit("pit_xs_224", (96, 192, 384), (2, 6, 4), (2, 4, 8))


@register_model
def pit_s_224():
    return _pit("pit_s_224", (144, 288, 576), (2, 6, 4), (3, 6, 12))


@register_model
def pit_b_224():
    return _pit("pit_b_224", (256, 512, 1024), (3, 6, 4), (4, 8, 16))


@register_model
def pit_ti_distilled_224():
    return _pit("pit_ti_distilled_224", (64, 128, 256), (2, 6, 4), (2, 4, 8), distilled=True)


@register_model
def pit_xs_distilled_224():
    return _pit("pit_xs_distilled_224", (96, 192, 384), (2, 6, 4), (2, 4, 8), distilled=True)


@register_model
def pit_s_distilled_224():
    return _pit("pit_s_distilled_224", (144, 288, 576), (2, 6, 4), (3, 6, 12), distilled=True)


@register_model
def pit_b_distilled_224():
    return _pit("pit_b_distilled_224", (256, 512, 1024), (3, 6, 4), (4, 8, 16), distilled=True)
