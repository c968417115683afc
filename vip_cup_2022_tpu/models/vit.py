"""ViT / DeiT family.

Architecture parity with reference models/tfimm/architectures/vit.py:
- fused-qkv MHSA (:121-168), pre-norm blocks (:170-241)
- patch embeddings + cls/dist tokens + learned pos_embed (:300-392)
- representation layer (pre_logits tanh) for in21k SAM/vit models (:342-352)
- distilled DeiT twin heads, averaged at inference (:445-465)
- pos-embed interpolation hook for size transfer (layers/transformers.py:13-77
  -> ops/resize.resize_positional_embedding)
- variant registry (:471-1147): vit tiny..huge x patch 8/16/32 x 224/384,
  in21k (21843 classes), SAM, MIIL, DeiT (+distilled)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import DropPath, LayerNorm, apply_activation
from ..ops.attention import MultiHeadSelfAttention
from ..ops.mlp import Mlp
from .base import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    IMAGENET_INCEPTION_MEAN,
    IMAGENET_INCEPTION_STD,
    ModelConfig,
    preprocess_input,
)
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ViTConfig(ModelConfig):
    patch_size: int = 16
    patch_nb_blocks: Any = None  # not None -> hybrid_embeddings (vit.py:104-110,:230-287)
    embed_dim: int = 768
    nb_blocks: int = 12
    nb_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    representation_size: Optional[int] = None
    distilled: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    act_layer: str = "gelu"
    crop_pct: float = 0.875
    mean: Tuple[float, ...] = IMAGENET_INCEPTION_MEAN
    std: Tuple[float, ...] = IMAGENET_INCEPTION_STD
    classifier_activation: Optional[str] = "softmax"

    @property
    def nb_tokens(self) -> int:
        return 2 if self.distilled else 1

    @property
    def grid_size(self) -> Tuple[int, int]:
        gh = self.input_size[0] // self.patch_size
        gw = self.input_size[1] // self.patch_size
        if self.patch_nb_blocks is not None:
            # 2 stem reductions + 1 per stage except the first (vit.py:104-110)
            stride = 2 ** (2 + max(len(self.patch_nb_blocks) - 1, 0))
            gh, gw = gh // stride, gw // stride
        return gh, gw

    @property
    def nb_patches(self) -> int:
        return self.grid_size[0] * self.grid_size[1]


class ViTBlock(nn.Module):
    cfg: ViTConfig
    drop_path_rate: float

    @nn.compact
    def __call__(self, x, training: bool = False):
        cfg = self.cfg
        shortcut = x
        y = LayerNorm(epsilon=cfg.norm_eps, name="norm1")(x)
        y = MultiHeadSelfAttention(
            num_heads=cfg.nb_heads,
            qkv_bias=cfg.qkv_bias,
            attn_drop=cfg.attn_drop_rate,
            proj_drop=cfg.drop_rate,
            dtype=cfg.dtype,
            name="attn",
        )(y, training=training)
        x = shortcut + DropPath(self.drop_path_rate, name="drop_path1")(y, training=training)
        y = LayerNorm(epsilon=cfg.norm_eps, name="norm2")(x)
        y = Mlp(
            hidden_features=int(cfg.embed_dim * cfg.mlp_ratio),
            activation=cfg.act_layer,
            drop_rate=cfg.drop_rate,
            dtype=cfg.dtype,
            name="mlp",
        )(y, training=training)
        return x + DropPath(self.drop_path_rate, name="drop_path2")(y, training=training)


class ViT(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        b = x.shape[0]
        x = preprocess_input(x, cfg)
        if cfg.patch_nb_blocks is not None:
            # HybridEmbeddings (vit.py:230-287): ResNetV2 backbone features
            from .resnetv2 import ResNetV2, ResNetV2Config, _Stem

            if len(cfg.patch_nb_blocks) == 0:
                bcfg = ResNetV2Config(name="", stem_type="same", conv_padding="same",
                                      preact=False, stem_width=64, dtype=cfg.dtype)
                x = _Stem(bcfg, name="patch_embed_backbone")(x)
            else:
                bcfg = ResNetV2Config(
                    name="", nb_classes=0, nb_blocks=tuple(cfg.patch_nb_blocks),
                    preact=False, stem_type="same", conv_padding="same",
                    mean=None, std=None, dtype=cfg.dtype,
                )
                x = ResNetV2(bcfg, name="patch_embed_backbone")(x, features_only=True)
        x = nn.Conv(
            cfg.embed_dim,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=cfg.dtype,
            name="patch_embed_proj",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, cfg.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim), jnp.float32)
        tokens = [jnp.broadcast_to(cls_token, (b, 1, cfg.embed_dim)).astype(x.dtype)]
        if cfg.distilled:
            dist_token = self.param("dist_token", nn.initializers.zeros, (1, 1, cfg.embed_dim), jnp.float32)
            tokens.append(jnp.broadcast_to(dist_token, (b, 1, cfg.embed_dim)).astype(x.dtype))
        x = jnp.concatenate(tokens + [x], axis=1)

        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.nb_patches + cfg.nb_tokens, cfg.embed_dim),
            jnp.float32,
        )
        x = x + pos_embed.astype(x.dtype)
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)

        for j in range(cfg.nb_blocks):
            x = ViTBlock(cfg, drop_path_rate=cfg.drop_path_rate, name=f"blocks_{j}")(
                x, training=training
            )
        x = LayerNorm(epsilon=cfg.norm_eps, name="norm")(x)
        if features_only:
            return x

        if cfg.distilled:
            cls_feat, dist_feat = x[:, 0], x[:, 1]
            if cfg.nb_classes <= 0:
                return (cls_feat + dist_feat) / 2.0
            y1 = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head")(cls_feat)
            y2 = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head_dist")(dist_feat)
            y = (y1 + y2) / 2.0  # inference-mode average (vit.py:445-465)
        else:
            feat = x[:, 0]
            if cfg.representation_size:
                feat = nn.Dense(cfg.representation_size, dtype=cfg.dtype, name="pre_logits_fc")(feat)
                feat = jnp.tanh(feat)
            if cfg.nb_classes <= 0:
                return feat
            y = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head")(feat)
        if cfg.classifier_activation:
            y = apply_activation(y, cfg.classifier_activation)
        return y


_SIZES = {
    "tiny": (192, 12, 3),
    "small": (384, 12, 6),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
    "huge": (1280, 32, 16),
}


def _vit(name, size, patch, input_size=(224, 224), **kw):
    d, depth, heads = _SIZES[size]
    cfg = ViTConfig(
        name=name, patch_size=patch, embed_dim=d, nb_blocks=depth, nb_heads=heads,
        input_size=input_size, **kw,
    )
    return ViT, cfg


def _register_vit_variants():
    specs = []
    for size in ("tiny", "small", "base", "large"):
        for patch in (8, 16, 32):
            if (size, patch) in (("tiny", 8), ("tiny", 32), ("large", 8)):
                continue
            specs.append((f"vit_{size}_patch{patch}_224", size, patch, (224, 224), {}))
            if patch != 8:
                specs.append(
                    (f"vit_{size}_patch{patch}_384", size, patch, (384, 384), {"crop_pct": 1.0})
                )
    # in21k variants (21843 classes, representation layer)
    for size, patch in [("tiny", 16), ("small", 32), ("small", 16), ("base", 32),
                        ("base", 16), ("base", 8), ("large", 32), ("large", 16),
                        ("huge", 14)]:
        d, depth, heads = _SIZES[size]
        specs.append(
            (
                f"vit_{size}_patch{patch}_224_in21k", size, patch, (224, 224),
                {"nb_classes": 21843, "representation_size": d},
            )
        )
    # SAM-pretrained
    specs.append(("vit_base_patch32_sam_224", "base", 32, (224, 224), {}))
    specs.append(("vit_base_patch16_sam_224", "base", 16, (224, 224), {}))
    # MIIL
    specs.append(("vit_base_patch16_224_miil_in21k", "base", 16, (224, 224),
                  {"nb_classes": 11221, "mean": (0, 0, 0), "std": (1, 1, 1)}))
    specs.append(("vit_base_patch16_224_miil", "base", 16, (224, 224),
                  {"mean": (0, 0, 0), "std": (1, 1, 1)}))
    # DeiT (imagenet mean/std)
    for size in ("tiny", "small", "base"):
        specs.append((f"deit_{size}_patch16_224", size, 16, (224, 224),
                      {"mean": IMAGENET_DEFAULT_MEAN, "std": IMAGENET_DEFAULT_STD}))
        specs.append((f"deit_{size}_distilled_patch16_224", size, 16, (224, 224),
                      {"distilled": True, "mean": IMAGENET_DEFAULT_MEAN, "std": IMAGENET_DEFAULT_STD}))
    specs.append(("deit_base_patch16_384", "base", 16, (384, 384),
                  {"crop_pct": 1.0, "mean": IMAGENET_DEFAULT_MEAN, "std": IMAGENET_DEFAULT_STD}))
    specs.append(("deit_base_distilled_patch16_384", "base", 16, (384, 384),
                  {"distilled": True, "crop_pct": 1.0, "mean": IMAGENET_DEFAULT_MEAN,
                   "std": IMAGENET_DEFAULT_STD}))

    for name, size, patch, input_size, kw in specs:
        def make(name=name, size=size, patch=patch, input_size=input_size, kw=kw):
            return _vit(name, size, patch, input_size, **kw)

        make.__name__ = name
        register_model(make)


_register_vit_variants()


# --- ViT-hybrid variants (tfimm architectures/vit_hybrid.py) ---


def _vit_hybrid(name, patch_nb_blocks, patch_size, embed_dim, nb_blocks, nb_heads,
                input_size=(224, 224), nb_classes=1000, representation_size=None):
    return ViT, ViTConfig(
        name=name, patch_nb_blocks=patch_nb_blocks, patch_size=patch_size,
        embed_dim=embed_dim, nb_blocks=nb_blocks, nb_heads=nb_heads,
        input_size=input_size, nb_classes=nb_classes,
        representation_size=representation_size,
        mean=IMAGENET_INCEPTION_MEAN, std=IMAGENET_INCEPTION_STD,
    )


@register_model
def vit_tiny_r_s16_p8_224():
    return _vit_hybrid("vit_tiny_r_s16_p8_224", (), 8, 192, 12, 3)


@register_model
def vit_tiny_r_s16_p8_384():
    return _vit_hybrid("vit_tiny_r_s16_p8_384", (), 8, 192, 12, 3, (384, 384))


@register_model
def vit_small_r26_s32_224():
    return _vit_hybrid("vit_small_r26_s32_224", (2, 2, 2, 2), 1, 384, 12, 6)


@register_model
def vit_small_r26_s32_384():
    return _vit_hybrid("vit_small_r26_s32_384", (2, 2, 2, 2), 1, 384, 12, 6, (384, 384))


@register_model
def vit_base_r50_s16_384():
    return _vit_hybrid("vit_base_r50_s16_384", (3, 4, 9), 1, 768, 12, 12, (384, 384))


@register_model
def vit_large_r50_s32_224():
    return _vit_hybrid("vit_large_r50_s32_224", (3, 4, 6, 3), 1, 1024, 24, 16)


@register_model
def vit_large_r50_s32_384():
    return _vit_hybrid("vit_large_r50_s32_384", (3, 4, 6, 3), 1, 1024, 24, 16, (384, 384))
