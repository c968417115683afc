"""Swin Transformer V2 (NAME2BS-era family; kecam zoo).

Architecture parity with reference
keras_cv_attention_models/swin_transformer_v2/swin_transformer_v2.py:
- cosine window attention with per-head learnable exp logit scale capped at
  100 (ExpLogitScale :31-57) and bias-free qkv + separate q/v bias layers
  (:163-178)
- log-CPB relative position bias: pairwise log-spaced coords table -> 2-layer
  meta MLP (512 relu -> heads, no bias) -> gather -> sigmoid*16 (:60-110,
  :185-195)
- shifted windows with ceil-mode bottom/right padding, roll-by-concat, and the
  9-region attention mask (-100 additive) (:113-160, :216-262)
- post-norm blocks with zero-gamma LN after attn/mlp (:269-283)
- patch merging: 2x2 space-to-depth -> Dense(2C, no bias) -> LN (:286-295)
- variants tiny/small/base/large x window 8/12/16/24 (:350-420)

TPU notes: coords table, position index, and shift masks are numpy constants
at trace time; windows fold into the batch axis for batched MXU matmuls.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import DropPath, LayerNorm, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SwinV2Config(ModelConfig):
    num_blocks: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    embed_dim: int = 96
    window_size: int = 8
    pos_scale: Any = -1
    stem_patch_size: int = 4
    use_stack_norm: bool = False
    extra_norm_period: int = 0
    drop_connect_rate: float = 0.0
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD
    input_size: Tuple[int, int] = (256, 256)


def _log_coords_table(wh: int, ww: int, pos_scale) -> np.ndarray:
    """(2wh-1)*(2ww-1), 2) log-spaced relative coords (reference :80-97)."""
    hh, wwg = np.meshgrid(np.arange(-wh + 1, wh), np.arange(-ww + 1, ww), indexing="ij")
    coords = np.stack([hh, wwg], axis=-1).astype(np.float32)
    ps = [wh, ww] if pos_scale == -1 else (
        pos_scale if isinstance(pos_scale, (list, tuple)) else [pos_scale, pos_scale]
    )
    coords = coords * 8.0 / np.array([float(ps[0] - 1), float(ps[1] - 1)], np.float32)
    out = np.sign(coords) * np.log1p(np.abs(coords)) / (math.log(2.0) * 3.0)
    return out.reshape(-1, 2)


def _pairwise_index(wh: int, ww: int) -> np.ndarray:
    """(N, N) gather index into the coords table (reference :66-78; note the
    meshgrid here is xy-ordered like the reference)."""
    hh, wwg = np.meshgrid(np.arange(wh), np.arange(ww))  # xy order, parity quirk
    coords = np.stack([hh, wwg], axis=-1).reshape(-1, 2)
    rel = coords[:, None, :] - coords[None, :, :]
    rel_h = rel[:, :, 0] + wh - 1
    rel_w = (rel[:, :, 1] + ww - 1) * (2 * wh - 1)
    return (rel_h + rel_w).astype(np.int32)


def _shift_mask(h, w, wh, ww, sh, sw) -> np.ndarray:
    """(nW, N, N) additive attention mask (-100 across regions), :113-160."""
    hs = [0, h - wh, h - sh, h]
    ws = [0, w - ww, w - sw, w]
    ids = np.zeros((h, w), np.int32)
    v = 0
    for i in range(3):
        for j in range(3):
            ids[hs[i] : hs[i + 1], ws[j] : ws[j + 1]] = v
            v += 1
    ids = ids.reshape(h // wh, wh, w // ww, ww).transpose(0, 2, 1, 3).reshape(-1, wh * ww)
    mask = ids[:, None, :] - ids[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class _Bias(nn.Module):
    """kecam BiasLayer (weight name 'bias')."""

    @nn.compact
    def __call__(self, x):
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        return x + b.astype(x.dtype)


class _ExpLogitScale(nn.Module):
    """kecam ExpLogitScale (:31-57): per-head multiplicative exp scale."""

    num_heads: int
    max_value: float = 100.0

    @nn.compact
    def __call__(self, attn):
        w = self.param(
            "weight", nn.initializers.constant(math.log(10.0)),
            (1, self.num_heads, 1, 1), jnp.float32,
        )
        return attn * jnp.exp(jnp.minimum(w, math.log(self.max_value)))


class SwinV2(nn.Module):
    cfg: SwinV2Config

    def _window_attention(self, x, num_heads, pos_scale, mask, name, training):
        """window_mhsa_with_pair_wise_positional_embedding (:163-213).
        x: (B*nW, wh, ww, C); mask: (nW, N, N) or None."""
        cfg = self.cfg
        b_, wh, ww, c = x.shape
        key_dim = c // num_heads
        n = wh * ww

        qkv = nn.Dense(c * 3, use_bias=False, dtype=cfg.dtype, name=name + "qkv")(
            x.reshape(b_, n, c)
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _Bias(name=name + "query_bias")(q)
        v = _Bias(name=name + "value_bias")(v)
        q = jnp.transpose(q.reshape(b_, n, num_heads, key_dim), (0, 2, 1, 3))
        k = jnp.transpose(k.reshape(b_, n, num_heads, key_dim), (0, 2, 1, 3))
        v = jnp.transpose(v.reshape(b_, n, num_heads, key_dim), (0, 2, 1, 3))

        # cosine attention with learnable exp scale (capped at 100)
        qn = q / jnp.maximum(jnp.linalg.norm(q.astype(jnp.float32), axis=-1, keepdims=True), 1e-6).astype(q.dtype)
        kn = k / jnp.maximum(jnp.linalg.norm(k.astype(jnp.float32), axis=-1, keepdims=True), 1e-6).astype(k.dtype)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qn, kn).astype(jnp.float32)
        attn = _ExpLogitScale(num_heads, name=name + "scale")(attn)

        # log-CPB bias
        table = jnp.asarray(_log_coords_table(wh, ww, pos_scale))
        idx = _pairwise_index(wh, ww).reshape(-1)
        bias = nn.Dense(512, use_bias=True, dtype=cfg.dtype, name=name + "meta_dense_1")(table)
        bias = apply_activation(bias, "relu")
        bias = nn.Dense(num_heads, use_bias=False, dtype=cfg.dtype, name=name + "meta_dense_2")(bias)
        bias = bias.astype(jnp.float32)[idx].reshape(n, n, num_heads)
        bias = jax.nn.sigmoid(bias) * 16.0
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, num_heads, n, n) + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(-1, num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b_, wh, ww, c)
        out = nn.Dense(c, use_bias=True, dtype=cfg.dtype, name=name + "output")(out)
        return out

    def _shifted_window_attention(self, x, num_heads, shift_size, pos_scale, name, training):
        cfg = self.cfg
        b, h, w, c = x.shape
        wh = min(cfg.window_size, h)
        ww = min(cfg.window_size, w)
        shift_size = 0 if (wh == h and ww == w) else shift_size
        should_shift = shift_size > 0

        ph, pw = -(-h // wh), -(-w // ww)  # ceil
        pad_h, pad_w = ph * wh - h, pw * ww - w
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hh, wwidth = x.shape[1], x.shape[2]

        sh = sw = 0
        if should_shift:
            sh, sw = int(wh * shift_size), int(ww * shift_size)
            x = jnp.roll(x, shift=(-sh, -sw), axis=(1, 2))

        xw = x.reshape(b, ph, wh, pw, ww, c).transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh, ww, c)
        mask = _shift_mask(hh, wwidth, wh, ww, sh, sw) if should_shift else None
        xw = self._window_attention(xw, num_heads, pos_scale, mask, name, training)
        x = xw.reshape(b, ph, pw, wh, ww, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, wwidth, c)

        if should_shift:
            x = jnp.roll(x, shift=(sh, sw), axis=(1, 2))
        if pad_h or pad_w:
            x = x[:, :h, :w, :]
        return x

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        x = nn.Conv(
            cfg.embed_dim, (cfg.stem_patch_size,) * 2, strides=(cfg.stem_patch_size,) * 2,
            padding="VALID", use_bias=True, dtype=cfg.dtype, name="stem_conv",
        )(x)
        x = LayerNorm(name="stem_ln")(x)

        total = sum(cfg.num_blocks)
        gid = 0
        for sid, (nb, nh) in enumerate(zip(cfg.num_blocks, cfg.num_heads)):
            sname = f"stack{sid + 1}_"
            if sid > 0:
                # patch merging (:286-295)
                b, h, w, c = x.shape
                if h % 2 or w % 2:
                    x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
                    h, w = x.shape[1], x.shape[2]
                # reference reshape/transpose trick (:289-292) interleaves the
                # 4C channels as (w_offset, h_offset, C)
                x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 4, 2, 5)
                x = x.reshape(b, h // 2, w // 2, 4 * c)
                x = nn.Dense(2 * c, use_bias=False, dtype=cfg.dtype, name=sname + "downsample_dense")(x)
                x = LayerNorm(name=sname + "downsample_ln")(x)
            ps = cfg.pos_scale[sid] if isinstance(cfg.pos_scale, (list, tuple)) else cfg.pos_scale
            for bid in range(nb):
                bname = sname + f"block{bid + 1}_"
                drop_rate = cfg.drop_connect_rate * gid / total
                shift = 0.0 if bid % 2 == 0 else 0.5
                # post-norm block (:269-283)
                attn = self._shifted_window_attention(x, nh, shift, ps, bname + "attn_", training)
                attn = LayerNorm(zero_gamma=True, name=bname + "attn_ln")(attn)
                attn = DropPath(drop_rate, name=bname + "attn_drop")(attn, training=training)
                x = x + attn
                mlp = nn.Dense(int(x.shape[-1] * 4), dtype=cfg.dtype, name=bname + "mlp_Dense_0")(x)
                mlp = apply_activation(mlp, "gelu")
                mlp = nn.Dense(x.shape[-1], dtype=cfg.dtype, name=bname + "mlp_Dense_1")(mlp)
                mlp = LayerNorm(zero_gamma=True, name=bname + "mlp_ln")(mlp)
                mlp = DropPath(drop_rate, name=bname + "mlp_drop")(mlp, training=training)
                x = x + mlp
                gid += 1
                if (
                    cfg.extra_norm_period > 0
                    and (bid + 1) % cfg.extra_norm_period == 0
                    and not (cfg.use_stack_norm and bid == nb - 1)
                ):
                    x = LayerNorm(name=bname + "output_ln")(x)
            if cfg.use_stack_norm and sid != len(cfg.num_blocks) - 1:
                x = LayerNorm(name=sname + "output_ln")(x)
        x = LayerNorm(name="pre_output_ln")(x)

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


def _swin(name, **kw):
    return SwinV2, SwinV2Config(name=name, **kw)


@register_model
def SwinTransformerV2Tiny_window8():
    return _swin("SwinTransformerV2Tiny_window8", window_size=8)


@register_model
def SwinTransformerV2Tiny_window16():
    return _swin("SwinTransformerV2Tiny_window16", window_size=16)


@register_model
def SwinTransformerV2Small_window8():
    return _swin("SwinTransformerV2Small_window8", num_blocks=(2, 2, 18, 2), window_size=8)


@register_model
def SwinTransformerV2Small_window16():
    return _swin("SwinTransformerV2Small_window16", num_blocks=(2, 2, 18, 2), window_size=16)


_BASE = dict(num_blocks=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), embed_dim=128)
_LARGE = dict(num_blocks=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), embed_dim=192)


@register_model
def SwinTransformerV2Base_window8():
    return _swin("SwinTransformerV2Base_window8", window_size=8, **_BASE)


@register_model
def SwinTransformerV2Base_window12():
    return _swin("SwinTransformerV2Base_window12", window_size=12, input_size=(192, 192), **_BASE)


@register_model
def SwinTransformerV2Base_window16():
    return _swin("SwinTransformerV2Base_window16", window_size=16, **_BASE)


@register_model
def SwinTransformerV2Base_window24():
    return _swin("SwinTransformerV2Base_window24", window_size=24, input_size=(384, 384), **_BASE)


@register_model
def SwinTransformerV2Large_window12():
    return _swin("SwinTransformerV2Large_window12", window_size=12, input_size=(192, 192), **_LARGE)


@register_model
def SwinTransformerV2Large_window16():
    return _swin("SwinTransformerV2Large_window16", window_size=16, **_LARGE)
