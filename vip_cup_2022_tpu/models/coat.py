"""CoaT — Co-scale Conv-Attentional Transformers (kecam coat/coat.py).

Architecture parity:
- serial stages (:262-288): patch conv (k=4 then k=2, WITH bias) + LN +
  per-stage class token; blocks = shared ConvPositionalEncoding (dw3x3 +
  residual on image tokens, :25-61) -> LN -> factorized attention with shared
  ConvRelativePositionalEncoding (:64-113, per-head-group dw convs k=3/5/7
  multiplied into the query) -> residual; LN -> MLP -> residual (:173-183)
- factorized attention (:132-162): softmax over the TOKEN axis of keys,
  attn = k^T v (kd x kd), out = q @ attn * scale + crpe(q, v)
- parallel blocks (:199-228, CoaTTiny/Mini): stages 2-4 cross-resampled with
  bilinear resize, each adding the OTHER stages' crpe outputs + cls tokens
- heads (:296-306): lite = LN cls token; parallel = per-stage LN cls tokens
  stacked and aggregated by a Conv1D(1x1) over the 3 scales

TPU notes: factorized attention is linear in tokens (k^T v is kd x kd) — an
MXU-friendly pair of batched einsums; the crpe per-group depthwise convs are
static-shape NHWC convs; cross-scale resample uses ops/resize.py matmul
resampling matrices.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import LayerNorm, apply_activation
from ..ops.resize import resize
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CoaTConfig(ModelConfig):
    serial_depths: Tuple[int, ...] = (2, 2, 2, 2)
    embed_dims: Tuple[int, ...] = (64, 128, 256, 320)
    mlp_ratios: Tuple[int, ...] = (8, 8, 4, 4)
    parallel_depth: int = 0
    patch_size: int = 4
    num_heads: int = 8
    head_splits: Tuple[int, ...] = (2, 3, 3)
    head_kernel_size: Tuple[int, ...] = (3, 5, 7)
    activation: str = "gelu"
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    input_size: Tuple[int, int] = (224, 224)
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class _ClassToken(nn.Module):
    """coat ClassToken (coat.py:116-129), weight name 'tokens'."""

    @nn.compact
    def __call__(self, x):
        tok = self.param("tokens", nn.initializers.truncated_normal(0.2), (1, 1, x.shape[-1]), jnp.float32)
        tok = jnp.broadcast_to(tok.astype(x.dtype), (x.shape[0], 1, x.shape[-1]))
        return jnp.concatenate([tok, x], axis=1)


class _CPE(nn.Module):
    """ConvPositionalEncoding (coat.py:25-61): dw3x3 + residual on the image
    tokens, cls token passed through. Weights live directly on the layer."""

    height: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, tokens):
        b, n, c = tokens.shape
        h = self.height
        w = (n - 1) // h
        cls_tok, img = tokens[:, :1], tokens[:, 1:]
        img = img.reshape(b, h, w, c)
        # weights live directly on the layer in the reference h5
        kern = self.param("kernel", nn.initializers.lecun_normal(), (3, 3, 1, c), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        y = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            y.astype(self.dtype or y.dtype), kern.astype(self.dtype or y.dtype),
            window_strides=(1, 1), padding="VALID", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(self.dtype or y.dtype)
        y = y + img
        return jnp.concatenate([cls_tok, y.reshape(b, n - 1, c)], axis=1)


class _CRPE(nn.Module):
    """ConvRelativePositionalEncoding (coat.py:64-113): per-head-group
    depthwise convs on V (channels grouped by head), multiplied into Q;
    cls position zero-padded."""

    height: int
    head_splits: Tuple[int, ...]
    head_kernel_size: Tuple[int, ...]
    dtype: Dtype = None

    @nn.compact
    def __call__(self, qq, vv):
        # qq, vv: (B, heads, N, kd) with cls at token 0
        b, heads, n, kd = qq.shape
        h = self.height
        w = (n - 1) // h
        img_v = jnp.transpose(vv[:, :, 1:, :], (0, 2, 1, 3)).reshape(b, h, w, heads * kd)
        outs, start = [], 0
        for i, (split, k) in enumerate(zip(self.head_splits, self.head_kernel_size)):
            ch = split * kd
            part = img_v[..., start : start + ch]
            start += ch
            p = k // 2
            part = jnp.pad(part, ((0, 0), (p, p), (p, p), (0, 0)))
            outs.append(
                nn.Conv(ch, (k, k), padding="VALID", feature_group_count=ch, use_bias=True,
                        dtype=self.dtype, name=f"depth_conv_{i + 1}")(part)
            )
        conv_v = jnp.concatenate(outs, axis=-1)
        conv_v = jnp.transpose(conv_v.reshape(b, h * w, heads, kd), (0, 2, 1, 3))
        ev = qq[:, :, 1:, :] * conv_v
        return jnp.pad(ev, ((0, 0), (0, 0), (1, 0), (0, 0)))


class _Aggregate(nn.Module):
    """Conv1D(1, 1) over the 3 per-scale cls tokens (coat.py:303-304):
    kernel (1, 3, 1), applied to the (B, C, 3) permuted stack."""

    @nn.compact
    def __call__(self, stacked):  # (B, 3, C)
        kern = self.param("kernel", nn.initializers.xavier_uniform(), (1, 3, 1), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        return jnp.einsum("btc,t->bc", stacked.astype(jnp.float32), kern[0, :, 0]) + bias[0]


class CoaT(nn.Module):
    cfg: CoaTConfig

    def _factor_attention(self, x, crpe, name):
        """coat factor_attention_conv_relative_positional_encoding (:132-162)."""
        cfg = self.cfg
        b, n, dim = x.shape
        heads = cfg.num_heads
        kd = dim // heads
        scale = kd**-0.5
        qkv = nn.Dense(dim * 3, use_bias=True, dtype=cfg.dtype, name=name + "qkv")(x)
        qkv = jnp.transpose(qkv.reshape(b, n, 3, heads, kd), (2, 0, 3, 1, 4))
        qq, kk, vv = qkv[0], qkv[1], qkv[2]
        # softmax over the TOKEN axis of keys
        kk = jax.nn.softmax(kk.astype(jnp.float32), axis=2).astype(x.dtype)
        attn = jnp.einsum("bhnk,bhnv->bhkv", kk, vv)
        factor = jnp.einsum("bhnk,bhkv->bhnv", qq, attn)
        out = factor * scale + crpe(qq, vv)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, dim)
        return nn.Dense(dim, use_bias=True, dtype=cfg.dtype, name=name + "out")(out)

    def _cpe_norm_crpe(self, x, cpe, crpe, name):
        cpe_out = cpe(x)
        y = LayerNorm(epsilon=1e-5, name=name + "norm1ln")(cpe_out)
        crpe_out = self._factor_attention(y, crpe, name + "factoratt_crpe_")
        return cpe_out, crpe_out

    def _res_mlp(self, cpe_out, crpe_out, mlp_ratio, name):
        cfg = self.cfg
        x = cpe_out + crpe_out
        y = LayerNorm(epsilon=1e-5, name=name + "norm2ln")(x)
        y = nn.Dense(x.shape[-1] * mlp_ratio, dtype=cfg.dtype, name=name + "mlp_dense_0")(y)
        y = apply_activation(y, cfg.activation)
        y = nn.Dense(x.shape[-1], dtype=cfg.dtype, name=name + "mlp_dense_1")(y)
        return x + y

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)

        classifier_outs = []
        cpes, crpes, heights = [], [], []
        for sid, (depth, dim, mlp_ratio) in enumerate(
            zip(cfg.serial_depths, cfg.embed_dims, cfg.mlp_ratios)
        ):
            name = f"serial{sid + 1}_"
            ps = cfg.patch_size if sid == 0 else 2
            x = nn.Conv(dim, (ps, ps), strides=(ps, ps), padding="VALID", use_bias=True,
                        dtype=cfg.dtype, name=name + "patch_conv")(x)
            hh, ww = x.shape[1], x.shape[2]
            t = x.reshape(x.shape[0], hh * ww, dim)
            t = LayerNorm(epsilon=1e-5, name=name + "patch_ln")(t)
            t = _ClassToken(name=name + "class_token")(t)
            cpe = _CPE(hh, cfg.dtype, name=f"cpe_{sid + 1}")
            crpe = _CRPE(hh, cfg.head_splits, cfg.head_kernel_size, cfg.dtype, name=f"crpe_{sid + 1}")
            for bid in range(depth):
                bname = name + f"block{bid + 1}_"
                cpe_out, crpe_out = self._cpe_norm_crpe(t, cpe, crpe, bname)
                t = self._res_mlp(cpe_out, crpe_out, mlp_ratio, bname)
            classifier_outs.append(t)
            cpes.append(cpe)
            crpes.append(crpe)
            heights.append(hh)
            x = t[:, 1:, :].reshape(x.shape[0], hh, ww, dim)

        for pid in range(cfg.parallel_depth):
            name = f"parallel{pid + 1}_"
            cpe_outs, crpe_outs, imgs, shapes = [], [], [], []
            for i, t in enumerate(classifier_outs[1:]):
                cname = name + f"{i + 2}_"
                cpe_out, crpe_out = self._cpe_norm_crpe(t, cpes[i + 1], crpes[i + 1], cname)
                cpe_outs.append(cpe_out)
                crpe_outs.append(crpe_out)
                h = heights[i + 1]
                w = (crpe_out.shape[1] - 1) // h
                imgs.append(crpe_out[:, 1:, :].reshape(-1, h, w, crpe_out.shape[-1]))
                shapes.append((h, w))

            def resample(img, shape, cls_tok):
                out = resize(img, shape, method="bilinear")
                out = out.reshape(out.shape[0], shape[0] * shape[1], out.shape[-1])
                return jnp.concatenate([cls_tok, out], axis=1)

            # cross-scale sums (coat.py:217-221 exact combination order)
            stack = [
                crpe_outs[0]
                + resample(imgs[1], shapes[0], crpe_outs[1][:, :1])
                + resample(imgs[2], shapes[0], crpe_outs[2][:, :1]),
                crpe_outs[1]
                + resample(imgs[2], shapes[1], crpe_outs[2][:, :1])
                + resample(imgs[0], shapes[1], crpe_outs[0][:, :1]),
                crpe_outs[2]
                + resample(imgs[1], shapes[2], crpe_outs[1][:, :1])
                + resample(imgs[0], shapes[2], crpe_outs[0][:, :1]),
            ]
            new_outs = [classifier_outs[0]]
            for i, (cpe_out, crpe_out) in enumerate(zip(cpe_outs, stack)):
                cname = name + f"{i + 2}_"
                new_outs.append(self._res_mlp(cpe_out, crpe_out, cfg.mlp_ratios[i + 1], cname))
            classifier_outs = new_outs

        if features_only:
            return classifier_outs

        if cfg.parallel_depth == 0:
            out = LayerNorm(epsilon=1e-5, name="out_ln")(classifier_outs[-1])[:, 0]
        else:
            cls_toks = [
                LayerNorm(epsilon=1e-5, name=f"out_{i + 1}_ln")(t)[:, :1, :]
                for i, t in enumerate(classifier_outs[1:])
            ]
            stacked = jnp.concatenate(cls_toks, axis=1)  # (B, 3, C)
            out = _Aggregate(name="aggregate")(stacked)

        if cfg.nb_classes <= 0:
            return out
        out = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="predictions")(out.astype(jnp.float32))
        if cfg.classifier_activation:
            out = apply_activation(out, cfg.classifier_activation)
        return out


def _coat(name, serial_depths, embed_dims, mlp_ratios, parallel_depth=0):
    return CoaT, CoaTConfig(
        name=name, serial_depths=serial_depths, embed_dims=embed_dims,
        mlp_ratios=mlp_ratios, parallel_depth=parallel_depth,
    )


@register_model
def CoaTLiteTiny():
    return _coat("coat_lite_tiny", (2, 2, 2, 2), (64, 128, 256, 320), (8, 8, 4, 4))


@register_model
def CoaTLiteMini():
    return _coat("coat_lite_mini", (2, 2, 2, 2), (64, 128, 320, 512), (8, 8, 4, 4))


@register_model
def CoaTLiteSmall():
    return _coat("coat_lite_small", (3, 4, 6, 3), (64, 128, 320, 512), (8, 8, 4, 4))


@register_model
def CoaTTiny():
    return _coat("coat_tiny", (2, 2, 2, 2), (152, 152, 152, 152), (4, 4, 4, 4), parallel_depth=6)


@register_model
def CoaTMini():
    return _coat("coat_mini", (2, 2, 2, 2), (152, 216, 216, 216), (4, 4, 4, 4), parallel_depth=6)
