"""AotNet — kecam's configurable ResNet meta-builder (ensemble member
ResNest50 builds on it; also ResNet-D / ResNeXt / RegNet-Z derivatives).

Architecture parity with reference keras_cv_attention_models/aotnet/aotnet.py:
- ``attn_block`` dispatcher over attn_types {None/resnet, 'sa' split-attention,
  groups-conv(ResNeXt), se/eca} (:30-97; bot/halo/cot/outlook hook points
  reserved for their families)
- ``conv_shortcut_branch`` with shortcut_type conv/avg/anti_alias (:100-117)
- ``deep_branch`` 1x1 -> attn(3x3) -> 1x1 with bn_after_attn toggle (:119-137)
- ``aot_block`` preact/resnet variants, zero-gamma closing BN (:139-193)
- stems: deep/deep2/quad/tiered/kernel_3x3/7x7 (:238-287)
- ``AotNet`` assembly with per-stack parameter broadcasting (:290-377)
- split_attention_conv2d + rsoftmax (resnest/resnest.py:16-66)

Module names mirror kecam layer names so the generic kecam h5 mapper applies.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import BatchNorm, DropPath, apply_activation, make_divisible
from ..ops.conv import AntiAliasDownsample
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


def _per_stack(v, i):
    return v[i] if isinstance(v, (list, tuple)) else v


def _rel_to_abs(rel_pos):
    """botnet rel->abs indexing (botnet.py:64-84); supports pos_dim > ww
    (halo's kv window larger than the query block)."""
    bh, hh, ww, dim = rel_pos.shape
    pos_dim = (dim + 1) // 2
    if pos_dim == 1:
        return rel_pos
    if ww == 1:
        return rel_pos[:, :, :, -pos_dim:]
    full_rank_gap = pos_dim - ww
    flat = rel_pos.reshape(bh, hh, ww * dim)[:, :, ww - 1 : -1]
    return flat.reshape(bh, hh, ww, 2 * (pos_dim - 1))[:, :, :, full_rank_gap : pos_dim + full_rank_gap]


class RelativePositionalEmbedding(nn.Module):
    """botnet RelativePositionalEmbedding (botnet.py:24-112): factorized
    per-axis relative logits added to attention scores. ``pos_height/width``
    may exceed the query block (halo). Weights r_height/r_width are
    (key_dim, 2*pos-1)."""

    key_dim: int
    pos_height: int
    pos_width: int
    relative: bool = True

    @nn.compact
    def __call__(self, pos_query):
        # pos_query: (B, H', qh, qw, key_dim) — H' folds heads (and halo grid)
        init = nn.initializers.normal(self.key_dim**-0.5)
        hs = 2 * self.pos_height - 1 if self.relative else self.pos_height
        ws = 2 * self.pos_width - 1 if self.relative else self.pos_width
        pos_h = self.param("r_height", init, (self.key_dim, hs), jnp.float32)
        pos_w = self.param("r_width", init, (self.key_dim, ws), jnp.float32)
        bq, nh, qh, qw, kd = pos_query.shape
        flat = pos_query.reshape(bq * nh, qh, qw, kd)
        logits_w = jnp.einsum("bhwd,dk->bhwk", flat, pos_w.astype(flat.dtype))
        logits_h = jnp.einsum("bwhd,dk->bwhk", jnp.transpose(flat, (0, 2, 1, 3)), pos_h.astype(flat.dtype))
        if self.relative:
            logits_w = _rel_to_abs(logits_w)
            logits_h = _rel_to_abs(logits_h)
        logits_h = jnp.transpose(logits_h, (0, 2, 1, 3))
        logits = logits_w[:, :, :, None, :] + logits_h[:, :, :, :, None]
        return logits.reshape(bq, nh, qh, qw, self.pos_height, self.pos_width)


@dataclasses.dataclass(frozen=True)
class AotNetConfig(ModelConfig):
    num_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    preact: bool = False
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    strides_first: bool = True
    out_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    hidden_channel_ratio: Any = 0.25
    use_3x3_kernel: bool = False
    use_block_output_activation: bool = True
    use_evo_norm: bool = False
    evo_norm_group_size: int = -1
    bn_epsilon: float = 1e-5
    stem_width: int = 64
    stem_type: Optional[str] = None  # deep/deep2/quad/tiered/kernel_3x3/None
    quad_stem_act: bool = False
    stem_last_strides: int = 1
    stem_downsample: bool = True
    attn_types: Any = None  # None | 'sa' | per-stack tuple
    attn_params: Any = dataclasses.field(default_factory=dict)
    se_ratio: Any = 0.0
    use_eca: Any = False
    groups: Any = 1
    group_size: Any = 0
    bn_after_attn: bool = True
    shortcut_type: Optional[str] = "conv"  # conv/avg/anti_alias/None
    activation: str = "relu"
    drop_connect_rate: float = 0.0
    output_num_features: int = 0
    drop_rate: float = 0.0
    classifier_activation: Optional[str] = "softmax"
    # kecam models use rescale_mode 'torch' when preprocessing is requested;
    # weights are trained on [0,1]*imagenet-normalized? No: the serialized
    # h5s consume whatever the training pipeline fed. Default to imagenet.
    mean: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_MEAN
    std: Optional[Tuple[float, ...]] = IMAGENET_DEFAULT_STD


class AotNet(nn.Module):
    cfg: AotNetConfig

    # ------------------------------------------------------------------
    # helpers (called inside the compact __call__, submodule names flat)
    # ------------------------------------------------------------------
    def _conv_nb(self, x, filters, kernel, stride, name, groups=1, padding="SAME"):
        # kecam conv2d_no_bias with torch padding (common_layers.py:230-250);
        # the symmetric k//2 zeros ride the conv's own explicit padding so
        # XLA folds them into the window instead of materializing a padded
        # copy before every conv
        if padding.upper() == "SAME" and kernel > 1:
            p = kernel // 2
            pad_arg = ((p, p), (p, p))
        else:
            pad_arg = "VALID"
        return nn.Conv(
            filters, (kernel, kernel), strides=(stride, stride), padding=pad_arg,
            use_bias=False, feature_group_count=max(1, groups),
            dtype=self.cfg.dtype, name=name + "conv",
        )(x)

    def _bn_act(self, x, act, name, zero_gamma=False, training=False):
        cfg = self.cfg
        if cfg.use_evo_norm:
            # batchnorm_with_activation evo path (common_layers.py:194-197)
            from ..ops import EvoNorm

            num_groups = x.shape[-1] // cfg.evo_norm_group_size
            return EvoNorm(
                nonlinearity=act is not None, num_groups=num_groups,
                zero_gamma=zero_gamma, epsilon=cfg.bn_epsilon, momentum=0.9,
                dtype=cfg.dtype, name=name + "evo_norm",
            )(x, training=training)
        x = BatchNorm(
            momentum=0.9, epsilon=cfg.bn_epsilon, zero_gamma=zero_gamma,
            dtype=cfg.dtype, name=name + "bn",
        )(x, training=training)
        return apply_activation(x, act) if act else x

    def _se(self, x, se_ratio, divisor, act, name):
        ch = x.shape[-1]
        reduction = make_divisible(ch * se_ratio, divisor)
        se = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        se = nn.Conv(reduction, (1, 1), use_bias=True, dtype=self.cfg.dtype, name=name + "1_conv")(se)
        se = apply_activation(se, act)
        se = nn.Conv(ch, (1, 1), use_bias=True, dtype=self.cfg.dtype, name=name + "2_conv")(se)
        se = apply_activation(se, "sigmoid")
        return x * se

    def _eca(self, x, name):
        import math

        ch = x.shape[-1]
        tt = int((math.log2(float(ch)) + 1.0) / 2.0)
        k = max(tt if tt % 2 else tt + 1, 3)
        pad = k // 2
        v = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
        v = jnp.pad(v, ((0, 0), (pad, pad)))[:, :, None]
        v = nn.Conv(1, (k,), padding="VALID", use_bias=False, dtype=self.cfg.dtype, name=name + "conv1d")(v)
        v = apply_activation(jnp.squeeze(v, -1), "sigmoid")
        return x * v[:, None, None, :]

    def _split_attention(self, x, filters, kernel, stride, groups, act, name, training):
        """resnest split_attention_conv2d (resnest.py:16-66), downsample_first=False."""
        in_channels = x.shape[-1]
        if groups == 1:
            logits = self._conv_nb(x, filters, kernel, 1, name + "1_")
        else:
            parts = jnp.split(x, groups, axis=-1)
            logits = jnp.concatenate(
                [
                    self._conv_nb(p, filters, kernel, 1, name + f"1_g{i + 1}_")
                    for i, p in enumerate(parts)
                ],
                axis=-1,
            )
        logits = self._bn_act(logits, act, name + "1_", training=training)

        if groups > 1:
            # groups is the radix; channel g*F+f <-> [..., g, f] so the
            # (B,H,W,GF)->(B,H,W,G,F) reshape is free (minor-dim split) and
            # the radix sum + spatial mean become ONE fused reduce instead of
            # the reference's split->sum->mean chain of full-array passes
            # (resnest.py:45-50; profiled 1.7 ms of ResNest50's 34.8 ms fwd)
            b, hh, ww_, c2 = logits.shape
            f = c2 // groups
            l5 = logits.reshape(b, hh, ww_, groups, f)
            gap = jnp.sum(
                jnp.mean(l5.astype(jnp.float32), axis=(1, 2)), axis=1
            )[:, None, None, :].astype(x.dtype)
        else:
            gap = logits
            gap = jnp.mean(
                gap.astype(jnp.float32), axis=(1, 2), keepdims=True
            ).astype(x.dtype)

        inter = max(in_channels * groups // 4, 32)
        att = nn.Conv(inter, (1, 1), use_bias=True, dtype=self.cfg.dtype, name=name + "2_conv")(gap)
        att = self._bn_act(att, act, name + "2_", training=training)
        att = nn.Conv(filters * groups, (1, 1), use_bias=True, dtype=self.cfg.dtype, name=name + "3_conv")(att)
        if groups > 1:
            b = att.shape[0]
            att = att.reshape(b, 1, groups, filters)
            att = jax.nn.softmax(att.astype(jnp.float32), axis=2).astype(x.dtype)
            # attn-mul + radix sum in one fused pass over the 5-d view
            # (reference multiplies the full (B,H,W,GF) then split->sum,
            # resnest.py:58-62 — two extra full-array passes)
            out = jnp.sum(att[:, :, None, :, :] * l5, axis=3)
        else:
            att = apply_activation(att, "sigmoid")
            out = att * logits
        if stride > 1:
            out = jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = nn.avg_pool(out, (3, 3), strides=(2, 2), padding="VALID")
        return out

    def _bot_mhsa(self, x, out_shape, params, name, training):
        """botnet mhsa_with_relative_position_embedding (botnet.py:126-171)."""
        cfg = self.cfg
        num_heads = params.get("num_heads", 4)
        relative = params.get("relative", True)
        out_weight = params.get("out_weight", True)
        out_bias = params.get("out_bias", False)
        b, hh, ww, c = x.shape
        key_dim = params.get("key_dim", 0) or c // num_heads
        out_shape = c if not out_weight else out_shape
        qk_out = num_heads * key_dim
        vv_dim = out_shape // num_heads
        scale = key_dim**-0.5

        qkv = nn.Conv(qk_out * 2 + out_shape, (1, 1), use_bias=False, dtype=cfg.dtype, name=name + "qkv_conv")(x)
        qkv = qkv.reshape(b, hh * ww, qk_out * 2 + out_shape)
        q, k, v = jnp.split(qkv, [qk_out, qk_out * 2], axis=-1)
        q = jnp.transpose(q.reshape(b, hh * ww, num_heads, key_dim), (0, 2, 1, 3))
        k = jnp.transpose(k.reshape(b, hh * ww, num_heads, key_dim), (0, 2, 1, 3))
        v = jnp.transpose(v.reshape(b, hh * ww, num_heads, vv_dim), (0, 2, 1, 3))

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale

        # NOTE: the reference scales only the QK^T product, not the positional
        # logits (botnet.py:145-152 — `query *= qk_scale` is commented out)
        pos_query = q.reshape(b, num_heads, hh, ww, key_dim)
        pos = RelativePositionalEmbedding(key_dim, hh, ww, relative, name=name + "pos_emb")(pos_query)
        attn = attn + pos.reshape(b, num_heads, hh * ww, hh * ww).astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, hh, ww, num_heads * vv_dim)
        if out_weight:
            out = nn.Dense(out_shape, use_bias=out_bias, dtype=cfg.dtype, name=name + "output")(out)
        return out

    def _halo_attention(self, x, out_shape, stride, params, name, training):
        """halonet halo_attention (halonet.py:34-120): blocked local attention
        with haloed key/value windows and relative position bias."""
        cfg = self.cfg
        num_heads = params.get("num_heads", 8)
        block_size = params.get("block_size", 4)
        halo_size = params.get("halo_size", 1)
        out_weight = params.get("out_weight", True)
        out_bias = params.get("out_bias", False)
        b, hh, ww, c = x.shape
        kd = params.get("key_dim", 0)
        if kd > 1:
            key_dim = int(kd)
        elif kd > 0:
            key_dim = make_divisible(c * kd, divisor=8) // num_heads
        else:
            key_dim = c // num_heads
        scale = key_dim**-0.5
        emb_dim = num_heads * key_dim
        kv_kernel = block_size + halo_size * 2
        if block_size % stride != 0:
            avg_pool_down, q_stride = True, 1
        else:
            avg_pool_down, q_stride = False, stride
        query_block = block_size // q_stride

        q = nn.Conv(emb_dim, (1, 1), strides=(q_stride, q_stride), padding="VALID",
                    use_bias=False, dtype=cfg.dtype, name=name + "query_conv")(x)
        _, qh, qw, _ = q.shape
        hh_q, ww_q, cc_q = qh // query_block, qw // query_block, emb_dim // num_heads
        q = q.reshape(b, hh_q, query_block, ww_q, query_block, num_heads, cc_q)
        q = jnp.transpose(q, (0, 5, 1, 3, 2, 4, 6))
        attn_q = q.reshape(b, num_heads, hh_q, ww_q, query_block * query_block, cc_q) * scale
        pos_q = q.reshape(b, num_heads * hh_q * ww_q, query_block, query_block, cc_q)

        kv = nn.Conv(emb_dim + out_shape, (1, 1), padding="VALID", use_bias=False,
                     dtype=cfg.dtype, name=name + "key_value_conv")(x)
        kvp = jnp.pad(kv, ((0, 0), (halo_size, halo_size), (halo_size, halo_size), (0, 0)))
        # extract kv_kernel x kv_kernel patches at stride block_size (TF
        # extract_patches (kh, kw, c) channel order) via static shifted slices
        hh_k, ww_k = hh // block_size, ww // block_size
        rows = []
        for di in range(kv_kernel):
            cols = []
            for dj in range(kv_kernel):
                sl = kvp[:, di : di + (hh_k - 1) * block_size + 1 : block_size,
                         dj : dj + (ww_k - 1) * block_size + 1 : block_size, :]
                cols.append(sl)
            rows.append(jnp.stack(cols, axis=3))  # (B, hh_k, ww_k, kv_kernel, C)
        patches = jnp.stack(rows, axis=3)  # (B, hh_k, ww_k, kv_kernel, kv_kernel, C)
        cc_k = (emb_dim + out_shape) // num_heads
        patches = patches.reshape(b, hh_k, ww_k, kv_kernel, kv_kernel, num_heads, cc_k)
        patches = jnp.transpose(patches, (0, 5, 1, 2, 3, 4, 6))
        patches = patches.reshape(b, num_heads, hh_k, ww_k, kv_kernel * kv_kernel, cc_k)
        k, v = jnp.split(patches, [emb_dim // num_heads], axis=-1)

        attn = jnp.einsum("bhxyqd,bhxykd->bhxyqk", attn_q, k)
        pos = RelativePositionalEmbedding(
            cc_q, kv_kernel, kv_kernel, True, name=name + "pos_emb"
        )(pos_q)
        pos = pos.reshape(b, num_heads, hh_q, ww_q, query_block * query_block, kv_kernel * kv_kernel)
        attn = attn + pos.astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhxyqk,bhxykd->bhxyqd", attn, v)
        vv_dim = out_shape // num_heads
        out = out.reshape(b, num_heads, hh_q, ww_q, query_block, query_block, vv_dim)
        out = jnp.transpose(out, (0, 2, 4, 3, 5, 1, 6))
        out = out.reshape(b, hh_q * query_block, ww_q * query_block, num_heads * vv_dim)
        if avg_pool_down:
            out = nn.avg_pool(out, (2, 2), strides=(2, 2), padding="VALID")
        if out_weight:
            out = nn.Dense(out_shape, use_bias=out_bias, dtype=cfg.dtype, name=name + "output")(out)
        return out

    def _cot_attention(self, x, stride, params, act, name, training):
        """cotnet cot_attention (cotnet.py:37-112): contextual key embedding,
        learned local-conv weights, and a 2-way SE-softmax fusion."""
        from ..ops.norms import GroupNorm

        cfg = self.cfg
        kernel_size = params.get("kernel_size", 3)
        downsample_first = params.get("downsample_first", True)
        if downsample_first and stride > 1:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            x = nn.avg_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        filters = x.shape[-1]
        randix, reduction = 2, 8
        key = self._conv_nb(x, filters, kernel_size, 1, name + "key_", groups=4)
        key = self._bn_act(key, act, name + "key_", training=training)

        qk = jnp.concatenate([x, key], axis=-1)
        b, height, width, _ = qk.shape
        ww = self._conv_nb(qk, filters // randix, 1, 1, name + "embed_ww_1_", padding="VALID")
        ww = self._bn_act(ww, act, name + "embed_ww_1_", training=training)
        embed_filters = kernel_size * kernel_size * filters // reduction
        ww = nn.Conv(embed_filters, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "embed_ww_2_conv")(ww)
        ww = GroupNorm(groups=filters // reduction, epsilon=1e-5, name=name + "embed_ww_group_norm")(ww)
        ww = ww.reshape(b, height, width, filters // reduction, kernel_size * kernel_size)
        ww = jnp.transpose(ww, (0, 1, 2, 4, 3))[:, :, :, :, None, :]  # (B,H,W,k2,1,C/r)

        embed = self._conv_nb(x, filters, 1, 1, name + "embed_1_", padding="VALID")
        embed = self._bn_act(embed, None, name + "embed_1_", training=training)
        # extract k x k patches stride 1, (kh, kw, c) channel order
        p = kernel_size // 2
        ep = jnp.pad(embed, ((0, 0), (p, p), (p, p), (0, 0)))
        patches = jnp.stack(
            [
                jnp.stack([ep[:, di : di + height, dj : dj + width, :] for dj in range(kernel_size)], axis=3)
                for di in range(kernel_size)
            ],
            axis=3,
        )  # (B,H,W,kh,kw,C)
        patches = patches.reshape(b, height, width, kernel_size * kernel_size, reduction, filters // reduction)

        out = jnp.sum(patches * ww.astype(patches.dtype), axis=-3)  # over k*k
        out = out.reshape(b, height, width, filters)
        out = self._bn_act(out, "swish", name + "embed_2_", training=training)

        attn = jnp.mean((out + key).astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        se_filters = max(filters * randix // 4, 32)
        attn = nn.Conv(se_filters, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "attn_se_1_conv")(attn)
        attn = self._bn_act(attn, act, name + "attn_se_", training=training)
        attn = nn.Conv(filters * randix, (1, 1), use_bias=True, dtype=cfg.dtype, name=name + "attn_se_2_conv")(attn)
        attn = attn.reshape(b, 1, 1, filters, randix)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)

        value = jnp.concatenate([out[..., None], key[..., None]], axis=-1)
        output = jnp.sum(value * attn, axis=-1)
        if not downsample_first and stride > 1:
            output = jnp.pad(output, ((0, 0), (1, 1), (1, 1), (0, 0)))
            output = nn.avg_pool(output, (3, 3), strides=(2, 2), padding="VALID")
        return output

    def _outlook_attention(self, x, embed_dim, params, name, training):
        """volo outlook_attention (volo.py:26-76) — see ops/outlook.py."""
        from ..ops.outlook import outlook_attention

        return outlook_attention(
            x, embed_dim,
            num_heads=params.get("num_heads", 8),
            kernel_size=params.get("kernel_size", 3),
            strides=params.get("strides", 2),
            dtype=self.cfg.dtype, name=name,
        )

    def _attn_block(self, x, filters, stride, stack_cfg, name, training):
        cfg = self.cfg
        attn_type = stack_cfg["attn_type"]
        act = cfg.activation
        need_downsample = False
        if attn_type == "bot":
            params = dict(stack_cfg["attn_params"] or {"num_heads": 4})
            x = self._bot_mhsa(x, filters, params, name + "mhsa_", training)
            need_downsample = True
        elif attn_type == "halo":
            params = dict(stack_cfg["attn_params"] or {"num_heads": 8, "block_size": 4, "halo_size": 1})
            halo_expansion = params.pop("halo_expansion", 1)
            out_shape = int(filters * halo_expansion)
            # halo handles its own stride; the block-level halo pad is applied
            # by the caller (aot_block :156-164) when needed
            x = self._halo_attention(x, out_shape, stride, params, name + "halo", training)
        elif attn_type == "outlook":
            params = {"num_heads": 8, "kernel_size": 3, **(stack_cfg["attn_params"] or {})}
            x = self._outlook_attention(x, filters, params, name + "outlook_", training)
            need_downsample = True
        elif attn_type == "cot":
            params = {"kernel_size": 3, "downsample_first": True, **(stack_cfg["attn_params"] or {})}
            attn_act = params.pop("activation", act)
            params.pop("groups", None)
            x = self._cot_attention(x, stride, params, attn_act, name + "cot_", training)
        elif attn_type == "sa":
            params = {"kernel_size": 3, "groups": 2, **(stack_cfg["attn_params"] or {})}
            attn_act = params.pop("activation", act)  # (aotnet.py:55 attn_act)
            x = self._split_attention(
                x, filters, params["kernel_size"], stride, params["groups"], attn_act,
                name + "sa_", training,
            )
        elif attn_type is None:
            groups = stack_cfg["groups"] if stack_cfg["group_size"] == 0 else filters // stack_cfg["group_size"]
            conv_name = (name + "GC_") if groups > 1 else name
            x = self._conv_nb(x, filters, 3, stride, conv_name, groups=max(1, groups))
        else:
            raise NotImplementedError(f"attn_type '{attn_type}' lands with its family module")

        if stride != 1 and need_downsample:
            x = nn.avg_pool(x, (2, 2), strides=(stride, stride), padding="VALID")
        if cfg.bn_after_attn:
            x = self._bn_act(x, act, name, training=training)
        if attn_type is None and stack_cfg["se_ratio"]:
            # se_divisor / activation from attn_params (ref aotnet.py:55-56)
            params = dict(stack_cfg["attn_params"] or {})
            x = self._se(x, stack_cfg["se_ratio"], params.get("se_divisor", 8),
                         params.get("activation", act), name + "se_")
        if attn_type is None and stack_cfg["use_eca"]:
            x = self._eca(x, name + "eca_")
        return x

    # ------------------------------------------------------------------
    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False,
                 feature_names: tuple = ()):
        """feature_names: block-output names ("stack3_block2_output", ...) to
        return as a pyramid list (kecam's named feature layers role)."""
        cfg = self.cfg
        act = cfg.activation
        feats = {}
        x = preprocess_input(x, cfg)

        # stem (aot_stem :274-287)
        sw = cfg.stem_width
        fs = cfg.first_strides
        if cfg.stem_type in ("deep", "deep2"):
            hidden = sw // 2 if cfg.stem_type == "deep" else sw
            x = self._conv_nb(x, hidden, 3, fs, "stem_1_")
            x = self._bn_act(x, act, "stem_1_", training=training)
            x = self._conv_nb(x, hidden, 3, 1, "stem_2_")
            x = self._bn_act(x, act, "stem_2_", training=training)
            x = self._conv_nb(x, sw, 3, cfg.stem_last_strides, "stem_3_")
        elif cfg.stem_type == "quad":
            x = self._conv_nb(x, sw // 8, 3, 2, "stem_1_")
            if cfg.quad_stem_act:
                x = self._bn_act(x, act, "stem_1_", training=training)
            x = self._conv_nb(x, sw // 4, 3, 1, "stem_2_")
            if cfg.quad_stem_act:
                x = self._bn_act(x, act, "stem_2_", training=training)
            x = self._conv_nb(x, sw // 2, 3, 1, "stem_3_")
            x = self._bn_act(x, act, "stem_3_", training=training)
            x = self._conv_nb(x, sw, 3, cfg.stem_last_strides, "stem_4_")
        elif cfg.stem_type == "tiered":
            x = self._conv_nb(x, 3 * sw // 8, 3, 2, "stem_1_")
            x = self._bn_act(x, act, "stem_1_", training=training)
            x = self._conv_nb(x, sw // 2, 3, 1, "stem_2_")
            x = self._bn_act(x, act, "stem_2_", training=training)
            x = self._conv_nb(x, sw, 3, cfg.stem_last_strides, "stem_3_")
        elif cfg.stem_type == "kernel_3x3":
            x = self._conv_nb(x, sw, 3, fs, "stem_")
        else:
            x = self._conv_nb(x, sw, 7, fs, "stem_")

        if not cfg.preact:
            x = self._bn_act(x, act, "stem_", training=training)
        if cfg.stem_downsample:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        # stacks
        from ..ops.drop import drop_connect_rates_split

        dcr = drop_connect_rates_split(cfg.num_blocks, 0.0, cfg.drop_connect_rate)
        for sid, (num_block, out_channel, stride) in enumerate(
            zip(cfg.num_blocks, cfg.out_channels, cfg.strides)
        ):
            sname = f"stack{sid + 1}_"
            stack_cfg = {
                "attn_type": _per_stack(cfg.attn_types, sid),
                "attn_params": _per_stack(cfg.attn_params, sid),
                "se_ratio": _per_stack(cfg.se_ratio, sid),
                "use_eca": _per_stack(cfg.use_eca, sid),
                "groups": _per_stack(cfg.groups, sid),
                "group_size": _per_stack(cfg.group_size, sid),
            }
            ratio = _per_stack(cfg.hidden_channel_ratio, sid)
            strides_block_id = 0 if cfg.strides_first else num_block - 1
            for bid in range(num_block):
                name = sname + f"block{bid + 1}_"
                cur_stride = stride if bid == strides_block_id else 1
                conv_shortcut = bid == 0 and (stride != 1 or x.shape[-1] != out_channel)
                # per-BLOCK values: attn_types may nest again inside a stack,
                # e.g. botnet's (None, 'bot') (aot_stack :214-233)
                block_cfg = {k: _per_stack(v, bid) for k, v in stack_cfg.items()}
                x = self._aot_block(
                    x, out_channel, cur_stride, conv_shortcut,
                    _per_stack(ratio, bid) if isinstance(ratio, (list, tuple)) else ratio,
                    dcr[sid][bid], block_cfg, name, training,
                )
                feats[name + "output"] = x

        if cfg.preact:
            x = self._bn_act(x, act, "post_", training=training)
        if cfg.output_num_features > 0:
            x = self._conv_nb(x, cfg.output_num_features, 1, 1, "features_", padding="VALID")
            x = self._bn_act(x, act, "features_", training=training)

        if feature_names:
            missing_names = [n for n in feature_names if n not in feats]
            if missing_names:
                raise KeyError(
                    f"unknown feature names {missing_names}; available: {sorted(feats)}"
                )
            return [feats[n] for n in feature_names]
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

    def _aot_block(self, x, filters, stride, conv_shortcut, ratio, drop_rate, stack_cfg, name, training):
        cfg = self.cfg
        act = cfg.activation

        # halo gap pad: center-pad H/W to the halo block multiple (:156-164)
        if stack_cfg.get("attn_type") == "halo":
            bs = (stack_cfg.get("attn_params") or {}).get("block_size", 4)
            h, w = x.shape[1], x.shape[2]
            gap_h = (bs - h % bs) % bs
            gap_w = (bs - w % bs) % bs
            if gap_h or gap_w:
                x = jnp.pad(
                    x,
                    ((0, 0), (gap_h // 2, gap_h - gap_h // 2), (gap_w // 2, gap_w - gap_w // 2), (0, 0)),
                )

        if cfg.preact:
            pre = self._bn_act(x, act, name + "preact_", training=training)
        else:
            pre = x

        if conv_shortcut:
            sc = pre
            sc_stride = stride
            if stride > 1 and cfg.shortcut_type == "avg":
                sc = nn.avg_pool(sc, (stride, stride), strides=(stride, stride), padding="SAME", count_include_pad=False)
                sc_stride = 1
            elif stride > 1 and cfg.shortcut_type == "anti_alias":
                sc = AntiAliasDownsample(kernel_size=3, strides=2, name=name + "shortcut_down")(sc)
                sc_stride = 1
            if cfg.shortcut_type is None:
                shortcut = None
            else:
                sc = self._conv_nb(sc, filters, 1, sc_stride, name + "shortcut_", padding="VALID")
                if not cfg.preact:
                    sc = self._bn_act(sc, None, name + "shortcut_", training=training)
                shortcut = sc
        else:
            shortcut = (
                nn.max_pool(x, (stride, stride), strides=(stride, stride), padding="SAME")
                if stride > 1
                else x
            )

        # deep branch (:119-137)
        hidden = int(filters * ratio)
        if cfg.use_3x3_kernel:
            deep = self._conv_nb(pre, hidden, 3, 1, name + "deep_1_")
        else:
            deep = self._conv_nb(pre, hidden, 1, 1, name + "deep_1_", padding="VALID")
        deep = self._bn_act(deep, act, name + "deep_1_", training=training)
        deep = self._attn_block(deep, hidden, stride, stack_cfg, name + "deep_2_", training)
        if not cfg.use_3x3_kernel:
            deep = self._conv_nb(deep, filters, 1, 1, name + "deep_3_", padding="VALID")

        if cfg.preact:
            deep = DropPath(drop_rate, name=name + "drop")(deep, training=training)
            return shortcut + deep if shortcut is not None else deep
        if not (cfg.use_3x3_kernel and cfg.bn_after_attn):
            deep = self._bn_act(deep, None, name + "3_", zero_gamma=True, training=training)
        deep = DropPath(drop_rate, name=name + "drop")(deep, training=training)
        out = shortcut + deep if shortcut is not None else deep
        if cfg.use_block_output_activation:
            out = apply_activation(out, act)
        return out


# ---------------------------------------------------------------------------
# registry: AotNet base sizes + ResNest family (resnest/resnest.py:69-89)
# ---------------------------------------------------------------------------

_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3), 200: (3, 24, 36, 3)}


def _aotnet(name, depth, **kw):
    return AotNet, AotNetConfig(name=name, num_blocks=_BLOCKS[depth], **kw)


@register_model
def aotnet50():
    return _aotnet("aotnet50", 50)


@register_model
def aotnet101():
    return _aotnet("aotnet101", 101)


def _resnest(name, num_blocks, stem_width, input_size):
    cfg = AotNetConfig(
        name=name,
        num_blocks=num_blocks,
        stem_width=stem_width,
        stem_type="deep",
        attn_types="sa",
        attn_params={"kernel_size": 3, "groups": 2},
        bn_after_attn=False,
        shortcut_type="avg",
        input_size=input_size,
    )
    return AotNet, cfg


@register_model
def ResNest50():
    return _resnest("ResNest50", (3, 4, 6, 3), 64, (224, 224))


@register_model
def ResNest101():
    return _resnest("ResNest101", (3, 4, 23, 3), 128, (256, 256))


@register_model
def ResNest200():
    return _resnest("ResNest200", (3, 24, 36, 3), 128, (320, 320))


@register_model
def ResNest269():
    return _resnest("ResNest269", (3, 30, 48, 8), 128, (416, 416))


# ResNet-D (kecam resnet_family/resnet_deep.py:12-36): deep stem + avg shortcut
def _resnet_d(name, depth, input_size=(224, 224), **kw):
    cfg = AotNetConfig(
        name=name,
        num_blocks=_BLOCKS[depth],
        stem_width=64,
        stem_type="deep",
        shortcut_type="avg",
        input_size=input_size,
        **kw,
    )
    return AotNet, cfg


@register_model
def ResNet50D():
    return _resnet_d("ResNet50D", 50)


@register_model
def ResNet101D():
    return _resnet_d("ResNet101D", 101)


@register_model
def ResNet152D():
    return _resnet_d("ResNet152D", 152)


@register_model
def ResNet200D():
    return _resnet_d("ResNet200D", 200)


# ResNeXt (kecam resnet_family/resnext.py): grouped 3x3, hidden ratio 0.5
def _resnext(name, num_blocks, hidden_ratio=0.5, groups=32, stem_type=None, se_ratio=0.0):
    cfg = AotNetConfig(
        name=name,
        num_blocks=num_blocks,
        hidden_channel_ratio=hidden_ratio,
        groups=groups,
        stem_type=stem_type,
        se_ratio=se_ratio,
    )
    return AotNet, cfg


@register_model
def ResNeXt50():
    return _resnext("ResNeXt50", (3, 4, 6, 3))


@register_model
def ResNeXt101():
    return _resnext("ResNeXt101", (3, 4, 23, 3))


@register_model
def ResNeXt50D():
    return _resnext("ResNeXt50D", (3, 4, 6, 3), stem_type="deep")


@register_model
def ResNeXt101W():
    return _resnext("ResNeXt101W", (3, 4, 23, 3), hidden_ratio=1.0)


@register_model
def ResNeXt101W_64():
    return _resnext("ResNeXt101W_64", (3, 4, 23, 3), hidden_ratio=1.0, groups=64)


# ---------------------------------------------------------------------------
# BotNet (kecam botnet/botnet.py): aotnet with 'bot' MHSA blocks
# ---------------------------------------------------------------------------


@register_model
def BotNet50():
    return AotNet, AotNetConfig(
        name="BotNet50", num_blocks=(3, 4, 6, 3),
        attn_types=(None, None, None, "bot"),
        attn_params={"num_heads": 4},
        strides=(1, 2, 2, 1),  # BotNet ctor: strides=1 for the last stack
    )


@register_model
def BotNet26T():
    return AotNet, AotNetConfig(
        name="BotNet26T", num_blocks=(2, 2, 2, 2), input_size=(256, 256),
        attn_types=(None, None, (None, "bot"), "bot"),
        attn_params={"num_heads": 4, "out_weight": False},
        stem_type="tiered",
    )


@register_model
def BotNextECA26T():
    return AotNet, AotNetConfig(
        name="BotNextECA26T", num_blocks=(2, 2, 2, 2), input_size=(256, 256),
        attn_types=(None, None, (None, "bot"), "bot"),
        attn_params={"num_heads": 4, "key_dim": 16, "out_weight": False},
        use_eca=True, group_size=16, stem_type="tiered", activation="swish",
    )


@register_model
def BotNetSE33T():
    return AotNet, AotNetConfig(
        name="BotNetSE33T", num_blocks=(2, 3, 3, 2), input_size=(256, 256),
        out_channels=(256, 512, 1024, 1536),
        hidden_channel_ratio=(0.25, 0.25, 0.25, 1 / 3),
        attn_types=(None, (None, None, "bot"), (None, None, "bot"), "bot"),
        attn_params={"num_heads": 4, "out_weight": False},
        se_ratio=0.25, stem_type="tiered", stem_last_strides=2,
        stem_downsample=False, activation="swish",
    )


# HaloNet (kecam halonet/halonet.py): aotnet with 'halo' attention
@register_model
def HaloNet26T():
    return AotNet, AotNetConfig(
        name="HaloNet26T", num_blocks=(2, 2, 2, 2), input_size=(256, 256),
        attn_types=(None, None, (None, "halo"), "halo"),
        attn_params=(
            None, None,
            (None, {"block_size": 8, "halo_size": 2, "num_heads": 8, "out_weight": False}),
            {"block_size": 8, "halo_size": 2, "num_heads": 8, "out_weight": False},
        ),
        stem_type="tiered",
    )


@register_model
def HaloNextECA26T():
    return AotNet, AotNetConfig(
        name="HaloNextECA26T", num_blocks=(2, 2, 2, 2), input_size=(256, 256),
        attn_types=(None, None, (None, "halo"), "halo"),
        attn_params=(
            None, None,
            (None, {"block_size": 8, "halo_size": 2, "num_heads": 8, "key_dim": 16, "out_weight": False}),
            {"block_size": 8, "halo_size": 2, "num_heads": 8, "key_dim": 16, "out_weight": False},
        ),
        use_eca=True, group_size=16, stem_type="tiered", activation="swish",
    )


# CotNet (kecam cotnet/cotnet.py): aotnet with 'cot' contextual attention
@register_model
def CotNet50():
    return AotNet, AotNetConfig(
        name="CotNet50", num_blocks=(3, 4, 6, 3),
        attn_types="cot", bn_after_attn=False, shortcut_type="avg",
    )


@register_model
def CotNet101():
    return AotNet, AotNetConfig(
        name="CotNet101", num_blocks=(3, 4, 23, 3),
        attn_types="cot", bn_after_attn=False, shortcut_type="avg",
    )


@register_model
def CotNetSE50D():
    return AotNet, AotNetConfig(
        name="CotNetSE50D", num_blocks=(3, 4, 6, 3), strides=(2, 2, 2, 2),
        attn_types=("sa", "sa", ("cot", "sa") * 3, "cot"),
        attn_params=(
            {"downsample_first": True, "groups": 1, "activation": "swish"},
            {"downsample_first": True, "groups": 1, "activation": "swish"},
            ({}, {"downsample_first": True, "groups": 1, "activation": "swish"}) * 3,
            {},
        ),
        bn_after_attn=False, shortcut_type="avg",
        stem_type="deep", stem_width=64, stem_downsample=False,
    )
