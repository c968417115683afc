"""GCViT — Global Context Vision Transformer (ensemble member GCViTTiny@224).

Architecture parity with the reference's own gcvit-tf zoo
(models/gcvit/, awsaf49/gcvit-tf):
- Stem: ZeroPad+Conv3x3 s2 (with bias) then ReduceSize(keep_dim)
  (layers/embedding.py:7-29)
- ReduceSize: LN -> [pad, dwconv3x3, gelu, SE, 1x1] residual -> pad ->
  strided 3x3 reduction -> LN (layers/feature.py ReduceSize)
- FeatExtract pyramid GlobalQueryGen with per-level keep_dims
  [(F,F,F),(F,F),(T,),(T,)] (gcvit.py:72, feature.py:163-188)
- GCViTBlock: LN -> window_partition -> WindowAttention (global query on odd
  blocks — level.py:31) -> window_reverse -> layer-scale residuals
  (layers/block.py:10-99)
- FitWindow centered pad + crop-back (feature.py:234-249, level.py:61-63)
- sizes xxtiny..base from NAME2CONFIG (models/gcvit.py:9-42); team
  ``first_strides`` knob (gcvit.py:47)

TPU-native: everything is static-shape reshapes/transposes + batched MXU
matmuls; the FitWindow pad amounts are Python ints at trace time.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import DropPath, LayerNorm, apply_activation
from ..ops.attention import WindowAttention
from ..ops.mlp import Mlp
from ..ops.window import window_partition, window_reverse
from .base import ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class GCViTConfig(ModelConfig):
    window_size: Tuple[int, ...] = (7, 7, 14, 7)
    dim: int = 64
    depths: Tuple[int, ...] = (3, 4, 19, 5)
    num_heads: Tuple[int, ...] = (2, 4, 8, 16)
    mlp_ratio: float = 3.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.2  # path_drop
    layer_scale: Optional[float] = None
    # the team's pipeline feeds [0,1] straight in (no mean/std inside gcvit-tf)
    mean: Optional[Tuple[float, ...]] = None
    std: Optional[Tuple[float, ...]] = None
    classifier_activation: Optional[str] = "softmax"
    # fused window-transformer-block Pallas pipeline (ops/pallas/gcvit_block)
    # on the inference path: None = auto (TPU backend), or force on/off.
    fused_block: Optional[bool] = None


def _use_fused_block(cfg, training: bool) -> bool:
    import os

    if training or cfg.drop_rate or cfg.attn_drop:
        return False
    if cfg.fused_block is not None:
        return cfg.fused_block
    if os.environ.get("VIPTPU_NO_FUSED_BLOCK"):
        return False
    import jax

    return jax.default_backend() == "tpu"


class SE(nn.Module):
    """gcvit's own SE flavor: bias-free Dense squeeze/excite with gelu
    (layers/feature.py SE, expansion 0.25)."""

    expansion: float = 0.25
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        b, _, _, c = x.shape
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)  # (B, C)
        s = nn.Dense(int(c * self.expansion), use_bias=False, dtype=self.dtype, name="fc_0")(s)
        s = apply_activation(s, "gelu")
        s = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc_2")(s)
        s = apply_activation(s, "sigmoid")
        return x * s[:, None, None, :]


def _conv_branch(parent, x, dtype):
    """The shared pad->dwconv->gelu->SE->1x1 residual branch of
    ReduceSize/FeatExtract. Submodule names (conv_0/conv_2/conv_3) mirror the
    Keras sublayer list for weight conversion."""
    c = x.shape[-1]
    # explicit (lo, hi) conv padding: same zeros as the reference's
    # ZeroPadding2D, folded into the conv window (no materialized copy);
    # routed through apply_depthwise_conv so VIPTPU_DW_BLOCKDIAG can lower
    # it onto the MXU (stem dw at 112x112x64 profiled 3.9 ms true-dw)
    from ..ops.conv import apply_depthwise_conv

    r = apply_depthwise_conv(
        parent, x, (3, 3), 1, ((1, 1), (1, 1)), "conv_0", dtype=dtype,
        use_bias=False,
    )
    r = apply_activation(r, "gelu")
    r = SE(dtype=dtype, name="conv_2")(r)
    r = nn.Conv(c, (1, 1), padding="VALID", use_bias=False, dtype=dtype, name="conv_3")(r)
    return x + r


class ReduceSize(nn.Module):
    keep_dim: bool = False
    first_strides: int = 2
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        dim_out = dim if self.keep_dim else 2 * dim
        x = LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = _conv_branch(self, x, self.dtype)
        x = nn.Conv(
            dim_out, (3, 3), strides=(self.first_strides, self.first_strides),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            name="reduction",
        )(x)
        x = LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x


class FeatExtract(nn.Module):
    keep_dim: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = _conv_branch(self, x, self.dtype)
        if not self.keep_dim:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return x


class Stem(nn.Module):
    dim: int
    first_strides: int = 2
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), dtype=self.dtype, name="proj")(x)
        x = ReduceSize(keep_dim=True, first_strides=self.first_strides, dtype=self.dtype, name="conv_down")(x)
        return x


class GCViTBlock(nn.Module):
    cfg: GCViTConfig
    window_size: int
    num_heads: int
    global_query: bool
    path_drop: float

    @nn.compact
    def __call__(self, x, q_global=None, training: bool = False,
                 windowed: bool = False, pack: int = 1):
        cfg = self.cfg
        ws = self.window_size

        if windowed:
            # x is already window-partitioned tokens (B, nWin*N, C): the
            # level hoists partition/reverse outside its block loop (the
            # per-block round trip was ~0.5 ms/block at L1 — pure layout
            # copies that cancel between consecutive blocks). With pack > 1
            # the level also lane-packed image pairs (C=64 -> 128 lanes).
            return self._fused_tokens(x, q_global, pack=pack)
        b, h, w, c = x.shape

        if _use_fused_block(cfg, training) and not self.is_initializing():
            xw = window_partition(x, ws).reshape(b, -1, c)
            out = self._fused_tokens(xw, q_global)
            return window_reverse(out.reshape(-1, ws, ws, c), ws, h, w)

        shortcut = x
        y = LayerNorm(epsilon=1e-5, name="norm1")(x)
        y = window_partition(y, ws)
        y = y.reshape(-1, ws * ws, c)
        y = WindowAttention(
            window_size=ws,
            num_heads=self.num_heads,
            global_query=self.global_query,
            qkv_bias=cfg.qkv_bias,
            qk_scale=cfg.qk_scale,
            attn_drop=cfg.attn_drop,
            proj_drop=cfg.drop_rate,
            dtype=cfg.dtype,
            name="attn",
        )(y, q_global=q_global, training=training)
        y = y.reshape(-1, ws, ws, c)
        y = window_reverse(y, ws, h, w)

        if cfg.layer_scale is not None:
            gamma1 = self.param("gamma1", nn.initializers.constant(cfg.layer_scale), (c,), jnp.float32)
            gamma2 = self.param("gamma2", nn.initializers.constant(cfg.layer_scale), (c,), jnp.float32)
        else:
            gamma1 = gamma2 = 1.0

        x = shortcut + DropPath(self.path_drop, name="drop_path1")(y * gamma1, training=training)
        m = Mlp(
            hidden_features=int(c * cfg.mlp_ratio), activation="gelu",
            drop_rate=cfg.drop_rate, dtype=cfg.dtype, name="mlp",
        )(LayerNorm(epsilon=1e-5, name="norm2")(x), training=training)
        x = x + DropPath(self.path_drop, name="drop_path2")(gamma2 * m, training=training)
        return x

    def _fused_tokens(self, xw, q_global, pack: int = 1):
        """Whole-block fused Pallas pipeline on window-partitioned tokens
        (B, nWin*N, C) -> same shape (inference; params already exist during
        apply — init always runs the Flax path above, creating them).
        See ops/pallas/gcvit_block.py for the kernel structure.

        VIPTPU_GCVIT_MM=bf16|f32 overrides the kernels' GEMM dtype (default:
        follow the compute dtype; bf16 measured +5% on the full member and
        bf16-equivalent, tools/exp_member_ab.py) — read at trace time."""
        import os

        import jax

        from ..ops.attention import relative_position_index
        from ..ops.pallas.gcvit_block import fused_window_transformer_block

        cfg = self.cfg
        c = xw.shape[-1]
        ws = self.window_size
        p = self.variables["params"]
        attn = p["attn"]

        table = attn["relative_position_bias_table"]
        idx = relative_position_index(ws, ws).reshape(-1)
        bias = table[idx].reshape(ws * ws, ws * ws, self.num_heads)
        bias = jnp.transpose(bias, (2, 0, 1))  # (heads, N, N)

        sc = attn["qkv"]["kernel"].shape[1]
        bqkv = attn["qkv"].get("bias", jnp.zeros((sc,), jnp.float32))
        gamma1 = p.get("gamma1") if cfg.layer_scale is not None else None
        gamma2 = p.get("gamma2") if cfg.layer_scale is not None else None

        return fused_window_transformer_block(
            xw,
            heads=self.num_heads,
            n=ws * ws,
            ln1_g=p["norm1"]["gamma"], ln1_b=p["norm1"]["beta"],
            wqkv=attn["qkv"]["kernel"], bqkv=bqkv,
            bias=bias,
            wp=attn["proj"]["kernel"], bp=attn["proj"]["bias"],
            ln2_g=p["norm2"]["gamma"], ln2_b=p["norm2"]["beta"],
            w1=p["mlp"]["fc1"]["kernel"], b1=p["mlp"]["fc1"]["bias"],
            w2=p["mlp"]["fc2"]["kernel"], b2=p["mlp"]["fc2"]["bias"],
            gamma1=gamma1, gamma2=gamma2,
            scale=cfg.qk_scale,
            q_global=q_global,
            force_mm_dtype={"bf16": jnp.bfloat16, "f32": jnp.float32}.get(
                os.environ.get("VIPTPU_GCVIT_MM", "")),
            pack=pack,
            interpret=jax.default_backend() != "tpu",
        )


class GCViTLevel(nn.Module):
    cfg: GCViTConfig
    depth: int
    num_heads: int
    window_size: int
    keep_dims: Tuple[bool, ...]
    downsample: bool
    path_drops: Tuple[float, ...]

    @nn.compact
    def __call__(self, x, training: bool = False):
        ws = self.window_size
        b, h, w, c = x.shape
        # FitWindow: centered pad to the window multiple (feature.py:234-249)
        h_pad = (ws - h % ws) % ws
        w_pad = (ws - w % ws) % ws
        if h_pad or w_pad:
            x = jnp.pad(
                x,
                (
                    (0, 0),
                    (h_pad // 2, h_pad // 2 + h_pad % 2),
                    (w_pad // 2, w_pad // 2 + w_pad % 2),
                    (0, 0),
                ),
            )

        q_global = x
        for i, keep_dim in enumerate(self.keep_dims):
            q_global = FeatExtract(keep_dim, dtype=self.cfg.dtype, name=f"q_global_gen_to_q_global_{i}")(q_global)
        # q_global: (B, ws, ws, C) -> (B, N, C)
        q_global_tokens = q_global.reshape(b, ws * ws, c)

        # fused inference path: partition ONCE per level and run every block
        # on window tokens — per-block partition/reverse between consecutive
        # blocks are pure layout copies that cancel (profiled ~7.7 ms of
        # reshape/copy glue per GCViTTiny forward before the hoist)
        hoist = (_use_fused_block(self.cfg, training)
                 and not self.is_initializing())
        hp, wp = h + h_pad, w + w_pad
        # lane-packing (default OFF, measured negative): at C<128 (L1:
        # C=64) every (8,128) VMEM tile is half-empty — 210 GB/s effective
        # DMA and half-width VPU passes (tools/exp_attn_parts.py). Packing
        # image PAIRS along the lane axis makes every pass full-width, but
        # the block-diagonal qkv/proj/MLP weights double the per-image GEMM
        # FLOPs; measured member A/B 3,384-3,435 packed vs 3,598 img/s
        # unpacked (same session). VIPTPU_GCVIT_PACK=1 enables for A/Bs.
        import os as _os

        from ..ops.pallas.gcvit_block import (attn_mode, pack_lanes,
                                              unpack_lanes)

        pack = 1
        if (hoist and c < 128 and 128 % c == 0 and b % (128 // c) == 0
                and attn_mode() == "masked"
                and _os.environ.get("VIPTPU_GCVIT_PACK", "0") == "1"):
            pack = 128 // c
        if hoist:
            x = window_partition(x, ws).reshape(b, -1, c)
            if pack > 1:
                x = pack_lanes(x, pack)
                q_global_tokens = pack_lanes(q_global_tokens, pack)
        for i in range(self.depth):
            blk = GCViTBlock(
                self.cfg,
                window_size=ws,
                num_heads=self.num_heads,
                global_query=bool(i % 2),
                path_drop=self.path_drops[i],
                name=f"blocks_{i}",
            )
            x = blk(x, q_global=q_global_tokens if i % 2 else None,
                    training=training, windowed=hoist, pack=pack)
        if hoist:
            if pack > 1:
                x = unpack_lanes(x, pack)
            x = window_reverse(x.reshape(-1, ws, ws, c), ws, hp, wp)

        x = x[:, :h, :w, :]  # crop back (level.py:61-63)
        if self.downsample:
            x = ReduceSize(keep_dim=False, dtype=self.cfg.dtype, name="downsample")(x)
        return x


class GCViT(nn.Module):
    cfg: GCViTConfig

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        x = Stem(cfg.dim, first_strides=cfg.first_strides, dtype=cfg.dtype, name="patch_embed")(x)
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)

        path_drops = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.depths))
        keep_dims = [(False, False, False), (False, False), (True,), (True,)]
        for i, depth in enumerate(cfg.depths):
            lo = sum(cfg.depths[:i])
            x = GCViTLevel(
                cfg,
                depth=depth,
                num_heads=cfg.num_heads[i],
                window_size=cfg.window_size[i],
                keep_dims=tuple(keep_dims[i]),
                downsample=i < len(cfg.depths) - 1,
                path_drops=tuple(path_drops[lo : lo + depth].tolist()),
                name=f"levels_{i}",
            )(x, training=training)

        x = LayerNorm(epsilon=1e-5, name="norm")(x)
        if features_only:
            return x
        if cfg.pool == "avg":
            x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        elif cfg.pool == "max":
            x = jnp.max(x, axis=(1, 2)).astype(jnp.float32)
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head")(x)
        if cfg.classifier_activation:
            x = apply_activation(x, cfg.classifier_activation)
        return x


def _make(name, **kw):
    return GCViT, GCViTConfig(name=name, **kw)


@register_model
def gcvit_xxtiny():
    return _make("gcvit_xxtiny", depths=(2, 2, 6, 2), drop_path_rate=0.2)


@register_model
def gcvit_xtiny():
    return _make("gcvit_xtiny", depths=(3, 4, 6, 5), drop_path_rate=0.2)


@register_model
def gcvit_tiny():
    return _make("gcvit_tiny", depths=(3, 4, 19, 5), drop_path_rate=0.2)


@register_model
def gcvit_small():
    return _make(
        "gcvit_small", dim=96, depths=(3, 4, 19, 5), num_heads=(3, 6, 12, 24),
        mlp_ratio=2.0, drop_path_rate=0.3, layer_scale=1e-5,
    )


@register_model
def gcvit_base():
    return _make(
        "gcvit_base", dim=128, depths=(3, 4, 19, 5), num_heads=(4, 8, 16, 32),
        mlp_ratio=2.0, drop_path_rate=0.5, layer_scale=1e-5,
    )


# manifest aliases (ckpts.json / NAME2BS naming)
@register_model
def GCViTTiny():
    return _make("GCViTTiny", depths=(3, 4, 19, 5), drop_path_rate=0.2)


@register_model
def GCViTBase():
    return _make(
        "GCViTBase", dim=128, depths=(3, 4, 19, 5), num_heads=(4, 8, 16, 32),
        mlp_ratio=2.0, drop_path_rate=0.5, layer_scale=1e-5,
    )
