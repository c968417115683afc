"""ConvNeXt family (ensemble member convnext_tiny_in22k-200x200; NAME2BS also
lists base/large 22k/22ft1k variants).

Architecture parity with reference models/tfimm/architectures/convnext.py:
- block: pad3 + dwconv7x7 -> LN(1e-6) -> MLP (dense or conv flavor) ->
  layer-scale gamma -> drop-path -> residual (:147-229)
- stage: LN + conv2x2 s2 downsample, then blocks (:232-296)
- stem: conv patch_size=4, stride ``first_down * 2`` — the team's ``first_down``
  knob and the ``_fd2`` variants (:115, :323, :528-537, :646-656)
- head: GAP -> LN -> dropout -> fc (:353-360, call :411-438)

TPU notes: NHWC; the 7x7 depthwise runs as a grouped conv XLA maps to the
convolution unit; LN stats in f32.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import DropPath, LayerNorm, apply_activation
from .base import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, ModelConfig, preprocess_input
from .registry import register_model

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig(ModelConfig):
    patch_size: int = 4
    first_down: int = 1  # team modification (convnext.py:115)
    embed_dim: Tuple[int, ...] = (96, 192, 384, 768)
    nb_blocks: Tuple[int, ...] = (3, 3, 9, 3)
    mlp_ratio: float = 4.0
    conv_mlp_block: bool = False
    drop_path_rate: float = 0.1
    norm_eps: float = 1e-6
    act_layer: str = "gelu"
    init_scale: float = 1e-6
    crop_pct: float = 0.875
    classifier_activation: Optional[str] = "softmax"
    # fused whole-block Pallas kernel (ops/pallas/convnext_block.py) on the
    # inference path: None = auto (TPU backend, dense-MLP flavor), or
    # force on/off. Training always uses the unfused path (XLA-derived grads).
    fused_block: Optional[bool] = None


def _use_fused_block(cfg, training: bool) -> bool:
    import os

    if training or cfg.conv_mlp_block or cfg.act_layer != "gelu" or cfg.drop_rate:
        return False
    if cfg.fused_block is not None:
        return cfg.fused_block
    if os.environ.get("VIPTPU_NO_FUSED_BLOCK"):
        return False
    import jax

    return jax.default_backend() == "tpu"


def _fused_min_c() -> int:
    """Channel threshold for the whole-image fused kernel (wide stages).
    VIPTPU_CONVNEXT_FUSED_MIN_C overrides for A/B runs — e.g. a huge value
    keeps the batch-last narrow-stage path but sends wide stages to XLA."""
    import os

    return int(os.environ.get("VIPTPU_CONVNEXT_FUSED_MIN_C", "256"))


class ConvNeXtBlock(nn.Module):
    cfg: ConvNeXtConfig
    embed_dim: int
    drop_path_rate: float

    @nn.compact
    def __call__(self, x, training: bool = False, batch_last: bool = False):
        cfg = self.cfg
        c = self.embed_dim
        # Narrow stages (C < 256, stages 1-2) run batch-last: the stage loop
        # transposes to (H, W, C, B) once, every block runs the HWCN
        # block-diagonal depthwise + batch-lane LN/MLP kernel (batch = lane
        # dim, 128-aligned regardless of C), and the stage transposes back.
        # Measured v5e 256-batch marginals: 13.3 ms/block at 99x99x96 vs ~24
        # XLA; 1-4 ms at 49x49x192 vs 14.4 (tools/exp_convnext_s12.py).
        if batch_last and not self.is_initializing():
            import jax

            from ..ops.pallas.convnext_block import fused_convnext_block_batchlane

            p = self.variables["params"]
            return fused_convnext_block_batchlane(
                x,
                p["conv_dw"]["kernel"][:, :, 0, :],
                p["conv_dw"]["bias"],
                p["norm"]["gamma"],
                p["norm"]["beta"],
                p["mlp_fc1"]["kernel"],
                p["mlp_fc1"]["bias"],
                p["mlp_fc2"]["kernel"],
                p["mlp_fc2"]["bias"],
                p["gamma"],
                eps=cfg.norm_eps,
                interpret=jax.default_backend() != "tpu",
            )
        # fused whole-image kernel pays off at C >= 256 (few positions,
        # wide channels: stages 3-4), where the VPU depthwise taps are cheap
        # and the single VMEM pass beats XLA ~1.5x. In f32 (VIPTPU_DTYPE
        # escape hatch) the MLP weights alone blow the 16 MB scoped-VMEM
        # limit at C=768 (2*768*3072*4 = 18.9 MB) — fall back to XLA there.
        f32_vmem_ok = jnp.dtype(cfg.dtype or jnp.float32) != jnp.float32 or c < 768
        if (c >= _fused_min_c() and f32_vmem_ok
                and _use_fused_block(cfg, training) and not self.is_initializing()):
            # whole-block Pallas kernel; params already exist during apply
            # (init always takes the unfused path below, creating them)
            import jax

            from ..ops.pallas.convnext_block import fused_convnext_block

            p = self.variables["params"]
            return fused_convnext_block(
                x,
                p["conv_dw"]["kernel"][:, :, 0, :],
                p["conv_dw"]["bias"],
                p["norm"]["gamma"],
                p["norm"]["beta"],
                p["mlp_fc1"]["kernel"],
                p["mlp_fc1"]["bias"],
                p["mlp_fc2"]["kernel"],
                p["mlp_fc2"]["bias"],
                p["gamma"],
                eps=cfg.norm_eps,
                interpret=jax.default_backend() != "tpu",
            )
        shortcut = x
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = nn.Conv(
            c, (7, 7), padding="VALID", feature_group_count=c, dtype=cfg.dtype, name="conv_dw"
        )(x)
        x = LayerNorm(epsilon=cfg.norm_eps, name="norm")(x)
        # MLP: dense flavor (timm's default for these variants); the conv
        # flavor is pointwise 1x1 convs — identical math, same param shapes
        hidden = int(cfg.mlp_ratio * c)
        if cfg.conv_mlp_block:
            x = nn.Conv(hidden, (1, 1), dtype=cfg.dtype, name="mlp_fc1")(x)
            x = apply_activation(x, cfg.act_layer)
            x = nn.Conv(c, (1, 1), dtype=cfg.dtype, name="mlp_fc2")(x)
        else:
            x = nn.Dense(hidden, dtype=cfg.dtype, name="mlp_fc1")(x)
            x = apply_activation(x, cfg.act_layer)
            x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)
            x = nn.Dense(c, dtype=cfg.dtype, name="mlp_fc2")(x)
            x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)
        gamma = self.param("gamma", nn.initializers.constant(cfg.init_scale), (c,), jnp.float32)
        x = x * gamma.astype(x.dtype)
        x = DropPath(self.drop_path_rate, name="drop_path")(x, training=training)
        return x + shortcut


class ConvNeXt(nn.Module):
    cfg: ConvNeXtConfig

    @nn.compact
    def __call__(self, x, training: bool = False, features_only: bool = False):
        cfg = self.cfg
        x = preprocess_input(x, cfg)
        x = nn.Conv(
            cfg.embed_dim[0],
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.first_down * 2, cfg.first_down * 2),
            padding="VALID",
            dtype=cfg.dtype,
            name="stem_conv",
        )(x)
        x = LayerNorm(epsilon=cfg.norm_eps, name="stem_norm")(x)

        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.nb_blocks))
        pos = 0
        fused = _use_fused_block(cfg, training) and not self.is_initializing()
        in_batch_last = False
        for j, nb in enumerate(cfg.nb_blocks):
            # narrow stages run batch-last (see ConvNeXtBlock)
            batch_last = fused and cfg.embed_dim[j] < 256
            if j > 0:
                if in_batch_last and batch_last:
                    # both sides of this boundary are batch-last: run the
                    # LN + 2x2/s2 downsample IN (H, W, C, B) instead of
                    # transposing out and back (the round trip at 99x99x96
                    # cost ~20 ms of s2's 29.8 ms stage marginal,
                    # tools/exp_convnext_stages.py). Params were created by
                    # the module path during init; numerics mirror
                    # ops/norms.LayerNorm (f32 stats) and nn.Conv (compute
                    # in cfg.dtype) exactly.
                    import jax

                    p = self.variables["params"]
                    pn = p[f"stages_{j}_downsample_norm"]
                    pc = p[f"stages_{j}_downsample_conv"]
                    # E[x^2]-E[x]^2 stats (the whole-image kernel's form):
                    # both reduces and the apply consume x directly, so XLA
                    # fuses the f32 convert into each pass instead of
                    # materializing a full f32 copy (profiled 2.3 ms at
                    # 99x99x96x256 for the two-pass jnp.var form)
                    mean = jnp.mean(x, axis=2, keepdims=True,
                                    dtype=jnp.float32)
                    if (x.dtype == jnp.bfloat16 and
                            os.environ.get("VIPTPU_LN_BF16_SQ", "0") == "1"):
                        # see ops/norms.py: bf16 square + f32 accumulate
                        # keeps the apply's x convert single-consumer so it
                        # fuses instead of materializing (2.3 ms at s1->s2)
                        ex2 = jnp.mean(jax.lax.square(x), axis=2,
                                       keepdims=True, dtype=jnp.float32)
                    else:
                        ex2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)),
                                       axis=2, keepdims=True)
                    inv = jax.lax.rsqrt(ex2 - mean * mean + cfg.norm_eps)
                    y = (x.astype(jnp.float32) - mean) * inv
                    y = y * pn["gamma"][:, None] + pn["beta"][:, None]
                    y = y.astype(x.dtype)
                    cd = cfg.dtype or jnp.promote_types(x.dtype, pc["kernel"].dtype)
                    x = jax.lax.conv_general_dilated(
                        y.astype(cd), jnp.asarray(pc["kernel"], cd),
                        (2, 2), "VALID",
                        dimension_numbers=("HWCN", "HWIO", "HWCN"),
                    ) + jnp.asarray(pc["bias"], cd)[:, None]
                else:
                    if in_batch_last:
                        x = jnp.transpose(x, (3, 0, 1, 2))
                        in_batch_last = False
                    x = LayerNorm(epsilon=cfg.norm_eps, name=f"stages_{j}_downsample_norm")(x)
                    x = nn.Conv(
                        cfg.embed_dim[j], (2, 2), strides=(2, 2), padding="VALID",
                        dtype=cfg.dtype, name=f"stages_{j}_downsample_conv",
                    )(x)
            if batch_last and not in_batch_last:
                x = jnp.transpose(x, (1, 2, 3, 0))
            in_batch_last = batch_last
            for idx in range(nb):
                x = ConvNeXtBlock(
                    cfg, cfg.embed_dim[j], float(dpr[pos]), name=f"stages_{j}_blocks_{idx}"
                )(x, training=training, batch_last=batch_last)
                pos += 1
        if in_batch_last:
            x = jnp.transpose(x, (3, 0, 1, 2))

        if features_only:
            return x
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = LayerNorm(epsilon=cfg.norm_eps, name="head_norm")(x)
        x = nn.Dropout(cfg.drop_rate, deterministic=not training)(x)
        if cfg.nb_classes <= 0:
            return x
        x = nn.Dense(cfg.nb_classes, dtype=jnp.float32, name="head_fc")(x)
        if cfg.classifier_activation:
            x = apply_activation(x, cfg.classifier_activation)
        return x


_DIMS = {
    "tiny": ((96, 192, 384, 768), (3, 3, 9, 3)),
    "small": ((96, 192, 384, 768), (3, 3, 27, 3)),
    "base": ((128, 256, 512, 1024), (3, 3, 27, 3)),
    "large": ((192, 384, 768, 1536), (3, 3, 27, 3)),
    "xlarge": ((256, 512, 1024, 2048), (3, 3, 27, 3)),
}


def _make(name: str, size: str, **kw):
    dims, blocks = _DIMS[size]
    return ConvNeXt, ConvNeXtConfig(name=name, embed_dim=dims, nb_blocks=blocks, **kw)


# registry mirrors the reference variant set (convnext.py:441-676), including
# the team's _fd2 first-down-2 models
@register_model
def convnext_tiny():
    return _make("convnext_tiny", "tiny")


@register_model
def convnext_small():
    return _make("convnext_small", "small")


@register_model
def convnext_base():
    return _make("convnext_base", "base")


@register_model
def convnext_large():
    return _make("convnext_large", "large")


@register_model
def convnext_tiny_in22ft1k():
    return _make("convnext_tiny_in22ft1k", "tiny")


@register_model
def convnext_small_in22ft1k():
    return _make("convnext_small_in22ft1k", "small")


@register_model
def convnext_base_in22ft1k():
    return _make("convnext_base_in22ft1k", "base")


@register_model
def convnext_large_in22ft1k():
    return _make("convnext_large_in22ft1k", "large")


@register_model
def convnext_large_in22ft1k_fd2():
    return _make("convnext_large_in22ft1k_fd2", "large", first_down=2)


@register_model
def convnext_xlarge_in22ft1k():
    return _make("convnext_xlarge_in22ft1k", "xlarge")


@register_model
def convnext_tiny_384_in22ft1k():
    return _make("convnext_tiny_384_in22ft1k", "tiny", input_size=(384, 384), crop_pct=1.0)


@register_model
def convnext_small_384_in22ft1k():
    return _make("convnext_small_384_in22ft1k", "small", input_size=(384, 384), crop_pct=1.0)


@register_model
def convnext_base_384_in22ft1k():
    return _make("convnext_base_384_in22ft1k", "base", input_size=(384, 384), crop_pct=1.0)


@register_model
def convnext_large_384_in22ft1k():
    return _make("convnext_large_384_in22ft1k", "large", input_size=(384, 384), crop_pct=1.0)


@register_model
def convnext_xlarge_384_in22ft1k():
    return _make("convnext_xlarge_384_in22ft1k", "xlarge", input_size=(384, 384), crop_pct=1.0)


@register_model
def convnext_tiny_in22k():
    return _make("convnext_tiny_in22k", "tiny", nb_classes=21841)


@register_model
def convnext_small_in22k():
    return _make("convnext_small_in22k", "small", nb_classes=21841)


@register_model
def convnext_base_in22k():
    return _make("convnext_base_in22k", "base", nb_classes=21841)


@register_model
def convnext_base_in22k_fd2():
    return _make("convnext_base_in22k_fd2", "base", nb_classes=21841, first_down=2)


@register_model
def convnext_large_in22k():
    return _make("convnext_large_in22k", "large", nb_classes=21841)


@register_model
def convnext_xlarge_in22k():
    return _make("convnext_xlarge_in22k", "xlarge", nb_classes=21841)
