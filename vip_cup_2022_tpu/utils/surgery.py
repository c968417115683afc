"""Model surgery on variable pytrees.

Parity surface: kecam model_surgery/model_surgery.py —
- conv-BN fusion (:407-501) — here a pytree transform: BN folds into the
  preceding conv's kernel/bias, BN stats replaced by identity
- mixed-precision convert (:367-406) — dtype cast of params
- FLOPs (:344) / params count (:357) — via jax cost analysis
- stochastic-depth add<->swap, L2 injection, ReLU replacement operate on
  *configs* in this framework (models are rebuilt from dataclasses, not
  graph-edited): see ``replace_activation`` / ``add_l2_regularizer`` notes.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def count_params(variables) -> int:
    tree = variables.get("params", variables)
    return int(sum(np.prod(x.shape) for x in flatten_dict(tree).values()))


def get_flops(fn, *example_args) -> float:
    """Analytical FLOPs from XLA's cost analysis of the jitted forward
    (replaces the frozen-graph tf.profiler counts — tfimm utils/flops.py)."""
    lowered = jax.jit(fn).lower(*example_args)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0))


def convert_precision(variables, dtype=jnp.bfloat16, keep_f32_names=("moving_mean", "moving_variance")):
    """Cast params to a lower precision (model_surgery convert_to_mixed_float16
    analogue); BN statistics stay f32."""
    flat = flatten_dict(variables, sep=None)
    out = {
        k: (v if (k[-1] in keep_f32_names) else v.astype(dtype))
        for k, v in flat.items()
    }
    return unflatten_dict(out)


def fuse_conv_bn(variables, conv_path: Tuple[str, ...], bn_path: Tuple[str, ...], eps: float = 1e-5):
    """Fold one BN into its preceding conv (model_surgery fuse_conv_bn):
    w' = w * gamma / sqrt(var + eps); b' = beta - gamma * mean / sqrt(var+eps).
    Returns a new variables dict with the BN neutralized.

    The BN is neutralized without changing the pytree structure: stats become
    (mean=0, var=1-eps) so ``rsqrt(var + eps)`` is exactly 1, gamma=1. When
    the conv has no bias param, the fused bias lives in the BN's beta instead
    (a bare channel add XLA folds into the conv epilogue); otherwise beta=0
    and the conv bias carries it."""
    params = flatten_dict(variables["params"])
    stats = flatten_dict(variables.get("batch_stats", {}))

    kernel = np.asarray(params[conv_path + ("kernel",)])
    has_bias = conv_path + ("bias",) in params
    bias = (
        np.asarray(params[conv_path + ("bias",)])
        if has_bias
        else np.zeros(kernel.shape[-1], np.float32)
    )
    gamma = np.asarray(params[bn_path + ("gamma",)])
    beta = np.asarray(params[bn_path + ("beta",)])
    mean = np.asarray(stats[bn_path + ("moving_mean",)])
    var = np.asarray(stats[bn_path + ("moving_variance",)])

    scale = gamma / np.sqrt(var + eps)
    fused_bias = (bias - mean) * scale + beta
    params[conv_path + ("kernel",)] = jnp.asarray(kernel * scale)
    params[bn_path + ("gamma",)] = jnp.ones_like(jnp.asarray(gamma))
    stats[bn_path + ("moving_mean",)] = jnp.zeros_like(jnp.asarray(mean))
    stats[bn_path + ("moving_variance",)] = jnp.full_like(
        jnp.asarray(var), 1.0 - eps
    )
    if has_bias:
        params[conv_path + ("bias",)] = jnp.asarray(fused_bias)
        params[bn_path + ("beta",)] = jnp.zeros_like(jnp.asarray(beta))
    else:
        params[bn_path + ("beta",)] = jnp.asarray(fused_bias)

    out = dict(variables)
    out["params"] = unflatten_dict(params)
    if stats:
        out["batch_stats"] = unflatten_dict(stats)
    return out


# conv-module wrapper leaves: a DepthwiseConv module holds its nn.Conv as
# 'dw_conv'; toolkit Conv wrappers hold theirs as 'conv'
_CONV_WRAPPER_LEAVES = ("conv", "dw_conv")
_BN_SPELLINGS = ("bn", "batch_norm", "batchnorm")


def discover_conv_bn_pairs(variables):
    """Find (conv_module, bn_module) pairs by the framework's naming
    conventions: a conv module (4-D kernel) pairs with the BN in the same
    parent whose name is the conv's with 'conv' -> 'bn'/'batch_norm'
    (kecam ``X_conv``/``X_bn``, resnet_rs ``conv_1``/``batch_norm_1``,
    ``projection_conv``/``projection_batch_norm``), with matching channel
    counts. Wrapper leaves ('conv' inside a named conv module) are stripped
    before matching. Each BN pairs at most once."""
    params = flatten_dict(variables["params"])
    stats = flatten_dict(variables.get("batch_stats", {}))
    bns = {p[:-1] for p in stats if p[-1] == "moving_mean"}
    pairs = []
    used = set()
    for path in sorted(p for p in params if p[-1] == "kernel" and params[p].ndim == 4):
        conv_mod = path[:-1]
        base = conv_mod
        if len(base) > 1 and base[-1] in _CONV_WRAPPER_LEAVES:
            base = base[:-1]
        name = base[-1]
        if "conv" not in name:
            continue
        for repl in _BN_SPELLINGS:
            cand = base[:-1] + (name.replace("conv", repl),)
            if (
                cand in bns
                and cand not in used
                and stats[cand + ("moving_mean",)].shape[-1] == params[path].shape[-1]
            ):
                pairs.append((conv_mod, cand))
                used.add(cand)
                break
    return pairs


def fuse_all_conv_bn(variables, eps: float = 1e-5, pairs=None):
    """Fold EVERY conv->BN pair in a model (reference model_surgery
    fuse_conv_bn walks the whole Keras graph, model_surgery.py:407-501).

    ``pairs`` defaults to :func:`discover_conv_bn_pairs`. ``eps`` must match
    the model's BN epsilon (resnet_rs 1e-5; efficientnet 1e-3 tf-mode /
    1e-5 torch-mode). Returns ``(fused_variables, pairs)``.

    Bench note (v5e, r3): XLA already folds inference-mode BN multiplies into
    the conv epilogue, so fusing moves throughput by ~0 on the ensemble —
    the tool's value is for export/quantization paths, not runtime speed.
    """
    if pairs is None:
        pairs = discover_conv_bn_pairs(variables)
    for conv_path, bn_path in pairs:
        variables = fuse_conv_bn(variables, conv_path, bn_path, eps=eps)
    return variables, pairs


def replace_activation(cfg, target_activation: str):
    """Configs are the graph here: rebuilding with a different activation is
    the kecam ``replace_ReLU`` equivalent."""
    return cfg.replace(activation=target_activation) if hasattr(cfg, "activation") else cfg


# -- stochastic depth add<->swap ---------------------------------------------
# Config-level analogues of kecam model_surgery.py:188-271: models here are
# rebuilt from dataclass configs, and every family expresses its residual
# drop-path as ONE terminal rate that block builders spread linearly over
# depth (rate * block_index / total — exactly the reference's
# ``start - (1 - end) * i / total`` survival ramp with start=1, end=1-rate).

_DROP_FIELDS = ("drop_path_rate", "drop_connect_rate")


def _drop_field(cfg) -> str:
    for f in _DROP_FIELDS:
        if hasattr(cfg, f):
            return f
    raise ValueError(
        f"config {type(cfg).__name__} has no stochastic-depth field "
        f"(looked for {_DROP_FIELDS})"
    )


def add_stochastic_depth(cfg, survivals=(1.0, 0.8)):
    """``replace_add_with_stochastic_depth`` analogue (model_surgery.py:188-219):
    set the config's terminal drop-path rate from a survival spec. ``survivals``
    is a float (constant survival) or ``(start, end)`` linear ramp; the ramp
    must start at 1.0 — that is the only schedule the linspace block builders
    can express (and the only one the reference's own models use). Rebuild the
    module from the returned config and re-use the same variables (drop-path
    has no weights)."""
    if isinstance(survivals, (tuple, list)):
        start, end = survivals
        if abs(start - 1.0) > 1e-6:
            raise ValueError(
                f"survival ramps must start at 1.0 (got {start}); the config "
                "parametrizes drop-path as a 0->rate linspace over depth"
            )
        rate = 1.0 - float(end)
    else:
        raise ValueError(
            "constant per-block survival is not expressible as the configs' "
            "linear ramp; pass (1.0, end)"
        )
    return cfg.replace(**{_drop_field(cfg): rate})


def remove_stochastic_depth(cfg):
    """``replace_stochastic_depth_with_add(drop_survival=True)`` analogue
    (model_surgery.py:258-271): zero the drop-path rate. DropPath modules are
    identity at rate 0 (and in eval mode regardless), so existing variables
    keep working on the rebuilt module."""
    return cfg.replace(**{_drop_field(cfg): 0.0})


# -- input-shape change -------------------------------------------------------

def _maybe_square_grid(n: int):
    r = int(round(n ** 0.5))
    return (r, r) if r * r == n else None


def change_input_shape(name: str, variables, new_input_size, method: str = "bilinear",
                       **overrides):
    """Rebuild model ``name`` at ``new_input_size`` and transfer weights,
    interpolating every position-dependent parameter whose shape changed
    (kecam model_surgery.py:170-185 ``change_model_input_shape`` + the
    download_and_load.py:50-79 pos-emb mismatch reload, in one call).

    Handled mismatches, matched structurally (all other params copy 1:1 via
    :func:`..models.factory.transfer_weights`):
    - ``(1, N, C)`` token pos-embeds (ViT/CaiT/PVT) — prefix tokens (cls/dist)
      preserved, grid bilinearly resized
    - ``(1, H, W, C)`` / ``(1, C, H, W)`` spatial pos-embeds (PiT)
    - ``(M, heads)`` relative-position bias tables with M=(2H-1)*(2W-1)
      (Swin/GCViT) — resized on the (2H-1, 2W-1) grid

    Returns ``(module, variables, cfg)`` like ``create_model``.
    """
    from ..models.factory import create_model, transfer_weights
    from ..ops.resize import resize, resize_positional_embedding

    module, new_vars, cfg = create_model(
        name, input_size=tuple(new_input_size), **overrides
    )
    src = flatten_dict(variables)
    dst = flatten_dict(new_vars)
    out = dict(dst)
    patched = set()
    for path, dv in dst.items():
        sv = src.get(path)
        if sv is None or tuple(sv.shape) == tuple(dv.shape):
            continue
        sv = jnp.asarray(np.asarray(sv), dtype=dv.dtype)
        fixed = None
        if sv.ndim == 3 and sv.shape[0] == 1 and sv.shape[-1] == dv.shape[-1]:
            # token pos-embed: find a prefix length making both grids square
            for prefix in (0, 1, 2):
                sg = _maybe_square_grid(sv.shape[1] - prefix)
                dg = _maybe_square_grid(dv.shape[1] - prefix)
                if sg and dg:
                    fixed = resize_positional_embedding(
                        sv, sg, dg, num_prefix_tokens=prefix
                    )
                    break
        elif sv.ndim == 4 and sv.shape[0] == 1:
            if sv.shape[-1] == dv.shape[-1]:  # NHWC
                fixed = resize(sv, dv.shape[1:3], method=method)
            elif sv.shape[1] == dv.shape[1]:  # NCHW (PiT)
                fixed = jnp.transpose(
                    resize(jnp.transpose(sv, (0, 2, 3, 1)), dv.shape[2:4],
                           method=method),
                    (0, 3, 1, 2),
                )
        elif sv.ndim == 2 and sv.shape[-1] == dv.shape[-1]:
            # relative bias table (M, heads), M = (2H-1)*(2W-1)
            sg = _maybe_square_grid(sv.shape[0])
            dg = _maybe_square_grid(dv.shape[0])
            if sg and dg and sg[0] % 2 == 1 and dg[0] % 2 == 1:
                grid = sv.reshape(1, sg[0], sg[1], sv.shape[-1])
                grid = resize(grid, dg, method=method)
                fixed = grid.reshape(dg[0] * dg[1], sv.shape[-1])
        if fixed is not None and tuple(fixed.shape) == tuple(dv.shape):
            out[path] = fixed.astype(dv.dtype)
            patched.add(path)
    # hand transfer_weights a source where the patched params already have
    # the destination shapes (exact copies), so everything else follows the
    # standard copy/adapt/warn rules with no false mismatch reports
    merged_src = dict(src)
    for k in patched:
        merged_src[k] = out[k]
    merged = transfer_weights(
        unflatten_dict(merged_src), new_vars, on_mismatch="warn"
    )
    return module, merged, cfg
