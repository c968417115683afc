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
    Returns a new variables dict with the BN neutralized."""
    params = flatten_dict(variables["params"])
    stats = flatten_dict(variables.get("batch_stats", {}))

    kernel = np.asarray(params[conv_path + ("kernel",)])
    bias = np.asarray(params.get(conv_path + ("bias",), np.zeros(kernel.shape[-1], kernel.dtype)))
    gamma = np.asarray(params[bn_path + ("gamma",)])
    beta = np.asarray(params[bn_path + ("beta",)])
    mean = np.asarray(stats[bn_path + ("moving_mean",)])
    var = np.asarray(stats[bn_path + ("moving_variance",)])

    scale = gamma / np.sqrt(var + eps)
    params[conv_path + ("kernel",)] = jnp.asarray(kernel * scale)
    params[conv_path + ("bias",)] = jnp.asarray((bias - mean) * scale + beta)
    params[bn_path + ("gamma",)] = jnp.ones_like(jnp.asarray(gamma))
    params[bn_path + ("beta",)] = jnp.zeros_like(jnp.asarray(beta))
    stats[bn_path + ("moving_mean",)] = jnp.zeros_like(jnp.asarray(mean))
    stats[bn_path + ("moving_variance",)] = jnp.ones_like(jnp.asarray(var))

    out = dict(variables)
    out["params"] = unflatten_dict(params)
    if stats:
        out["batch_stats"] = unflatten_dict(stats)
    return out


def replace_activation(cfg, target_activation: str):
    """Configs are the graph here: rebuilding with a different activation is
    the kecam ``replace_ReLU`` equivalent."""
    return cfg.replace(activation=target_activation) if hasattr(cfg, "activation") else cfg
