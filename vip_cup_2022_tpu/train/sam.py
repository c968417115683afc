"""Sharpness-Aware Minimization.

Parity surface: kecam model_surgery SAMModel two-step train_step
(model_surgery.py:8-62): grads at params -> perturb by
``rho * g / ||g||_2`` -> grads at perturbed point -> apply to the ORIGINAL
params. Functional formulation here: wrap any (params -> loss) fn.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def sam_gradient(loss_fn, params, rho: float = 0.05, has_aux: bool = False):
    """Returns ((loss, aux?), grads) where grads are evaluated at the
    SAM-perturbed parameters. Differentiation is first-order (standard SAM)."""
    grad_fn = jax.value_and_grad(loss_fn, has_aux=has_aux)
    out1, grads1 = grad_fn(params)
    norm = _global_norm(grads1) + 1e-12
    scale = rho / norm
    params_adv = jax.tree_util.tree_map(
        lambda p, g: p + g.astype(p.dtype) * scale.astype(p.dtype), params, grads1
    )
    out2, grads2 = grad_fn(params_adv)
    return out2, grads2
