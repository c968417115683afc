"""Optimizer factory.

Parity surface: kecam imagenet/train_func.py:62-84 (SGD/SGDW/RMSprop/LAMB/
AdamW with ``exclude_from_weight_decay`` on bn gamma/beta, bias, positional
embeddings) and tfimm train/optimizers/optimizer.py. Built on optax; weight
decay is masked by parameter-path predicates instead of Keras variable-name
lists.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import optax
from flax.traverse_util import flatten_dict, unflatten_dict

# kecam excludes: ["bn/gamma", "bn/beta", "bias", "positional_embedding", "no_weight_decay"]
DEFAULT_NO_DECAY = (
    "gamma",
    "beta",
    "bias",
    "gain",
    "positional_embedding",
    "pos_emb",
    "relative_position_bias_table",
    "cls_token",
    "moving_mean",
    "moving_variance",
    "vv",
    "weight",  # ChannelAffine layer-scale
    "gamma1",
    "gamma2",
)


def weight_decay_mask(params, no_decay_names: Sequence[str] = DEFAULT_NO_DECAY):
    """True where weight decay applies (2D+ kernels not in the exclude list)."""
    flat = flatten_dict(params)
    mask = {
        k: (k[-1] not in no_decay_names) and getattr(v, "ndim", 0) >= 2
        for k, v in flat.items()
    }
    return unflatten_dict(mask)


def create_optimizer(
    name: str,
    learning_rate: Union[float, Callable],
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    params=None,
    no_decay_names: Sequence[str] = DEFAULT_NO_DECAY,
    grad_clip_norm: Optional[float] = None,
    **kwargs,
) -> optax.GradientTransformation:
    """name in {sgd, sgdw, rmsprop, adamw, adam, lamb}; 'w' variants decouple
    weight decay (masked) exactly as the reference's tfa optimizers did."""
    name = name.lower()
    mask = (lambda p: weight_decay_mask(p, no_decay_names)) if weight_decay else None

    if name in ("sgd", "sgdw"):
        tx = optax.sgd(learning_rate, momentum=momentum, nesterov=kwargs.get("nesterov", False))
    elif name == "rmsprop":
        tx = optax.rmsprop(learning_rate, decay=kwargs.get("rho", 0.9), momentum=momentum)
    elif name in ("adam",):
        tx = optax.adam(learning_rate)
    elif name == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=weight_decay, mask=mask)
        weight_decay = 0.0  # already applied inside
    elif name == "lamb":
        tx = optax.lamb(learning_rate, weight_decay=weight_decay, mask=mask)
        weight_decay = 0.0
    else:
        raise KeyError(f"unknown optimizer '{name}'")

    chain = []
    if grad_clip_norm:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay and name in ("sgdw", "rmsprop", "sgd"):
        # decoupled weight decay (SGDW/tfa semantics): wd * lr applied with update
        chain.append(optax.add_decayed_weights(weight_decay, mask=mask))
    chain.append(tx)
    return optax.chain(*chain) if len(chain) > 1 else tx
