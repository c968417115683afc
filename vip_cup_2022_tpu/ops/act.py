"""Activations — flat name->fn map.

Parity surface: kecam ``common_layers.py:17-72`` (``hard_swish``, ``mish``,
``phish``, ``hard_sigmoid_torch``, ``activation_by_name``) and the NFNet
variance-preserving gamma table (``nfnets/nfnets.py:23-38``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def hard_swish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hard_sigmoid_torch(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def phish(x):
    return x * jnp.tanh(jax.nn.gelu(x, approximate=False))


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def gelu_approx(x):
    return jax.nn.gelu(x, approximate=True)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def star_relu(x):
    # metaformer/poolformer family: s * relu(x)**2 + b with fixed constants
    return 0.8944 * jax.nn.relu(x) ** 2 - 0.4472


ACTIVATIONS = {
    None: lambda x: x,
    "linear": lambda x: x,
    "identity": lambda x: x,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.3),  # keras default alpha=0.3
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "celu": jax.nn.celu,
    "gelu": gelu_exact,
    "gelu/app": gelu_approx,
    "gelu/approximate": gelu_approx,
    "quick_gelu": quick_gelu,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "hard_swish": hard_swish,
    "hard_sigmoid": hard_sigmoid_torch,  # torch semantics (reference uses this)
    "hard_sigmoid_torch": hard_sigmoid_torch,
    "mish": mish,
    "phish": phish,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softplus": jax.nn.softplus,
    "softsign": jax.nn.soft_sign,
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
    "star_relu": star_relu,
    "log_sigmoid": jax.nn.log_sigmoid,
    "log_softmax": lambda x: jax.nn.log_softmax(x, axis=-1),
    "exp": jnp.exp,
}

# NFNet variance-preserving gammas (reference nfnets/nfnets.py:23-38).
NON_LINEAR_GAMMA = {
    "identity": 1.0,
    "celu": 1.270926833152771,
    "elu": 1.2716004848480225,
    "gelu": 1.7015043497085571,
    "leaky_relu": 1.70590341091156,
    "log_sigmoid": 1.9193484783172607,
    "log_softmax": 1.0002083778381348,
    "relu": 1.7139588594436646,
    "relu6": 1.7131484746932983,
    "selu": 1.0008515119552612,
    "sigmoid": 4.803835391998291,
    "swish": 1.7881293296813965,  # silu
    "silu": 1.7881293296813965,
    "softsign": 2.338853120803833,
    "softplus": 1.9203323125839233,
    "tanh": 1.5939117670059204,
}


def get_activation(name):
    """activation name -> fn (parity: kecam activation_by_name)."""
    if callable(name):
        return name
    if name not in ACTIVATIONS:
        raise KeyError(f"unknown activation '{name}'")
    return ACTIVATIONS[name]


def apply_activation(x, name):
    return get_activation(name)(x)
