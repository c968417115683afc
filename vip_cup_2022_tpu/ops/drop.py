"""Stochastic depth / dropout helpers.

Parity: kecam ``drop_block`` (common_layers.py:362-370), gcvit/tfimm
``DropPath`` (per-sample noise [B,1,...,1], inverse-scaled), and
``drop_connect_rates_split`` (common_layers.py:356-360).
"""
from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class DropPath(nn.Module):
    """Per-sample stochastic depth. Identity when rate == 0 or not training."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.rate <= 0.0 or not training:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + nn.initializers.uniform(scale=1.0)(rng, shape, jnp.float32))
        return (x / keep) * mask.astype(x.dtype)


def drop_connect_rates_split(num_blocks: Sequence[int], start: float = 0.0, end: float = 0.0) -> List[List[float]]:
    """Linear stochastic-depth schedule split per stack."""
    total = sum(num_blocks)
    rates = np.linspace(start, end, total).tolist()
    out, pos = [], 0
    for n in num_blocks:
        out.append(rates[pos : pos + n])
        pos += n
    return out
