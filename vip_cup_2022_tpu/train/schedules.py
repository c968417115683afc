"""LR schedules.

Parity surface: kecam imagenet/callbacks.py:9-131 (cosine with restarts +
warmup + cooldown, per-batch and per-epoch variants; constant/exp schedulers)
and tfimm train/optimizers/schedules.py (const/multistep/cosine/exp with
warmup). Implemented as pure step->lr functions usable both inside optax
(jit-traced) and from the host loop.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def cosine_decay(step, lr_base, decay_steps, alpha=0.0):
    """keras CosineDecay semantics."""
    p = jnp.clip(step / decay_steps, 0.0, 1.0)
    cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * p))
    return lr_base * ((1 - alpha) * cosine + alpha)


def cosine_decay_restarts(step, lr_base, first_decay_steps, t_mul=2.0, m_mul=0.5, alpha=0.0):
    """keras CosineDecayRestarts semantics (geometric restart periods)."""
    step = jnp.asarray(step, jnp.float32)
    if t_mul == 1.0:
        i_restart = jnp.floor(step / first_decay_steps)
        frac = step / first_decay_steps - i_restart
    else:
        ratio = step / first_decay_steps * (t_mul - 1.0) + 1.0
        i_restart = jnp.floor(jnp.log(ratio) / math.log(t_mul))
        sum_r = (t_mul**i_restart - 1.0) / (t_mul - 1.0)
        frac = (step / first_decay_steps - sum_r) / t_mul**i_restart
    m_fac = m_mul**i_restart
    cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
    return lr_base * ((1 - alpha) * m_fac * cosine + alpha)


class CosineLrScheduler:
    """Warmup -> cosine(+restarts) -> per-cycle cooldown, stepped per batch.

    Mirrors kecam CosineLrScheduler (callbacks.py:9-75): restart periods
    ``first_restart_step * t_mul**i`` epochs with ``cooldown_steps`` epochs of
    lr_min inserted after each cycle; linear warmup from lr_warmup (default
    lr_min) over ``warmup_steps`` epochs.
    """

    def __init__(
        self,
        lr_base: float,
        first_restart_step: float,
        steps_per_epoch: int,
        m_mul: float = 0.5,
        t_mul: float = 2.0,
        lr_min: float = 1e-5,
        lr_warmup: float = -1,
        warmup_steps: float = 0,
        cooldown_steps: float = 0,
    ):
        self.lr_base, self.m_mul, self.t_mul, self.lr_min = lr_base, m_mul, t_mul, lr_min
        self.steps_per_epoch = steps_per_epoch
        self.first_restart_step = first_restart_step
        self.cooldown_steps = cooldown_steps
        self.warmup_batch_steps = warmup_steps * steps_per_epoch
        self.lr_warmup = lr_warmup if lr_warmup > 0 else lr_min
        self.alpha = lr_min / lr_base
        self.no_restart = lr_min == lr_base * m_mul
        if not self.no_restart:
            aa = [first_restart_step * (t_mul**i) for i in range(5)]
            self.cooldown_epochs_start = np.array(
                [int(sum(aa[:i]) + cooldown_steps * (i - 1)) for i in range(1, 5)]
            )
            self.cooldown_epochs_end = self.cooldown_epochs_start + cooldown_steps
        else:
            self.cooldown_epochs_start = np.array([])
            self.cooldown_epochs_end = np.array([])

    def __call__(self, global_step: int) -> float:
        """Host-side lr for a global batch step (epoch = step // steps_per_epoch)."""
        epoch = global_step // self.steps_per_epoch
        if global_step < self.warmup_batch_steps:
            return float(
                self.lr_warmup
                + (self.lr_base - self.lr_warmup) * global_step / self.warmup_batch_steps
            )
        previous_cooldown_steps = 0
        if self.cooldown_epochs_end.shape[0]:
            pos = int((self.cooldown_epochs_end > epoch).argmax())
            previous_cooldown_steps = self.cooldown_steps * pos * self.steps_per_epoch
            if epoch >= self.cooldown_epochs_end[pos] - self.cooldown_steps:
                return float(self.lr_min)
        step = global_step - previous_cooldown_steps
        if self.no_restart:
            lr = cosine_decay(step, self.lr_base, self.first_restart_step * self.steps_per_epoch, self.alpha)
        else:
            lr = cosine_decay_restarts(
                step, self.lr_base, self.first_restart_step * self.steps_per_epoch,
                self.t_mul, self.m_mul, self.alpha,
            )
        return float(lr)


def constant_scheduler(epoch, lr_base, lr_decay_steps: Sequence[int], decay_rate=0.1, warmup_steps=0):
    """kecam constant_scheduler (callbacks.py:115-121)."""
    if epoch < warmup_steps:
        return lr_base * (epoch + 1) / (warmup_steps + 1)
    return lr_base * decay_rate ** int(np.sum(epoch >= np.array(lr_decay_steps)))


def exp_scheduler(epoch, lr_base=0.1, decay_step=1, decay_rate=0.9, lr_min=0.0, warmup_steps=0):
    """kecam exp_scheduler (callbacks.py:124-131)."""
    if epoch < warmup_steps:
        return (lr_base - lr_min) * (epoch + 1) / (warmup_steps + 1)
    lr = lr_base * decay_rate ** (epoch / decay_step)
    return lr if lr > lr_min else lr_min


def multistep_schedule(epoch, lr_base, boundaries: Sequence[int], decay_rate=0.1, warmup_epochs=0):
    """tfimm multistep schedule."""
    if epoch < warmup_epochs:
        return lr_base * (epoch + 1) / (warmup_epochs + 1)
    return lr_base * decay_rate ** int(np.sum(epoch >= np.array(boundaries)))
