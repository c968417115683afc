"""Throughput / FLOPs profiling.

Parity surface: tfimm utils/profile.py (``time_model`` inference+backprop
img/sec) and utils/flops.py; kecam model_surgery.get_flops/count_params.
TPU-native: timings use block_until_ready; traces via jax.profiler.
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def time_function(fn: Callable, *args, warmup: int = 2, iters: int = 10) -> float:
    """Median seconds per call of a jitted function (device-synchronized)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def time_model(module, variables, input_size=(224, 224), batch_size=32, dtype=jnp.float32,
               backward: bool = False, iters: int = 10) -> float:
    """Images/sec of a model forward (or forward+backward) — tfimm
    ``time_model`` parity."""
    x = jnp.zeros((batch_size, *input_size, 3), dtype)

    if backward:
        def step(v, x):
            def loss(p):
                out = module.apply({**v, "params": p}, x, training=True, rngs={"dropout": jax.random.PRNGKey(0)})
                return jnp.sum(out.astype(jnp.float32))

            return jax.grad(loss)(v["params"])

        fn = jax.jit(step)
        sec = time_function(fn, variables, x, iters=iters)
    else:
        fn = jax.jit(lambda v, x: module.apply(v, x))
        sec = time_function(fn, variables, x, iters=iters)
    return batch_size / sec


def trace(path: str = "/tmp/jax-trace"):
    """Context manager: capture a jax.profiler trace viewable in TensorBoard/
    Perfetto (replaces the reference's TensorBoard callback profiling)."""
    return jax.profiler.trace(path)
