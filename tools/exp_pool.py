#!/usr/bin/env python3
"""Global-average-pool lowering A/B (the SE squeeze).

GCViT's stem SE pool (jnp.mean over axis (1,2) of a bf16 NHWC
256x112x112x64) profiles at 3.92 ms — ~8x the read-bandwidth bound. This
prices alternative formulations; the winner replaces the shared helper.

Variants (each wrapped as shape-preserving u -> u + pool(u)[:,None,None,:]
so chains stay on device; the broadcast-add pass is a constant across
variants):

  mean_hw    — jnp.mean(x.astype(f32), axis=(1,2))  (current)
  mean_dtype — jnp.mean(x, axis=(1,2), dtype=f32)   (convert fused into reduce)
  mean_seq   — mean over H then W (two stages)
  reshape    — reshape (B, H*W, C) then mean axis 1
  dot_ones   — (B, HW, C)^T contracted with ones via dot_general on the MXU

Usage: python tools/exp_pool.py [--iters 64]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if not int(os.environ.get("VIPTPU_NO_JIT_CACHE", "0")):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "vip_cup_2022_tpu_jit"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tools.bench_util import device_randn, time_marginal  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--shape", type=int, nargs=4, default=[256, 112, 112, 64])
    args = ap.parse_args()
    b, h, w, c = args.shape
    print(f"backend={jax.default_backend()} shape={args.shape}", flush=True)
    x = device_randn((b, h, w, c), jnp.bfloat16)

    def wrap(pool):
        return lambda u: u + pool(u)[:, None, None, :].astype(u.dtype)

    inv = 1.0 / (h * w)

    def dot_ones(u):
        ones = jnp.full((h * w,), inv, jnp.bfloat16)
        return jax.lax.dot_general(
            u.reshape(-1, h * w, c), ones,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    variants = {
        "mean_hw": wrap(lambda u: jnp.mean(u.astype(jnp.float32), axis=(1, 2))),
        "mean_dtype": wrap(lambda u: jnp.mean(u, axis=(1, 2),
                                              dtype=jnp.float32)),
        "mean_seq": wrap(lambda u: jnp.mean(
            jnp.mean(u, axis=1, dtype=jnp.float32), axis=1)),
        "reshape": wrap(lambda u: jnp.mean(
            u.reshape(-1, h * w, c), axis=1, dtype=jnp.float32)),
        "dot_ones": wrap(dot_ones),
    }
    ref = None
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(x[:2]), np.float32)
        if ref is None:
            ref = got
        else:
            print(f"  equiv {name}: max|d| = {np.abs(got - ref).max():.2e}",
                  flush=True)
    for name, fn in variants.items():
        time_marginal(name, fn, x, iters=args.iters, label_width=11)


if __name__ == "__main__":
    main()
