#!/usr/bin/env python3
"""Depthwise-conv lowering A/B on the EfficientNet hot shapes (real v5e).

EfficientNetV1B4's profile is ~28 of 36 ms XLA true-depthwise convs
(tools/profile_member.py), the 5x5 14x14 stacks at ~7x the bandwidth floor.
Variants per shape, timed with chained marginals (tools/bench_util.py):

  xla      — lax true depthwise (feature_group_count=C), the production path
  bdiag    — block-diagonal grouped conv g8 (MXU; 8x FLOP waste)
  pallas   — ops/pallas/depthwise.py tap-loop kernel (native NHWC, VPU)

Shapes are EfficientNetV1B4's stride-1 dw convs at 224x224 input plus
ConvNeXt's s1 7x7 for reference. Usage: python tools/exp_dw.py [--iters 64]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.bench_util import time_marginal
from vip_cup_2022_tpu.ops.pallas.depthwise import depthwise_conv_nhwc

# (tag, B, H, W, C, k) — EfficientNetV1B4 stride-1 dw shapes (profiled ms):
SHAPES = [
    ("s1_56x192_k3", 256, 56, 56, 192, 3),    # 1.63 ms x3 blocks
    ("s2_28x336_k5", 256, 28, 28, 336, 5),    # 1.51 ms x3
    ("s3_14x672_k3", 256, 14, 14, 672, 3),    # 0.44 ms x5
    ("s4_14x960_k5", 256, 14, 14, 960, 5),    # 1.70 ms x5
    ("s5_7x1632_k5", 256, 7, 7, 1632, 5),     # 0.24 ms x7
    ("cnx_99x96_k7", 256, 99, 99, 96, 7),     # ConvNeXt s1 (blockdiag 4.5)
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--shapes", nargs="*", default=None)
    ap.add_argument("--variants", nargs="*",
                    default=["xla", "bdiag", "pallas"])
    args = ap.parse_args()

    print(f"backend={jax.default_backend()}", flush=True)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    for tag, b, h, w, c, k in SHAPES:
        if args.shapes and tag not in args.shapes:
            continue
        key = jax.random.PRNGKey(0)
        x = jax.jit(
            lambda kk: jax.random.uniform(kk, (b, h, w, c), dt))(key)
        jax.block_until_ready(x)
        kern = jax.jit(lambda kk: jax.random.uniform(
            kk, (k, k, 1, c), jnp.float32) - 0.5)(jax.random.PRNGKey(1))
        jax.block_until_ready(kern)
        pad = (k // 2, k // 2)
        g = 8
        lane = jax.lax.broadcasted_iota(jnp.int32, (g, c), 0)
        chan = jax.lax.broadcasted_iota(jnp.int32, (g, c), 1)
        mask = (chan % g == lane).astype(jnp.float32)
        kern_bd = jnp.asarray(kern, jnp.float32).reshape(k, k, 1, c) * mask[None, None]

        def f_xla(v):
            return jax.lax.conv_general_dilated(
                v, jnp.asarray(kern, v.dtype), (1, 1), [pad, pad],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c).astype(v.dtype)

        def f_bdiag(v):
            return jax.lax.conv_general_dilated(
                v, jnp.asarray(kern_bd, v.dtype), (1, 1), [pad, pad],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c // g).astype(v.dtype)

        def f_pallas(v):
            return depthwise_conv_nhwc(v, kern, padding=(pad, pad))

        fns = {"xla": f_xla, "bdiag": f_bdiag, "pallas": f_pallas}
        # equivalence spot check (single small run)
        try:
            xs = x[:2]
            r_ref = np.asarray(jax.jit(f_xla)(xs), np.float32)
            r_pl = np.asarray(jax.jit(f_pallas)(xs), np.float32)
            err = float(np.max(np.abs(r_ref - r_pl)))
        except Exception as e:  # noqa: BLE001
            err = float("nan")
            print(f"  [{tag}] pallas equiv FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
        gb = 2 * b * h * w * c * jnp.dtype(dt).itemsize / 2 ** 30
        print(f"[{tag}] ({b},{h},{w},{c}) k{k}  in+out {gb:.2f} GiB  "
              f"pallas max|d|={err:.2e}", flush=True)
        for name in args.variants:
            ms = time_marginal(f"{tag}:{name}", fns[name], x,
                               iters=args.iters, label_width=22)
            if ms:
                print(f"      -> {gb / (ms / 1000):.0f} GiB/s eff", flush=True)


if __name__ == "__main__":
    main()
