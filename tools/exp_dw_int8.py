#!/usr/bin/env python3
"""int8 depthwise-conv experiment for ConvNeXt s1/s2 (VERDICT r3 item 2).

The s1/s2 dw7x7 runs as a bf16 block-diagonal grouped conv in HWCN land
(ops/pallas/convnext_block.blockdiag_dw7x7_hwcn): 5.93 ms/block at s1 vs a
~1.2 ms bf16 bandwidth floor (NOTES_r3 exp_dw table). Hypotheses:

1. s8 x s8 -> s32 grouped conv hits the MXU int8 path (2.84x the bf16 GEMM
   rate measured at XLA level) => the blockdiag conv gets ~2-3x faster.
2. int8 operands halve HBM bytes => even the true-depthwise (VPU) lowering
   gets ~2x on its bandwidth floor.
3. End-to-end viability needs quant+dequant riding existing passes: LN
   absorbs a PER-TENSOR dequant exactly (normalize is scale-invariant);
   per-CHANNEL scales must be divided out before LN stats — both fold into
   the batch-lane kernel's existing per-channel vector ops.

Variants (all chained-marginal, bf16 carrier so requant cost is included
where marked):

  bf16_bdiag   — production: bf16 blockdiag g8 HWCN conv
  bf16_true    — XLA true-depthwise (fgc=C) HWCN
  int8_bdiag   — s8 operands resident, s32 out, scale+cast to bf16 (epilogue)
  int8_bdiag_rq — bf16 in -> quant -> int8 conv -> dequant -> bf16 (full
                  requant cost, the XLA-side worst case)
  int8_true    — s8 true-depthwise
  int8_mxu_g32 — wider group (more MXU utilization; int8 flops are cheap)

Usage: python tools/exp_dw_int8.py [s1|s2|all]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.bench_util import device_randn, time_marginal

SHAPES = {  # (H, W, C, B) batch-last, kernel 7x7
    "s1": (99, 99, 96, 256),
    "s2": (49, 49, 192, 256),
}


def bdiag_kernel(dw, c, g, dtype):
    if g == 1:
        return dw[:, :, None, :].astype(dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (g, c), 0)
    chan = jax.lax.broadcasted_iota(jnp.int32, (g, c), 1)
    mask = (chan % g == lane)
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.where(mask[None, None], dw[:, :, None, :], 0).astype(dtype)
    return (dw[:, :, None, :] * mask.astype(dw.dtype)[None, None]).astype(dtype)


def conv_hwcn(x, kern, fgc):
    pet = jnp.int32 if jnp.issubdtype(x.dtype, jnp.integer) else None
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("HWCN", "HWIO", "HWCN"),
        feature_group_count=fgc,
        preferred_element_type=pet,
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    shapes = SHAPES if which == "all" else {which: SHAPES[which]}
    jax.block_until_ready(
        jax.device_put(jnp.zeros((8,), jnp.float32), jax.devices()[0]))
    print(f"backend={jax.default_backend()}", flush=True)

    for name, (h, w, c, b) in shapes.items():
        print(f"-- {name}: {h}x{w}x{c} B={b} k7", flush=True)
        xb = device_randn((h, w, c, b), jnp.bfloat16)
        # int8 resident operand (values in [-127,127])
        x8 = jax.jit(lambda a: jnp.clip(jnp.round(a.astype(jnp.float32) * 40),
                                        -127, 127).astype(jnp.int8))(xb)
        jax.block_until_ready(x8)
        dwf = jax.jit(lambda k: jax.random.normal(k, (7, 7, c), jnp.float32))(
            jax.random.PRNGKey(2))
        dw8 = jax.jit(lambda a: jnp.clip(jnp.round(a * 40), -127, 127)
                      .astype(jnp.int8))(dwf)
        jax.block_until_ready(jax.block_until_ready(dw8))

        iters = 32 if name == "s1" else 64

        # production bf16 blockdiag g8
        kb8 = bdiag_kernel(dwf.astype(jnp.bfloat16), c, 8, jnp.bfloat16)
        time_marginal("bf16_bdiag", lambda v: conv_hwcn(v, kb8, c // 8)
                      .astype(jnp.bfloat16), xb, iters=iters)
        # bf16 true depthwise
        kb1 = bdiag_kernel(dwf.astype(jnp.bfloat16), c, 1, jnp.bfloat16)
        time_marginal("bf16_true", lambda v: conv_hwcn(v, kb1, c)
                      .astype(jnp.bfloat16), xb, iters=iters)

        # int8 resident (s8 chain carrier: conv -> s32 -> clip to s8);
        # int8 arms chain 4x longer — the op can be so fast the whole K-chain
        # hides inside the dispatch-latency window (NOTES_r3 rule 3)
        groups = [g for g in (8, 16, 32, 64, c) if c % g == 0]
        for g in groups:
            k8 = bdiag_kernel(dw8, c, g, jnp.int8)
            fgc = c // g
            label = f"int8_bdiag_g{g}" if g != c else "int8_dense"
            time_marginal(
                label,
                lambda v, k8=k8, fgc=fgc: jnp.clip(
                    conv_hwcn(v, k8, fgc) >> 7, -127, 127).astype(jnp.int8),
                x8, iters=4 * iters)
        k8t = bdiag_kernel(dw8, c, 1, jnp.int8)
        time_marginal(
            "int8_true",
            lambda v: jnp.clip(conv_hwcn(v, k8t, c) >> 7, -127, 127
                               ).astype(jnp.int8),
            x8, iters=2 * iters)

        # full requant path on a bf16 carrier: quant -> int8 conv -> dequant
        for g in (8, 32):
            k8 = bdiag_kernel(dw8, c, g, jnp.int8)

            def rq(v, k8=k8, fgc=c // g):
                q = jnp.clip(jnp.round(v.astype(jnp.float32) * 40.0), -127,
                             127).astype(jnp.int8)
                y = conv_hwcn(q, k8, fgc)
                return (y.astype(jnp.float32) * (1.0 / (40.0 * 40.0))
                        ).astype(jnp.bfloat16)

            time_marginal(f"int8_rq_g{g}", rq, xb, iters=iters)


if __name__ == "__main__":
    main()
