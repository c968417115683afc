#!/usr/bin/env python3
"""Does an s8 x s8 -> s32 jnp.dot lower inside a PALLAS kernel on v5e?

tools/int8_spike.py proved XLA reaches the MXU int8 path (2.84x GEMM,
1.96-3.58x conv). The fused block kernels (ops/pallas/convnext_block.py,
gcvit_block.py) bypass XLA's convs/dots, so an int8 win there needs Mosaic
itself to lower an int8 matmul. This spike measures exactly that in
isolation before any kernel is rewritten:

  modes:
    equiv  — interpret-mode (CPU) + compiled equivalence of the int8 kernel
    gemm   — chained-marginal ms + TOPS for bf16-in-kernel vs int8-in-kernel
             at ConvNeXt-stage GEMM shapes (M=th*W rows, K=C, N=4C)

Chained per tunnel rule #1/#3 (NOTES_r3): K vs 4K iterations, totals must
exceed the latency window, re-quantize each iteration so the chain isn't
constant-folded.

Usage: python tools/int8_pallas_spike.py equiv|gemm [--iters 64]
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _bf16_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _int8_kernel(x_ref, w_ref, o_ref, *, sx: float):
    # per-tensor activation scale (static, like quant/ptq.py's calibrated
    # scales); weight scale folded into the epilogue as a row broadcast
    q = jnp.clip(jnp.round(x_ref[:].astype(jnp.float32) * (1.0 / sx)),
                 -127, 127).astype(jnp.int8)
    acc = jnp.dot(q, w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * sx).astype(o_ref.dtype)


def _int8_direct_kernel(x_ref, w_ref, o_ref):
    # operands already int8 in HBM (weights pre-quantized; activation
    # quantized by the producer): the pure MXU question
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = acc


def _call(kernel, x, w, out_dtype, m_tile, interpret=False):
    m, k = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, m_tile),),
        in_specs=[pl.BlockSpec((m_tile, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((m_tile, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )(x, w)


def equiv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(256, 384), jnp.float32)
    w = jnp.asarray(rng.randn(384, 1536) * 0.05, jnp.float32)
    sx = float(jnp.max(jnp.abs(x))) / 127.0
    kern = functools.partial(_int8_kernel, sx=sx)
    ref = x @ w
    got_i = _call(kern, x, w.astype(jnp.int8), jnp.float32, 128,
                  interpret=True)
    # int8 weights carry no scale here (spike only); compare int8-x effect
    qx = np.clip(np.round(np.asarray(x) / sx), -127, 127)
    want = (qx * sx) @ np.asarray(w.astype(jnp.int8), np.float32)
    err = np.abs(np.asarray(got_i) - want).max()
    print(f"interpret int8 kernel matches hand math: max|d| = {err:.2e}")
    assert err < 1e-3
    if jax.default_backend() == "tpu":
        got_c = _call(kern, x, w.astype(jnp.int8), jnp.float32, 128)
        err_c = np.abs(np.asarray(got_c) - want).max()
        print(f"compiled (Mosaic) matches: max|d| = {err_c:.2e}")
    print("OK")


def gemm(iters: int):
    from tools.bench_util import time_marginal

    shapes = [  # (name, M, K, N) — ConvNeXt s3/s4 whole-image MLP fc1 shapes
        ("s3_fc1", 25 * 25, 384, 1536),
        ("s4_fc1", 13 * 13 * 8, 768, 3072),  # 8 rows batched: M 128-aligned
        ("big", 4096, 768, 3072),
    ]
    for name, m, k, n in shapes:
        key = jax.random.PRNGKey(0)
        x16 = jax.jit(lambda u: (jax.random.normal(u, (m, k), jnp.float32)
                                 ).astype(jnp.bfloat16))(key)
        w16 = jax.jit(lambda u: (jax.random.normal(u, (k, n), jnp.float32)
                                 * 0.05).astype(jnp.bfloat16))(key)
        w8 = jax.jit(lambda v: jnp.clip(v.astype(jnp.float32) * 16.0,
                                        -127, 127).astype(jnp.int8))(w16)
        x8 = jax.jit(lambda v: jnp.clip(v.astype(jnp.float32) * 16.0,
                                        -127, 127).astype(jnp.int8))(x16)
        jax.block_until_ready((x16, w16, w8, x8))
        mt = min(m, 512)
        fl = 2.0 * m * k * n

        def run_bf16(u, w=w16, mt=mt):
            o = _call(_bf16_kernel, u, w, jnp.bfloat16, mt)
            return o[:, : u.shape[1]].astype(jnp.bfloat16) + u  # chain dep

        t16 = time_marginal(f"{name} pallas bf16", run_bf16, x16,
                            iters=iters, label_width=24)

        kern = functools.partial(_int8_kernel, sx=1.0 / 16.0)

        def run_int8(u, w=w8, mt=mt):
            o = _call(kern, u, w, jnp.float32, mt)
            return (o[:, : u.shape[1]] * 1e-3).astype(jnp.bfloat16) + u

        t8 = time_marginal(f"{name} pallas int8", run_int8, x16,
                           iters=iters, label_width=24)

        def run_int8_direct(u, w=w8, mt=mt):
            o = _call(_int8_direct_kernel, u, w, jnp.int32, mt)
            # chain: re-derive an int8 input from the output (cheap epilogue)
            return jnp.clip(o[:, : u.shape[1]] >> 9, -127, 127
                            ).astype(jnp.int8)

        t8d = time_marginal(f"{name} pallas int8-direct", run_int8_direct,
                            x8, iters=iters, label_width=24)
        if t16:
            print(f"  {name}: bf16 {t16:.3f} ms = {fl/(t16/1e3)/1e12:.1f} TF/s")
        if t8:
            print(f"  {name}: int8(q-in-kernel) {t8:.3f} ms = "
                  f"{fl/(t8/1e3)/1e12:.1f} TOPS  "
                  f"speedup {t16/t8:.2f}x" if t16 else "")
        if t8d:
            print(f"  {name}: int8(direct) {t8d:.3f} ms = "
                  f"{fl/(t8d/1e3)/1e12:.1f} TOPS  "
                  + (f"speedup {t16/t8d:.2f}x" if t16 else ""))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["equiv", "gemm"])
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    if args.mode == "equiv":
        equiv()
    else:
        gemm(args.iters)


if __name__ == "__main__":
    main()
