#!/usr/bin/env python3
"""Decompose the grouped window-attention kernel's per-step cost (L1/L2).

The masked-GEMM attention kernel is VPU-bound: the (gN, gN) f32 score tile
pays bias-add, row-max, subtract, exp, (and pre-round-3b sum+divide) on
~8x more elements than the real block diagonal. This tool prices each part
by timing kernel variants with pieces REMOVED (numerically wrong, timing
only), chained output->input so the marginal cancels tunnel fixed costs:

  full      — production kernel (mxu-sum softmax)
  no_max    — skip the row-max subtraction
  no_bias   — skip the bias/mask add (exp of raw scores)
  no_exp    — skip exp (softmax-less: scores straight to p@[V|1])
  gemm_only — q@k then p=s straight to @V (no bias/max/exp/divide)
  empty     — LN-dense-free copy kernel (pallas floor)

Usage: python tools/exp_attn_parts.py [l1|l2] [--iters 64]
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

if not int(os.environ.get("VIPTPU_NO_JIT_CACHE", "0")):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "vip_cup_2022_tpu_jit"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tools.bench_util import device_randn, time_marginal  # noqa: E402


def _kernel(q_ref, k_ref, v_ref, mb_ref, o_ref, *, scale, g, n, heads,
            mm_dtype, parts):
    qfull = (q_ref[0].astype(jnp.float32) * scale).astype(mm_dtype)
    kfull = k_ref[0]
    vfull = v_ref[0]
    c = kfull.shape[1]
    hd = c // heads
    outs = []
    for h in range(heads):
        q = qfull[:, h * hd : (h + 1) * hd]
        k = kfull[:, h * hd : (h + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if "bias" in parts:
            s = s + mb_ref[h]
        if "max" in parts:
            s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s) if "exp" in parts else s
        vh = vfull[:, h * hd : (h + 1) * hd]
        v_ext = jnp.concatenate(
            [vh, jnp.ones((vh.shape[0], 1), vh.dtype)], axis=1)
        o_ext = jnp.dot(p.astype(mm_dtype), v_ext,
                        preferred_element_type=jnp.float32)
        num = jax.lax.slice(o_ext, (0, 0), (o_ext.shape[0], hd))
        if "div" in parts:
            den = jax.lax.slice(o_ext, (0, hd), (o_ext.shape[0], hd + 1))
            num = num / den
        outs.append(num)
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _copy_kernel(q_ref, k_ref, v_ref, mb_ref, o_ref, **_):
    o_ref[0] = q_ref[0] + v_ref[0]


def build(b, nwin, n, c, heads, g, parts, copy=False):
    toks = nwin * n
    nwg = nwin // g
    rng = np.random.RandomState(0)
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32) * 0.05)
    eye = np.kron(np.eye(g, dtype=np.float32), np.ones((n, n), np.float32))
    mb = jnp.tile(bias, (1, g, g)) * eye + (1.0 - eye) * -1e9

    kern = _copy_kernel if copy else functools.partial(
        _kernel, scale=(c // heads) ** -0.5, g=g, n=n, heads=heads,
        mm_dtype=jnp.bfloat16, parts=parts)

    def call(q, k, v):
        return pl.pallas_call(
            kern,
            grid=(b, nwg),
            in_specs=[
                pl.BlockSpec((1, g * n, c), lambda b_, wg: (b_, wg, 0)),
                pl.BlockSpec((1, g * n, c), lambda b_, wg: (b_, wg, 0)),
                pl.BlockSpec((1, g * n, c), lambda b_, wg: (b_, wg, 0)),
                pl.BlockSpec((heads, g * n, g * n), lambda b_, wg: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, g * n, c), lambda b_, wg: (b_, wg, 0)),
            out_shape=jax.ShapeDtypeStruct((b, toks, c), k.dtype),
        )(q, k, v, mb)

    return call


SHAPES = {
    "l1": (64, 49, 64, 2, 8),   # nwin, n, c, heads, g (56x56, ws 7)
    "l2": (16, 49, 128, 4, 8),  # 28x28, ws 7
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("shape", nargs="?", default="l1", choices=sorted(SHAPES))
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    nwin, n, c, heads, g = SHAPES[args.shape]
    b = args.batch
    toks = nwin * n
    print(f"backend={jax.default_backend()} {args.shape}: "
          f"(B={b}, toks={toks}, C={c}, heads={heads}, g={g})", flush=True)
    q = device_randn((b, toks, c), jnp.bfloat16)
    k = device_randn((b, toks, c), jnp.bfloat16)
    v = device_randn((b, toks, c), jnp.bfloat16)

    variants = {
        "full": dict(parts={"bias", "max", "exp", "div"}),
        "no_max": dict(parts={"bias", "exp", "div"}),
        "no_bias": dict(parts={"max", "exp", "div"}),
        "no_exp": dict(parts={"bias", "max", "div"}),
        "gemm_only": dict(parts=set()),
        "empty": dict(parts=set(), copy=True),
    }
    for name, kw in variants.items():
        call = build(b, nwin, n, c, heads, g, **kw)
        # chain output -> q so iterated compute stays on device and the
        # totals grow far past the tunnel latency window (rule 3)
        fn = lambda u, call=call: call(u, k, v)
        time_marginal(name, fn, q, iters=args.iters, label_width=11)


if __name__ == "__main__":
    main()
