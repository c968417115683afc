#!/usr/bin/env python3
"""GCViT level-1/2 fused-block experiments (round 3, real v5e).

L1 (56x56, C=64, heads=2, win 7) is the named GCViT hotspot (NOTES_r2): its
GEMMs run f32 because C=64/hd=32 are lane-unaligned and the conservative
Mosaic rule forces f32. Round-3 hypothesis: the crash is specific to bf16
GEMMs whose LHS is a RESHAPE of an unaligned load — these kernels' LHS are
elementwise-derived values, so bf16 may be legal. Variants:

  xla         — unfused windowed-attention block (einsum), the no-pallas path
  fused       — fused_window_transformer_block, current defaults (f32 GEMMs)
  fused_bf16  — force_mm_dtype=bf16 in all three kernels
  fused_g16   — window group 16 instead of 8
  fused_bf16_g16

Usage: python tools/exp_gcvit_l1.py [l1|l2|all] [--batch B] [--iters K]
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
from vip_cup_2022_tpu.ops.pallas.gcvit_block import (  # noqa: E402
    fused_window_transformer_block,
)

DT = jnp.bfloat16
EPS = 1e-5


def make_params(c, heads, n, hidden, rng):
    r = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)  # noqa: E731
    return dict(
        ln1_g=r(c) + 1.0, ln1_b=r(c),
        wqkv=r(c, 3 * c), bqkv=r(3 * c),
        bias=r(heads, n, n),
        wp=r(c, c), bp=r(c),
        ln2_g=r(c) + 1.0, ln2_b=r(c),
        w1=r(c, hidden), b1=r(hidden), w2=r(hidden, c), b2=r(c),
        g1=r(c) * 0.01 + 1.0, g2=r(c) * 0.01 + 1.0,
    )


def xla_block(x, p, heads, n):
    """Unfused windowed-attention block over window-ordered tokens (B, T, C):
    the computation the flax path runs, without pallas."""
    b, t, c = x.shape
    nwin = t // n
    hd = c // heads
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + EPS)) * p["ln1_g"] + p["ln1_b"]
    qkv = jnp.dot(y.astype(x.dtype).reshape(b * t, c), p["wqkv"].astype(x.dtype),
                  preferred_element_type=jnp.float32) + p["bqkv"]
    qkv = qkv.reshape(b, nwin, n, 3, heads, hd).transpose(3, 0, 1, 4, 2, 5)
    q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]     # (b, nwin, heads, n, hd)
    s = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k) + p["bias"]
    s = jax.nn.softmax(s, axis=-1)
    a = jnp.einsum("bwhnm,bwhmd->bwhnd", s, v)
    a = a.transpose(0, 1, 3, 2, 4).reshape(b, t, c)
    proj = jnp.dot(a.astype(x.dtype).reshape(b * t, c), p["wp"].astype(x.dtype),
                   preferred_element_type=jnp.float32) + p["bp"]
    r1 = xf + proj.reshape(b, t, c) * p["g1"]
    mean = r1.mean(-1, keepdims=True)
    var = ((r1 - mean) ** 2).mean(-1, keepdims=True)
    y = ((r1 - mean) * jax.lax.rsqrt(var + EPS)) * p["ln2_g"] + p["ln2_b"]
    h = jnp.dot(y.astype(x.dtype).reshape(b * t, c), p["w1"].astype(x.dtype),
                preferred_element_type=jnp.float32) + p["b1"]
    h = jax.nn.gelu(h, approximate=False)
    o = jnp.dot(h.astype(x.dtype), p["w2"].astype(x.dtype),
                preferred_element_type=jnp.float32) + p["b2"]
    out = r1 + o.reshape(b, t, c) * p["g2"]
    return out.astype(x.dtype)


def fused(x, p, heads, n, force=None, group=None, mode=None, softmax=None):
    if softmax is not None:
        os.environ["VIPTPU_GCVIT_SOFTMAX"] = softmax  # read at trace time
    return fused_window_transformer_block(
        x, heads=heads, n=n,
        ln1_g=p["ln1_g"], ln1_b=p["ln1_b"], wqkv=p["wqkv"], bqkv=p["bqkv"],
        bias=p["bias"], wp=p["wp"], bp=p["bp"],
        ln2_g=p["ln2_g"], ln2_b=p["ln2_b"],
        w1=p["w1"], b1=p["b1"], w2=p["w2"], b2=p["b2"],
        gamma1=p["g1"], gamma2=p["g2"],
        group=group, eps=EPS, force_mm_dtype=force, mode=mode,
    )


def run_shape(tag, b, hw, c, heads, hidden, iters, skip_equiv, ws=7):
    n = ws * ws
    nwin = (hw // ws) ** 2
    toks = nwin * n
    print(f"== {tag}: (B={b}, {hw}x{hw}, C={c}, heads={heads}) "
          f"toks={toks} ==", flush=True)
    rng = np.random.RandomState(0)
    p = make_params(c, heads, n, hidden, rng)
    x = device_randn((b, toks, c), DT)
    variants = {
        "xla": lambda u: xla_block(u, p, heads, n),
        # round-3b softmax A/B: 'mxu' rides the row-sum on the p@[V|1] GEMM
        # (now the default), 'div' is the classic full-lane p/sum(p)
        "fused": lambda u: fused(u, p, heads, n, softmax="mxu"),
        "fused_sm_div": lambda u: fused(u, p, heads, n, softmax="div"),
        # NB group must keep g*N sublane-aligned (g*49 % 8 == 0 => g in
        # {8, 16, ...}); g=4 fails Mosaic's block-shape rule
        "fused_g16": lambda u: fused(u, p, heads, n, group=16, softmax="mxu"),
    }
    if not skip_equiv:
        xs = x[:2]
        ref = np.asarray(variants["xla"](xs)).astype(np.float32)
        for name in ("fused", "fused_sm_div"):
            got = np.asarray(variants[name](xs)).astype(np.float32)
            print(f"  equiv {name}: max|d| = {np.abs(got - ref).max():.4f}",
                  flush=True)
    for name, fn in variants.items():
        time_marginal(name, fn, x, iters=iters, label_width=14)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("shape", nargs="?", default="all",
                    choices=["l1", "l2", "l3", "l4", "all"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip-equiv", action="store_true")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()}", flush=True)
    if args.shape in ("l1", "all"):
        run_shape("L1", args.batch, 56, 64, 2, 192, args.iters, args.skip_equiv)
    if args.shape in ("l2", "all"):
        run_shape("L2", args.batch, 28, 128, 4, 384, args.iters, args.skip_equiv)
    # GCViTTiny window_size=(7,7,14,7), heads=(2,4,8,16): L3 is 19 blocks of
    # a single 196-token window, L4 is 5 blocks of one 49-token window —
    # never probed before round 3 (L1 was the named hotspot, but L3 holds
    # ~half the member FLOPs)
    if args.shape == "l3":
        run_shape("L3", args.batch, 14, 256, 8, 1024, args.iters,
                  args.skip_equiv, ws=14)
    if args.shape == "l4":
        run_shape("L4", args.batch, 7, 512, 16, 2048, args.iters,
                  args.skip_equiv, ws=7)


if __name__ == "__main__":
    main()
