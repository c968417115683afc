#!/usr/bin/env python3
"""ConvNeXt stage-1/2 kernel experiments (round 3, on the real v5e chip).

Measures per-block ms for the team's ConvNeXt (stride-2 stem) hot stages:
  s1 = (B, 99, 99, 96)   hidden 384   — 72 ms/stage under XLA in round 2
  s2 = (B, 49, 49, 192)  hidden 768   — 40 ms/stage

Variants per shape (each printed as it completes; chained K iters inside one
fori_loop program so tunnel dispatch overhead amortizes — fine for
single-member programs per NOTES_r2):
  xla        — unfused block (true-depthwise conv + LN + dense MLP), the gate's
               current choice at C < 256
  fused      — ops/pallas/convnext_block.fused_convnext_block (padded lanes,
               bf16 dots); re-measures the C>=256 gate per VERDICT r2 item 1b
  fused_sig  — same with sigmoid-GELU (prices the erf polynomial's VPU cost)
  dw_true    — XLA true-depthwise alone
  dw_bdiag   — XLA block-diagonal grouped depthwise alone (g=8, MXU)
  lnmlp      — pallas fused_ln_mlp_residual alone (NHWC rows)
  hyb_nhwc   — dw_bdiag + lnmlp in one program (round-2's 83 ms relayout trap,
               re-measured with the bdiag conv instead of true-dw)
  hyb_hwcn   — NEW: whole block in (H, W, C, B) land — bdiag dw via
               dimension_numbers=("HWCN","HWIO","HWCN") + a batch-as-lanes
               pallas LN/MLP kernel (B=lane dim, perfectly 128-aligned; C=96
               rides sublanes; bf16 dots with direct-loaded weights)
  tposes     — cost of NHWC->HWCN + back transposes alone

Usage: python tools/exp_convnext_s12.py [s1|s2|all] [--iters K] [--batch B]
"""
import argparse
import functools
import os
import sys
import time

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

from vip_cup_2022_tpu.ops.pallas.convnext_block import (  # noqa: E402
    _gelu,
    blockdiag_dw7x7,
    fused_convnext_block,
    fused_ln_mlp_residual,
)

DT = jnp.bfloat16
EPS = 1e-6


# ---------------------------------------------------------------- batch-lane
def _lnmlp_bl_kernel(x_ref, r_ref, g_ref, b_ref, w1t_ref, b1_ref, w2t_ref,
                     b2_ref, ls_ref, o_ref, *, tp: int, c: int, eps: float):
    """LN+MLP+layerscale+residual with BATCH as the lane dimension.

    Blocks are (tp, C, B): B (=256) is lane-aligned by construction, C rides
    sublanes (96 = 12x8 f32-aligned). Channel params come in as (C, 1)/(H, 1)
    column vectors so no lane->sublane relayout happens in-kernel. The dots
    contract over C with DIRECT-loaded (hidden, C) weights — legal in bf16
    even at C % 128 != 0 (the Mosaic crash is specific to reshapes of
    lane-unaligned loads)."""
    for p in range(tp):
        y = x_ref[p].astype(jnp.float32)              # (C, B)
        mean = y.mean(axis=0, keepdims=True)          # LN over C (sublanes)
        var = ((y - mean) ** 2).mean(axis=0, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + eps)
        y = y * g_ref[:] + b_ref[:]                   # (C,1) broadcast lanes
        h = jnp.dot(w1t_ref[:], y.astype(o_ref.dtype),
                    preferred_element_type=jnp.float32)   # (H, B)
        h = h + b1_ref[:]
        h = _gelu(h)
        o = jnp.dot(w2t_ref[:], h.astype(o_ref.dtype),
                    preferred_element_type=jnp.float32)   # (C, B)
        o = (o + b2_ref[:]) * ls_ref[:]
        o_ref[p] = (o + r_ref[p].astype(jnp.float32)).astype(o_ref.dtype)


def lnmlp_batchlane(dw_out, residual, ln_gamma, ln_beta, w1, b1, w2, b2,
                    ls_gamma, *, eps: float = EPS, tp: int = 8):
    """dw_out/residual are (H, W, C, B); returns same. Weights in the model's
    (C, hidden)/(hidden, C) convention — transposed here (tiny, one-time under
    jit with constant-folding of the transpose on params)."""
    h_, w_, c, b = dw_out.shape
    n = h_ * w_
    x2 = dw_out.reshape(n, c, b)
    r2 = residual.reshape(n, c, b)
    hidden = w1.shape[1]
    col = lambda a: jnp.asarray(a, jnp.float32)[:, None]  # noqa: E731
    kern = functools.partial(_lnmlp_bl_kernel, tp=tp, c=c, eps=eps)
    out = pl.pallas_call(
        kern,
        grid=(pl.cdiv(n, tp),),
        in_specs=[
            pl.BlockSpec((tp, c, b), lambda i: (i, 0, 0)),
            pl.BlockSpec((tp, c, b), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((hidden, c), lambda i: (0, 0)),
            pl.BlockSpec((hidden, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, hidden), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tp, c, b), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c, b), dw_out.dtype),
    )(
        x2, r2, col(ln_gamma), col(ln_beta),
        jnp.asarray(w1, dw_out.dtype).T, col(b1),
        jnp.asarray(w2, dw_out.dtype).T, col(b2), col(ls_gamma),
    )
    return out.reshape(h_, w_, c, b)


def bdiag_dw_hwcn(x, dw_kernel, dw_bias, group: int = 8):
    """Block-diagonal grouped depthwise with batch-last dimension numbers."""
    c = x.shape[2]
    g = group if c % group == 0 else 1
    if g == 1:
        kern = dw_kernel[:, :, None, :]
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (g, c), 0)
        chan = jax.lax.broadcasted_iota(jnp.int32, (g, c), 1)
        mask = (chan % g == lane).astype(dw_kernel.dtype)
        kern = dw_kernel[:, :, None, :] * mask[None, None]
    out = jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("HWCN", "HWIO", "HWCN"),
        feature_group_count=c // g,
    )
    return out + dw_bias.astype(out.dtype)[:, None]


# ------------------------------------------------------------- channel-first
def _lnmlp_cf_kernel(x_ref, r_ref, g_ref, b_ref, w1t_ref, b1_ref, w2t_ref,
                     b2_ref, ls_ref, o_ref, *, eps: float):
    """LN+MLP+layerscale+residual in channel-first (C, L) tiles: one big
    lane tile per program (L = 512-2048 columns of H*W*B), LN reduces over
    the sublane axis (C rows), and each dot is a single (hidden, C) @ (C, L)
    GEMM — no tp-loop of small GEMMs."""
    y = x_ref[:].astype(jnp.float32)                  # (C, L)
    mean = y.mean(axis=0, keepdims=True)
    var = ((y - mean) ** 2).mean(axis=0, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[:] + b_ref[:]
    h = jnp.dot(w1t_ref[:], y.astype(o_ref.dtype),
                preferred_element_type=jnp.float32)   # (hidden, L)
    h = h + b1_ref[:]
    h = _gelu(h)
    o = jnp.dot(w2t_ref[:], h.astype(o_ref.dtype),
                preferred_element_type=jnp.float32)   # (C, L)
    o = (o + b2_ref[:]) * ls_ref[:]
    o_ref[:] = (o + r_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def lnmlp_chanfirst(dw_out, residual, ln_gamma, ln_beta, w1, b1, w2, b2,
                    ls_gamma, *, eps: float = EPS, lane_tile: int = 1024):
    """dw_out/residual are (C, H, W, B); returns same."""
    c, h_, w_, b = dw_out.shape
    n = h_ * w_ * b
    x2 = dw_out.reshape(c, n)
    r2 = residual.reshape(c, n)
    hidden = w1.shape[1]
    col = lambda a: jnp.asarray(a, jnp.float32)[:, None]  # noqa: E731
    kern = functools.partial(_lnmlp_cf_kernel, eps=eps)
    lt = lane_tile
    out = pl.pallas_call(
        kern,
        grid=(pl.cdiv(n, lt),),
        in_specs=[
            pl.BlockSpec((c, lt), lambda i: (0, i)),
            pl.BlockSpec((c, lt), lambda i: (0, i)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((hidden, c), lambda i: (0, 0)),
            pl.BlockSpec((hidden, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, hidden), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c, lt), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c, n), dw_out.dtype),
    )(
        x2, r2, col(ln_gamma), col(ln_beta),
        jnp.asarray(w1, dw_out.dtype).T, col(b1),
        jnp.asarray(w2, dw_out.dtype).T, col(b2), col(ls_gamma),
    )
    return out.reshape(c, h_, w_, b)


def bdiag_dw_chwn(x, dw_kernel, dw_bias, group: int = 8):
    """Block-diagonal grouped depthwise with channel-first dim numbers."""
    c = x.shape[0]
    g = group if c % group == 0 else 1
    if g == 1:
        kern = dw_kernel[:, :, None, :]
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (g, c), 0)
        chan = jax.lax.broadcasted_iota(jnp.int32, (g, c), 1)
        mask = (chan % g == lane).astype(dw_kernel.dtype)
        kern = dw_kernel[:, :, None, :] * mask[None, None]
    out = jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("CHWN", "HWIO", "CHWN"),
        feature_group_count=c // g,
    )
    return out + dw_bias.astype(out.dtype)[:, None, None, None]


# ------------------------------------------------------------------ variants
def make_params(c, hidden, rng):
    r = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)  # noqa: E731
    return dict(
        wdw=r(7, 7, c), bdw=r(c), g=r(c) + 1.0, b=r(c),
        w1=r(c, hidden), b1=r(hidden), w2=r(hidden, c), b2=r(c),
        ls=r(c) * 0.1 + 1e-2,
    )


def xla_block(x, p, c):
    sc = x
    k = p["wdw"][:, :, None, :].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    y = y + p["bdw"].astype(y.dtype)
    yf = y.astype(jnp.float32)
    m = yf.mean(-1, keepdims=True)
    v = ((yf - m) ** 2).mean(-1, keepdims=True)
    yn = (yf - m) * jax.lax.rsqrt(v + EPS) * p["g"] + p["b"]
    h = jnp.dot(yn.astype(x.dtype).reshape(-1, c), p["w1"].astype(x.dtype),
                preferred_element_type=jnp.float32) + p["b1"]
    h = jax.nn.gelu(h, approximate=False)
    o = jnp.dot(h.astype(x.dtype), p["w2"].astype(x.dtype),
                preferred_element_type=jnp.float32) + p["b2"]
    o = o.reshape(x.shape) * p["ls"] + sc.astype(jnp.float32)
    return o.astype(x.dtype)


def build_variants(p, c, which):
    P = p
    v = {
        "xla": lambda x: xla_block(x, P, c),
        "fused": lambda x: fused_convnext_block(
            x, P["wdw"], P["bdw"], P["g"], P["b"], P["w1"], P["b1"],
            P["w2"], P["b2"], P["ls"]),
        "fused_sig": lambda x: fused_convnext_block(
            x, P["wdw"], P["bdw"], P["g"], P["b"], P["w1"], P["b1"],
            P["w2"], P["b2"], P["ls"], gelu="sigmoid"),
        "dw_true": lambda x: jax.lax.conv_general_dilated(
            x, P["wdw"][:, :, None, :].astype(x.dtype), (1, 1),
            [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c) + P["bdw"].astype(x.dtype),
        "dw_bdiag": lambda x: blockdiag_dw7x7(x, P["wdw"], P["bdw"]),
        "lnmlp": lambda x: fused_ln_mlp_residual(
            x, x, P["g"], P["b"], P["w1"], P["b1"], P["w2"], P["b2"], P["ls"]),
        "hyb_nhwc": lambda x: fused_ln_mlp_residual(
            blockdiag_dw7x7(x, P["wdw"], P["bdw"]), x,
            P["g"], P["b"], P["w1"], P["b1"], P["w2"], P["b2"], P["ls"]),
        "tposes": lambda x: jnp.transpose(
            jnp.transpose(x, (1, 2, 3, 0)) + jnp.bfloat16(1), (3, 0, 1, 2)),
    }
    # hwcn variant chains in (H, W, C, B) land — separate input shape
    vt = {
        "hyb_hwcn": lambda xt: lnmlp_batchlane(
            bdiag_dw_hwcn(xt, P["wdw"], P["bdw"]), xt,
            P["g"], P["b"], P["w1"], P["b1"], P["w2"], P["b2"], P["ls"]),
    }
    # chwn variant chains in (C, H, W, B) land
    vc = {
        "hyb_chwn": lambda xc: lnmlp_chanfirst(
            bdiag_dw_chwn(xc, P["wdw"], P["bdw"]), xc,
            P["g"], P["b"], P["w1"], P["b1"], P["w2"], P["b2"], P["ls"]),
        "hyb_chwn_l512": lambda xc: lnmlp_chanfirst(
            bdiag_dw_chwn(xc, P["wdw"], P["bdw"]), xc,
            P["g"], P["b"], P["w1"], P["b1"], P["w2"], P["b2"], P["ls"],
            lane_tile=512),
        "hyb_chwn_l2048": lambda xc: lnmlp_chanfirst(
            bdiag_dw_chwn(xc, P["wdw"], P["bdw"]), xc,
            P["g"], P["b"], P["w1"], P["b1"], P["w2"], P["b2"], P["ls"],
            lane_tile=2048),
    }
    if which:
        v = {k: f for k, f in v.items() if k in which}
        vt = {k: f for k, f in vt.items() if k in which}
        vc = {k: f for k, f in vc.items() if k in which}
    return v, vt, vc


def time_chained(name, fn, x, iters):
    """Differenced chain timing: the tunnel's per-dispatch overhead is large
    AND variable (26-700 ms depending on service state), so absolute one-call
    times are useless. Time chains of K and 4K iterations (min of 3 reps
    each) and report the marginal — fixed costs cancel exactly."""
    k1, k2 = iters, 4 * iters

    def run(k):
        f = jax.jit(lambda v: jax.lax.fori_loop(0, k, lambda i, u: fn(u), v))
        t0 = time.time()
        r = f(x)
        np.asarray(jax.jit(lambda a: a.reshape(-1)[:8])(r))
        compile_s = time.time() - t0
        best = float("inf")
        x2 = x
        for _ in range(3):
            x2 = jax.jit(lambda a: a + jnp.asarray(0.001, a.dtype))(x2)
            jax.block_until_ready(x2)
            t0 = time.time()
            r = f(x2)
            np.asarray(jax.jit(lambda a: a.reshape(-1)[:8])(r))
            best = min(best, time.time() - t0)
        return best, compile_s

    try:
        t1, c1 = run(k1)
        t2, c2 = run(k2)
    except Exception as e:  # noqa: BLE001
        print(f"  {name:10s}  FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    per = (t2 - t1) / (k2 - k1) * 1e3
    print(f"  {name:10s}  {per:8.2f} ms/block   (compile {c1:.0f}+{c2:.0f}s, "
          f"totals {t1*1e3:.0f}/{t2*1e3:.0f} ms @ {k1}/{k2})", flush=True)
    return per


def measure_overhead():
    tiny = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda v: v + 1)
    np.asarray(f(tiny))
    t0 = time.time()
    np.asarray(jax.jit(lambda a: a.reshape(-1)[:8])(f(tiny + 2)))
    return time.time() - t0


def check_equiv(variants, vt, vc, x, c):
    """bf16-tolerance equivalence of every variant vs xla on a small slab."""
    xs = x[:2]
    if "xla" not in variants:
        return
    ref = np.asarray(variants["xla"](xs)).astype(np.float32)
    for n, f in variants.items():
        if n in ("xla", "tposes", "dw_true", "dw_bdiag", "lnmlp", "fused_sig"):
            continue
        got = np.asarray(f(xs)).astype(np.float32)
        d = np.abs(got - ref).max()
        print(f"  equiv {n}: max|d| = {d:.4f}", flush=True)
    if "hyb_hwcn" in vt:
        xt = jnp.transpose(xs, (1, 2, 3, 0))
        got = np.asarray(jnp.transpose(vt["hyb_hwcn"](xt), (3, 0, 1, 2)))
        d = np.abs(got.astype(np.float32) - ref).max()
        print(f"  equiv hyb_hwcn: max|d| = {d:.4f}", flush=True)
    for n, f in vc.items():
        if n != "hyb_chwn":
            continue
        xc = jnp.transpose(xs, (3, 1, 2, 0))
        got = np.asarray(jnp.transpose(f(xc), (3, 1, 2, 0)))
        d = np.abs(got.astype(np.float32) - ref).max()
        print(f"  equiv {n}: max|d| = {d:.4f}", flush=True)


def run_shape(tag, b, h, w, c, hidden, iters, which, skip_equiv):
    print(f"== {tag}: ({b},{h},{w},{c}) hidden={hidden} bf16 ==", flush=True)
    rng = np.random.RandomState(0)
    p = make_params(c, hidden, rng)
    key = jax.random.PRNGKey(1)
    x = jax.jit(lambda k: jax.random.normal(k, (b, h, w, c), DT))(key)
    jax.block_until_ready(x)
    v, vt, vc = build_variants(p, c, which)
    if not skip_equiv:
        check_equiv(v, vt, vc, x, c)
    res = {}
    for name, fn in v.items():
        res[name] = time_chained(name, fn, x, iters)
    if vt:
        xt = jax.jit(lambda a: jnp.transpose(a, (1, 2, 3, 0)))(x)
        jax.block_until_ready(xt)
        for name, fn in vt.items():
            res[name] = time_chained(name, fn, xt, iters)
    if vc:
        xc = jax.jit(lambda a: jnp.transpose(a, (3, 1, 2, 0)))(x)
        jax.block_until_ready(xc)
        for name, fn in vc.items():
            res[name] = time_chained(name, fn, xc, iters)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("shape", nargs="?", default="all",
                    choices=["s1", "s2", "s3", "s4", "all"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--skip-equiv", action="store_true")
    args = ap.parse_args()
    which = set(args.only.split(",")) if args.only else None

    print("imports done; touching device...", flush=True)
    global OVERHEAD
    OVERHEAD = measure_overhead()
    print(f"backend={jax.default_backend()} overhead={OVERHEAD*1e3:.1f}ms",
          flush=True)
    if args.shape in ("s1", "all"):
        run_shape("s1", args.batch, 99, 99, 96, 384, args.iters, which,
                  args.skip_equiv)
    if args.shape in ("s2", "all"):
        run_shape("s2", args.batch, 49, 49, 192, 768, args.iters, which,
                  args.skip_equiv)
    # wide stages: C is 128-aligned so the row-major whole-image kernel is
    # already legal in bf16; these probe whether batch-last wins anyway
    if args.shape == "s3":
        run_shape("s3", args.batch, 25, 25, 384, 1536, args.iters, which,
                  args.skip_equiv)
    if args.shape == "s4":
        run_shape("s4", args.batch, 13, 13, 768, 3072, args.iters, which,
                  args.skip_equiv)


if __name__ == "__main__":
    main()
