#!/usr/bin/env python3
"""int8 inference feasibility spike (VERDICT r2 item 9 / NOTES_r2 lead 5).

Two questions, answered with committed numbers:
1. Is int8 actually faster through this XLA/TPU stack? — microbench an
   int8xint8->int32 GEMM against bf16 at MXU-saturating shape (v5e int8 peak
   is 2x bf16; whether XLA reaches it decides go/no-go).
2. What does int8 WEIGHT quantization cost in decisions? — per-output-channel
   symmetric fake-quant (quantize->dequantize, numerically the int8 weight
   grid while keeping the f32/bf16 compute path) on ResNetRS50, then
   decision-flip rate vs the unquantized model at thr=0.487 over synthetic
   inputs. Activation quantization needs model hooks (calibrated scales) and
   is out of spike scope — weight-grid flips are the lower bound on damage.

Usage:
  python tools/int8_spike.py gemm            # microbench (TPU)
  python tools/int8_spike.py flips [--cpu]   # ResNetRS50 weight-quant flips
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

THR = 0.487


def gemm_bench(n=8192, iters=64):
    from tools.bench_util import device_randn, time_marginal

    a16 = device_randn((n, n), jnp.bfloat16)
    print(f"GEMM {n}^3:", flush=True)
    t_bf16 = time_marginal(
        "bf16xbf16", lambda u: jnp.dot(u, u, preferred_element_type=jnp.bfloat16),
        a16, iters=iters)
    # int8 path: quantize the running value each iteration (keeps the chain
    # shape-preserving in int8), dot with int32 accumulation
    a8 = jax.jit(lambda x: jnp.clip(x * 16.0, -127, 127).astype(jnp.int8))(a16)
    jax.block_until_ready(a8)

    def int8_dot(u):
        o = jax.lax.dot_general(
            u, u, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return jnp.clip(o >> 8, -127, 127).astype(jnp.int8)

    t_int8 = time_marginal("int8xint8", int8_dot, a8, iters=iters)
    if t_bf16 and t_int8:
        tf_bf16 = 2 * n ** 3 / (t_bf16 / 1e3) / 1e12
        tf_int8 = 2 * n ** 3 / (t_int8 / 1e3) / 1e12
        print(json.dumps({
            "gemm_n": n,
            "bf16_tflops": round(tf_bf16, 1),
            "int8_tops": round(tf_int8, 1),
            "int8_speedup": round(t_bf16 / t_int8, 2),
        }))


def conv_bench(iters=16, batch=256):
    """int8 vs bf16 CONVOLUTION at member-representative shapes — the GEMM
    result (2.84x) does not by itself prove XLA lowers s8 convs to the MXU
    int8 path; this does. Chains are shape-preserving (SAME, C_in=C_out) and
    re-quantize each iteration like the GEMM chain."""
    from tools.bench_util import device_randn, time_marginal

    shapes = [
        ("conv3x3_c256_50", (batch, 50, 50, 256), (3, 3, 256, 256)),
        ("conv1x1_c512_25", (batch, 25, 25, 512), (1, 1, 512, 512)),
    ]
    results = {}
    for name, xs, ks in shapes:
        x16 = device_randn(xs, jnp.bfloat16)
        k16 = device_randn(ks, jnp.bfloat16)

        def bf16_conv(u, k=k16):
            return jax.lax.conv_general_dilated(
                u, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)

        t16 = time_marginal(f"{name} bf16", bf16_conv, x16, iters=iters,
                            label_width=22)
        q = jax.jit(lambda v: jnp.clip(v * 16.0, -127, 127).astype(jnp.int8))
        x8, k8 = q(x16), q(k16)
        jax.block_until_ready((x8, k8))

        def int8_conv(u, k=k8):
            o = jax.lax.conv_general_dilated(
                u, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return jnp.clip(o >> 7, -127, 127).astype(jnp.int8)

        t8 = time_marginal(f"{name} int8", int8_conv, x8, iters=iters,
                           label_width=22)
        if t16 and t8:
            n, h, w, ci = xs
            kh, kw, _, co = ks
            fl = 2.0 * n * h * w * co * ci * kh * kw
            results[name] = {
                "bf16_ms": round(t16, 3), "int8_ms": round(t8, 3),
                "bf16_tflops": round(fl / (t16 / 1e3) / 1e12, 1),
                "int8_tops": round(fl / (t8 / 1e3) / 1e12, 1),
                "speedup": round(t16 / t8, 2),
            }
    print(json.dumps(results, indent=1))


def quantize_weights_int8(variables):
    """Per-output-channel symmetric int8 fake-quant of every conv/dense
    kernel (quantize -> dequantize: values land exactly on the int8 grid the
    real int8 program would use; biases/norms stay f32, like production int8
    deployments)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(variables["params"])
    n_q = 0
    for k, v in flat.items():
        if k[-1] != "kernel" or v.ndim < 2:
            continue
        w = np.asarray(v, np.float32)
        axes = tuple(range(w.ndim - 1))          # per-output-channel
        scale = np.abs(w).max(axis=axes, keepdims=True) / 127.0
        scale = np.where(scale == 0, 1.0, scale)
        q = np.clip(np.round(w / scale), -127, 127)
        flat[k] = jnp.asarray(q * scale, np.asarray(v).dtype)
        n_q += 1
    out = dict(variables)
    out["params"] = unflatten_dict(flat)
    return out, n_q


def flips(n_imgs=512, batch=64, head_scale=20.0, cpu=False):
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    from tools.flip_rate import scale_head
    from vip_cup_2022_tpu.infer.engine import EnsembleEngine

    engine = EnsembleEngine(verbose=0)
    module, variables, _ = engine._create_member(
        "ResNetRS50", (200, 200),
        dict(nb_classes=1, classifier_activation="sigmoid"))
    variables = scale_head(variables, head_scale)
    qvars, n_q = quantize_weights_int8(variables)
    print(f"quantized {n_q} kernels (per-output-channel symmetric int8)",
          flush=True)

    members = [(module, (200, 200))]
    fwd = engine.build_fused_ensemble(members, tta=1)
    rng = np.random.RandomState(0)
    base = rng.randint(0, 256, size=(n_imgs, 25, 25, 3), dtype=np.uint8)
    imgs = np.kron(base, np.ones((1, 8, 8, 1), np.uint8))
    key = jax.random.PRNGKey(0)

    def run(vs):
        out = []
        for s in range(0, n_imgs, batch):
            out.append(np.asarray(fwd([[engine._place(vs)]],
                                      imgs[s : s + batch], key)))
        return np.concatenate(out)[:, 0]

    p_ref = run(variables)
    p_q = run(qvars)
    d_ref, d_q = p_ref > THR, p_q > THR
    print(json.dumps({
        "model": "ResNetRS50",
        "n": n_imgs,
        "head_scale": head_scale,
        "weight_int8_flip_rate": float((d_ref != d_q).mean()),
        "mean_abs_dp": float(np.abs(p_ref - p_q).mean()),
        "max_abs_dp": float(np.abs(p_ref - p_q).max()),
        "compute_dtype": jnp.dtype(engine.compute_dtype).name,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["gemm", "conv", "flips"])
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=512)
    args = ap.parse_args()
    if args.mode == "gemm":
        gemm_bench()
    elif args.mode == "conv":
        # per-iter cost is sub-ms: chains must be long enough that totals
        # clear the (up to ~800 ms) tunnel latency window (NOTES_r3 rule 3)
        conv_bench(iters=args.iters)
    else:
        flips(n_imgs=args.n, batch=args.batch, cpu=args.cpu)


if __name__ == "__main__":
    main()
