#!/usr/bin/env python3
"""Same-session ensemble-level A/B: bf16 fused ensemble vs int8-auto
(PTQ on the measured-win members, engine.INT8_AUTO). VERDICT r3 item 1.

Times the two whole-ensemble programs A-B-A-B in one session with the
pipelined-queue pattern (distinct inputs, fetch-last drain), so tunnel
session drift cancels. Prints per-arm ms/batch and img/s.

Usage: python tools/exp_ensemble_int8.py [--batch 256] [--reps 6]
       [--members ResNetRS50,ResNest50]   # override the int8 set
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ENSEMBLE = [
    ("convnext_tiny_in22k", (200, 200)),
    ("ResNest50", (200, 200)),
    ("GCViTTiny", (224, 224)),
    ("EfficientNetV2T", (200, 200)),
    ("EfficientNetV1B4", (224, 224)),
    ("ECA_NFNetL0", (200, 200)),
    ("ResNetRS50", (200, 200)),
]


def time_queue(fn, inputs, overhead):
    np.asarray(fn(inputs[0]))  # warm/drain
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs[1:]]
    np.asarray(outs[-1])
    total = time.perf_counter() - t0
    return (total - overhead) / (len(inputs) - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--members", type=str, default="")
    args = ap.parse_args()

    from vip_cup_2022_tpu.infer.engine import EnsembleEngine

    jax.block_until_ready(
        jax.device_put(jnp.zeros((8,), jnp.float32), jax.devices()[0]))
    print(f"backend={jax.default_backend()}", flush=True)

    engine = EnsembleEngine(verbose=0)
    int8_set = (set(args.members.split(",")) if args.members
                else set(EnsembleEngine.INT8_AUTO))
    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0] if jax.default_backend() != "cpu" else device

    members, all_vars, quant_scales = [], [], []
    rng = np.random.RandomState(0)
    base = jax.device_put(
        jnp.asarray(rng.randint(0, 256, (args.batch, 200, 200, 3),
                                dtype=np.uint8)), device)
    for name, dim in ENSEMBLE:
        module, variables, _ = engine._create_member(
            name, dim, dict(nb_classes=1, classifier_activation="sigmoid"))
        placed = jax.device_put(variables, device)
        members.append((module, dim))
        all_vars.append([placed])
        if name in int8_set:
            scales = engine._calibrate_member(module, placed, dim, base)
            print(f"calibrated {name}: {len(scales)} sites", flush=True)
            quant_scales.append(scales)
        else:
            quant_scales.append(None)

    bump = jax.jit(lambda x, i: x + jnp.uint8(i))
    inputs = [jax.block_until_ready(bump(base, i))
              for i in range(args.reps + 1)]
    key = jax.random.PRNGKey(0)

    tiny = jax.device_put(jnp.zeros((8,), jnp.float32), device)
    noop = jax.jit(lambda x, i: x + i)
    np.asarray(noop(tiny, 0.5))
    t0 = time.perf_counter()
    outs = [noop(tiny, float(i + 1)) for i in range(args.reps)]
    np.asarray(outs[-1])
    overhead = time.perf_counter() - t0
    print(f"overhead {overhead*1e3:.1f} ms", flush=True)

    f_bf16 = engine.build_fused_ensemble(members, tta=1)
    f_int8 = engine.build_fused_ensemble(members, tta=1,
                                         quant_scales=quant_scales)
    a = lambda x: f_bf16(all_vars, x, key)   # noqa: E731
    b = lambda x: f_int8(all_vars, x, key)   # noqa: E731

    # equivalence first (also compiles both)
    pa = np.asarray(a(inputs[0]))
    pb = np.asarray(b(inputs[0]))
    print(f"int8-vs-bf16 max|dp| = {np.abs(pa - pb).max():.5f}", flush=True)

    for rnd in range(2):
        for label, fn in (("bf16", a), ("int8", b)):
            dt = time_queue(fn, inputs, overhead)
            print(f"[{rnd}] {label}: {dt*1e3:8.1f} ms/batch  "
                  f"{args.batch/dt:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
