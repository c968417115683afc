#!/usr/bin/env python3
"""Ensemble-level A/B for the IN-KERNEL int8 GEMM paths (VERDICT r4 item 5's
ensemble half): the production fused 7-member program traced with
VIPTPU_INT8_KERNELS off (arm A, the shipped default incl. PTQ int8-auto)
vs on (arm B: + s8 GEMMs in the ConvNeXt whole-image/batch-lane kernels
and the GCViT mono/pipeline kernels at C>=128). Same-session A/B/A/B,
pipelined distinct inputs, fetch-last drain (bench.py pattern).

Member-level A/Bs (NOTES_r5) measured GCViT -2.5% and ConvNeXt -5.2%;
this records the ensemble-level number the worklist asked for.

Usage: python tools/exp_ensemble_int8k.py [--batch 256] [--reps 6]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    from vip_cup_2022_tpu.infer.engine import EnsembleEngine

    device = jax.devices()[0]
    jax.block_until_ready(jax.device_put(jnp.zeros((8,), jnp.float32), device))
    print(f"backend={jax.default_backend()}", flush=True)

    engine = EnsembleEngine(verbose=0)
    members, all_vars = [], []
    for name, dim in ENSEMBLE:
        module, variables, _ = engine._create_member(
            name, dim, dict(nb_classes=1, classifier_activation="sigmoid"))
        members.append((module, dim))
        all_vars.append([jax.device_put(variables, device)])

    rng = np.random.RandomState(0)
    base = jax.device_put(jnp.asarray(
        rng.randint(0, 256, (args.batch, 200, 200, 3), dtype=np.uint8)), device)
    bump = jax.jit(lambda x, i: x + jnp.uint8(i))
    inputs = [jax.block_until_ready(bump(base, i)) for i in range(args.reps + 1)]
    key = jax.random.PRNGKey(0)

    tiny = jax.device_put(jnp.zeros((8,), jnp.float32), device)
    noop = jax.jit(lambda x, i: x + i)
    np.asarray(noop(tiny, 0.5))
    t0 = time.perf_counter()
    outs = [noop(tiny, float(i + 1)) for i in range(args.reps)]
    np.asarray(outs[-1])
    overhead = time.perf_counter() - t0
    print(f"overhead {overhead*1e3:.1f} ms", flush=True)

    # the kernels read VIPTPU_INT8_KERNELS at TRACE time (first call), so
    # each arm's env must be live through its first invocation
    progs, first = {}, {}
    for label, env in (("default", "0"), ("int8_kernels", "1")):
        os.environ["VIPTPU_INT8_KERNELS"] = env
        progs[label] = engine.build_fused_ensemble(members, tta=1)
        first[label] = np.asarray(progs[label](all_vars, inputs[0], key))
    os.environ.pop("VIPTPU_INT8_KERNELS", None)
    dp = np.abs(first["default"] - first["int8_kernels"]).max()
    print(f"int8k-vs-default max|dp| = {dp:.5f}", flush=True)
    assert dp > 0, "int8 kernels did not engage (trace-time env gate missed)"

    for rnd in range(2):
        for label, fwd in progs.items():
            fn = lambda x: fwd(all_vars, x, key)  # noqa: E731
            np.asarray(fn(inputs[0]))
            t0 = time.perf_counter()
            outs = [fn(x) for x in inputs[1:]]
            np.asarray(outs[-1])
            dt = (time.perf_counter() - t0 - overhead) / args.reps
            print(f"[{rnd}] {label:13s}: {dt*1e3:8.1f} ms/batch "
                  f"{args.batch/dt:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
