#!/usr/bin/env python3
"""ConvNeXt member per-stage cost profile (round 3, real v5e).

The member totals 146.5 ms/256-batch but the known kernel costs (stem 5,
s1 3x13.3, s2 ~8, s3 9x5.3, s4 3x3.6) sum to ~112 ms — this harness times
TRUNCATED models (prefixes of nb_blocks, features_only) so consecutive
marginals give each stage's true cost INCLUDING glue (downsample convs,
batch-last transposes, layout changes), plus the head.

Each truncated model is the production convnext_tiny_in22k config with
nb_blocks/embed_dim cut to a prefix; the stride-2 stem (first_down) and the
fused-kernel gates behave exactly as in production.

Usage: python tools/exp_convnext_stages.py [--batch 256] [--reps 6]
"""
import argparse
import os
import sys
import time

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

NB = (3, 3, 9, 3)
DIMS = (96, 192, 384, 768)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import bench  # repo-root: time_program + runtime overhead measurement
    from vip_cup_2022_tpu.models import create_model

    print(f"backend={jax.default_backend()}", flush=True)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = jax.devices()[0]
    device = jax.devices()[0]

    # normalized image tensor (what the stem sees after engine preprocess)
    key = jax.random.PRNGKey(0)
    mk = jax.jit(lambda k: jax.random.normal(k, (args.batch, 200, 200, 3), dt))
    inputs = [jax.block_until_ready(mk(jax.random.fold_in(key, i)))
              for i in range(args.reps + 1)]

    variants = [("stem", 0)] + [(f"s{k}", k) for k in range(1, 5)]
    prev_name, prev = None, None
    for tag, k in variants:
        with jax.default_device(cpu):
            module, variables, _ = create_model(
                "convnext_tiny_in22k", input_size=(200, 200), nb_classes=1,
                classifier_activation="sigmoid", dtype=dt,
                nb_blocks=NB[:k], embed_dim=DIMS[:max(k, 1)],
            )
        v = jax.device_put(variables, device)
        # reduce to a scalar on device: fetching the raw stage-1 feature map
        # (481 MB) through the ~75 MB/s tunnel would swamp the timing
        fn = jax.jit(lambda x, v=v, m=module: m.apply(
            v, x, features_only=True).astype(jnp.float32).mean())
        t0 = time.time()
        per_fwd, detail = bench.time_program(fn, inputs)
        ms = per_fwd * 1e3
        marg = "" if prev is None else f"   marginal {ms - prev:+.1f} ms vs {prev_name}"
        print(f"  {tag:6s}  {ms:7.1f} ms/batch   (compile+run1 {time.time()-t0:.0f}s; "
              f"total {detail['pipelined_total_s']}s){marg}", flush=True)
        prev_name, prev = tag, ms

    # full model with head (marginal vs s4 = final norm + pooled head)
    with jax.default_device(cpu):
        module, variables, _ = create_model(
            "convnext_tiny_in22k", input_size=(200, 200), nb_classes=1,
            classifier_activation="sigmoid", dtype=dt,
        )
    v = jax.device_put(variables, device)
    fn = jax.jit(lambda x: module.apply(v, x))
    t0 = time.time()
    per_fwd, detail = bench.time_program(fn, inputs)
    ms = per_fwd * 1e3
    print(f"  full    {ms:7.1f} ms/batch   (compile+run1 {time.time()-t0:.0f}s; "
          f"total {detail['pipelined_total_s']}s)   marginal {ms - prev:+.1f} ms vs s4",
          flush=True)


if __name__ == "__main__":
    main()
