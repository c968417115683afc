#!/usr/bin/env python3
"""Joint fused-ensemble program vs chained per-member dispatches (round 3).

BENCH_r03 mid-round: the joint 7-member program runs ~354 ms/256-batch while
the SUM of the best single-member program times is ~295 ms — a ~20% penalty
that can only come from the joint compile (scheduling, VMEM pressure — e.g.
the GCViT L4 batch-fold is reverted by a VMEM guard only in the ensemble
compile). This prices the alternative: keep the engine's per-member fused
programs (exactly what exp_member_ab measures) and queue all 7 dispatches
per batch back-to-back, combining on device with a tiny 8th program. JAX's
async dispatch pipelines them; the tunnel round-trip is latency, not
serialized work, so the per-batch marginal is the device time either way.

Both variants are timed in the SAME session with the same inputs
(bench.py's pipelined distinct-input pattern), joint first, then chain,
then joint again to expose session drift.

Usage: python tools/exp_chain_vs_joint.py [--batch 256] [--reps 6]
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

ENSEMBLE = [
    ("convnext_tiny_in22k-200x200", (200, 200)),
    ("ResNest50-200x200", (200, 200)),
    ("GCViTTiny-224x224", (224, 224)),
    ("EfficientNetV2T-200x200", (200, 200)),
    ("EfficientNetV1B4-224x224", (224, 224)),
    ("ECA_NFNetL0-200x200", (200, 200)),
    ("ResNetRS50-200x200", (200, 200)),
]


def time_pipelined(label, fn, inputs):
    """bench.py's pattern: queue one dispatch per distinct input, fetch the
    last output; prints and returns seconds/forward (raw, incl. ~2 round
    trips of fixed latency — identical for both variants, so the comparison
    is fair even when the tunnel is degraded)."""
    jax.block_until_ready(fn(inputs[0]))  # compile + warm
    np.asarray(fn(inputs[0]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [fn(x) for x in inputs[1:]]
        np.asarray(outs[-1])
        best = min(best, (time.perf_counter() - t0) / len(outs))
    img_s = inputs[0].shape[0] / best
    print(f"  {label:14s} {best*1e3:8.1f} ms/batch  {img_s:8.1f} img/s",
          flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    from vip_cup_2022_tpu.infer.engine import EnsembleEngine, registry_name
    from vip_cup_2022_tpu.models import create_model

    compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    engine = EnsembleEngine(verbose=0, compute_dtype=compute_dtype)
    device = jax.devices()[0]
    jax.block_until_ready(jax.device_put(jnp.zeros((8,), jnp.float32), device))
    print(f"device: {device.device_kind}", flush=True)
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = device

    members, all_variables = [], []
    for dirname, dim in ENSEMBLE:
        name = registry_name(dirname)
        with jax.default_device(cpu):
            module, variables, _ = create_model(
                name, input_size=dim, nb_classes=1,
                classifier_activation="sigmoid", dtype=compute_dtype,
            )
        members.append((module, dim))
        all_variables.append([jax.device_put(variables, device)])

    rng = np.random.RandomState(0)
    base = jax.device_put(
        jnp.asarray(rng.randint(0, 256, size=(args.batch, 200, 200, 3),
                                dtype=np.uint8)), device)
    bump = jax.jit(lambda x, i: x + jnp.uint8(i))
    inputs = [jax.block_until_ready(bump(base, i)) for i in range(args.reps + 1)]
    key = jax.random.PRNGKey(0)

    # joint: the production build_fused_ensemble over all 7 members
    joint = engine.build_fused_ensemble(members, tta=1)
    joint_call = lambda x: joint(all_variables, x, key)  # noqa: E731

    # chain: one fused program PER member (exactly the exp_member_ab
    # programs) + an on-device mean combiner; 8 queued dispatches per batch
    member_fns = [engine.build_fused_ensemble([m], tta=1) for m in members]
    combine = jax.jit(lambda ps: jnp.mean(jnp.stack(ps), axis=0))

    def chain_call(x):
        return combine([fn([fv], x, key)
                        for fn, fv in zip(member_fns, all_variables)])

    t0 = time.time()
    tj1 = time_pipelined("joint", joint_call, inputs)
    print(f"  (joint compile+run {time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    tc = time_pipelined("chain", chain_call, inputs)
    print(f"  (chain compile+run {time.time()-t0:.0f}s)", flush=True)
    tj2 = time_pipelined("joint again", joint_call, inputs)
    print(f"\njoint {min(tj1, tj2)*1e3:.1f} ms vs chain {tc*1e3:.1f} ms "
          f"({(min(tj1, tj2)/tc - 1)*100:+.1f}% for chain)", flush=True)


if __name__ == "__main__":
    main()
