#!/usr/bin/env python3
"""Throughput benchmark — prints ONE JSON line.

Metric: ensemble inference images/sec/chip on 200x200 inputs through the
PRODUCTION path — the fused whole-ensemble program (all 7 reference members
back-to-back in one jitted program per batch, engine.build_fused_ensemble),
i.e. what `python3 main.py` runs on TPU. ``vs_baseline`` = ratio against the
10,000 img/s/chip north star (BASELINE.md rebuild target; the reference's own
envelope is ~1.39 img/s end-to-end on a 16 GB GPU).

NOTE on the north star: with the team's stride-2 ConvNeXt stem
(tfimm convnext.py:115,323 — first_down=1 => 99x99 stage 1) the ensemble
costs ~65-70 GFLOPs per image, so 10k img/s would require ~350% of v5e's
bf16 peak; the architectural speed-of-light at a strong 50% MFU is
~1,400 img/s/chip. vs_baseline is reported against 10k anyway for
round-over-round comparability.

Measurement notes (axon tunnel): host<->device roundtrips cost ~27 ms
(subtracted) and the runtime memoizes identical dispatches, so each timed rep
uses a DISTINCT device-resident input. The fused program is NOT wrapped in a
fori_loop: XLA's loop passes blow the joint 7-member module's compile past
40 minutes, while the unchained program compiles in ~70 s. Models initialize
on the CPU backend and weights are device_put once (jit-init through the
tunnel costs minutes per model).

Env knobs: VIPTPU_BENCH_BATCH (default 256), VIPTPU_BENCH_REPS (default 6),
VIPTPU_BENCH_MEMBERS=1 adds per-member timings (roughly doubles runtime).
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent executable cache (same knob as main.py): the fused 7-member
# program costs minutes to compile through the remote helper; repeat bench
# runs on this host reuse it. VIPTPU_NO_JIT_CACHE=1 opts out.
if not int(os.environ.get("VIPTPU_NO_JIT_CACHE", "0")):
    _cache_dir = os.environ.get(
        "VIPTPU_JIT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "vip_cup_2022_tpu_jit"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

ENSEMBLE = [
    ("convnext_tiny_in22k-200x200", (200, 200)),
    ("ResNest50-200x200", (200, 200)),
    ("GCViTTiny-224x224", (224, 224)),
    ("EfficientNetV2T-200x200", (200, 200)),
    ("EfficientNetV1B4-224x224", (224, 224)),
    ("ECA_NFNetL0-200x200", (200, 200)),
    ("ResNetRS50-200x200", (200, 200)),
]

NORTH_STAR = 10_000.0
BATCH = int(os.environ.get("VIPTPU_BENCH_BATCH", "256"))
REPS = int(os.environ.get("VIPTPU_BENCH_REPS", "6"))
DISPATCH_OVERHEAD_S = 0.0265  # measured axon-tunnel constant per dispatch


def time_program(fn, inputs):
    """Pipelined timing: queue one dispatch per distinct input (distinct
    because the runtime memoizes identical dispatches), then drain the queue
    with a host fetch of the LAST output — executions are ordered on device,
    so the wall time covers every queued forward. block_until_ready is NOT a
    reliable sync point through the axon tunnel (it can report a queued
    dispatch 'ready' in ~5 ms); a value fetch is."""
    jax.block_until_ready(fn(inputs[0]))  # compile + warm
    np.asarray(fn(inputs[0]))  # drain anything outstanding
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs[1:]]
    np.asarray(outs[-1])
    total = time.perf_counter() - t0
    if os.environ.get("VIPTPU_BENCH_DEBUG"):
        print(f"pipelined total {total*1e3:.1f} ms over {len(outs)} forwards",
              file=__import__("sys").stderr)
    return max((total - 2 * DISPATCH_OVERHEAD_S) / len(outs), 1e-9)


def main():
    from vip_cup_2022_tpu.infer.engine import EnsembleEngine, registry_name
    from vip_cup_2022_tpu.models import create_model, is_model

    compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    engine = EnsembleEngine(verbose=0, compute_dtype=compute_dtype)

    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = jax.devices()[0]
    device = jax.devices()[0]
    members, all_variables = [], []
    for dirname, dim in ENSEMBLE:
        name = registry_name(dirname)
        if not is_model(name):
            continue
        with jax.default_device(cpu):  # init through the tunnel is minutes/model
            module, variables, _ = create_model(
                name, input_size=dim, nb_classes=1,
                classifier_activation="sigmoid", dtype=compute_dtype,
            )
        members.append((module, dim))
        all_variables.append([jax.device_put(variables, device)])

    rng = np.random.RandomState(0)
    base = jax.device_put(
        jnp.asarray(rng.randint(0, 256, size=(BATCH, 200, 200, 3), dtype=np.uint8)),
        device,
    )
    bump = jax.jit(lambda x, i: x + jnp.uint8(i))
    inputs = [jax.block_until_ready(bump(base, i)) for i in range(REPS + 1)]

    key = jax.random.PRNGKey(0)
    t_compile = time.time()
    path = "fused_whole_ensemble (production default)"
    try:
        fused = engine.build_fused_ensemble(members, tta=1)
        per_fwd = time_program(lambda x: fused(all_variables, x, key), inputs)
    except Exception as e:  # insurance: never return an empty bench
        print(f"fused-ensemble path failed ({type(e).__name__}); "
              "falling back to per-member sum", file=__import__("sys").stderr)
        path = "per_member_sum (fused path failed)"
        per_fwd = 0.0
        for (module, dim), fold_vars in zip(members, all_variables):
            one = engine.build_fused_ensemble([(module, dim)], tta=1)
            fv = [fold_vars]
            per_fwd += time_program(lambda x, one=one, fv=fv: one(fv, x, key), inputs)
    compile_s = time.time() - t_compile
    per_chip = BATCH / per_fwd / max(len(jax.devices()), 1)

    detail = {
        "path": path,
        "n_members": len(members),
        "n_members_target": len(ENSEMBLE),
        "batch": BATCH,
        "reps": REPS,
        "backend": jax.default_backend(),
        "n_chips": len(jax.devices()),
        "compile_plus_first_pass_s": round(compile_s, 1),
        "note": "each image passes through every ensemble member; "
                "north star predates the stride-2 ConvNeXt finding "
                "(arch speed-of-light ~1.4k img/s at 50% MFU)",
    }

    if int(os.environ.get("VIPTPU_BENCH_MEMBERS", "0")):
        per_member = {}
        for (module, dim), fold_vars in zip(members, all_variables):
            one = engine.build_fused_ensemble([(module, dim)], tta=1)
            fv = [fold_vars]
            dt = time_program(lambda x: one(fv, x, key), inputs)
            per_member[module.cfg.name] = round(BATCH / dt, 1)
        detail["per_member_img_per_sec"] = per_member

    result = {
        "metric": "ensemble_infer_img_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / NORTH_STAR, 4),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
