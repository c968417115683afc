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

Measurement notes (axon tunnel): host<->device dispatch/fetch overhead is
measured at runtime on a trivial jitted program with the same queue/fetch
pattern (and reported in ``detail.timing`` so the subtraction is auditable);
the runtime memoizes identical dispatches, so each timed rep uses a DISTINCT
device-resident input. Also reported: p50 per-batch latency (dispatch+fetch,
the second BASELINE.json metric) and measured GFLOPs/img + MFU from XLA's
cost analysis of the exact compiled ensemble program. The fused program is NOT wrapped in a
fori_loop: XLA's loop passes blow the joint 7-member module's compile past
40 minutes, while the unchained program compiles in ~70 s. Models initialize
on the CPU backend and weights are device_put once (jit-init through the
tunnel costs minutes per model).

Env knobs: VIPTPU_BENCH_BATCH (default 256), VIPTPU_BENCH_REPS (default 6),
VIPTPU_BENCH_MEMBERS=1 adds per-member timings (roughly doubles runtime).
"""
import json
import os
import subprocess
import sys
import time

# --flops-probe self-mode (used by main() in a subprocess): count the
# ensemble's ALGORITHMIC FLOPs by compiling the UNFUSED program on the CPU
# backend at a small batch — XLA's cost analysis reports 0 FLOPs for pallas
# custom calls, so the TPU-compiled fused program undercounts; the unfused
# trace counts every conv/dot, and FLOPs scale linearly in batch.
if "--flops-probe" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["VIPTPU_NO_FUSED_BLOCK"] = "1"

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
PEAK_FLOPS = {  # bf16 dense peak per chip, for the MFU readout
    "v5 lite": 197e12,  # TPU v5e
    "v5e": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
}


def _peak_flops() -> float:
    env = os.environ.get("VIPTPU_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    kind = jax.devices()[0].device_kind.lower()
    for key, val in PEAK_FLOPS.items():
        if key in kind:
            return val
    return 0.0


_overhead_cache = {}


def measure_dispatch_overhead(n: int) -> float:
    """Exposed host-side overhead of the pipelined timing pattern, measured
    at runtime on THIS host/backend (replaces a baked-in tunnel constant):
    run the identical queue-n-dispatches + fetch-last pattern on a trivial
    jitted program whose device time is ~0, so the wall clock IS the
    dispatch/fetch overhead (~2 tunnel round-trips on axon, ~0 locally)."""
    if n in _overhead_cache:
        return _overhead_cache[n]
    tiny = jax.device_put(jnp.zeros((8,), jnp.float32), jax.devices()[0])
    noop = jax.jit(lambda x, i: x + i)
    jax.block_until_ready(noop(tiny, 0.0))
    np.asarray(noop(tiny, 0.5))
    t0 = time.perf_counter()
    outs = [noop(tiny, float(i + 1)) for i in range(n)]
    np.asarray(outs[-1])
    _overhead_cache[n] = time.perf_counter() - t0
    return _overhead_cache[n]


def time_program(fn, inputs):
    """Pipelined timing: queue one dispatch per distinct input (distinct
    because the runtime memoizes identical dispatches), then drain the queue
    with a host fetch of the LAST output — executions are ordered on device,
    so the wall time covers every queued forward. block_until_ready is NOT a
    reliable sync point through the axon tunnel (it can report a queued
    dispatch 'ready' in ~5 ms); a value fetch is. Returns
    (seconds_per_forward, detail_dict) with the raw pipelined total so the
    overhead subtraction is auditable."""
    jax.block_until_ready(fn(inputs[0]))  # compile + warm
    np.asarray(fn(inputs[0]))  # drain anything outstanding
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs[1:]]
    np.asarray(outs[-1])
    total = time.perf_counter() - t0
    overhead = measure_dispatch_overhead(len(outs))
    per_fwd = (total - overhead) / len(outs)
    if per_fwd <= 0:  # overhead-dominated (trivial program): report raw
        per_fwd = total / len(outs)
    detail = {
        "pipelined_total_s": round(total, 4),
        "dispatch_overhead_s": round(overhead, 4),
        "n_forwards": len(outs),
    }
    if os.environ.get("VIPTPU_BENCH_DEBUG"):
        print(f"pipelined total {total*1e3:.1f} ms over {len(outs)} forwards "
              f"(overhead {overhead*1e3:.1f} ms)", file=__import__("sys").stderr)
    return per_fwd, detail


def batch_latency(fn, inputs):
    """Per-batch latency: one dispatch + host fetch, timed individually
    (the p50 CSV-batch latency metric BASELINE.json names). Includes the
    host<->device round-trips a real CSV batch pays."""
    np.asarray(fn(inputs[0]))  # warm
    lats = []
    for x in inputs[1:]:
        t0 = time.perf_counter()
        np.asarray(fn(x))
        lats.append(time.perf_counter() - t0)
    return float(np.median(lats)), [round(v * 1e3, 1) for v in lats]


def _build_members(engine, compute_dtype, init_device):
    from vip_cup_2022_tpu.infer.engine import registry_name
    from vip_cup_2022_tpu.models import create_model, is_model

    members = []
    for dirname, dim in ENSEMBLE:
        name = registry_name(dirname)
        if not is_model(name):
            continue
        with jax.default_device(init_device):
            module, variables, _ = create_model(
                name, input_size=dim, nb_classes=1,
                classifier_activation="sigmoid", dtype=compute_dtype,
            )
        members.append((module, dim, variables))
    return members


def flops_probe(batch: int = 8):
    """--flops-probe mode (CPU subprocess): algorithmic FLOPs/img of the
    unfused ensemble program. Prints one JSON line."""
    from vip_cup_2022_tpu.infer.engine import EnsembleEngine

    engine = EnsembleEngine(verbose=0, compute_dtype=jnp.float32)
    triples = _build_members(engine, jnp.float32, jax.devices()[0])
    members = [(m, d) for m, d, _ in triples]
    all_variables = [[v] for _, _, v in triples]
    x = jnp.zeros((batch, 200, 200, 3), jnp.uint8)
    fused = engine.build_fused_ensemble(members, tta=1)
    analysis = fused.lower(all_variables, x, jax.random.PRNGKey(0)).compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    print(json.dumps({"flops_per_img": float(analysis.get("flops", 0.0)) / batch}))


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
    # liveness marker for wrappers (tools/tpu_retry.sh): the first real device
    # op is where a wedged axon tunnel hangs, so probe it before the long
    # CPU-side model init and announce success on stderr.
    jax.block_until_ready(jax.device_put(jnp.zeros((8,), jnp.float32), device))
    print(f"[bench] device bound: {device.device_kind}",
          file=__import__("sys").stderr, flush=True)
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

    # int8 PTQ members (production default 'auto' = the measured-win set;
    # VIPTPU_INT8=off for the pure-bf16 arm). Calibration runs as one jitted
    # program per member on the synthetic batch (engine._calibrate_member).
    int8_names = engine._int8_names()
    quant_scales = None
    int8_applied = []
    if int8_names:
        quant_scales = []
        for (module, dim), fold_vars, (dirname, _d) in zip(
            members, all_variables, ENSEMBLE
        ):
            name = registry_name(dirname)
            if "*" in int8_names or name in int8_names:
                quant_scales.append(
                    engine._calibrate_member(module, fold_vars[0], dim, base)
                )
                int8_applied.append(name)
            else:
                quant_scales.append(None)

    key = jax.random.PRNGKey(0)
    t_compile = time.time()
    path = "fused_whole_ensemble (production default)"
    timing_detail = {}
    p50_ms, lats_ms = None, None
    flops_batch = 0.0
    try:
        fused = engine.build_fused_ensemble(members, tta=1,
                                            quant_scales=quant_scales)
        fused_call = lambda x: fused(all_variables, x, key)  # noqa: E731
        per_fwd, timing_detail = time_program(fused_call, inputs)
        p50, lats_ms = batch_latency(fused_call, inputs)
        p50_ms = round(p50 * 1e3, 1)
        try:  # measured FLOPs of the exact compiled program (XLA cost analysis)
            analysis = fused.lower(all_variables, inputs[0], key).compile().cost_analysis()
            if isinstance(analysis, list):
                analysis = analysis[0]
            flops_batch = float(analysis.get("flops", 0.0))
        except Exception as e:
            print(f"cost_analysis unavailable ({type(e).__name__}: {e})",
                  file=__import__("sys").stderr)
    except Exception as e:  # insurance: never return an empty bench
        print(f"fused-ensemble path failed ({type(e).__name__}); "
              "falling back to per-member sum", file=__import__("sys").stderr)
        path = "per_member_sum (fused path failed)"
        per_fwd = 0.0
        for (module, dim), fold_vars in zip(members, all_variables):
            one = engine.build_fused_ensemble([(module, dim)], tta=1)
            fv = [fold_vars]
            dt, _ = time_program(lambda x, one=one, fv=fv: one(fv, x, key), inputs)
            per_fwd += dt
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
        "int8_members": int8_applied,
        "timing": timing_detail,
        "note": "each image passes through every ensemble member; "
                "north star predates the stride-2 ConvNeXt finding "
                "(arch speed-of-light ~1.4k img/s at 50% MFU)",
    }
    if p50_ms is not None:
        # second BASELINE.json metric: one CSV batch dispatch+fetch, p50
        detail["p50_batch_latency_ms"] = p50_ms
        detail["batch_latency_ms"] = lats_ms
    flops_img_alg = 0.0
    if not int(os.environ.get("VIPTPU_BENCH_NO_FLOPS_PROBE", "0")):
        try:  # algorithmic FLOPs: unfused trace in a CPU subprocess (XLA
            # reports 0 FLOPs for pallas custom calls, so the TPU-compiled
            # fused program undercounts the real work)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flops-probe"],
                capture_output=True, text=True, timeout=1500,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            flops_img_alg = json.loads(out.stdout.strip().splitlines()[-1])[
                "flops_per_img"]
        except Exception as e:
            print(f"flops probe unavailable ({type(e).__name__}: {e})",
                  file=__import__("sys").stderr)
    peak = _peak_flops()
    if flops_batch > 0:
        # XLA-counted FLOPs of the exact compiled program — an UNDERCOUNT
        # when pallas kernels are on the path (custom calls report 0)
        detail["gflops_per_img_xla_counted"] = round(flops_batch / BATCH / 1e9, 1)
    if flops_img_alg > 0:
        detail["gflops_per_img"] = round(flops_img_alg / 1e9, 1)
        if peak > 0:
            detail["mfu"] = round(flops_img_alg * BATCH / per_fwd / peak, 4)
            detail["peak_tflops_assumed"] = peak / 1e12
    elif flops_batch > 0 and peak > 0:
        detail["gflops_per_img"] = round(flops_batch / BATCH / 1e9, 1)
        detail["mfu"] = round(flops_batch / per_fwd / peak, 4)
        detail["peak_tflops_assumed"] = peak / 1e12

    # On-chip fused-vs-XLA equivalence gate (VERDICT r3 item 6): run ONE
    # batch through the production fused-pallas program and through the
    # pure-XLA program (VIPTPU_NO_FUSED_BLOCK, read at trace time) and
    # report max |Δp|. Mosaic miscompiles have been observed on this stack
    # (ops/pallas/convnext_block.py bf16 lane-unaligned LHS), so the bench
    # number is only trustworthy alongside this diff. Both arms run in the
    # same compute dtype; the bound is therefore kernel-order bf16 noise
    # (~5e-3 on sigmoid probabilities), not dtype error.
    # VIPTPU_BENCH_NO_EQUIV=1 skips (saves the second whole-ensemble compile).
    if path.startswith("fused") and not int(
        os.environ.get("VIPTPU_BENCH_NO_EQUIV", "0")
    ):
        old_env = os.environ.get("VIPTPU_NO_FUSED_BLOCK")
        try:
            os.environ["VIPTPU_NO_FUSED_BLOCK"] = "1"
            xla_prog = engine.build_fused_ensemble(
                members, tta=1, quant_scales=quant_scales)
            p_xla = np.asarray(xla_prog(all_variables, inputs[0], key))
            p_fused = np.asarray(fused(all_variables, inputs[0], key))
            max_dp = float(np.max(np.abs(p_fused - p_xla)))
            detail["fused_vs_xla_max_dp"] = round(max_dp, 6)
            detail["equiv_ok"] = bool(max_dp < 0.05)
            if max_dp >= 0.05:
                print(
                    f"EQUIVALENCE GATE FAILED: fused vs XLA max|dp|={max_dp:.4f}"
                    " >= 0.05 — suspect a Mosaic miscompile; the throughput"
                    " number above is NOT trustworthy",
                    file=__import__("sys").stderr,
                )
        except Exception as e:
            print(f"equivalence gate unavailable ({type(e).__name__}: {e})",
                  file=__import__("sys").stderr)
        finally:
            if old_env is None:
                os.environ.pop("VIPTPU_NO_FUSED_BLOCK", None)
            else:
                os.environ["VIPTPU_NO_FUSED_BLOCK"] = old_env

    if int(os.environ.get("VIPTPU_BENCH_MEMBERS", "0")):
        per_member = {}
        for (module, dim), fold_vars in zip(members, all_variables):
            one = engine.build_fused_ensemble([(module, dim)], tta=1)
            fv = [fold_vars]
            dt, _ = time_program(lambda x: one(fv, x, key), inputs)
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
    if "--flops-probe" in sys.argv:
        flops_probe()
    else:
        main()
