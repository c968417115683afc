#!/usr/bin/env python3
"""TTA execution A/B on chip (VERDICT r3 item 8): lax.map over TTA replicas
(tta sequential forwards at batch B) vs folding the TTA copies into the
batch axis (one forward at tta*B, VIPTPU_TTA_MODE=fold).

Fair comparison at equal images-in-flight: map runs B=256 (2 passes of 256),
fold runs B=128 (one pass at effective 256 — the ConvNeXt batch-lane kernel
rejects 512-lane folds, so fold cannot run 2x256). Metric: distinct CSV
images per second at tta=2 (each image costs two member passes either way).

Usage: python tools/exp_tta.py [--reps 6]
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
TTA = 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--map-batch", type=int, default=256)
    ap.add_argument("--fold-batch", type=int, default=128)
    args = ap.parse_args()

    from vip_cup_2022_tpu.infer.engine import EnsembleEngine

    jax.block_until_ready(
        jax.device_put(jnp.zeros((8,), jnp.float32), jax.devices()[0]))
    print(f"backend={jax.default_backend()}", flush=True)
    os.environ["VIPTPU_INT8"] = "off"  # isolate the TTA variable

    engine = EnsembleEngine(verbose=0)
    device = jax.devices()[0]
    members, all_vars = [], []
    for name, dim in ENSEMBLE:
        module, variables, _ = engine._create_member(
            name, dim, dict(nb_classes=1, classifier_activation="sigmoid"))
        members.append((module, dim))
        all_vars.append([jax.device_put(variables, device)])

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)

    def inputs_for(batch):
        base = jax.device_put(
            jnp.asarray(rng.randint(0, 256, (batch, 200, 200, 3),
                                    dtype=np.uint8)), device)
        bump = jax.jit(lambda x, i: x + jnp.uint8(i))
        return [jax.block_until_ready(bump(base, i))
                for i in range(args.reps + 1)]

    tiny = jax.device_put(jnp.zeros((8,), jnp.float32), device)
    noop = jax.jit(lambda x, i: x + i)
    np.asarray(noop(tiny, 0.5))
    t0 = time.perf_counter()
    outs = [noop(tiny, float(i + 1)) for i in range(args.reps)]
    np.asarray(outs[-1])
    overhead = time.perf_counter() - t0
    print(f"overhead {overhead*1e3:.1f} ms", flush=True)

    progs = {}
    for mode, batch in (("map", args.map_batch), ("fold", args.fold_batch)):
        os.environ["VIPTPU_TTA_MODE"] = mode
        progs[mode] = (engine.build_fused_ensemble(members, tta=TTA),
                       inputs_for(batch), batch)
    os.environ.pop("VIPTPU_TTA_MODE", None)

    for rnd in range(2):
        for mode, (fwd, inputs, batch) in progs.items():
            fn = lambda x: fwd(all_vars, x, key)  # noqa: E731
            np.asarray(fn(inputs[0]))  # compile/warm + drain
            t0 = time.perf_counter()
            outs = [fn(x) for x in inputs[1:]]
            np.asarray(outs[-1])
            total = time.perf_counter() - t0
            dt = (total - overhead) / args.reps
            print(f"[{rnd}] tta2_{mode} B={batch}: {dt*1e3:8.1f} ms/batch "
                  f"{batch/dt:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
