#!/usr/bin/env python3
"""Throughput benchmark — prints ONE JSON line.

Metric: ensemble inference images/sec/chip on 200x200 inputs, across every
implemented member of the reference's 7-model ensemble (ckpts/ckpts.json).
``vs_baseline`` = ratio against the 10,000 img/s/chip north star
(BASELINE.md rebuild target; the reference's own envelope is ~1.39 img/s
end-to-end on a 16GB GPU).

Measurement notes (axon tunnel): host<->device roundtrips cost ~70ms and the
runtime memoizes identical dispatches, so each member runs K forwards chained
inside ONE jitted fori_loop (input varied on device per step) and the clock
stops on a host fetch of the reduced output. Device path = the production
engine path: u8 -> f32/255 -> resize-to-dim (MXU matmuls) -> model, bf16.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

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
K = int(os.environ.get("VIPTPU_BENCH_K", "8"))  # chained forwards per dispatch


def member_program(module, variables, dim, compute_dtype):
    from vip_cup_2022_tpu.ops.resize import resize

    def one_pass(x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        if tuple(dim) != (200, 200):
            x = resize(x, dim, method="bicubic")
        x = x.astype(compute_dtype)
        out = module.apply(variables, x)
        return jnp.sum(out.astype(jnp.float32))

    def chained(x_u8):
        def body(i, acc):
            # vary the input per step (dodges dispatch memoization, keeps the
            # loop un-hoistable) at negligible cost
            xi = x_u8 + i.astype(jnp.uint8)
            return acc + one_pass(xi)

        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

    return jax.jit(chained)


def main():
    from vip_cup_2022_tpu.models import create_model, is_model
    from vip_cup_2022_tpu.infer.engine import registry_name

    compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    members = [
        (registry_name(d), dim) for d, dim in ENSEMBLE if is_model(registry_name(d))
    ]

    rng = np.random.RandomState(0)
    u8 = jax.device_put(
        jnp.asarray(rng.randint(0, 256, size=(BATCH, 200, 200, 3), dtype=np.uint8))
    )

    per_member = {}
    total_time = 0.0
    for name, dim in members:
        module, variables, cfg = create_model(
            name, input_size=dim, nb_classes=1,
            classifier_activation="sigmoid", dtype=compute_dtype,
        )
        prog = member_program(module, variables, dim, compute_dtype)
        float(prog(u8))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(prog(u8))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        per_member[name] = round(BATCH * K / dt, 1)
        total_time += dt

    # one ensemble-scored image = a forward through EVERY member
    imgs_per_sec = BATCH * K / total_time if members else 0.0
    n_chips = len(jax.devices())
    per_chip = imgs_per_sec / max(n_chips, 1)

    result = {
        "metric": "ensemble_infer_img_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / NORTH_STAR, 4),
        "detail": {
            "per_member_img_per_sec": per_member,
            "n_members": len(members),
            "n_members_target": len(ENSEMBLE),
            "batch": BATCH,
            "chained_steps": K,
            "backend": jax.default_backend(),
            "n_chips": n_chips,
            "note": "each image passes through every ensemble member",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
