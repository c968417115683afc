#!/usr/bin/env python3
"""Throughput benchmark — prints ONE JSON line.

Metric: ensemble inference images/sec/chip on 200x200 inputs, covering every
implemented member of the reference's 7-model ensemble (ckpts/ckpts.json).
``vs_baseline`` is the ratio against the north-star target of 10,000 img/s/chip
(BASELINE.md rebuild target; the reference's own envelope is only ~1.39 img/s
end-to-end on a 16GB GPU).

Design: same device path as the production engine — uint8 H2D, cast+resize
(MXU matmuls)+normalize+forward as one jitted program per member, bf16 compute.
"""
import json
import sys
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


def main():
    from vip_cup_2022_tpu.infer.engine import NAME2BS, EnsembleEngine, registry_name
    from vip_cup_2022_tpu.models import is_model, create_model
    from vip_cup_2022_tpu.parallel.mesh import get_mesh

    mesh = get_mesh()
    engine = EnsembleEngine(mesh=mesh, verbose=0)

    members = []
    for dir_name, dim in ENSEMBLE:
        name = registry_name(dir_name)
        if is_model(name):
            members.append((dir_name, name, dim))
    if not members:
        print(json.dumps({"metric": "ensemble_infer_img_per_sec_per_chip", "value": 0.0,
                          "unit": "img/s/chip", "vs_baseline": 0.0}))
        return

    n_chips = len(jax.devices())
    batch = 512  # fixed bench batch per program
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, size=(batch, 200, 200, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(0)

    programs = []
    for dir_name, name, dim in members:
        module, variables, cfg = create_model(
            name, input_size=dim, nb_classes=1,
            classifier_activation="sigmoid", dtype=engine.compute_dtype,
        )
        fwd = engine._build_forward(module, dim, tta=1)
        out = fwd(variables, u8, key)  # compile + warm
        jax.block_until_ready(out)
        programs.append((name, fwd, variables))

    # timed: full ensemble over the same batch (shared decode is free here —
    # bench measures the device path)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = [fwd(variables, u8, key) for (_, fwd, variables) in programs]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    # images scored per second by the WHOLE ensemble (each image passes
    # through every member — same accounting as the reference's 5000-img run)
    imgs_per_sec = batch * iters / dt
    per_chip = imgs_per_sec / max(n_chips, 1)

    result = {
        "metric": "ensemble_infer_img_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / NORTH_STAR, 4),
        "detail": {
            "members": [m[1] for m in members],
            "n_members": len(members),
            "n_members_target": len(ENSEMBLE),
            "batch": batch,
            "backend": jax.default_backend(),
            "n_chips": n_chips,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
