#!/usr/bin/env python3
"""On-chip TRAINING-step throughput for the flagship members (round 5).

The inference path has bench.py + BENCH_r*.json; this times the trainer's
own compiled step (the same _build_step the Trainer.fit loop dispatches,
including the loss/grad/optimizer chain) and reports img/s + step latency
+ model FLOP-based MFU (fwd+bwd ~= 3x forward FLOPs).

CAVEAT (measured r5, NOTES_r5): through the axon remote-dispatch tunnel
this measures the TUNNEL, not the chip — step dispatches carrying the
~800-buffer params+opt pytree cost seconds each and scale INVERSELY with
batch (6.8 s/step at B=128, 24 s at B=32; device compute is ~15-60 ms),
while Trainer.fit's own epochs run 0.58 s/step at B=64 (tools/
train_flip.py logs). On a directly-attached TPU host this tool reports
real numbers; in the tunnel environment prefer the train_flip epoch
timings.

Usage: python tools/train_bench.py [--member ResNetRS50] [--batch 128]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FWD_GFLOPS = {  # XLA cost analysis of the unfused f32 forward (BASELINE.md)
    "ResNetRS50": 7.4,
    "convnext_tiny_in22k": 28.4,
    "GCViTTiny": 10.1,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--member", default="ResNetRS50")
    ap.add_argument("--dim", type=int, default=200)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    from vip_cup_2022_tpu.models import create_model
    from vip_cup_2022_tpu.train.trainer import TrainConfig, Trainer

    jax.block_until_ready(
        jax.device_put(jnp.zeros((8,), jnp.float32), jax.devices()[0]))
    print(f"backend={jax.default_backend()}", flush=True)

    cpu = jax.devices("cpu")[0] if jax.default_backend() != "cpu" else None
    dim = (args.dim, args.dim)
    if cpu is not None:
        with jax.default_device(cpu):
            module, variables, _ = create_model(
                args.member, input_size=dim, nb_classes=1,
                classifier_activation=None)
    else:
        module, variables, _ = create_model(
            args.member, input_size=dim, nb_classes=1,
            classifier_activation=None)

    cfg = TrainConfig(
        epochs=1, steps_per_epoch=args.reps, lr_base=1e-3,
        lr_schedule="constant", loss="bce_timm", weight_decay=1e-4,
        nan_check_every=10_000,  # keep the host sync out of the timing
    )
    trainer = Trainer(module, variables, cfg)
    step = trainer._build_step()

    # distinct on-device batches (the runtime memoizes identical dispatches)
    key = jax.random.PRNGKey(0)
    gen = jax.jit(lambda k: (
        jax.random.uniform(k, (args.batch, *dim, 3), jnp.float32),
        (jax.random.uniform(k, (args.batch, 1)) < 0.5).astype(jnp.float32),
    ))
    batches = [jax.block_until_ready(gen(jax.random.fold_in(key, i)))
               for i in range(args.reps + 1)]

    params, stats, opt = trainer.params, trainer.batch_stats, trainer.opt_state
    lr = jnp.float32(1e-3)
    t0 = time.perf_counter()
    params, stats, opt, loss = step(
        params, stats, opt, lr, *batches[0], jax.random.PRNGKey(1))
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0

    # pipelined: queue reps steps on distinct inputs, drain via the loss
    t0 = time.perf_counter()
    losses = []
    for i, (x, y) in enumerate(batches[1:]):
        params, stats, opt, loss = step(
            params, stats, opt, lr, x, y, jax.random.PRNGKey(2 + i))
        losses.append(loss)
    float(losses[-1])
    total = time.perf_counter() - t0
    per_step = total / args.reps
    img_s = args.batch / per_step
    out = {
        "metric": "train_step_img_per_sec",
        "member": args.member,
        "batch": args.batch,
        "dim": args.dim,
        "per_step_ms": round(per_step * 1e3, 1),
        "img_per_sec": round(img_s, 1),
        "compile_plus_first_step_s": round(compile_s, 1),
        "loss_first": float(np.asarray(jax.device_get(losses[0]))),
    }
    fwd = FWD_GFLOPS.get(args.member)
    if fwd:
        gflops = 3.0 * fwd * args.batch  # fwd+bwd ~= 3x forward FLOPs
        out["mfu_3x_fwd_est"] = round(gflops / per_step / 1e3 / 197.0, 4)
    import json

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
