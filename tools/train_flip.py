#!/usr/bin/env python3
"""Trained-weights decision-flip measurement (VERDICT r3 item 5).

The r3 flip-rate study used random-init weights with head-scaled synthetic
score spreads; this closes the gap with REAL decision boundaries: train
ensemble members in-environment on a synthetic real-vs-fake task until the
score distribution goes bimodal, then measure bf16-fused (and int8-PTQ)
decision flips against the f32 XLA reference arm at thr=0.487 on held-out
images — the reference's golden-accuracy oracle pattern
(keras_cv_attention_models/imagenet/eval_func.py:70-116), adapted to a
no-egress environment.

Task: "fake" images carry a faint periodic checkerboard (the classic
transposed-conv GAN artifact) on top of the same blob+noise base as "real"
ones — learnable from local texture at any member's input size.

Data is generated ON DEVICE (one jitted program per batch; the axon tunnel
moves ~75 MB/s, so host-side batches would dominate wall time).

Usage:
  python tools/train_flip.py --members 3 --epochs 2 --steps 80   # TPU
  python tools/train_flip.py --members 1 --epochs 1 --steps 4 --n-eval 32 --cpu
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

THR = 0.487  # reference main.py:144

# the three architecture families that dominate ensemble time and cover
# both pallas members + the int8-auto member
MEMBERS = [
    ("ResNetRS50", (200, 200)),
    ("convnext_tiny_in22k", (200, 200)),
    ("GCViTTiny", (224, 224)),
]


def make_batch_fn(batch, hw):
    """Jitted on-device generator: returns (images_f32[0..1], labels(B,1))."""
    h, w = hw

    def gen(key):
        kb, kn, kl, kp = jax.random.split(key, 4)
        base = jax.random.randint(kb, (batch, h // 8 + 1, w // 8 + 1, 3),
                                  0, 256).astype(jnp.float32)
        img = jnp.repeat(jnp.repeat(base, 8, 1), 8, 2)[:, :h, :w, :]
        noise = jax.random.uniform(kn, (batch, h, w, 3), minval=-16.0,
                                   maxval=16.0)
        img = jnp.clip(img + noise, 0, 255)
        labels = (jax.random.uniform(kl, (batch, 1)) < 0.5).astype(jnp.float32)
        # fake artifact: faint 2x2 checkerboard with a random per-image
        # phase/amplitude (4..8 grey levels) — local, CNN-learnable
        yy = jax.lax.broadcasted_iota(jnp.int32, (batch, h, w, 1), 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (batch, h, w, 1), 2)
        phase = jax.random.randint(kp, (batch, 1, 1, 1), 0, 2)
        amp = 4.0 + 4.0 * jax.random.uniform(kp, (batch, 1, 1, 1))
        checker = (((yy // 2 + xx // 2 + phase) % 2) * 2 - 1).astype(jnp.float32)
        img = jnp.clip(img + labels[:, :, None, None] * amp * checker, 0, 255)
        return img / 255.0, labels

    return jax.jit(gen)


def train_member(name, dim, epochs, steps, batch, ckpt_dir):
    from vip_cup_2022_tpu.models import create_model
    from vip_cup_2022_tpu.train.trainer import TrainConfig, Trainer
    from vip_cup_2022_tpu.utils.checkpoint import save_variables

    path = os.path.join(ckpt_dir, f"{name}.msgpack")
    if os.path.isfile(path):
        print(f"[train] {name}: cached {path}", flush=True)
        return path
    cpu = None
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        pass
    if cpu is not None and jax.default_backend() != "cpu":
        with jax.default_device(cpu):
            module, variables, _ = create_model(
                name, input_size=dim, nb_classes=1, classifier_activation=None)
    else:
        module, variables, _ = create_model(
            name, input_size=dim, nb_classes=1, classifier_activation=None)
    cfg = TrainConfig(
        epochs=epochs, steps_per_epoch=steps, lr_base=3e-4,
        lr_schedule="constant", loss="bce_timm", weight_decay=1e-4,
        ckpt_dir=os.path.join(ckpt_dir, f"_state_{name}"),
        nan_check_every=steps,
    )
    trainer = Trainer(module, variables, cfg)
    gen = make_batch_fn(batch, dim)

    def train_iter():
        key = jax.random.PRNGKey(trainer.global_step + 1)
        for i in range(steps):
            key, sub = jax.random.split(key)
            yield gen(sub)

    trainer.fit(train_iter, verbose=1)
    trained = {"params": trainer.params}
    if trainer.batch_stats:
        trained["batch_stats"] = trainer.batch_stats
    save_variables(path, trained)
    print(f"[train] {name}: saved {path}", flush=True)
    return path


def eval_arms(members_spec, ckpt_dir, n_eval, batch, int8_set):
    """Run f32-XLA / bf16-fused / int8 arms over held-out on-device images;
    returns per-arm probabilities + labels."""
    from vip_cup_2022_tpu.infer.engine import EnsembleEngine
    from vip_cup_2022_tpu.models import create_model
    from vip_cup_2022_tpu.utils.checkpoint import load_variables

    # held-out eval set: same generator, fresh keys, NATIVE 200x200 (the
    # engine resizes per member exactly as production does)
    gen = make_batch_fn(batch, (200, 200))
    keys = [jax.random.PRNGKey(10_000 + i) for i in range(n_eval // batch)]
    u8_batches, labels = [], []
    to_u8 = jax.jit(lambda x: jnp.clip(jnp.round(x * 255.0), 0, 255)
                    .astype(jnp.uint8))
    for k in keys:
        img, lab = gen(k)
        u8_batches.append(jax.block_until_ready(to_u8(img)))
        labels.append(np.asarray(lab))
    y = np.concatenate(labels)[:, 0]

    results = {}
    for arm in ("f32", "bf16", "int8"):
        dtype = jnp.float32 if arm == "f32" else jnp.bfloat16
        old = os.environ.get("VIPTPU_NO_FUSED_BLOCK")
        if arm == "f32":  # reference compute: unfused XLA
            os.environ["VIPTPU_NO_FUSED_BLOCK"] = "1"
        try:
            engine = EnsembleEngine(compute_dtype=dtype, verbose=0)
            members, all_vars, scales = [], [], []
            for name, dim in members_spec:
                module, variables, _ = engine._create_member(
                    name, dim,
                    dict(nb_classes=1, classifier_activation="sigmoid"))
                trained = load_variables(
                    os.path.join(ckpt_dir, f"{name}.msgpack"))
                from vip_cup_2022_tpu.models.factory import transfer_weights
                variables = engine._place(
                    transfer_weights(trained, variables, on_mismatch="warn"))
                members.append((module, dim))
                all_vars.append([variables])
                if arm == "int8" and name in int8_set:
                    scales.append(engine._calibrate_member(
                        module, variables, dim, u8_batches[0]))
                else:
                    scales.append(None)
            fwd = engine.build_fused_ensemble(
                members, tta=1,
                quant_scales=scales if arm == "int8" else None)
            key = jax.random.PRNGKey(0)
            outs = [np.asarray(fwd(all_vars, u8, key)) for u8 in u8_batches]
            results[arm] = np.concatenate(outs)[:, 0]
        finally:
            if arm == "f32":
                if old is None:
                    os.environ.pop("VIPTPU_NO_FUSED_BLOCK", None)
                else:
                    os.environ["VIPTPU_NO_FUSED_BLOCK"] = old
        print(f"[eval] {arm}: mean p={results[arm].mean():.3f}", flush=True)
    return results, y


def balanced_acc(y_true, y_pred):
    accs = [(y_pred[y_true == c] == c).mean() for c in (0, 1)
            if (y_true == c).any()]
    return float(np.mean(accs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=len(MEMBERS))
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-eval", type=int, default=1024)
    ap.add_argument("--eval-batch", type=int, default=256)
    ap.add_argument("--ckpt-dir", default="/tmp/vip_train_flip")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.ckpt_dir, exist_ok=True)

    jax.block_until_ready(
        jax.device_put(jnp.zeros((8,), jnp.float32), jax.devices()[0]))
    print(f"backend={jax.default_backend()}", flush=True)

    spec = MEMBERS[: args.members]
    for name, dim in spec:
        train_member(name, dim, args.epochs, args.steps, args.batch,
                     args.ckpt_dir)

    eval_batch = min(args.eval_batch, args.n_eval)
    from vip_cup_2022_tpu.infer.engine import EnsembleEngine

    results, y = eval_arms(spec, args.ckpt_dir, args.n_eval, eval_batch,
                           set(EnsembleEngine.INT8_AUTO))
    p32 = results["f32"]
    d32 = p32 > THR
    out = {"n": len(p32), "members": len(spec),
           "task_balanced_acc_f32": balanced_acc(y.astype(int),
                                                 d32.astype(int)),
           "frac_within_0.01_of_thr_f32": float(
               (np.abs(p32 - THR) < 0.01).mean())}
    for arm in ("bf16", "int8"):
        p = results[arm]
        d = p > THR
        out[arm] = {
            "flip_rate": float((d != d32).mean()),
            "balanced_acc_vs_f32_decisions": balanced_acc(
                d32.astype(int), d.astype(int)),
            "task_balanced_acc": balanced_acc(y.astype(int), d.astype(int)),
            "mean_abs_dp": float(np.abs(p - p32).mean()),
            "max_abs_dp": float(np.abs(p - p32).max()),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
