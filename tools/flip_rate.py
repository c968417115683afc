#!/usr/bin/env python3
"""bf16-vs-f32 decision-flip measurement for the fused ensemble (VERDICT r2
item 2).

bf16 is the default compute dtype on TPU (infer/engine.py); the reference
runs f32 (main.py:109) and BASELINE.json allows a 0.1% balanced-acc parity
budget. This harness quantifies what bf16 costs at the decision level: it
runs the SAME fused ensemble program f32 and bf16 over the same inputs and
reports the rate of decision flips at thr=0.487, the probability deltas, and
the balanced accuracy of bf16 decisions against the f32 decisions (the f32
run is ground truth by construction — it is the reference behavior).

Score spread matters: with random-init heads every sigmoid output clusters
at ~0.5, right on top of the threshold, which over-counts flips relative to
a trained ensemble whose scores are bimodal. --head-scale S multiplies each
member's classifier kernel by S to spread the logits (S=20 gives a roughly
uniform [0,1] probability spread); we report the clustered (pessimistic)
S=1 number and the spread number side by side.

Usage:
  python tools/flip_rate.py                    # full 7-member, n=2048, TPU
  python tools/flip_rate.py --members 2 --n 64 # quick CPU sanity
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

ENSEMBLE = [
    ("convnext_tiny_in22k", (200, 200)),
    ("ResNest50", (200, 200)),
    ("GCViTTiny", (224, 224)),
    ("EfficientNetV2T", (200, 200)),
    ("EfficientNetV1B4", (224, 224)),
    ("ECA_NFNetL0", (200, 200)),
    ("ResNetRS50", (200, 200)),
]


def scale_head(variables, scale: float):
    """Multiply the classifier kernel/bias by ``scale`` (pytree surgery) to
    spread sigmoid outputs away from the 0.5 cluster of random init."""
    if scale == 1.0:
        return variables
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(variables["params"])
    head_keys = [
        k for k in flat
        if k[-1] in ("kernel", "bias")
        and any(part.startswith(("head", "predictions", "classifier", "logits"))
                for part in k[:-1])
    ]
    for k in head_keys:
        flat[k] = flat[k] * scale
    out = dict(variables)
    out["params"] = unflatten_dict(flat)
    return out


# the members where PTQ int8 measured a real throughput win (NOTES_r3 table:
# ResNetRS50 +17%, ResNest50 +6%; the EfficientNets and NFNet lose) — i.e.
# the production int8 candidate set
INT8_MEMBERS = {"ResNetRS50", "ResNest50"}


def run_dtype(members_spec, dtype, imgs, batch, head_scale, seed=0,
              int8=False):
    """One fused-ensemble pass in ``dtype``. The f32 arm runs the UNFUSED
    XLA path (VIPTPU_NO_FUSED_BLOCK, read at trace time): that is the
    reference's compute (TF f32 XLA, main.py:109), so the measured flips are
    production-vs-reference, not merely dtype-vs-dtype on our kernels."""
    import os

    from vip_cup_2022_tpu.infer.engine import EnsembleEngine

    old = os.environ.get("VIPTPU_NO_FUSED_BLOCK")
    if dtype == jnp.float32:
        os.environ["VIPTPU_NO_FUSED_BLOCK"] = "1"
    try:
        return _run_dtype(members_spec, dtype, imgs, batch, head_scale,
                          seed, EnsembleEngine, int8=int8)
    finally:
        if dtype == jnp.float32:
            if old is None:
                os.environ.pop("VIPTPU_NO_FUSED_BLOCK", None)
            else:
                os.environ["VIPTPU_NO_FUSED_BLOCK"] = old


def _run_dtype(members_spec, dtype, imgs, batch, head_scale, seed,
               EnsembleEngine, int8=False):
    engine = EnsembleEngine(compute_dtype=dtype, verbose=0)
    members, all_vars, quant_scales = [], [], []
    for name, dim in members_spec:
        module, variables, _ = engine._create_member(
            name, dim, dict(nb_classes=1, classifier_activation="sigmoid")
        )
        variables = scale_head(variables, head_scale)
        members.append((module, dim))
        # _place commits to the accelerator on TPU and leaves the pytree
        # uncommitted on (possibly multi-device) CPU so the mesh sharding
        # can replicate it
        placed = engine._place(variables)
        all_vars.append([placed])
        if int8 and name in INT8_MEMBERS:
            quant_scales.append(
                engine._calibrate_member(module, placed, dim, imgs[:64])
            )
        else:
            quant_scales.append(None)
    fwd = engine.build_fused_ensemble(
        members, tta=1, quant_scales=quant_scales if int8 else None
    )
    key = jax.random.PRNGKey(seed)
    outs = []
    for start in range(0, len(imgs), batch):
        chunk = imgs[start : start + batch]
        if len(chunk) < batch:  # pad tail like the engine does
            chunk = np.concatenate(
                [chunk, np.zeros((batch - len(chunk), *chunk.shape[1:]), chunk.dtype)]
            )
        outs.append(np.asarray(fwd(all_vars, chunk, key)))
    return np.concatenate(outs)[: len(imgs), 0]


def balanced_acc(y_true, y_pred):
    accs = []
    for cls in (0, 1):
        m = y_true == cls
        if m.any():
            accs.append((y_pred[m] == cls).mean())
    return float(np.mean(accs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--members", type=int, default=len(ENSEMBLE))
    ap.add_argument("--head-scales", type=str, default="1,20")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin ignores "
                         "JAX_PLATFORMS=cpu; this uses jax.config in-process)")
    ap.add_argument("--int8", action="store_true",
                    help="measure the int8 PTQ arm (quant/ptq.py on the CNN "
                         "members, bf16 elsewhere) against the f32 reference "
                         "arm instead of plain bf16")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # liveness marker for tools/tpu_retry.sh: probe the first device op
    # (where a wedged tunnel hangs) before the long compiles
    jax.block_until_ready(
        jax.device_put(jnp.zeros((8,), jnp.float32), jax.devices()[0]))
    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

    spec = ENSEMBLE[: args.members]
    rng = np.random.RandomState(0)
    # synthetic inputs with per-image structure (not pure noise): random
    # low-frequency blobs + noise, the kind of spread real JPEGs produce
    base = rng.randint(0, 256, size=(args.n, 25, 25, 3), dtype=np.uint8)
    imgs = np.kron(base, np.ones((1, 8, 8, 1), np.uint8))  # 200x200 blocks
    noise = rng.randint(0, 32, size=(args.n, 200, 200, 3), dtype=np.uint8)
    imgs = np.clip(imgs.astype(np.int16) + noise - 16, 0, 255).astype(np.uint8)

    results = {}
    arm = "int8" if args.int8 else "bf16"
    for s in [float(v) for v in args.head_scales.split(",")]:
        p32 = run_dtype(spec, jnp.float32, imgs, args.batch, s)
        p16 = run_dtype(spec, jnp.bfloat16, imgs, args.batch, s,
                        int8=args.int8)
        d32, d16 = p32 > THR, p16 > THR
        flips = float((d32 != d16).mean())
        results[f"head_scale_{s:g}"] = {
            "n": args.n,
            "arm": arm,
            "flip_rate": flips,
            f"balanced_acc_{arm}_vs_f32": balanced_acc(d32.astype(int), d16.astype(int)),
            "mean_abs_dp": float(np.abs(p32 - p16).mean()),
            "max_abs_dp": float(np.abs(p32 - p16).max()),
            "frac_within_0.01_of_thr_f32": float((np.abs(p32 - THR) < 0.01).mean()),
        }
        print(json.dumps({f"head_scale_{s:g}": results[f"head_scale_{s:g}"]}),
              flush=True)
    print(json.dumps({"thr": THR, "members": len(spec), "results": results}))


if __name__ == "__main__":
    main()
