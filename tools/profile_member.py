#!/usr/bin/env python3
"""Per-op device-time profile of one ensemble member's production program.

Truncated-model marginals (exp_convnext_stages.py) locate cost per STAGE but
not per HLO op. This captures a jax.profiler device trace of the
single-member fused program (the exact production computation) and prints
the top ops by device time, aggregated over repeats — custom-calls (pallas
kernels) appear under their model-scope names (e.g. stages_2_blocks_4), so
kernel cost is directly attributable.

The xplane.pb is parsed directly with TF's xplane proto
(tensorflow.tsl.profiler.protobuf) — the tensorboard_plugin_profile
converters in this image are protobuf-incompatible. Verified on the axon
tunnel: the TPU plugin does export the '/device:TPU:0' plane ('XLA Ops'
line), e.g. the round-3 ConvNeXt breakdown (NOTES_r3.md).

'Async XLA Ops' (copy-start/done spans) are reported separately and only
summarized: their durations span the async window, not busy time.

Usage: python tools/profile_member.py convnext [--batch 256] [--iters 4]
       (names: convnext|gcvit|resnetrs|resnest|nfnet|effv2t|effb4)
"""
import argparse
import glob
import os
import re
import sys
import tempfile
from collections import defaultdict

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

MEMBERS = {
    "convnext": ("convnext_tiny_in22k", (200, 200)),
    "gcvit": ("GCViTTiny", (224, 224)),
    "resnetrs": ("ResNetRS50", (200, 200)),
    "resnest": ("ResNest50", (200, 200)),
    "nfnet": ("ECA_NFNetL0", (200, 200)),
    "effv2t": ("EfficientNetV2T", (200, 200)),
    "effb4": ("EfficientNetV1B4", (224, 224)),
}


def build_hlo_op_name_map(hlo_text: str):
    """Map HLO instruction names (e.g. 'fusion.123', 'convolution.7') to the
    jax scope carried in their metadata op_name — XLA's fusion names are
    anonymous, but the fusion instruction keeps the root op's op_name
    (e.g. 'jit(main)/ResNest/stages_2/blocks_3/conv2/conv_general_dilated'),
    which attributes device time to model modules."""
    mapping = {}
    for m in re.finditer(
            r"%([\w.-]+) = [^\n]*?metadata={[^}]*?op_name=\"([^\"]+)\"",
            hlo_text):
        mapping[m.group(1)] = m.group(2)
    return mapping


def _scope_of(op_name: str, depth: int = 3) -> str:
    """Collapse 'jit(x)/jit(main)/Model/stages_2/blocks_3/conv2/conv' to the
    trailing model path, block indices collapsed so repeats aggregate."""
    parts = [p for p in op_name.split("/") if not p.startswith("jit(")]
    parts = [re.sub(r"_\d+$", "", p) for p in parts]
    return "/".join(parts[-depth:]) if parts else op_name


def print_op_table(logdir: str, iters: int, top: int, group: bool,
                   hlo_map=None):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("PROFILE UNAVAILABLE: no xplane.pb captured")
        return
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fh:
        xs.ParseFromString(fh.read())
    dev = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not dev:
        print("PROFILE UNAVAILABLE: no device plane "
              f"(planes: {[p.name for p in xs.planes]})")
        return
    for plane in dev:
        em = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                if line.name == "Async XLA Ops" and line.events:
                    n_async = len(line.events)
                    print(f"  [{plane.name}] {n_async} async copy spans "
                          "(overlapped DMA; spans != busy time, not listed)")
                continue
            agg = defaultdict(lambda: [0.0, 0])
            for ev in line.events:
                name = em.get(ev.metadata_id, "?")
                if group and hlo_map:
                    mn = re.match(r"%([\w.-]+) =", name)
                    if mn and mn.group(1) in hlo_map:
                        opcode = re.match(
                            r"%[\w.-]+ = \S+ (\w[\w-]*)\(", name)
                        oc = opcode.group(1) if opcode else "?"
                        agg_key = f"{oc}@{_scope_of(hlo_map[mn.group(1)])}"
                        agg[agg_key][0] += ev.duration_ps / 1e9 / iters
                        agg[agg_key][1] += 1
                        continue
                if group:
                    # collapse %stages_2_blocks_4.1 = bf16[...] ... into the
                    # op family: scope name for custom-calls, opcode otherwise
                    m = re.match(r"%([a-zA-Z_][\w.]*) = (\S+) (\w[\w-]*)\(", name)
                    if m:
                        scope, rshape, opcode = m.groups()
                        scope = re.sub(r"[._]\d+$", "", scope)
                        scope = re.sub(r"blocks_\d+", "blocks", scope)
                        if opcode == "custom-call":
                            # distinguish model levels by the result's channel
                            # width (e.g. GCViT L1..L4 = C 64/128/256/512)
                            cw = re.search(r",(\d+)[\]}]", rshape)
                            suffix = f"@C{cw.group(1)}" if cw else ""
                            name = f"{opcode}:{scope}{suffix}"
                        else:
                            name = opcode + (
                                f":{scope}" if opcode == "fusion" else "")
                agg[name][0] += ev.duration_ps / 1e9 / iters  # ms per forward
                agg[name][1] += 1
            tot = sum(v[0] for v in agg.values())
            print(f"  [{plane.name}] total device time {tot:.1f} ms/forward, "
                  f"{len(agg)} op groups; top {top}:")
            for n, (ms, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
                print(f"  {100*ms/tot:5.1f}%  {ms:8.2f} ms  x{cnt:<5d} {n[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("member", choices=sorted(MEMBERS) + ["ensemble"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--raw", action="store_true",
                    help="per-op rows (no grouping by scope/opcode)")
    ap.add_argument("--keep", action="store_true",
                    help="keep the trace dir (prints path) for offline digs")
    args = ap.parse_args()

    from vip_cup_2022_tpu.infer.engine import EnsembleEngine
    from vip_cup_2022_tpu.models import create_model

    print(f"backend={jax.default_backend()}", flush=True)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = jax.devices()[0]
    device = jax.devices()[0]
    engine = EnsembleEngine(verbose=0, compute_dtype=dt)
    if args.member == "ensemble":
        # the full fused 7-member production program: attributes the engine
        # glue (shared resize/cast, aggregation) and inter-member fusions
        # that per-member profiles can't see
        specs = [MEMBERS[k] for k in
                 ("convnext", "resnest", "gcvit", "effv2t", "effb4",
                  "nfnet", "resnetrs")]
    else:
        specs = [MEMBERS[args.member]]
    members, fv = [], []
    for name, dim in specs:
        with jax.default_device(cpu):
            module, variables, _ = create_model(
                name, input_size=dim, nb_classes=1,
                classifier_activation="sigmoid", dtype=dt)
        members.append((module, dim))
        fv.append([jax.device_put(variables, device)])
    one = engine.build_fused_ensemble(members, tta=1)
    key = jax.random.PRNGKey(0)

    mk = jax.jit(lambda k: jax.random.randint(
        k, (args.batch, 200, 200, 3), 0, 256, jnp.int32).astype(jnp.uint8))
    inputs = [jax.block_until_ready(mk(jax.random.fold_in(key, i)))
              for i in range(args.iters + 1)]
    np.asarray(one(fv, inputs[0], key))  # compile + warm
    hlo_map = None
    try:
        txt = one.lower(fv, inputs[0], key).compile().as_text()
        hlo_map = build_hlo_op_name_map(txt)
        print(f"hlo op_name map: {len(hlo_map)} instructions", flush=True)
    except Exception as e:  # noqa: BLE001 — AOT text is best-effort
        print(f"hlo map unavailable ({type(e).__name__}: {str(e)[:80]})",
              flush=True)
    print("warm; tracing...", flush=True)

    logdir = tempfile.mkdtemp(prefix=f"prof_{args.member}_")
    with jax.profiler.trace(logdir):
        outs = [one(fv, x, key) for x in inputs[1:]]
        np.asarray(outs[-1])

    print_op_table(logdir, args.iters, args.top, group=not args.raw,
                   hlo_map=hlo_map)
    if args.keep:
        print("trace dir:", logdir)
    else:
        import shutil
        shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()
