#!/usr/bin/env python3
"""Full-member A/B throughput runs (round 3, real v5e).

Isolated per-block chains (exp_convnext_s12 / exp_gcvit_l1) measure kernels
out of context; the decision metric is the FULL member's img/s through the
production fused-member program (engine.build_fused_ensemble on one member),
timed with bench.py's pipelined distinct-input pattern. Variants:

  convnext      — convnext_tiny_in22k, gate as shipped (fused at C>=256)
  convnext_all  — fused_block=True (fused kernel at every stage incl. s1/s2)
  convnext_off  — fused_block=False (pure XLA)
  gcvit         — GCViTTiny, fused pipeline, default f32 GEMMs at C<128
  gcvit_bf16    — VIPTPU_GCVIT_MM=bf16 (force bf16 GEMMs in all three kernels)
  gcvit_off     — fused_block=False (pure XLA path)

Usage: python tools/exp_member_ab.py convnext convnext_all [--batch 256]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

VARIANTS = {
    "convnext": ("convnext_tiny_in22k", (200, 200), {}, {}),
    "convnext_all": ("convnext_tiny_in22k", (200, 200), {"fused_block": True}, {}),
    "convnext_off": ("convnext_tiny_in22k", (200, 200), {"fused_block": False}, {}),
    # batch-lane kernel WITHOUT the lane-fold (per-position (hidden,C)@(C,B)
    # dots, the round-3-early shape) — prices the tp-wide GEMM concat
    "convnext_nofold": ("convnext_tiny_in22k", (200, 200), {},
                        {"VIPTPU_BATCHLANE_FOLD": "0"}),
    # dw blockdiag group-size sweep: the grouped conv's channel-split
    # relayout profiled 4.5 ms/s1-block at g8; wider groups waste MXU FLOPs
    # but split channels into fewer, fatter blocks
    "convnext_dwg16": ("convnext_tiny_in22k", (200, 200), {},
                       {"VIPTPU_DW_GROUP": "16"}),
    "convnext_dwg32": ("convnext_tiny_in22k", (200, 200), {},
                       {"VIPTPU_DW_GROUP": "32"}),
    "convnext_dwg96": ("convnext_tiny_in22k", (200, 200), {},
                       {"VIPTPU_DW_GROUP": "96"}),
    # g=1 is XLA's TRUE-depthwise lowering under HWCN dimension numbers
    # (the 9.8 ms figure in blockdiag_dw7x7's docstring was NHWC); g=4
    # probes below g8 — the scope-attributed profile shows the s1/s2 dw
    # convs at 20.3 ms of the member's 123.5 vs a ~1.5 ms bandwidth floor
    "convnext_dwg1": ("convnext_tiny_in22k", (200, 200), {},
                      {"VIPTPU_DW_GROUP": "1"}),
    "convnext_dwg4": ("convnext_tiny_in22k", (200, 200), {},
                      {"VIPTPU_DW_GROUP": "4"}),
    # bf16 tap accumulation in the whole-image kernel (s3/s4): prices
    # VPU bf16 packing; taps are 1.45 of the 4.64 ms s3 block
    "convnext_tapsbf16": ("convnext_tiny_in22k", (200, 200), {},
                          {"VIPTPU_DW_TAPS": "bf16"}),
    # batch-last at s1/s2 as shipped, but wide stages (s3/s4) on plain XLA
    # GEMMs instead of the whole-image pallas kernel — re-prices the round-2
    # f32-era +15% win in the bf16 world
    "convnext_s34xla": ("convnext_tiny_in22k", (200, 200), {},
                        {"VIPTPU_CONVNEXT_FUSED_MIN_C": "100000"}),
    "gcvit": ("GCViTTiny", (224, 224), {}, {}),
    # three-kernel pipeline (pre-monoblock shape): prices the whole-block
    # single-program kernel (two fewer HBM round-trips of the token array
    # per block + no inter-kernel XLA reshape glue)
    "gcvit_mono0": ("GCViTTiny", (224, 224), {}, {"VIPTPU_GCVIT_MONO": "0"}),
    # stem/downsample dw 3x3 convs on the block-diagonal MXU lowering
    "gcvit_bdiag": ("GCViTTiny", (224, 224), {}, {"VIPTPU_DW_BLOCKDIAG": "1"}),
    # classic p/sum(p) softmax (the pre-round-3b shape) — control for the
    # MXU-sum ones-column softmax that is now the default
    "gcvit_sm_div": ("GCViTTiny", (224, 224), {},
                     {"VIPTPU_GCVIT_SOFTMAX": "div"}),
    # 8 images per attention grid step (256 programs instead of 2048 at L1):
    # prices the per-grid-step DMA/loop overhead
    "gcvit_bpp8": ("GCViTTiny", (224, 224), {}, {"VIPTPU_GCVIT_BPP": "8"}),
    "gcvit_bf16": ("GCViTTiny", (224, 224), {}, {"VIPTPU_GCVIT_MM": "bf16"}),
    # L1 lane-packing: C=64 half-fills (8,128) tiles (210 GB/s effective,
    # exp_attn_parts) — packing image pairs along lanes makes every DMA/VPU
    # pass full-width. MEASURED NEGATIVE (3,384-3,435 vs 3,598 img/s): the
    # block-diagonal weights double per-image GEMM FLOPs. Default off.
    "gcvit_pack": ("GCViTTiny", (224, 224), {}, {"VIPTPU_GCVIT_PACK": "1"}),
    # pack with rows-GEMM in f32 (is the Mosaic HTTP 500 on pack-rows the
    # bf16 lane-slice-derived-LHS crash class?)
    "gcvit_pack_f32": ("GCViTTiny", (224, 224), {},
                       {"VIPTPU_GCVIT_PACK": "1", "VIPTPU_GCVIT_MM": "f32"}),
    # pack with the round-3 kron block-diagonal GEMMs (control: compiled
    # and ran in r3, so if rows crashes and kron doesn't, the row-fold
    # shuffles are the trigger)
    "gcvit_pack_kron": ("GCViTTiny", (224, 224), {},
                        {"VIPTPU_GCVIT_PACK": "1",
                         "VIPTPU_GCVIT_PACK_GEMM": "kron"}),
    # unrolled per-window attention: no GxG masked score matrix (kills the
    # 8x softmax waste at L1) and linear-VMEM bias -> the L4 batch-fold
    # becomes legal again
    "gcvit_unroll": ("GCViTTiny", (224, 224), {},
                     {"VIPTPU_GCVIT_ATTN": "unroll"}),
    # (G, N, N) f32 batch-dim score dots at EVERY level (the folded
    # single-window levels default to batched since round 3; this also
    # flips L1/L2's masked GEMM to per-window scores)
    "gcvit_batched": ("GCViTTiny", (224, 224), {},
                      {"VIPTPU_GCVIT_ATTN": "batched"}),
    "gcvit_off": ("GCViTTiny", (224, 224), {"fused_block": False}, {}),
    # EfficientNetV1B4: third hotspot (74.3 ms/batch, ~2-5% MFU). The dw
    # convs go through apply_depthwise_conv, so VIPTPU_DW_BLOCKDIAG=1 flips
    # them to block-diagonal grouped convs on the MXU (exact math).
    "effb4": ("EfficientNetV1B4", (224, 224), {}, {}),
    "effb4_bdiag": ("EfficientNetV1B4", (224, 224), {},
                    {"VIPTPU_DW_BLOCKDIAG": "1"}),
    "effv2t": ("EfficientNetV2T", (200, 200), {}, {}),
    "effv2t_bdiag": ("EfficientNetV2T", (200, 200), {},
                     {"VIPTPU_DW_BLOCKDIAG": "1"}),
    "resnest": ("ResNest50", (200, 200), {}, {}),
    # conv-BN weights-level fold: unlike ResNetRS (XLA folds it there), the
    # split-attention concat sits between conv and BN, so XLA CANNOT fuse
    # the BN+relu epilogue (profiled 3.65 ms of 34.8 in _bn_act/max fusions)
    "resnest_bnfused": ("ResNest50", (200, 200), {}, {}),
    "resnetrs": ("ResNetRS50", (200, 200), {}, {}),
    # conv-BN folded at the weights level (utils/surgery.fuse_all_conv_bn):
    # prices whether pre-folding beats XLA's own inference-BN folding
    "resnetrs_bnfused": ("ResNetRS50", (200, 200), {}, {}),
    "nfnet": ("ECA_NFNetL0", (200, 200), {}, {}),
    # int8 PTQ (quant/ptq.py): one-batch calibration then eligible
    # convs/denses on the MXU int8 path — the "_int8" suffix is detected by
    # the runner, not the engine env (keeps calibration explicit here)
    "resnetrs_int8": ("ResNetRS50", (200, 200), {}, {}),
    "resnest_int8": ("ResNest50", (200, 200), {}, {}),
    "nfnet_int8": ("ECA_NFNetL0", (200, 200), {}, {}),
    "effv2t_int8": ("EfficientNetV2T", (200, 200), {}, {}),
    "effb4_int8": ("EfficientNetV1B4", (224, 224), {}, {}),
    # int8 dots INSIDE the fused pallas kernels (dynamic activation scales,
    # ops/pallas/convnext_block.int8_kernels_enabled) — distinct from the
    # "_int8" PTQ-interceptor variants above, which only reach nn.Conv/Dense
    "convnext_int8k": ("convnext_tiny_in22k", (200, 200), {},
                       {"VIPTPU_INT8_KERNELS": "1"}),
    # GCViT in-kernel int8 (round 5): qkv/proj/MLP GEMMs s8 at C >= 128
    # (L2/L3/L4); attention GEMMs stay bf16. min_c=0 also covers L1's C=64.
    "gcvit_int8k": ("GCViTTiny", (224, 224), {},
                    {"VIPTPU_INT8_KERNELS": "1"}),
    "gcvit_int8k_all": ("GCViTTiny", (224, 224), {},
                        {"VIPTPU_INT8_KERNELS": "1",
                         "VIPTPU_GCVIT_INT8_MIN_C": "0"}),
    "gcvit_int8k_256": ("GCViTTiny", (224, 224), {},
                        {"VIPTPU_INT8_KERNELS": "1",
                         "VIPTPU_GCVIT_INT8_MIN_C": "256"}),
    # batch-lane positions-per-step fold sweep: tp*B is the lane-concat
    # GEMM's N. tp=16 doubles N at s1 (hidden=384: f32 scratch 6.3 MB);
    # the VMEM guard in fused_ln_mlp_residual_batchlane keeps s2 at its
    # default when the scratch would exceed the budget.
    "convnext_tp16": ("convnext_tiny_in22k", (200, 200), {},
                      {"VIPTPU_BATCHLANE_TP": "16"}),
    "convnext_tp4": ("convnext_tiny_in22k", (200, 200), {},
                     {"VIPTPU_BATCHLANE_TP": "4"}),
    # scoped-VMEM raise (v5e has 128 MB physical; default scoped limit
    # ~16 MB): compiler_options travels with the jitted program, and
    # VIPTPU_VMEM_MB scales the pallas fold/tile budget models so deeper
    # image folds (bigger GEMM M) become legal. Risk: XLA's own fusions
    # also get more scratch, which can shift its heuristics either way.
    "convnext_vmem64": ("convnext_tiny_in22k", (200, 200), {}, {
        "VIPTPU_COMPILER_OPTIONS": "xla_tpu_scoped_vmem_limit_kib=65536",
        "VIPTPU_VMEM_MB": "64"}),
    "convnext_vmem32": ("convnext_tiny_in22k", (200, 200), {}, {
        "VIPTPU_COMPILER_OPTIONS": "xla_tpu_scoped_vmem_limit_kib=32768",
        "VIPTPU_VMEM_MB": "32"}),
    # raise the XLA limit only (pallas budgets untouched): isolates the
    # XLA-fusion effect from the deeper-fold effect
    "convnext_vmem64x": ("convnext_tiny_in22k", (200, 200), {}, {
        "VIPTPU_COMPILER_OPTIONS": "xla_tpu_scoped_vmem_limit_kib=65536"}),
    "gcvit_vmem64": ("GCViTTiny", (224, 224), {}, {
        "VIPTPU_COMPILER_OPTIONS": "xla_tpu_scoped_vmem_limit_kib=65536",
        "VIPTPU_VMEM_MB": "64"}),
    "gcvit_vmem64x": ("GCViTTiny", (224, 224), {}, {
        "VIPTPU_COMPILER_OPTIONS": "xla_tpu_scoped_vmem_limit_kib=65536"}),
    # synth-bias era A/B: 'dense' restores the pre-synth default (bias as a
    # precomputed (gN, gN) VMEM block -> L4 fold capped at 1, L3 mono
    # ineligible); plain gcvit now auto-synthesizes at L3/L4 (fold=8 at L4,
    # mono at the folded L3)
    "gcvit_biasdense": ("GCViTTiny", (224, 224), {},
                        {"VIPTPU_GCVIT_BIAS": "dense"}),
    # deeper folds under the raised row cap: L3 folds 4 (784-row GEMMs),
    # L4 folds 16 — prices the masked GEMM's off-diagonal FLOP waste vs
    # larger-tile utilization at the next level up
    "gcvit_cap1024": ("GCViTTiny", (224, 224), {},
                      {"VIPTPU_GCVIT_CAP": "1024"}),
    # bf16-square LN stats: removes the CSE-materialized f32 convert shared
    # between E[x^2] and the LN apply (profiled 2.3 + 1.15 ms standalone
    # converts at ConvNeXt's s1->s2 / s2->s3 boundaries)
    "convnext_lnsq": ("convnext_tiny_in22k", (200, 200), {},
                      {"VIPTPU_LN_BF16_SQ": "1"}),
    "gcvit_lnsq": ("GCViTTiny", (224, 224), {},
                   {"VIPTPU_LN_BF16_SQ": "1"}),
    # bisect the synth-bias loss: budget 6 MB -> only L4 (9.8 MB dense
    # block) synthesizes + folds 8; L3 stays dense fold=2 pipeline
    "gcvit_synthl4": ("GCViTTiny", (224, 224), {},
                      {"VIPTPU_GCVIT_BIAS_BUDGET": str(6 * 2 ** 20)}),
    # monoblock at the folded L3: its VMEM model lands at 11.5 MB with the
    # dense bias — just over the default 11 MB gate — so L3 runs the
    # 3-kernel pipeline whose per-window-group attention GEMMs hold L3 at
    # ~47% MXU (19 blocks x 1.07 ms, the biggest GCViT level). 12.5 MB is
    # still comfortably inside the 16 MB scoped limit.
    # MEASURED: a tie — 3,430.9 vs 3,339.0 img/s forward order but
    # 3,461.7 vs 3,464.6 reversed (same session); the first delta was
    # drift. Gate stays 11 MB (L3 pipeline), knob kept for A/Bs.
    "gcvit_monol3": ("GCViTTiny", (224, 224), {},
                     {"VIPTPU_GCVIT_MONO_MB": "12.5"}),
    "effb4_vmem64x": ("EfficientNetV1B4", (224, 224), {}, {
        "VIPTPU_COMPILER_OPTIONS": "xla_tpu_scoped_vmem_limit_kib=65536"}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="+", choices=sorted(VARIANTS))
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import bench  # repo-root bench.py: time_program + overhead measurement
    from vip_cup_2022_tpu.infer.engine import EnsembleEngine

    print(f"backend={jax.default_backend()}", flush=True)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = jax.devices()[0]
    device = jax.devices()[0]

    rng = np.random.RandomState(0)
    base = jax.device_put(
        jnp.asarray(rng.randint(0, 256, size=(args.batch, 200, 200, 3),
                                dtype=np.uint8)), device)
    bump = jax.jit(lambda x, i: x + jnp.uint8(i))
    inputs = [jax.block_until_ready(bump(base, i)) for i in range(args.reps + 1)]
    key = jax.random.PRNGKey(0)
    engine = EnsembleEngine(verbose=0, compute_dtype=dt)

    from vip_cup_2022_tpu.models import create_model

    for tag in args.variants:
        name, dim, overrides, env = VARIANTS[tag]
        old_env = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            with jax.default_device(cpu):
                module, variables, _ = create_model(
                    name, input_size=dim, nb_classes=1,
                    classifier_activation="sigmoid", dtype=dt, **overrides)
                if tag.endswith("_bnfused"):
                    from vip_cup_2022_tpu.utils.surgery import fuse_all_conv_bn

                    variables, pairs = fuse_all_conv_bn(variables)
                    print(f"  ({tag}: folded {len(pairs)} conv->BN pairs)",
                          flush=True)
            fv = [[jax.device_put(variables, device)]]
            quant_scales = None
            if tag.endswith("_int8"):
                calib = np.asarray(jax.device_get(inputs[0]))[:64]
                scales = engine._calibrate_member(module, fv[0][0], dim, calib)
                print(f"  ({tag}: {len(scales)} calibrated sites)", flush=True)
                quant_scales = [scales]
            one = engine.build_fused_ensemble([(module, dim)], tta=1,
                                              quant_scales=quant_scales)
            t0 = time.time()
            per_fwd, detail = bench.time_program(lambda x: one(fv, x, key), inputs)
            print(f"  {tag:14s}  {args.batch/per_fwd:9.1f} img/s   "
                  f"({per_fwd*1e3:.1f} ms/batch; compile+run1 {time.time()-t0:.0f}s; "
                  f"total {detail['pipelined_total_s']}s, "
                  f"overhead {detail['dispatch_overhead_s']}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {tag:14s}  FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        finally:
            for k, v in old_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
