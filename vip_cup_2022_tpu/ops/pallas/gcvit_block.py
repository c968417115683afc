"""Fused GCViT/Swin window-transformer block (inference hot path).

A GCViT block (reference models/gcvit/layers/block.py:10-99) is

    x = x + g1 * WindowAttention(LN1(x))          # per 7x7/14x14 window
    x = x + g2 * MLP(LN2(x))

Under XLA at level-1 scale (256 x 56x56x64, window 7) one block measures
~21.7 ms: the (B*nWin, heads, N, N) f32 score tensor round-trips HBM
(~314 MB), the per-window matmuls are tiny (49x32) batched GEMMs, and every
LN/residual is an extra pass. This module runs the block as THREE pallas
kernels over window-ordered tokens (window_partition/reverse stay in XLA —
they are cheap layout ops):

1. ``_ln_dense``  — LN1 + qkv projection, flat (tokens, C) row tiles
2. ``_attention`` — grid (batch, heads, window-groups): G windows stacked
   into one (G*N, hd) block-diagonal attention per program; the combined
   rel-pos-bias + off-diagonal -1e9 mask makes the big masked GEMM exactly
   equal to G independent window attentions while feeding the MXU ~G*N-row
   tiles; scores live only in VMEM
3. ``_proj_res_ln_mlp`` — proj + layer-scale residual + LN2 + MLP +
   residual in one pass

GCViT's global-query mode (shared per-image query broadcast to every window,
reference attention.py:62-66) swaps kernel 2's Q source for the q_global
buffer and tiles it across the group.

Matmul dtype rule (v5e Mosaic): bf16 LHS reshaped from lane-unaligned loads
crashes the backend compiler — but these kernels' GEMM LHS are
elementwise-derived values (never reshapes of unaligned loads), so every
GEMM follows the compute dtype (bf16 on TPU) even at C=64/head_dim=32;
verified on-chip round 3 (+5% full-member, bf16-level equivalence). Set
VIPTPU_GCVIT_MM=f32 to restore f32 GEMMs. GELU uses the Abramowitz-Stegun
erf (no erf primitive in Mosaic). Inference-only: training uses the Flax
path, whose gradients XLA derives.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .convnext_block import (
    _gelu,
    _quant_cols,
    gelu_flavor,
    int8_kernels_enabled,
    vmem_scale,
)


def _aligned(*dims: int) -> bool:
    return all(d % 128 == 0 for d in dims)


# ---------------------------------------------------------------------------
# int8 dense GEMMs (VERDICT r4 item 5): the block's qkv/proj/MLP projections
# on the MXU s8 x s8 -> s32 path (~2.8x the bf16 dot rate — tools/
# int8_pallas_spike.py). Same scheme as the ConvNeXt kernel: per-output-
# channel weight scales quantized host-side, DYNAMIC per-tile activation
# abs-max scales on the VPU. Attention score/PV GEMMs stay bf16 (softmax
# needs the f32 range anyway, and head_dim=32 tiles are relayout-bound).
# ---------------------------------------------------------------------------
def gcvit_int8(c: int, force: Optional[bool] = None) -> bool:
    """Whether a block at channel width ``c`` runs its dense GEMMs int8:
    VIPTPU_INT8_KERNELS=1 and c >= VIPTPU_GCVIT_INT8_MIN_C (default 128 —
    C=64 (L1) lane-slices s8 operands at 64-offsets, below the (32, 128)
    native int8 tile, and L1 is bandwidth-bound, not GEMM-bound)."""
    if force is not None:
        return force
    return int8_kernels_enabled() and c >= int(
        os.environ.get("VIPTPU_GCVIT_INT8_MIN_C", "128"))


def _dyn_quant_rows(y):
    """Dynamic PER-ROW symmetric int8 of an f32 (M, K) tile: (q, (M, 1)
    scales). Row scales factor out of the GEMM exactly (o = s_row *
    (q @ w) * s_col), and are much tighter than one per-tile scale when the
    token rows have uneven magnitudes (post-LN activations mostly do not,
    but the GELU'd MLP hidden does)."""
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(y * (1.0 / s)), -127, 127).astype(jnp.int8)
    return q, s


def _dot_i8(y_f32, w_ref_val, scale, bias=None):
    """f32 (M, K) @ s8 (K, N) via dynamic-activation int8: quantize the tile
    on the VPU (per-row scales), s8 x s8 -> s32 on the MXU, dequantize with
    (row_scale * per-channel weight scale). ``scale`` is the (N,) f32
    weight-scale value; ``bias`` an optional (N,) f32 add after dequant."""
    qy, sy = _dyn_quant_rows(y_f32)
    acc = jnp.dot(qy, w_ref_val, preferred_element_type=jnp.int32)
    o = acc.astype(jnp.float32) * (sy * scale)
    return o if bias is None else o + bias


# ---------------------------------------------------------------------------
# lane-packing: C<128 levels half-fill every (8,128) VMEM tile (GCViT L1 at
# C=64 measured 210 GB/s effective DMA and half-width VPU passes —
# tools/exp_attn_parts.py). Packing `pack` consecutive images along the lane
# axis makes every DMA tile and VPU pass full-width; weights become
# block-diagonal (exact math: the kron zeros contribute exact 0.0 to the f32
# accumulators) and LN stats are computed per 64-lane half.
# ---------------------------------------------------------------------------
def pack_lanes(x: jax.Array, pack: int) -> jax.Array:
    """(B, T, C) -> (B//pack, T, pack*C): lane-concatenate ``pack``
    consecutive images (image i of the pair occupies lanes [i*C, (i+1)*C))."""
    b, t, c = x.shape
    return x.reshape(b // pack, pack, t, c).transpose(0, 2, 1, 3).reshape(
        b // pack, t, pack * c)


def unpack_lanes(x: jax.Array, pack: int) -> jax.Array:
    """Inverse of :func:`pack_lanes`."""
    b, t, pc = x.shape
    c = pc // pack
    return x.reshape(b, t, pack, c).transpose(0, 2, 1, 3).reshape(
        b * pack, t, c)


def _pack_weight(w, pack):
    """(C, D) -> block-diagonal (pack*C, pack*D): packed lanes [img_i*C..]
    map to packed output lanes [img_i*D..]."""
    if pack == 1:
        return w
    return jnp.kron(jnp.eye(pack, dtype=w.dtype), jnp.asarray(w))


def pack_gemm_mode() -> str:
    """How lane-packed kernels run their dense GEMMs:
    'rows' (default) — slice each image's lane span and row-concatenate, so
    the GEMM uses the ORIGINAL per-image weights at pack*M rows: zero extra
    FLOPs, two lane<->sublane shuffles per GEMM.
    'kron' — block-diagonal (pack*C, pack*D) weights: one packed GEMM, but
    pack x the per-image FLOPs (the r3 lane-packing loss, NOTES_r3)."""
    return os.environ.get("VIPTPU_GCVIT_PACK_GEMM", "rows")


def _lane_slices(y, pack):
    """Per-image lane spans of a packed (t, pack*C0) value: pack (t, C0)
    slices. Lane slices of VALUES are the construct the r3 packed attention
    kernel already compiles on v5e Mosaic (sublane-axis concat/slice of
    lane-sliced values, by contrast, crashes the backend — measured HTTP 500
    from the compile helper in both bf16 and f32)."""
    t, c = y.shape
    c0 = c // pack
    return [jax.lax.slice(y, (0, i * c0), (t, (i + 1) * c0))
            for i in range(pack)]


def _per_image_dot(y, w_ref, bias, pack, mm_dtype):
    """GEMM each image's lane span against the ORIGINAL (C0, D0) weights and
    lane-concat the results back to packed layout: (t, pack*C0) ->
    (t, pack*D0). pack small independent GEMMs instead of one row-folded
    (pack*t, C0) GEMM — identical FLOPs, and avoids the sublane concat that
    crashes Mosaic."""
    outs = []
    for yi in _lane_slices(y, pack):
        o = jnp.dot(yi.astype(mm_dtype), w_ref[:],
                    preferred_element_type=jnp.float32)
        outs.append(o if bias is None else o + bias)
    return outs


def _pack_vec(v, pack):
    if pack == 1:
        return v
    return jnp.tile(jnp.asarray(v), pack)


def _ln_normalize(xf, pack, eps):
    """LayerNorm statistics over the per-image channel span: full-row for
    pack=1, else per 1/pack lane-slice (each image's channels normalize
    independently, exactly as unpacked)."""
    if pack == 1:
        mean = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
        return (xf - mean) * jax.lax.rsqrt(var + eps)
    c0 = xf.shape[-1] // pack
    ys = []
    for i in range(pack):
        h = jax.lax.slice(xf, (0, i * c0), (xf.shape[0], (i + 1) * c0))
        mean = h.mean(axis=-1, keepdims=True)
        var = ((h - mean) ** 2).mean(axis=-1, keepdims=True)
        ys.append((h - mean) * jax.lax.rsqrt(var + eps))
    return jnp.concatenate(ys, axis=1)


def _mm_dtype(x_dtype, *dims, force=None):
    """Matmul dtype: follow the compute dtype (bf16 on TPU) regardless of
    lane alignment. The old conservative rule forced f32 at C % 128 != 0 out
    of fear of the v5e Mosaic crash on bf16 GEMMs — but that crash is
    specific to LHS values RESHAPED from lane-unaligned loads; these kernels'
    LHS are elementwise-derived, and round-3 on-chip runs (tools/
    exp_gcvit_l1.py + tools/exp_member_ab.py) confirmed bf16 at C=64/hd=32 is
    legal, bf16-equivalent (max|d| 0.016 on unit inputs) and +5% on the full
    GCViTTiny member (2,891 -> 3,030 img/s). ``force`` (or the model-level
    VIPTPU_GCVIT_MM=f32 env) restores f32."""
    del dims
    if force is not None:
        return force
    return x_dtype


# ---------------------------------------------------------------------------
# kernel 1: LN + dense (qkv projection)
# ---------------------------------------------------------------------------
def _ln_dense_kernel(x_ref, g_ref, b_ref, w_ref, wb_ref, *o_refs, eps,
                     mm_dtype, pack=1, rows=False, int8_mm=False):
    if int8_mm:
        s_ref, *o_refs = o_refs
    xf = x_ref[:].astype(jnp.float32)
    y = _ln_normalize(xf, pack, eps)
    y = y * g_ref[:] + b_ref[:]
    split = len(o_refs)
    if int8_mm:
        o = _dot_i8(y, w_ref[:], s_ref[:], wb_ref[:])
        width = o.shape[1] // split
        for s, o_ref in enumerate(o_refs):
            o_ref[:] = o[:, s * width : (s + 1) * width].astype(o_ref.dtype)
        return
    if rows and pack > 1:
        # per-image GEMMs with the ORIGINAL (C0, D0) weights: no kron FLOP
        # multiplication; outputs re-packed to the lane layout the attention
        # kernel expects ([img0 | img1] per split component)
        t = y.shape[0]
        per_img = _per_image_dot(y, w_ref, wb_ref[:], pack, mm_dtype)
        d0 = per_img[0].shape[1] // split
        for s, o_ref in enumerate(o_refs):
            o_ref[:] = jnp.concatenate(
                [jax.lax.slice(o, (0, s * d0), (t, (s + 1) * d0))
                 for o in per_img], axis=1).astype(o_ref.dtype)
        return
    o = jnp.dot(y.astype(mm_dtype), w_ref[:], preferred_element_type=jnp.float32)
    o = o + wb_ref[:]
    width = o.shape[1] // split
    for s, o_ref in enumerate(o_refs):
        o_ref[:] = o[:, s * width : (s + 1) * width].astype(o_ref.dtype)


def ln_dense(x2, ln_g, ln_b, w, wb, *, eps=1e-5, row_tile=1024, split=1,
             force_mm_dtype=None, pack=1, int8: Optional[bool] = None,
             interpret=False):
    """LN over the last axis then a dense projection; x2 is (M, C). With
    ``split`` > 1 the (M, D) result is returned as ``split`` separate
    (M, D/split) arrays (q/k/v), keeping each output's lane dim equal to its
    full array width — the layout the attention kernel's BlockSpecs need.
    With ``pack`` > 1, x2 is lane-packed (see pack_lanes): LN params are
    per-image (C/pack wide) and get tiled here; the GEMM runs per
    :func:`pack_gemm_mode` — 'rows' keeps the original per-image weights
    (row-folded in-kernel, zero extra FLOPs), 'kron' block-diagonalizes
    them. Each split component's output keeps the packed lane layout
    [img0 | img1]."""
    rows = pack > 1 and pack_gemm_mode() == "rows"
    if pack > 1:
        ln_g = _pack_vec(ln_g, pack)
        ln_b = _pack_vec(ln_b, pack)
        if not rows:
            d0 = w.shape[1] // split
            w = jnp.concatenate(
                [_pack_weight(w[:, j * d0:(j + 1) * d0], pack)
                 for j in range(split)], axis=1)
            wb = jnp.concatenate(
                [_pack_vec(wb[j * d0:(j + 1) * d0], pack)
                 for j in range(split)])
    m, c = x2.shape
    d = w.shape[1]  # rows mode: split*D0 (original); kron: pack*split*D0
    width = (pack * d // split) if rows else (d // split)
    mm_dtype = _mm_dtype(x2.dtype, c, d, force=force_mm_dtype)
    int8_mm = pack == 1 and gcvit_int8(c, force=int8)
    kern = functools.partial(_ln_dense_kernel, eps=eps, mm_dtype=mm_dtype,
                             pack=pack, rows=rows, int8_mm=int8_mm)
    if x2.dtype == jnp.float32:
        row_tile //= 2  # f32 tiles are 2x the bytes; stay under scoped VMEM
    if c < 128:
        row_tile *= 128 // c  # narrow-C tiles are lane-padded half-empty;
        # more rows per step keeps bytes/step (and the grid floor) constant
    t = min(row_tile, max(8, -(-m // 8) * 8))  # small-M: don't allocate a
    # full 1024-row VMEM tile for a 2-image batch (scoped-vmem OOM at C=512)
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    if int8_mm:
        w_op, sw = _quant_cols(f32(w))
        extra_args, extra_specs = [sw], [pl.BlockSpec((d,), lambda i: (0,))]
    else:
        w_op = jnp.asarray(w, mm_dtype)
        extra_args, extra_specs = [], []
    out = pl.pallas_call(
        kern,
        grid=(pl.cdiv(m, t),),
        in_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c // pack if rows else c, d), lambda i: (0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            *extra_specs,
        ],
        out_specs=tuple(
            pl.BlockSpec((t, width), lambda i: (i, 0)) for _ in range(split)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((m, width), x2.dtype) for _ in range(split)
        ),
        interpret=interpret,
    )(x2, f32(ln_g), f32(ln_b), w_op, f32(wb), *extra_args)
    return tuple(out)  # pallas returns a sequence for tuple out_shape


# ---------------------------------------------------------------------------
# kernel 2: block-diagonal grouped window attention
# ---------------------------------------------------------------------------
def softmax_mode() -> str:
    """How the masked kernel normalizes softmax: 'mxu' (default) appends a
    ones-column to V so the row-sum rides the p @ [V|1] GEMM and the divide
    shrinks to the (gN, hd) output — the full-lane sum+divide passes over the
    (gN, gN) masked tile were pure VPU cost; 'div' restores the classic
    in-place p/sum(p)."""
    import os

    return os.environ.get("VIPTPU_GCVIT_SOFTMAX", "mxu")


def _masked_bias(bias, g, n):
    """Combined rel-pos bias + block-diagonal mask for the masked-GEMM
    layout: position (i, j) belongs to windows (i//N, j//N); off-diagonal
    pairs get -1e9 (=> exactly 0 after softmax). (heads, gN, gN) f32."""
    eye = np.kron(np.eye(g, dtype=np.float32), np.ones((n, n), np.float32))
    tiled = jnp.tile(jnp.asarray(bias, jnp.float32), (1, g, g))
    return tiled * eye + (1.0 - eye) * -1e9


def _bias_synth(heads: int, g: int, n: int) -> bool:
    """Whether the masked kernels synthesize the (gN, gN) bias+mask tile
    in-register from the per-window (n, n) bias instead of loading it as a
    precomputed VMEM block. The dense block costs heads*(gN)^2 f32 bytes
    resident per program — 9.8 MB at L4 fold=8, which is what reverted the
    round-3 L4 batch-fold — while synthesis costs one transient (gN, gN)
    tile of concats + an iota-compare select per head. Dense stays the
    default at small blocks (measured free at L1: the bias add rides the
    score GEMM epilogue); synthesis engages when the dense block passes
    VIPTPU_GCVIT_BIAS_BUDGET (bytes). NEGATIVE RESULT, default effectively
    off (budget 1 GB): the deeper folds synthesis unlocks LOSE at member
    level on v5e — same-session A/B 3,391 img/s dense vs 3,212 synth
    (budget 3 MB: L4 fold=8 + L3 mono) and 3,324 L4-only (budget 6 MB) —
    the masked GEMM's off-diagonal FLOP waste at fold=8 plus the in-kernel
    tiling concats outrun the VMEM saving in the post-mono, MXU-softmax
    kernel era (the round-3-early "+4% L4 fold" predated both).
    VIPTPU_GCVIT_BIAS=dense|synth forces either mode."""
    if g <= 1:
        return False
    force = os.environ.get("VIPTPU_GCVIT_BIAS", "")
    if force == "dense":
        return False
    if force == "synth":
        return True
    budget = int(os.environ.get("VIPTPU_GCVIT_BIAS_BUDGET",
                                str(2 ** 30)))
    return heads * (g * n) ** 2 * 4 > budget


def _apply_masked_bias(s, mb_h, g, n, synth):
    """Add the block-diagonal masked rel-pos bias to a (gN, gN) f32 score
    tile inside a kernel. synth=False: ``mb_h`` is the precomputed
    (gN, gN) bias+mask tile. synth=True: ``mb_h`` is the per-window (n, n)
    bias; the g x g tiling is built with row/column concats and the
    off-diagonal -1e9 mask from an iota window-index compare — no
    O((gN)^2) kernel input."""
    if not synth or g == 1:
        return s + mb_h
    gn = g * n
    row = jnp.concatenate([mb_h] * g, axis=0)           # (gN, n)
    full = jnp.concatenate([row] * g, axis=1)           # (gN, gN)
    ri = jax.lax.broadcasted_iota(jnp.int32, (gn, gn), 0) // n
    ci = jax.lax.broadcasted_iota(jnp.int32, (gn, gn), 1) // n
    return jnp.where(ri == ci, s + full, -1e9)


def _attn_kernel(q_ref, k_ref, v_ref, mb_ref, o_ref, *, scale, g, n, heads,
                 mm_dtype=jnp.float32, wpp=1, synth=False, pack=1):
    # wpp = window-GROUPS per program: the per-grid-step fixed cost is the
    # dominant kernel cost at L1 (tools/exp_attn_parts.py: empty-kernel
    # floor 1.96 ms of the 3.52 ms total across 2048 steps), so each
    # program handles wpp groups sliced from one big block — fewer, fatter
    # steps, identical math. (bpp — images per step — crashes the v5e
    # Mosaic backend; wpp slices VALUES, which is legal.)
    mxu_sum = softmax_mode() == "mxu"
    gn = g * n
    qall = q_ref[0]
    kall = k_ref[0]                                   # (wpp*gN, C)
    vall = v_ref[0]
    c = kall.shape[1]
    c0 = c // pack                                    # per-image channel span
    hd = c0 // heads
    q_global = qall.shape[0] != wpp * gn
    outs = []
    for w in range(wpp):
        kfull = jax.lax.slice(kall, (w * gn, 0), ((w + 1) * gn, c))
        vfull = vall if wpp == 1 else jax.lax.slice(
            vall, (w * gn, 0), ((w + 1) * gn, c))
        kfull = kfull.astype(mm_dtype)
        if q_global:
            qf = qall
        else:
            qf = jax.lax.slice(qall, (w * gn, 0), ((w + 1) * gn, c))
        qfull = (qf.astype(jnp.float32) * scale).astype(mm_dtype)
        houts = []
        for i, h in ((i, h) for i in range(pack) for h in range(heads)):
            off = i * c0 + h * hd                     # packed-image lane slot
            q = qfull[:, off : off + hd]
            if q.shape[0] != gn:                      # global query: tile
                q = jnp.concatenate([q] * g, axis=0)
            k = kfull[:, off : off + hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                         # (gN, gN)
            s = _apply_masked_bias(s, mb_ref[h], g, n, synth)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            vh = vfull[:, off : off + hd].astype(mm_dtype)
            if mxu_sum:
                # row-sum on the MXU: p @ [V | 1] yields (gN, hd+1) whose
                # last column is sum(p); normalize the small output instead
                # of the (gN, gN) tile (saves two full-lane VPU passes)
                v_ext = jnp.concatenate(
                    [vh, jnp.ones((vh.shape[0], 1), vh.dtype)], axis=1)
                o_ext = jnp.dot(p.astype(mm_dtype), v_ext,
                                preferred_element_type=jnp.float32)
                num = jax.lax.slice(o_ext, (0, 0), (o_ext.shape[0], hd))
                den = jax.lax.slice(o_ext, (0, hd), (o_ext.shape[0], hd + 1))
                houts.append(num / den)
            else:
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                houts.append(jnp.dot(p.astype(mm_dtype), vh,
                                     preferred_element_type=jnp.float32))
        outs.append(jnp.concatenate(houts, axis=1))
    o = outs[0] if wpp == 1 else jnp.concatenate(outs, axis=0)
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_kernel_perwin(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, g, n,
                        heads, mm_dtype=jnp.float32, batched=False):
    """Per-window attention without the G^2 masked score matrix.

    The masked-GEMM kernel above trades G*N-row MXU tiles for computing (and
    softmax-ing) a (G*N, G*N) score block of which only the N-wide diagonal
    is real — at L1 (G=8) that is 8x wasted exp/max/sum VPU work, which
    dominates once the GEMMs are bf16. Here scores are (G, N, N): 'batched'
    uses one f32 batch-dim dot_general per head (bf16 3-D dots hit the v5e
    Mosaic reshape-of-unaligned crash; f32 are fine), else G unrolled 2-D
    dots per head in the compute dtype via lax.slice (arbitrary row offsets
    on VALUES are legal — only refs need sublane alignment). The rel-pos
    bias stays (heads, N, N) — no G x G tiling, no -1e9 mask."""
    qfull = q_ref[0].astype(jnp.float32) * scale      # (gN | N, C)
    kfull = k_ref[0]                                  # (gN, C)
    vfull = v_ref[0]
    c = kfull.shape[1]
    hd = c // heads
    q_global = qfull.shape[0] != g * n
    outs = []
    for h in range(heads):
        qh = qfull[:, h * hd : (h + 1) * hd]
        kh = kfull[:, h * hd : (h + 1) * hd]
        vh = vfull[:, h * hd : (h + 1) * hd]
        bias = b_ref[h]                               # (N, N)
        if batched:
            kh3 = kh.astype(jnp.float32).reshape(g, n, hd)
            if q_global:
                q3 = jnp.broadcast_to(qh[None], (g, n, hd))
            else:
                q3 = qh.reshape(g, n, hd)
            s = jax.lax.dot_general(
                q3, kh3, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                         # (g, N, N)
            s = s + bias[None]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p, vh.astype(jnp.float32).reshape(g, n, hd),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                         # (g, N, hd)
            outs.append(o.reshape(g * n, hd))
        else:
            qh = qh.astype(mm_dtype)
            wins = []
            for i in range(g):
                qi = qh if q_global else jax.lax.slice(
                    qh, (i * n, 0), ((i + 1) * n, hd))
                ki = jax.lax.slice(kh, (i * n, 0), ((i + 1) * n, hd))
                vi = jax.lax.slice(vh, (i * n, 0), ((i + 1) * n, hd))
                s = jax.lax.dot_general(
                    qi, ki.astype(mm_dtype), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s = s + bias
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                wins.append(jnp.dot(p.astype(mm_dtype), vi.astype(mm_dtype),
                                    preferred_element_type=jnp.float32))
            outs.append(jnp.concatenate(wins, axis=0))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def attn_mode(mode: Optional[str] = None) -> str:
    """Resolve the window-attention kernel mode: explicit arg, else the
    VIPTPU_GCVIT_ATTN env (masked|batched|unroll), else 'masked'."""
    import os

    return mode or os.environ.get("VIPTPU_GCVIT_ATTN", "masked")


def _pick_wpp(nwg: int, g: int, n: int, c: int, heads: int,
              itemsize: int) -> int:
    """Window-groups per program: largest divisor of ``nwg`` whose
    double-buffered qkv+out blocks and masked bias stay under ~7 MB of
    VMEM. Fewer, fatter grid steps — the per-step fixed cost dominates the
    attention kernel at L1 (exp_attn_parts: 1.96 ms empty floor of 3.52)."""
    if _bias_synth(heads, g, n):
        bias_bytes = heads * n * n * 4 + (g * n) ** 2 * 4  # input + synth tile
    else:
        bias_bytes = heads * (g * n) ** 2 * 4
    best = 1
    for cand in range(1, nwg + 1):
        if nwg % cand:
            continue
        blocks = 8 * cand * g * n * c * itemsize  # 2x double-buffer x 4 refs
        if blocks + bias_bytes <= 7 * 2 ** 20:
            best = cand
    return best


def grouped_window_attention(
    q, k, v, heads, n, *, bias, scale, group, q_is_global=False,
    force_mm_dtype=None, mode=None, wpp=None, pack=1, interpret=False,
):
    """Block-diagonal grouped window attention.

    q/k/v: (B, nWin*N, C), columns ordered [head][head_dim]; for GCViT's
    global-query blocks ``q`` is the shared (B, N, C) query. ``bias`` is the
    dense (heads, N, N) rel-pos bias. G windows are stacked per program,
    and ``wpp`` window-groups are processed per grid step (masked mode).
    ``mode`` picks the score layout: 'masked' = one (G*N, G*N) masked GEMM
    (bias tiled G x G with -1e9 off-diagonal — exactly G independent window
    attentions, but G x the softmax VPU work); 'batched' = (G, N, N) f32
    batch-dim dots; 'unroll' = G unrolled (N, N) dots in the compute dtype.
    Returns (B, nWin*N, C).
    """
    b, toks, c = k.shape
    nwin = toks // n
    g = group
    assert nwin % g == 0, (nwin, g)
    nwg = nwin // g
    mode = attn_mode(mode)
    assert pack == 1 or mode == "masked", (pack, mode)  # pack is masked-only
    if mode == "masked":
        if wpp is None:
            wpp = _pick_wpp(nwg, g, n, c, heads, jnp.dtype(k.dtype).itemsize)
        if nwg % wpp:
            wpp = 1
    else:
        wpp = 1  # per-window kernels handle one group per step

    if mode == "masked":
        synth = _bias_synth(heads, g, n)
        if synth:
            mb = jnp.asarray(bias, jnp.float32)       # (heads, N, N)
            bias_spec = pl.BlockSpec((heads, n, n), lambda b_, wg: (0, 0, 0))
        else:
            mb = _masked_bias(bias, g, n)             # (heads, gN, gN)
            bias_spec = pl.BlockSpec((heads, g * n, g * n),
                                     lambda b_, wg: (0, 0, 0))
        kern = functools.partial(
            _attn_kernel, scale=scale, g=g, n=n, heads=heads,
            mm_dtype=_mm_dtype(k.dtype, force=force_mm_dtype), wpp=wpp,
            synth=synth, pack=pack,
        )
    else:
        mb = jnp.asarray(bias, jnp.float32)           # (heads, N, N), no tile
        bias_spec = pl.BlockSpec((heads, n, n), lambda b_, wg: (0, 0, 0))
        kern = functools.partial(
            _attn_kernel_perwin, scale=scale, g=g, n=n, heads=heads,
            mm_dtype=_mm_dtype(k.dtype, force=force_mm_dtype),
            batched=(mode == "batched"),
        )
    if q_is_global:
        q_spec = pl.BlockSpec((1, n, c), lambda b_, wg: (b_, 0, 0))
    else:
        q_spec = pl.BlockSpec((1, wpp * g * n, c), lambda b_, wg: (b_, wg, 0))

    return pl.pallas_call(
        kern,
        grid=(b, nwg // wpp),
        in_specs=[
            q_spec,
            pl.BlockSpec((1, wpp * g * n, c), lambda b_, wg: (b_, wg, 0)),
            pl.BlockSpec((1, wpp * g * n, c), lambda b_, wg: (b_, wg, 0)),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((1, wpp * g * n, c), lambda b_, wg: (b_, wg, 0)),
        out_shape=jax.ShapeDtypeStruct((b, toks, c), k.dtype),
        interpret=interpret,
    )(q, k, v, mb)


# ---------------------------------------------------------------------------
# kernel 3: proj + residual + LN2 + MLP + residual
# ---------------------------------------------------------------------------
def _tail_kernel(a_ref, x_ref, wp_ref, bp_ref, g1_ref, lg_ref, lb_ref,
                 w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, *rest, eps,
                 mm_dtype, gelu="erf", pack=1, rows=False, int8_mm=False):
    if int8_mm:
        sp_ref, s1_ref, s2_ref, o_ref = rest
        proj = _dot_i8(a_ref[:].astype(jnp.float32), wp_ref[:], sp_ref[:],
                       bp_ref[:])
        r1 = x_ref[:].astype(jnp.float32) + proj * g1_ref[:]
        y = _ln_normalize(r1, pack, eps)
        y = y * lg_ref[:] + lb_ref[:]
        h = _gelu(_dot_i8(y, w1_ref[:], s1_ref[:], b1_ref[:]), gelu)
        o = r1 + _dot_i8(h, w2_ref[:], s2_ref[:], b2_ref[:]) * g2_ref[:]
        o_ref[:] = o.astype(o_ref.dtype)
        return
    (o_ref,) = rest
    if rows and pack > 1:
        # per-image GEMMs with per-image weights (see _ln_dense_kernel);
        # everything elementwise (residuals, LN, layer-scale) stays on the
        # full-lane packed tiles
        proj = jnp.concatenate(
            _per_image_dot(a_ref[:], wp_ref, bp_ref[:], pack, mm_dtype),
            axis=1)
        r1 = x_ref[:].astype(jnp.float32) + proj * g1_ref[:]
        y = _ln_normalize(r1, pack, eps)
        y = y * lg_ref[:] + lb_ref[:]
        outs = []
        for yi in _lane_slices(y, pack):
            h = jnp.dot(yi.astype(mm_dtype), w1_ref[:],
                        preferred_element_type=jnp.float32) + b1_ref[:]
            h = _gelu(h, gelu)
            outs.append(jnp.dot(h.astype(mm_dtype), w2_ref[:],
                                preferred_element_type=jnp.float32) + b2_ref[:])
        o = r1 + jnp.concatenate(outs, axis=1) * g2_ref[:]
        o_ref[:] = o.astype(o_ref.dtype)
        return
    proj = jnp.dot(a_ref[:].astype(mm_dtype), wp_ref[:],
                   preferred_element_type=jnp.float32) + bp_ref[:]
    r1 = x_ref[:].astype(jnp.float32) + proj * g1_ref[:]

    y = _ln_normalize(r1, pack, eps)
    y = y * lg_ref[:] + lb_ref[:]
    h = jnp.dot(y.astype(mm_dtype), w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:]
    h = _gelu(h, gelu)
    o = jnp.dot(h.astype(mm_dtype), w2_ref[:], preferred_element_type=jnp.float32)
    o = r1 + (o + b2_ref[:]) * g2_ref[:]
    o_ref[:] = o.astype(o_ref.dtype)


def proj_res_ln_mlp(
    attn_out, x2, wp, bp, gamma1, ln_g, ln_b, w1, b1, w2, b2, gamma2,
    *, eps=1e-5, row_tile=1024, force_mm_dtype=None, gelu=None, pack=1,
    int8: Optional[bool] = None, interpret=False,
):
    """x + g1*proj(attn) then +g2*MLP(LN(.)) over flat (M, C) tokens.
    ``pack`` > 1: lane-packed tokens; GEMMs per :func:`pack_gemm_mode`
    ('rows' keeps per-image weights, 'kron' block-diagonalizes)."""
    rows = pack > 1 and pack_gemm_mode() == "rows"
    if pack > 1:
        # vectors applied on PACKED (t, pack*C0) tiles tile x pack; in rows
        # mode the GEMM biases (bp/b1/b2) add onto ROW-FOLDED (pack*t, .)
        # outputs and keep their original per-image width
        gamma1, ln_g, ln_b, gamma2 = (
            _pack_vec(v_, pack) for v_ in (gamma1, ln_g, ln_b, gamma2))
        if not rows:
            wp, w1, w2 = (_pack_weight(w_, pack) for w_ in (wp, w1, w2))
            bp, b1, b2 = (_pack_vec(v_, pack) for v_ in (bp, b1, b2))
    m, c = x2.shape
    hidden = w1.shape[1]
    mm_dtype = _mm_dtype(x2.dtype, c, hidden, force=force_mm_dtype)
    int8_mm = pack == 1 and gcvit_int8(c, force=int8)
    kern = functools.partial(_tail_kernel, eps=eps, mm_dtype=mm_dtype,
                             gelu=gelu_flavor(gelu), pack=pack, rows=rows,
                             int8_mm=int8_mm)
    if x2.dtype == jnp.float32:
        row_tile //= 2  # f32 tiles are 2x the bytes (see ln_dense)
    if c < 128:
        row_tile *= 128 // c  # narrow-C: see ln_dense
    t = min(row_tile, max(8, -(-m // 8) * 8))  # small-M clamp (see ln_dense)
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    c0 = c // pack if rows else c  # per-image width for rows-mode weights
    if int8_mm:
        wp_op, sp = _quant_cols(f32(wp))
        w1_op, s1 = _quant_cols(f32(w1))
        w2_op, s2 = _quant_cols(f32(w2))
        extra_args = [sp, s1, s2]
        extra_specs = [pl.BlockSpec((c,), lambda i: (0,)),
                       pl.BlockSpec((hidden,), lambda i: (0,)),
                       pl.BlockSpec((c,), lambda i: (0,))]
    else:
        wp_op = jnp.asarray(wp, mm_dtype)
        w1_op = jnp.asarray(w1, mm_dtype)
        w2_op = jnp.asarray(w2, mm_dtype)
        extra_args, extra_specs = [], []
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(m, t),),
        in_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0)),
            pl.BlockSpec((t, c), lambda i: (i, 0)),
            pl.BlockSpec((c0, c0), lambda i: (0, 0)),
            pl.BlockSpec((c0,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c0, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden,), lambda i: (0,)),
            pl.BlockSpec((hidden, c0), lambda i: (0, 0)),
            pl.BlockSpec((c0,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((t, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        interpret=interpret,
    )(
        attn_out, x2, wp_op, f32(bp), f32(gamma1),
        f32(ln_g), f32(ln_b), w1_op, f32(b1),
        w2_op, f32(b2), f32(gamma2), *extra_args,
    )


# ---------------------------------------------------------------------------
# monoblock: the WHOLE transformer block in one program per image
# ---------------------------------------------------------------------------
def _mono_kernel(*refs, eps, mm_dtype, gelu, scale, g, n, heads, s_comp,
                 mxu_sum, synth=False, int8_mm=False):
    """LN1 -> qkv GEMM -> grouped masked window attention -> proj +
    layer-scale residual -> LN2 -> MLP -> residual, all on one image's
    window-ordered tokens held in VMEM. Identical math to the three-kernel
    pipeline (_ln_dense_kernel / _attn_kernel / _tail_kernel) — the win is
    eliminating two full HBM round-trips of the token array per block plus
    the XLA reshape/copy glue between kernels (C=64 levels DMA at ~210 GB/s,
    so each saved pass is expensive; profiled L1 = 30.7 of GCViTTiny's
    76.8 ms device time)."""
    has_qg = s_comp == 2
    if int8_mm:  # 4 weight-scale refs ride between the params and the out
        *refs, sqkv_ref, sp_ref, s1_ref, s2_ref, o_ref = refs
    else:
        *refs, o_ref = refs
    if has_qg:
        (x_ref, qg_ref, ln1g_ref, ln1b_ref, wqkv_ref, bqkv_ref, mb_ref,
         wp_ref, bp_ref, g1_ref, ln2g_ref, ln2b_ref, w1_ref, b1_ref,
         w2_ref, b2_ref, g2_ref) = refs
    else:
        (x_ref, ln1g_ref, ln1b_ref, wqkv_ref, bqkv_ref, mb_ref,
         wp_ref, bp_ref, g1_ref, ln2g_ref, ln2b_ref, w1_ref, b1_ref,
         w2_ref, b2_ref, g2_ref) = refs

    x = x_ref[0]                                    # (toks, C)
    c = x.shape[1]
    hd = c // heads
    gn = g * n
    toks = x.shape[0]
    nwg = toks // gn

    # LN1 + qkv projection. One GEMM per COMPONENT (q/k/v), not one fat
    # (toks, 3C) GEMM: the per-group/per-head loads then slice clean
    # (toks, C) arrays row-wise (free) + at hd lane offsets (what the
    # three-kernel attention kernel already does), instead of lane-slicing
    # a 3C-wide array at C offsets (vector relayouts per group).
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln1g_ref[:] + ln1b_ref[:]
    wqkv = wqkv_ref[:]
    bqkv = bqkv_ref[:]
    s_c = wqkv.shape[1] // c
    if int8_mm:
        # quantize the LN'd activations ONCE; the per-component dots share
        # the dynamic per-row scales (same tile => same abs-max rows)
        qy, sy = _dyn_quant_rows(y)
    else:
        y = y.astype(mm_dtype)
    comps = []
    for s_i in range(s_c):
        wj = jax.lax.slice(wqkv, (0, s_i * c), (wqkv.shape[0], (s_i + 1) * c))
        bj = jax.lax.slice(bqkv, (s_i * c,), ((s_i + 1) * c,))
        if int8_mm:
            sj = jax.lax.slice(sqkv_ref[:], (s_i * c,), ((s_i + 1) * c,))
            acc = jnp.dot(qy, wj, preferred_element_type=jnp.int32)
            comps.append(acc.astype(jnp.float32) * (sy * sj) + bj)
        else:
            comps.append(
                jnp.dot(y, wj, preferred_element_type=jnp.float32) + bj)

    if has_qg:
        qg = qg_ref[0]                              # (n, C) or (toks, C)
        q_tiled = qg.shape[0] != toks               # per-image global query
        kc, vc = comps
        qc = None
    else:
        q_tiled = False
        qc, kc, vc = comps
    kc = kc.astype(mm_dtype)
    vc = vc.astype(mm_dtype)

    outs = []
    for wg in range(nwg):
        r0 = wg * gn
        kfull = jax.lax.slice(kc, (r0, 0), (r0 + gn, c))
        vfull = jax.lax.slice(vc, (r0, 0), (r0 + gn, c))
        if has_qg:
            qf = qg if q_tiled else jax.lax.slice(qg, (r0, 0), (r0 + gn, c))
        else:
            qf = jax.lax.slice(qc, (r0, 0), (r0 + gn, c))
        qfull = (qf.astype(jnp.float32) * scale).astype(mm_dtype)
        houts = []
        for h in range(heads):
            q = qfull[:, h * hd : (h + 1) * hd]
            if q.shape[0] != gn:                    # global query: tile
                q = jnp.concatenate([q] * g, axis=0)
            k = kfull[:, h * hd : (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = _apply_masked_bias(s, mb_ref[h], g, n, synth)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            vh = vfull[:, h * hd : (h + 1) * hd].astype(mm_dtype)
            if mxu_sum:
                v_ext = jnp.concatenate(
                    [vh, jnp.ones((vh.shape[0], 1), vh.dtype)], axis=1)
                o_ext = jnp.dot(p.astype(mm_dtype), v_ext,
                                preferred_element_type=jnp.float32)
                num = jax.lax.slice(o_ext, (0, 0), (o_ext.shape[0], hd))
                den = jax.lax.slice(o_ext, (0, hd), (o_ext.shape[0], hd + 1))
                houts.append(num / den)
            else:
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                houts.append(jnp.dot(p.astype(mm_dtype), vh,
                                     preferred_element_type=jnp.float32))
        outs.append(jnp.concatenate(houts, axis=1))
    attn = outs[0] if nwg == 1 else jnp.concatenate(outs, axis=0)
    # match the three-kernel pipeline bit-for-bit: the attention kernel
    # stores its output in the token dtype before the tail reads it
    attn = attn.astype(x.dtype)

    if int8_mm:
        proj = _dot_i8(attn.astype(jnp.float32), wp_ref[:], sp_ref[:],
                       bp_ref[:])
    else:
        proj = jnp.dot(attn.astype(mm_dtype), wp_ref[:],
                       preferred_element_type=jnp.float32) + bp_ref[:]
    r1 = xf + proj * g1_ref[:]

    mean2 = r1.mean(axis=-1, keepdims=True)
    var2 = ((r1 - mean2) ** 2).mean(axis=-1, keepdims=True)
    y2 = (r1 - mean2) * jax.lax.rsqrt(var2 + eps)
    y2 = y2 * ln2g_ref[:] + ln2b_ref[:]
    if int8_mm:
        h_ = _gelu(_dot_i8(y2, w1_ref[:], s1_ref[:], b1_ref[:]), gelu)
        o = _dot_i8(h_, w2_ref[:], s2_ref[:], b2_ref[:])
        o = r1 + o * g2_ref[:]
    else:
        h_ = jnp.dot(y2.astype(mm_dtype), w1_ref[:],
                     preferred_element_type=jnp.float32)
        h_ = _gelu(h_ + b1_ref[:], gelu)
        o = jnp.dot(h_.astype(mm_dtype), w2_ref[:],
                    preferred_element_type=jnp.float32)
        o = r1 + (o + b2_ref[:]) * g2_ref[:]
    o_ref[0] = o.astype(o_ref.dtype)


def _mono_vmem_model(toks, c, hidden, heads, gn, s_comp, itemsize,
                     n=None) -> int:
    """Rough VMEM bytes for one _mono_kernel program: f32 qkv + bias +
    score tile + residual + f32 MLP hidden + bf16 weights + 2x double-
    buffered token blocks. When ``n`` is given and the synth-bias policy
    engages, the resident bias block shrinks to (heads, n, n) plus one
    transient (gN, gN) synthesis tile."""
    if n is not None and _bias_synth(heads, gn // n, n):
        bias_bytes = 4 * heads * n * n + 4 * gn * gn
    else:
        bias_bytes = 4 * heads * gn * gn
    return (
        4 * toks * s_comp * c          # qkv (f32 accum)
        + bias_bytes                   # masked bias block (dense or synth)
        + 4 * gn * gn                  # score tile
        + 4 * toks * c * 2             # xf + r1
        + 4 * toks * hidden            # MLP hidden (f32)
        + 2 * (c * 3 * c + c * c + 2 * c * hidden)  # weights (bf16)
        + 4 * toks * c * itemsize      # in/out blocks, double-buffered
    )


def mono_window_transformer_block(
    x_win, *, heads, n, ln1_g, ln1_b, wqkv, bqkv, bias, wp, bp,
    ln2_g, ln2_b, w1, b1, w2, b2, gamma1, gamma2, scale, q_global,
    group, eps, force_mm_dtype=None, int8: Optional[bool] = None,
    interpret=False,
):
    """One pallas program per image for the whole block; see _mono_kernel.
    ``q_global`` may be None (local block), (B, N, C) (global query) or
    (B, toks, C) (folded single-window levels, a full per-token q).
    ``int8`` (default: :func:`gcvit_int8` policy) runs the qkv/proj/MLP
    GEMMs s8 x s8 with per-output-channel weight scales + dynamic
    activation scales; attention GEMMs stay in the compute dtype."""
    b, toks, c = x_win.shape
    hidden = w1.shape[1]
    g = group
    gn = g * n
    mm_dtype = _mm_dtype(x_win.dtype, force=force_mm_dtype)
    s_comp = 3 if q_global is None else 2
    mxu = softmax_mode() == "mxu"
    synth = _bias_synth(heads, g, n)
    int8_mm = gcvit_int8(c, force=int8)
    kern = functools.partial(
        _mono_kernel, eps=eps, mm_dtype=mm_dtype, gelu=gelu_flavor(None),
        scale=scale, g=g, n=n, heads=heads, s_comp=s_comp, mxu_sum=mxu,
        synth=synth, int8_mm=int8_mm)
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    ones = jnp.ones((c,), jnp.float32)
    gamma1 = ones if gamma1 is None else f32(gamma1)
    gamma2 = ones if gamma2 is None else f32(gamma2)

    # the dense rel-pos bias + off-diagonal mask, expanded to the group
    # (same construction grouped_window_attention uses) — or, under the
    # synth policy, the raw (heads, n, n) bias tiled/masked in-kernel
    mb = (jnp.asarray(bias, jnp.float32) if synth
          else _masked_bias(bias, g, n))

    in_specs = [pl.BlockSpec((1, toks, c), lambda i: (i, 0, 0))]
    args = [x_win]
    if s_comp == 2:
        qrows = q_global.shape[1]
        in_specs.append(pl.BlockSpec((1, qrows, c), lambda i: (i, 0, 0)))
        args.append(jnp.asarray(q_global, x_win.dtype))
    w_specs = [
        pl.BlockSpec((c,), lambda i: (0,)),
        pl.BlockSpec((c,), lambda i: (0,)),
        pl.BlockSpec((c, s_comp * c), lambda i: (0, 0)),
        pl.BlockSpec((s_comp * c,), lambda i: (0,)),
        pl.BlockSpec(mb.shape, lambda i: (0,) * mb.ndim),
        pl.BlockSpec((c, c), lambda i: (0, 0)),
        pl.BlockSpec((c,), lambda i: (0,)),
        pl.BlockSpec((c,), lambda i: (0,)),
        pl.BlockSpec((c,), lambda i: (0,)),
        pl.BlockSpec((c,), lambda i: (0,)),
        pl.BlockSpec((c, hidden), lambda i: (0, 0)),
        pl.BlockSpec((hidden,), lambda i: (0,)),
        pl.BlockSpec((hidden, c), lambda i: (0, 0)),
        pl.BlockSpec((c,), lambda i: (0,)),
        pl.BlockSpec((c,), lambda i: (0,)),
    ]
    if int8_mm:
        wqkv_op, sqkv = _quant_cols(f32(wqkv))
        wp_op, sp = _quant_cols(f32(wp))
        w1_op, s1 = _quant_cols(f32(w1))
        w2_op, s2 = _quant_cols(f32(w2))
        scale_args = [sqkv, sp, s1, s2]
        scale_specs = [
            pl.BlockSpec((s_comp * c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((hidden,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ]
    else:
        wqkv_op = jnp.asarray(wqkv, mm_dtype)
        wp_op = jnp.asarray(wp, mm_dtype)
        w1_op = jnp.asarray(w1, mm_dtype)
        w2_op = jnp.asarray(w2, mm_dtype)
        scale_args, scale_specs = [], []
    w_args = [
        f32(ln1_g), f32(ln1_b), wqkv_op, f32(bqkv), mb,
        wp_op, f32(bp), gamma1, f32(ln2_g), f32(ln2_b),
        w1_op, f32(b1), w2_op, f32(b2), gamma2,
    ]
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs + w_specs + scale_specs,
        out_specs=pl.BlockSpec((1, toks, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, toks, c), x_win.dtype),
        interpret=interpret,
    )(*args, *w_args, *scale_args)


# ---------------------------------------------------------------------------
# whole block
# ---------------------------------------------------------------------------
def _pick_group(nwin: int, n: int, cap: int = 512) -> int:
    """Largest window-group with G*N rows per program under ``cap`` and
    8-divisible (Mosaic second-to-last-dim rule; G=1 is always legal as the
    degenerate full-dim case). VIPTPU_GCVIT_CAP overrides the row cap (the
    masked GEMM's off-diagonal FLOP waste grows with G, so bigger is not
    automatically better — G=16 measured worse than G=8 at L1)."""
    import os as _os

    cap = int(_os.environ.get("VIPTPU_GCVIT_CAP", "0")) or cap
    g = 1
    for cand in range(1, nwin + 1):
        if nwin % cand == 0 and cand * n <= cap and (cand * n) % 8 == 0:
            g = cand
    return g


def fused_window_transformer_block(
    x_win: jax.Array,          # (B, nWin*N, C) window-ordered tokens
    *,
    heads: int,
    n: int,                    # tokens per window (ws*ws)
    ln1_g, ln1_b,
    wqkv, bqkv,                # (C, S*C), (S*C,)
    bias,                      # (heads, N, N) dense rel-pos bias
    wp, bp,                    # proj
    ln2_g, ln2_b,
    w1, b1, w2, b2,            # MLP
    gamma1=None, gamma2=None,  # layer-scale (None -> 1)
    scale: Optional[float] = None,
    q_global: Optional[jax.Array] = None,  # (B, N, C) global query tokens
    group: Optional[int] = None,
    eps: float = 1e-5,
    force_mm_dtype=None,
    mode: Optional[str] = None,
    pack: int = 1,             # lane-packed images per row (see pack_lanes);
    # x_win/q_global arrive packed, weights stay per-image (C/pack wide)
    interpret: bool = False,
) -> jax.Array:
    b, toks, c = x_win.shape
    b0, toks0 = b, toks  # pre-fold shape for the final reshape
    nwin = toks // n
    hd = (c // pack) // heads
    scale = scale if scale is not None else hd ** -0.5
    import os

    raw_mode = mode or os.environ.get("VIPTPU_GCVIT_ATTN") or None

    # Batch folding for single-window levels (GCViT L3/L4: the whole 14x14 /
    # 7x7 feature map is one window, so the grouped attention degenerates to
    # G=1 tiny GEMMs). Windows of DIFFERENT images are independent exactly
    # like windows of one image, so fold F images into the window axis. With
    # nwin==1 the global query is per-window anyway (one window per image),
    # so global-query attention is exactly regular attention with
    # q = q_global. 'masked' pays an F^2 score/bias block ((heads, F*N, F*N)
    # f32 — 9.8 MB at L4 fold=8, which overflows the ensemble compile's
    # scoped VMEM and caps L3 at fold=2), while 'batched' keeps bias at
    # (heads, N, N) and scores at (F, N, N) per head, LINEAR in F, so L3
    # folds 4x and L4 16x with zero off-diagonal softmax waste. Measured
    # (exp_member_ab, r3): the deeper batched folds LOSE at member level —
    # 2,745 img/s (batched L3x4/L4x16) / 2,020 (batched everywhere) vs
    # 3,067 masked — the (F, N, N) batch-dim dots underutilize the MXU more
    # than the masked GEMM's F^2 softmax waste costs. 'masked' stays the
    # default; VIPTPU_GCVIT_ATTN=batched|unroll remain available.
    fold = 1
    if group is None and nwin == 1:
        fold_mode = raw_mode or "masked"
        fold = _pick_group(b, n, cap=512 if fold_mode == "masked" else 1024)

        def _attn_vmem(f):
            qkv = 3 * f * n * c * 2
            if fold_mode == "masked":
                if _bias_synth(heads, f, n):
                    return (heads * n * n + (f * n) ** 2) * 4 + qkv
                return heads * (f * n) ** 2 * 4 + qkv
            return heads * n * n * 4 + 2 * f * n * n * 4 + qkv

        while fold > 1 and _attn_vmem(fold) > 6 * 2 ** 20 * vmem_scale():
            nxt = 1
            for cand in range(1, fold):
                if b % cand == 0 and (cand * n) % 8 == 0:
                    nxt = cand
            fold = nxt
        if fold > 1:
            b //= fold
            toks *= fold
            nwin = fold
            x_win = x_win.reshape(b, toks, c)
            if q_global is not None:
                q_global = jnp.asarray(q_global, x_win.dtype).reshape(b, toks, c)
        mode = fold_mode if fold > 1 else attn_mode(raw_mode)
    else:
        mode = attn_mode(raw_mode)

    g = group or _pick_group(nwin, n)

    # monoblock: whole block in one program per image (masked mode only,
    # unpacked — the packed L1 VMEM footprint exceeds the mono gate anyway).
    # VIPTPU_GCVIT_MONO=0 restores the three-kernel pipeline; the VMEM
    # model gates shapes whose per-program footprint would overflow.
    if (
        mode == "masked"
        and pack == 1
        and os.environ.get("VIPTPU_GCVIT_MONO", "1") == "1"
        and nwin % g == 0
        and _mono_vmem_model(
            toks, c, w1.shape[1], heads, g * n,
            3 if q_global is None else 2,
            jnp.dtype(x_win.dtype).itemsize, n=n,
        ) <= float(os.environ.get("VIPTPU_GCVIT_MONO_MB", "11"))
        * 2 ** 20 * vmem_scale()
    ):
        out = mono_window_transformer_block(
            x_win, heads=heads, n=n, ln1_g=ln1_g, ln1_b=ln1_b,
            wqkv=wqkv, bqkv=bqkv, bias=bias, wp=wp, bp=bp,
            ln2_g=ln2_g, ln2_b=ln2_b, w1=w1, b1=b1, w2=w2, b2=b2,
            gamma1=gamma1, gamma2=gamma2, scale=scale,
            q_global=None if q_global is None
            else jnp.asarray(q_global, x_win.dtype),
            group=g, eps=eps, force_mm_dtype=force_mm_dtype,
            interpret=interpret,
        )
        return out.reshape(b0, toks0, c)

    ones = jnp.ones((c // pack,), jnp.float32)
    gamma1 = ones if gamma1 is None else gamma1
    gamma2 = ones if gamma2 is None else gamma2

    x2 = x_win.reshape(b * toks, c)
    s_comp = 3 if q_global is None else 2
    parts = ln_dense(
        x2, ln1_g, ln1_b, wqkv, bqkv, eps=eps, split=s_comp,
        force_mm_dtype=force_mm_dtype, pack=pack, interpret=interpret
    )
    parts = [part.reshape(b, toks, c) for part in parts]
    if q_global is None:
        q, k, v = parts
        q_is_global = False
    else:
        k, v = parts
        q = jnp.asarray(q_global, x_win.dtype)
        # folded single-window levels: q already has one row per token slot
        # (image i's global query in slot i), i.e. it IS a regular q
        q_is_global = fold == 1
    wpp_env = os.environ.get("VIPTPU_GCVIT_WPP")
    attn = grouped_window_attention(
        q, k, v, heads, n, bias=bias, scale=scale, group=g,
        q_is_global=q_is_global, force_mm_dtype=force_mm_dtype,
        mode=mode, wpp=int(wpp_env) if wpp_env else None, pack=pack,
        interpret=interpret,
    )
    out = proj_res_ln_mlp(
        attn.reshape(b * toks, c), x2, wp, bp, gamma1, ln2_g, ln2_b,
        w1, b1, w2, b2, gamma2, eps=eps, force_mm_dtype=force_mm_dtype,
        pack=pack, interpret=interpret,
    )
    return out.reshape(b0, toks0, c)
