"""Fused ConvNeXt block kernel (inference hot path).

One ConvNeXt block is ``x + ls_gamma * pw2(gelu(pw1(LN(dw7x7(x)))))``
(reference tfimm architectures/convnext.py:147-229). Under plain XLA each
piece round-trips the (B, H, W, C) activation through HBM — at the team's
stride-2 stem resolution (99x99x96 for a 200x200 input) the block is
bandwidth-bound and measured ~24 ms per 256-batch on v5e (~4x slower than
its FLOP cost). This kernel performs the WHOLE block in one VMEM pass:

- grid = (batch, row-tiles); the block input is the full padded image
  (a few MB — fits VMEM for every ConvNeXt stage at 200/224-px inputs),
  revisited across that image's row-tiles so pallas fetches it once
- depthwise 7x7 = 49 unrolled VPU multiply-adds over halo'd row slices
  of the image ref (f32 accumulate)
- LayerNorm over C in f32, masked for lane padding (ops/norms.py parity)
- pointwise MLP as two MXU matmuls ((TILE*W, C) @ (C, 4C) and back),
  exact-erf GELU between, f32 accumulation
- layer-scale + residual, single store of the output row-tile

Channels are zero-padded to a 128-lane multiple before the call: Mosaic
mis-compiles bf16 matmuls whose LHS is a reshape of a lane-unaligned load
(observed on v5e: K=96/192 crash the backend compiler; K=384/768 are fine).
All padded weight/param lanes are zero so padded output lanes are exactly 0;
the caller slices them off. LN statistics divide by the REAL channel count
and use E[x^2]-E[x]^2 over the zero-padded lanes.

HBM traffic drops from ~10 tensor round-trips to read-once/write-once.
Inference-only: no custom VJP — training uses the unfused Flax path, whose
gradients XLA derives.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _erf(x):
    """erf from exp (Mosaic lowers neither erf nor erfc). Abramowitz-Stegun
    7.1.26 rational approximation, |error| <= 1.5e-7 — far below the bf16
    output precision."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


# erf(y) = y * P(y^2), odd Chebyshev-LSQ polynomial fit on |y| <= 3.2
# (erf(3.2) = 1 - 2.2e-6; inputs are clamped there). Degree-9 Horner in
# u = y^2: pure FMAs, no exp/reciprocal — the A&S form above spends most of
# its VPU budget on those two transcendentals. f32-evaluated |erf err|
# <= 3.6e-5 => |GELU err| <= 8.6e-5 absolute (fit: round-3 notes), ~50x
# below the bf16 activation precision the fused kernels already accept.
_ERF_POLY = (
    1.1283719539642334, -0.37597814202308655, 0.11232960224151611,
    -0.02617778442800045, 0.004737855866551399, -0.0006494964472949505,
    6.420582940336317e-05, -4.252056896802969e-06, 1.6692509063886973e-07,
    -2.9142208646248946e-09,
)


def _erf_poly(x):
    """Polynomial erf (|err| <= 3.6e-5): cheaper on the VPU than :func:`_erf`
    (no exp, no reciprocal). Beyond |x| >= 3.2 the result snaps to exactly
    +-1 (true |erf| there is 1 - 2.2e-6): without the snap, GELU's
    0.5*x*(1 +- (1 - eps)) tails would grow an ~eps*|x| error."""
    xc = jnp.clip(x, -3.2, 3.2)
    u = xc * xc
    p = jnp.full_like(u, _ERF_POLY[-1])
    for coef in _ERF_POLY[-2::-1]:
        p = p * u + coef
    return jnp.where(jnp.abs(x) < 3.2, xc * p, jnp.sign(x))


def _gelu(x, flavor: str = "erf"):
    """GELU on the VPU. 'erf' = A&S erf (|err|<=1.5e-7, costs an exp + a
    reciprocal); 'poly' = clamped odd-polynomial erf (|err|<=8.6e-5 absolute
    on GELU, pure FMAs — cheaper per element); 'sigmoid' = x*sigmoid(1.702x)
    (|err|<~1e-2 absolute — bf16-visible, experiment-only, used to price the
    erf polynomial's VPU cost)."""
    if flavor == "sigmoid":
        return x * jax.nn.sigmoid(1.702 * x)
    if flavor == "poly":
        return 0.5 * x * (1.0 + _erf_poly(x * 0.7071067811865476))
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def gelu_flavor(flavor: Optional[str] = None) -> str:
    """Resolve the GELU flavor for the fused kernels: explicit arg, else the
    VIPTPU_GELU env (erf|poly|sigmoid), else 'poly' — measured v5e 256-batch:
    +3% on the full ConvNeXt member (1,794 -> 1,850 img/s; GELU runs on ~1.7B
    hidden elements per batch), neutral on GCViT (3,207 vs 3,218); its 8.6e-5
    absolute error is ~50x below the bf16 activation precision these kernels
    already accept. VIPTPU_GELU=erf restores the A&S erf (|err|<=1.5e-7)."""
    return flavor or os.environ.get("VIPTPU_GELU", "poly")


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def vmem_scale() -> float:
    """Scale factor for the kernels' VMEM budget models. The fold/tile
    pickers were tuned against the default ~16 MB scoped-VMEM limit;
    launching with XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=<K> and
    VIPTPU_VMEM_MB=<K/1024> scales every budget proportionally so deeper
    image folds (bigger MXU GEMMs) become legal. v5e has 128 MB of VMEM
    total; the scoped limit is what pallas programs may address."""
    return float(os.environ.get("VIPTPU_VMEM_MB", "16")) / 16.0


def int8_kernels_enabled() -> bool:
    """VIPTPU_INT8_KERNELS=1 runs the fused kernels' dense GEMMs on the MXU
    int8 path (s8 x s8 -> s32, ~2.8x the bf16 dot rate — measured
    tools/int8_spike.py / int8_pallas_spike.py): the ConvNeXt whole-image
    kernel's MLP (this file), the ConvNeXt batch-lane kernel's lane-fold MLP
    (s1/s2), and the GCViT kernels' qkv/proj/MLP (gcvit_block.py, gated at
    C >= VIPTPU_GCVIT_INT8_MIN_C). Weights are quantized per-output-channel
    outside the kernel; activations are quantized per-grid-step with DYNAMIC
    abs-max scales computed on the VPU (strictly tighter than calibrated
    per-tensor scales — no calibration pass needed). Gate the default on the
    measured decision-flip rate (tools/flip_rate.py), exactly as for bf16."""
    return os.environ.get("VIPTPU_INT8_KERNELS", "0") == "1"


def _quant_cols(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 weights for a (K, N) operand:
    returns (q (K,N) int8, scale (N,) f32). All-zero (lane-pad) columns get
    scale 1 so the dequant stays exactly 0."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s


def _dyn_quant(y: jax.Array):
    """Dynamic per-block symmetric int8 of an f32 tile: (q, scale)."""
    amax = jnp.max(jnp.abs(y))
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(y * (1.0 / s)), -127, 127).astype(jnp.int8)
    return q, s


def _pick_row_tile(h: int, w: int, c: int, hidden: int) -> int:
    """Largest row tile whose f32 temporaries fit a ~4 MB scratch budget
    (the full image block + weights occupy VMEM separately)."""
    budget = int(4 * 1024 * 1024 * vmem_scale())
    best = 1
    for t in range(1, h + 1):
        acc = t * w * c * 4            # f32 dw/LN accumulator
        hid = t * w * hidden * 4       # f32 MLP hidden
        if acc + hid <= budget:
            best = t
    for t in range(best, 0, -1):  # prefer exact divisor: no ragged tile
        if h % t == 0:
            return t
    return best


def _pick_fold(bsz: int, h: int, w: int, cp: int, hp_: int,
               img_bytes: int, itemsize: int, w_itemsize: Optional[int] = None):
    """Choose (g, th, n_split) for the whole-image kernel: fold g images into
    each grid step so the MLP GEMM's M = g*th*w is large enough to utilize
    the 128x128 MXU (one image's row tile at stage 3/4 is only a few hundred
    rows — profiled 77 TF/s at s3), under a ~13 MB VMEM model:

      2 x g x image (Mosaic double-buffers the next fold's images)
      + fc1/fc2 weights + f32 dw/LN accumulator + y + (M, hp_/n_split) f32
      hidden chunk + 2 x output block.

    n_split chunks fc1's N dimension (each chunk GELU'd and contracted with
    its w2 row-block immediately) purely to bound the hidden scratch — same
    math, same total FLOPs. Returns the (g, th, n_split) with the largest M,
    tie-broken toward fewer splits; (1, th, 1) when folding doesn't help or
    bsz isn't divisible."""
    limit = int(13 * 1024 * 1024 * vmem_scale())
    w_bytes = (cp * hp_ + hp_ * cp) * (w_itemsize or itemsize) \
        + (hp_ + 3 * cp) * 4
    best = (1, _pick_row_tile(h, w, cp, hp_), 1)
    best_m = best[1] * w
    for g in (8, 4, 2):
        if bsz % g:
            continue
        for ns in (1, 2, 4):  # fewest splits first: ties keep ns small
            if hp_ % (ns * 128):
                continue
            for t in range(h, 0, -1):  # largest exact-divisor tile
                if h % t:
                    continue
                m = g * t * w
                if m <= best_m:
                    break
                fixed = 2 * g * img_bytes + w_bytes
                scratch = (g * t * w * cp * 4          # f32 dw/LN acc
                           + m * cp * itemsize          # y
                           + m * (hp_ // ns) * 4        # f32 hidden chunk
                           + 2 * m * cp * itemsize)     # double-buffered out
                if fixed + scratch <= limit:
                    best, best_m = (g, t, ns), m
                    break
    return best


def _kernel(x_ref, wdw_ref, dwb_ref, lng_ref, lnb_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, ls_ref, *rest, th: int, w: int, cp: int,
            c_real: int, eps: float, gelu: str = "erf", g: int = 1,
            n_split: int = 1, int8_mm: bool = False,
            tap_bf16: bool = False):
    if int8_mm:
        s1_ref, s2_ref, out_ref = rest
    else:
        (out_ref,) = rest
    r = pl.program_id(1)
    r0 = r * th

    # depthwise 7x7: 49 shifted multiply-adds on the VPU, f32 accumulate.
    # x_ref holds g full padded images; rows [r0+dy, r0+dy+th) are the
    # halo'd slice for output rows [r0, r0+th) of every image in the fold.
    # tap_bf16 (VIPTPU_DW_TAPS=bf16, experiment): accumulate in bf16 —
    # prices whether the v5e VPU packs bf16 FMAs 2x (taps profiled
    # 1.45 ms of the 4.64 ms s3 block). ~49-term bf16 accumulation feeds
    # the LN, which re-normalizes; flip-rate harness gates any promotion.
    tap_dtype = jnp.bfloat16 if tap_bf16 else jnp.float32
    acc = jnp.zeros((g, th, w, cp), tap_dtype)
    wdw = wdw_ref[:].astype(tap_dtype)
    for dy in range(7):
        rows = x_ref[:, pl.ds(r0 + dy, th)]  # (g, th, w+6, cp)
        rows = rows.astype(tap_dtype)
        for dx in range(7):
            acc = acc + rows[:, :, dx : dx + w, :] * wdw[dy, dx, :]
    acc = acc.astype(jnp.float32) + dwb_ref[:]

    # LayerNorm over the REAL channels (padded lanes are exactly 0, so the
    # plain sums are already masked; divide by c_real, var = E[x^2]-E[x]^2)
    inv_c = 1.0 / c_real
    mean = acc.sum(axis=-1, keepdims=True) * inv_c
    var = (acc * acc).sum(axis=-1, keepdims=True) * inv_c - mean * mean
    y = (acc - mean) * jax.lax.rsqrt(var + eps)
    y = y * lng_ref[:] + lnb_ref[:]  # padded gamma/beta are 0 -> y_pad = 0

    # pointwise MLP on the MXU. The g-fold concatenates every image's rows
    # into ONE (g*th*w, cp) GEMM: at stage-3/4 extents a single image's tile
    # is only a few hundred rows, which underutilizes the 128x128 systolic
    # array (profiled 77 TF/s at s3); the fold multiplies M. The hidden
    # activation is produced in n_split N-chunks of fc1 (each GELU'd and
    # immediately contracted with the matching w2 row-block) so the f32
    # hidden scratch is (M, hidden/n_split) — same math, same FLOPs, chunked
    # f32 accumulation of fc2.
    hp_ = w1_ref.shape[1]
    chunk = hp_ // n_split
    o = jnp.zeros((g * th * w, cp), jnp.float32)
    if int8_mm:
        # dynamic per-tile activation scale (abs-max on the VPU — tighter
        # than any calibrated per-tensor scale), per-output-channel weight
        # scales from the host-side quantization; s8xs8->s32 on the MXU
        qy, sy = _dyn_quant(y.reshape(g * th * w, cp))
        for k in range(n_split):
            acc = jnp.dot(qy, w1_ref[:, k * chunk : (k + 1) * chunk],
                          preferred_element_type=jnp.int32)
            h = acc.astype(jnp.float32) * (sy * s1_ref[pl.ds(k * chunk, chunk)])
            h = _gelu(h + b1_ref[pl.ds(k * chunk, chunk)], gelu)
            qh, sh = _dyn_quant(h)
            acc2 = jnp.dot(qh, w2_ref[pl.ds(k * chunk, chunk), :],
                           preferred_element_type=jnp.int32)
            o = o + acc2.astype(jnp.float32) * (sh * s2_ref[:])
    else:
        y2 = y.astype(out_ref.dtype).reshape(g * th * w, cp)
        for k in range(n_split):
            h = jnp.dot(y2, w1_ref[:, k * chunk : (k + 1) * chunk],
                        preferred_element_type=jnp.float32)
            h = h + b1_ref[pl.ds(k * chunk, chunk)]
            h = _gelu(h, gelu)
            o = o + jnp.dot(h.astype(out_ref.dtype),
                            w2_ref[pl.ds(k * chunk, chunk), :],
                            preferred_element_type=jnp.float32)
    o = o + b2_ref[:]

    # layer-scale + residual from the image centre
    res = x_ref[:, pl.ds(r0 + 3, th), 3 : 3 + w, :].astype(jnp.float32)
    o = o.reshape(g, th, w, cp) * ls_ref[:] + res
    out_ref[:] = o.astype(out_ref.dtype)


def _lnmlp_kernel(x_ref, r_ref, lng_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                  b2_ref, ls_ref, o_ref, *, c_real: int, eps: float,
                  gelu: str = "erf"):
    xf = x_ref[:].astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * lng_ref[:] + lnb_ref[:]
    h = jnp.dot(y.astype(o_ref.dtype), w1_ref[:],
                preferred_element_type=jnp.float32)
    h = h + b1_ref[:]
    h = _gelu(h, gelu)
    o = jnp.dot(h.astype(o_ref.dtype), w2_ref[:],
                preferred_element_type=jnp.float32)
    o = (o + b2_ref[:]) * ls_ref[:]
    o_ref[:] = (o + r_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def fused_ln_mlp_residual(
    dw_out: jax.Array,      # (B, H, W, C) — depthwise-conv output
    residual: jax.Array,    # (B, H, W, C) — the block input
    ln_gamma, ln_beta, w1, b1, w2, b2, ls_gamma,
    *,
    eps: float = 1e-6,
    row_tile: int = 1024,
    gelu: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """LN -> MLP -> layer-scale -> +residual over flattened positions (the
    post-conv two thirds of a ConvNeXt block) in one VMEM pass. Positions are
    independent, so this is a simple 1-D row tiling with no halo."""
    bsz, h, w, c = dw_out.shape
    n = bsz * h * w
    x2 = dw_out.reshape(n, c)
    r2 = residual.reshape(n, c)
    hidden = w1.shape[1]
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    kern = functools.partial(_lnmlp_kernel, c_real=c, eps=eps,
                             gelu=gelu_flavor(gelu))
    t = row_tile
    out = pl.pallas_call(
        kern,
        grid=(pl.cdiv(n, t),),
        in_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0)),
            pl.BlockSpec((t, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden,), lambda i: (0,)),
            pl.BlockSpec((hidden, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((t, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), dw_out.dtype),
        interpret=interpret,
    )(
        x2, r2, f32(ln_gamma), f32(ln_beta),
        jnp.asarray(w1, dw_out.dtype), f32(b1),
        jnp.asarray(w2, dw_out.dtype), f32(b2), f32(ls_gamma),
    )
    return out.reshape(bsz, h, w, c)


def _dyn_quant_cols(y):
    """Dynamic PER-COLUMN symmetric int8 of an f32 (K, N) tile: (q, (1, N)
    scales). The batch-lane layout contracts over K (sublanes), so per-
    column = per-batch-position scales, which factor out of the GEMM
    exactly: w_s8 @ q * (s_row * s_col)."""
    amax = jnp.max(jnp.abs(y), axis=0, keepdims=True)
    s = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(y * (1.0 / s)), -127, 127).astype(jnp.int8)
    return q, s


def _lnmlp_batchlane_kernel(x_ref, r_ref, dwb_ref, g_ref, b_ref, w1t_ref,
                            b1_ref, w2t_ref, b2_ref, ls_ref, *rest,
                            tp: int, eps: float, gelu: str = "erf",
                            lane_fold: bool = True, int8_mm: bool = False):
    """LN+MLP+layer-scale+residual with BATCH as the lane dimension.

    Blocks are (tp, C, B): B is lane-aligned by construction (batch 256), C
    rides sublanes. Channel params come in as (C, 1)/(hidden, 1) column
    vectors so no lane<->sublane relayout happens in-kernel. The dots
    contract over C with DIRECT-loaded (hidden, C) weights — legal in bf16
    even at C % 128 != 0 (the v5e Mosaic crash is specific to reshapes of
    lane-unaligned loads; these are direct 2-D loads).

    ``lane_fold`` concatenates the tp positions' LN'd (C, B) tiles along
    LANES into one (C, tp*B) MLP operand: the per-position loop issues
    ~19,600 (hidden, C)@(C, 256) dots per s1 block and measured 39 TF/s on
    370 GFLOP of GEMMs — N=tp*B amortizes the per-dot pipeline cost and
    multiplies the lane tiles 8x. Channel-param columns broadcast over the
    wider lane extent unchanged; the result is sliced back per position for
    the residual adds (lane slices at B-multiples are tile-aligned).

    ``int8_mm`` (lane-fold path only): both MLP GEMMs run s8 x s8 -> s32 —
    weights per-output-channel (per-ROW of the transposed operands; scale
    COLUMNS (hidden, 1)/(C, 1) in s1_ref/s2_ref), activations with dynamic
    per-COLUMN (= per batch position) scales; both factor out of the GEMM
    exactly."""
    if int8_mm:
        s1_ref, s2_ref, o_ref = rest
    else:
        (o_ref,) = rest
    ys = []
    for p in range(tp):
        # the depthwise-conv bias rides in here (one (C,1) broadcast-add on
        # data already in VMEM) instead of a separate full-array HBM pass
        # after the conv (profiled 1.46 ms per s1 block)
        y = x_ref[p].astype(jnp.float32) + dwb_ref[:]  # (C, B)
        mean = y.mean(axis=0, keepdims=True)          # LN over C (sublanes)
        var = ((y - mean) ** 2).mean(axis=0, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + eps)
        y = y * g_ref[:] + b_ref[:]                   # (C,1) broadcasts lanes
        if not lane_fold:
            h = jnp.dot(w1t_ref[:], y.astype(o_ref.dtype),
                        preferred_element_type=jnp.float32)   # (hidden, B)
            h = h + b1_ref[:]
            h = _gelu(h, gelu)
            o = jnp.dot(w2t_ref[:], h.astype(o_ref.dtype),
                        preferred_element_type=jnp.float32)   # (C, B)
            o = (o + b2_ref[:]) * ls_ref[:]
            o_ref[p] = (o + r_ref[p].astype(jnp.float32)).astype(o_ref.dtype)
        else:
            ys.append(y if int8_mm else y.astype(o_ref.dtype))
    if not lane_fold:
        return
    bsz = x_ref.shape[2]
    ybig = ys[0] if tp == 1 else jnp.concatenate(ys, axis=1)  # (C, tp*B)
    if int8_mm:
        qy, sy = _dyn_quant_cols(ybig)
        h = jnp.dot(w1t_ref[:], qy, preferred_element_type=jnp.int32)
        h = h.astype(jnp.float32) * (s1_ref[:] * sy) + b1_ref[:]
        h = _gelu(h, gelu)
        qh, sh = _dyn_quant_cols(h)
        o = jnp.dot(w2t_ref[:], qh, preferred_element_type=jnp.int32)
        o = (o.astype(jnp.float32) * (s2_ref[:] * sh) + b2_ref[:]) * ls_ref[:]
    else:
        h = jnp.dot(w1t_ref[:], ybig, preferred_element_type=jnp.float32)
        h = h + b1_ref[:]
        h = _gelu(h, gelu)
        o = jnp.dot(w2t_ref[:], h.astype(o_ref.dtype),
                    preferred_element_type=jnp.float32)       # (C, tp*B)
        o = (o + b2_ref[:]) * ls_ref[:]
    for p in range(tp):
        op = jax.lax.slice(o, (0, p * bsz), (o.shape[0], (p + 1) * bsz))
        o_ref[p] = (op + r_ref[p].astype(jnp.float32)).astype(o_ref.dtype)


def fused_ln_mlp_residual_batchlane(
    dw_out: jax.Array,      # (H, W, C, B) — depthwise-conv output, batch-last
    residual: jax.Array,    # (H, W, C, B) — the block input
    ln_gamma, ln_beta, w1, b1, w2, b2, ls_gamma,
    *,
    dw_bias=None,           # (C,) depthwise bias folded into the LN pass
    eps: float = 1e-6,
    row_tile: int = 8,
    gelu: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """Batch-last twin of :func:`fused_ln_mlp_residual` for the narrow
    stages. In (H, W, C, B) layout the batch (256) is the lane dimension —
    perfectly 128-aligned regardless of C — and the MLP contracts over C on
    the sublane axis with direct-loaded transposed weights, so the bf16 MXU
    path is legal at C=96/192 where the row-major kernel must lane-pad.
    Measured v5e (256-batch, marginal): 13.3 ms/block at 99x99x96 vs 29.4 for
    the padded row-major kernel and ~24 for XLA; 1-4 ms at 49x49x192 vs 14.4
    (tools/exp_convnext_s12.py). Weights arrive in the model's (C, hidden)
    convention and are transposed here (tiny, fused by XLA into the feed)."""
    h_, w_, c, b = dw_out.shape
    n = h_ * w_
    x2 = dw_out.reshape(n, c, b)
    r2 = residual.reshape(n, c, b)
    hidden = w1.shape[1]
    # VIPTPU_BATCHLANE_TP overrides the positions-per-grid-step fold (the
    # lane-concat GEMM's N = tp*B); the default 8 keeps the f32 hidden
    # scratch (hidden, tp*B) within ~6.5 MB at s2's hidden=768. Larger tp
    # at s1 (hidden=384) doubles N for the same scratch.
    env_tp = int(os.environ.get("VIPTPU_BATCHLANE_TP", "0"))
    if env_tp and hidden * env_tp * b * 4 <= 13 * 2**20 * vmem_scale():
        row_tile = env_tp  # ragged final tile handled by the cdiv grid
    lane_fold = os.environ.get("VIPTPU_BATCHLANE_FOLD", "1") == "1"
    int8_mm = lane_fold and int8_kernels_enabled()
    col = lambda a: jnp.asarray(a, jnp.float32)[:, None]  # noqa: E731
    kern = functools.partial(
        _lnmlp_batchlane_kernel, tp=row_tile, eps=eps,
        gelu=gelu_flavor(gelu), lane_fold=lane_fold, int8_mm=int8_mm,
    )
    dwb = (jnp.zeros((c,), jnp.float32) if dw_bias is None
           else jnp.asarray(dw_bias, jnp.float32))
    if int8_mm:
        # per-output-channel s8 (per ROW of the transposed operands): reuse
        # the column quantizer on the model-layout weights, then transpose
        w1q, s1 = _quant_cols(jnp.asarray(w1, jnp.float32))
        w2q, s2 = _quant_cols(jnp.asarray(w2, jnp.float32))
        w1_op, w2_op = w1q.T, w2q.T
        extra_args = [s1[:, None], s2[:, None]]
        extra_specs = [pl.BlockSpec((hidden, 1), lambda i: (0, 0)),
                       pl.BlockSpec((c, 1), lambda i: (0, 0))]
    else:
        w1_op = jnp.asarray(w1, dw_out.dtype).T
        w2_op = jnp.asarray(w2, dw_out.dtype).T
        extra_args, extra_specs = [], []
    out = pl.pallas_call(
        kern,
        grid=(pl.cdiv(n, row_tile),),
        in_specs=[
            pl.BlockSpec((row_tile, c, b), lambda i: (i, 0, 0)),
            pl.BlockSpec((row_tile, c, b), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((hidden, c), lambda i: (0, 0)),
            pl.BlockSpec((hidden, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, hidden), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((row_tile, c, b), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c, b), dw_out.dtype),
        interpret=interpret,
    )(
        x2, r2, dwb[:, None], col(ln_gamma), col(ln_beta),
        w1_op, col(b1), w2_op, col(b2), col(ls_gamma), *extra_args,
    )
    return out.reshape(h_, w_, c, b)


def blockdiag_dw7x7_hwcn(x: jax.Array, dw_kernel: jax.Array,
                         dw_bias: Optional[jax.Array], group: int = 8
                         ) -> jax.Array:
    """Batch-last twin of :func:`blockdiag_dw7x7`: depthwise 7x7 on a
    (H, W, C, N) array via HWCN dimension numbers, block-diagonal grouped
    kernel (off-diagonal taps exactly zero => numerically identical).
    ``dw_bias=None`` skips the bias add (the fused block folds it into the
    LN/MLP kernel's VMEM pass instead — the standalone add profiled as a
    1.46 ms full-array HBM round-trip per s1 block). VIPTPU_DW_GROUP
    overrides the group size (the conv's MXU FLOP waste scales with group,
    but XLA's grouped-conv channel-split relayout — profiled 4.5 ms per s1
    block at group 8, i.e. a (12, 8) split — may prefer wider blocks)."""
    c = x.shape[2]
    group = int(os.environ.get("VIPTPU_DW_GROUP", "0")) or group
    g = group if c % group == 0 else 1
    if g == 1:
        kern = dw_kernel[:, :, None, :]
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (g, c), 0)
        chan = jax.lax.broadcasted_iota(jnp.int32, (g, c), 1)
        mask = (chan % g == lane).astype(dw_kernel.dtype)
        kern = dw_kernel[:, :, None, :] * mask[None, None]
    out = jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("HWCN", "HWIO", "HWCN"),
        feature_group_count=c // g,
    )
    if dw_bias is None:
        return out
    return out + dw_bias.astype(out.dtype)[:, None]


def fused_convnext_block_batchlane(
    xt: jax.Array,          # (H, W, C, B) batch-last block input
    dw_kernel: jax.Array,   # (7, 7, C)
    dw_bias: jax.Array,     # (C,)
    ln_gamma, ln_beta, w1, b1, w2, b2, ls_gamma,
    *,
    eps: float = 1e-6,
    gelu: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """Whole ConvNeXt block in batch-last land: block-diagonal depthwise via
    the conv unit (HWCN dimension numbers) + the batch-lane LN/MLP kernel.
    Both halves live in the same layout domain, so none of the XLA<->pallas
    relayouts that sank the row-major hybrid (83 ms/block, NOTES_r2) occur.
    The production choice for ConvNeXt stages with C < 256."""
    dw = blockdiag_dw7x7_hwcn(xt, dw_kernel, None)
    return fused_ln_mlp_residual_batchlane(
        dw, xt, ln_gamma, ln_beta, w1, b1, w2, b2, ls_gamma,
        dw_bias=dw_bias, eps=eps, gelu=gelu, interpret=interpret,
    )


def blockdiag_dw7x7(x: jax.Array, dw_kernel: jax.Array, dw_bias: jax.Array,
                    group: int = 8) -> jax.Array:
    """Depthwise 7x7 via a block-diagonal grouped conv. XLA's true-depthwise
    lowering (feature_group_count=C) runs ~9.8 ms on a (256,99,99,96) bf16
    batch on v5e; embedding the same taps on the diagonal of a
    (7,7,group,C) kernel with feature_group_count=C/group lands on the MXU
    and measures ~6.1 ms at group=8. Numerically identical (off-diagonal
    taps are exactly zero)."""
    c = x.shape[-1]
    g = group if c % group == 0 else 1
    if g == 1:
        kern = dw_kernel[:, :, None, :]
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (g, c), 0)
        chan = jax.lax.broadcasted_iota(jnp.int32, (g, c), 1)
        mask = (chan % g == lane).astype(dw_kernel.dtype)
        kern = dw_kernel[:, :, None, :] * mask[None, None]
    out = jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c // g,
    )
    return out + dw_bias.astype(out.dtype)


def fused_convnext_block(
    x: jax.Array,
    dw_kernel: jax.Array,   # (7, 7, C)
    dw_bias: jax.Array,     # (C,)
    ln_gamma: jax.Array,    # (C,)
    ln_beta: jax.Array,     # (C,)
    w1: jax.Array,          # (C, hidden)
    b1: jax.Array,          # (hidden,)
    w2: jax.Array,          # (hidden, C)
    b2: jax.Array,          # (C,)
    ls_gamma: jax.Array,    # (C,) layer-scale
    *,
    eps: float = 1e-6,
    row_tile: Optional[int] = None,
    gelu: Optional[str] = None,
    group: Optional[int] = None,
    n_split: Optional[int] = None,
    int8_mm: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused whole ConvNeXt block; x is (B, H, W, C), returns same.

    Pays off at C >= 256 (stages 3-4: few positions, wide channels), where
    the VPU depthwise taps are cheap and the single VMEM pass beats XLA
    ~1.5x (measured v5e, 256-batch: 5.3 vs 8.0 ms and 3.6 vs 5.2 ms per
    block). At stage-1/2 widths (99x99x96, 49x49x192) the taps are VPU-bound
    (~16 GFLOP) and this kernel only ties XLA (25.5 vs 24 ms) — the model
    gates it to C >= 256 (models/convnext.py). Hybrid XLA-conv + pallas-MLP
    splits lose badly to layout relayouts at every boundary (83 ms/block
    measured), which is why the dispatch is all-or-nothing per block.

    ``group`` folds that many images into each grid step so the MLP GEMM
    sees M = group*th*W rows (one s3 image tile alone is a few hundred rows
    — profiled 77 TF/s on the MXU); ``n_split`` chunks fc1's N dimension to
    bound the f32 hidden scratch (identical math). Both default to
    :func:`_pick_fold`'s VMEM-model choice; VIPTPU_CONVNEXT_GROUP overrides
    the fold for experiments.
    """
    bsz, h, w, c = x.shape
    hidden = w1.shape[1]
    cp = _round_up(c, 128)
    hp_ = _round_up(hidden, 128)
    # pre-pad: 3 halo rows/cols each side, channels to the 128-lane multiple
    # (XLA fuses the pad into the producer); fold geometry needs the final
    # padded image size, so compute it before picking (g, th, n_split)
    if int8_mm is None:
        int8_mm = int8_kernels_enabled()
    img_bytes = (h + 6) * (w + 6) * cp * jnp.dtype(x.dtype).itemsize
    g, th_auto, ns_auto = _pick_fold(bsz, h, w, cp, hp_, img_bytes,
                                     jnp.dtype(x.dtype).itemsize,
                                     w_itemsize=1 if int8_mm else None)
    env_g = int(os.environ.get("VIPTPU_CONVNEXT_GROUP", "0"))
    if env_g:
        g = env_g if bsz % env_g == 0 else 1
    if group:
        g = group if bsz % group == 0 else 1
    n_split = n_split or ns_auto
    if hp_ % (n_split * 128):
        n_split = 1
    th = row_tile or th_auto
    n_tiles = pl.cdiv(h, th)
    pad_rows = n_tiles * th - h
    xp = jnp.pad(x, ((0, 0), (3, 3 + pad_rows), (3, 3), (0, cp - c)))
    hrows, wcols = xp.shape[1], xp.shape[2]

    def padded(a, target_shape):
        pads = tuple((0, t - s) for s, t in zip(a.shape, target_shape))
        return jnp.pad(a, pads)

    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    kern = functools.partial(_kernel, th=th, w=w, cp=cp, c_real=c, eps=eps,
                             gelu=gelu_flavor(gelu), g=g, n_split=n_split,
                             int8_mm=int8_mm,
                             tap_bf16=os.environ.get(
                                 "VIPTPU_DW_TAPS", "f32") == "bf16")

    if int8_mm:
        # per-output-channel int8 weights (host-side; XLA runs this once per
        # dispatch and fuses it into the operand feed)
        w1_op, s1 = _quant_cols(padded(f32(w1), (cp, hp_)))
        w2_op, s2 = _quant_cols(padded(f32(w2), (hp_, cp)))
        extra_ops = [s1, s2]
        extra_specs = [pl.BlockSpec((hp_,), lambda b, r: (0,)),
                       pl.BlockSpec((cp,), lambda b, r: (0,))]
    else:
        w1_op = padded(jnp.asarray(w1, x.dtype), (cp, hp_))
        w2_op = padded(jnp.asarray(w2, x.dtype), (hp_, cp))
        extra_ops, extra_specs = [], []

    out = pl.pallas_call(
        kern,
        grid=(bsz // g, n_tiles),
        in_specs=[
            # g full padded images, revisited across the fold's row-tiles —
            # pallas fetches them into VMEM once per fold index
            pl.BlockSpec((g, hrows, wcols, cp), lambda b, r: (b, 0, 0, 0)),
            pl.BlockSpec((7, 7, cp), lambda b, r: (0, 0, 0)),
            pl.BlockSpec((cp,), lambda b, r: (0,)),
            pl.BlockSpec((cp,), lambda b, r: (0,)),
            pl.BlockSpec((cp,), lambda b, r: (0,)),
            pl.BlockSpec((cp, hp_), lambda b, r: (0, 0)),
            pl.BlockSpec((hp_,), lambda b, r: (0,)),
            pl.BlockSpec((hp_, cp), lambda b, r: (0, 0)),
            pl.BlockSpec((cp,), lambda b, r: (0,)),
            pl.BlockSpec((cp,), lambda b, r: (0,)),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((g, th, w, cp), lambda b, r: (b, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cp), x.dtype),
        interpret=interpret,
    )(
        xp,
        padded(f32(dw_kernel), (7, 7, cp)),
        padded(f32(dw_bias), (cp,)),
        padded(f32(ln_gamma), (cp,)),
        padded(f32(ln_beta), (cp,)),
        w1_op,
        padded(f32(b1), (hp_,)),
        w2_op,
        padded(f32(b2), (cp,)),
        padded(f32(ls_gamma), (cp,)),
        *extra_ops,
    )
    return out[..., :c] if cp != c else out
