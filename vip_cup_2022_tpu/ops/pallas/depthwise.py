"""Depthwise conv as one pallas tap-loop pass (TPU inference hot path).

XLA's true-depthwise lowering (feature_group_count=C) is the dominant cost
of the EfficientNet members: profiled 28 of EfficientNetV1B4's 36 ms/forward
(tools/profile_member.py), with the 5x5 stacks at 14x14 spatial running ~7x
off the HBM bandwidth floor. A depthwise conv is arithmetically a VPU op
(per-tap shifted multiply-accumulate, no channel contraction), so the MXU
cannot help without the 8x FLOP waste of the block-diagonal grouped form
(measured negative for EfficientNet, NOTES_r3.md). This kernel keeps the
native NHWC layout (no relayout in or out), reads the padded input once per
image group, and runs the kh*kw taps as f32 FMAs over full (W, C) tiles.

Stride-1 SAME/explicit-padded call sites only (EfficientNet's non-strided
MBConv dw convs; strided blocks stay on XLA). Reference behavior:
keras DepthwiseConv2D(use_bias=False) as used by
keras_cv_attention_models common_layers.depthwise_conv2d_no_bias.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_VMEM_BUDGET = 8 * 2 ** 20  # bytes of per-step operand footprint to target


def _dw_kernel(x_ref, w_ref, o_ref, *, kh, kw, h, w):
    x = x_ref[:]                                   # (ipg, h+kh-1, w+kw-1, C)
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            tap = jax.lax.slice(
                x, (0, dy, dx, 0), (x.shape[0], dy + h, dx + w, x.shape[3]))
            term = tap.astype(jnp.float32) * w_ref[dy, dx]
            acc = term if acc is None else acc + term
    o_ref[:] = acc.astype(o_ref.dtype)


def depthwise_conv_nhwc(x, kern, *, padding, interpret=False):
    """Stride-1 depthwise conv over NHWC ``x`` with kernel ``kern`` of shape
    (kh, kw, 1, C) (flax ``nn.Conv(feature_group_count=C)`` layout) and
    ``padding`` as a ((top, bottom), (left, right)) pair. Returns x.dtype.

    The halo pad is materialized by XLA outside the kernel (cheap at the
    small-spatial shapes this targets); the kernel grid walks image groups
    sized to keep the per-step operand footprint under ~8 MB of VMEM.
    """
    b, h, w, c = x.shape
    kh, kw = kern.shape[0], kern.shape[1]
    (pt, pb), (pl_, pr) = padding
    hp, wp = h + pt + pb, w + pl_ + pr
    ho, wo = hp - kh + 1, wp - kw + 1
    if pt or pb or pl_ or pr:
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
    wf = jnp.asarray(kern, jnp.float32).reshape(kh, kw, c)

    itemsize = jnp.dtype(x.dtype).itemsize
    per_img = (hp * wp + ho * wo) * c * itemsize + ho * wo * c * 4  # + f32 acc
    ipg = max(1, min(b, _VMEM_BUDGET // max(per_img, 1)))
    while b % ipg:
        ipg -= 1

    return pl.pallas_call(
        functools.partial(_dw_kernel, kh=kh, kw=kw, h=ho, w=wo),
        grid=(b // ipg,),
        in_specs=[
            pl.BlockSpec((ipg, hp, wp, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((kh, kw, c), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((ipg, ho, wo, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, c), x.dtype),
        interpret=interpret,
    )(x, wf)
