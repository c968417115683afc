"""Pallas TPU kernel: fused decode-side preprocessing.

The device half of the input pipeline (SURVEY.md §3.2 / BASELINE north star):
uint8 HWC batch -> f32 cast -> /255 -> bicubic resize (two MXU matmuls with
the TF-parity matrices from ops/resize.py) -> mean/std normalize -> compute
dtype, all in one VMEM-resident pass per image. The XLA fallback path does the
same ops unfused (each intermediate written back to HBM).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..resize import resize_matrix

try:
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _preprocess_kernel(u8_ref, wh_ref, ww_ref, o_ref, *, mean, std, out_dtype):
    h_in, w_in, c = u8_ref.shape[1], u8_ref.shape[2], u8_ref.shape[3]
    h_out, w_out = o_ref.shape[1], o_ref.shape[2]
    img = u8_ref[0].astype(jnp.float32) * (1.0 / 255.0)  # (Hi, Wi, C)
    # rows: (Ho, Hi) @ (Hi, Wi*C)
    t = jnp.dot(wh_ref[:], img.reshape(h_in, w_in * c), preferred_element_type=jnp.float32)
    t = t.reshape(h_out, w_in, c)
    # cols: contract W_in: (Wo, Wi) @ (Wi, Ho*C)
    t = jnp.transpose(t, (1, 0, 2)).reshape(w_in, h_out * c)
    t = jnp.dot(ww_ref[:], t, preferred_element_type=jnp.float32)
    t = jnp.transpose(t.reshape(w_out, h_out, c), (1, 0, 2))
    if mean is not None:
        # per-channel python scalars (array constants can't be captured)
        t = jnp.stack(
            [(t[:, :, i] - float(mean[i])) * float(1.0 / std[i]) for i in range(c)],
            axis=-1,
        )
    o_ref[0] = t.astype(out_dtype)


def fused_preprocess(
    u8: jnp.ndarray,
    out_size: Tuple[int, int],
    mean: Optional[Sequence[float]] = None,
    std: Optional[Sequence[float]] = None,
    out_dtype=jnp.bfloat16,
    method: str = "bicubic",
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """uint8 (B, Hi, Wi, C) -> normalized (B, Ho, Wo, C) in ``out_dtype``."""
    b, h_in, w_in, c = u8.shape
    h_out, w_out = out_size
    if use_pallas is None:
        use_pallas = _HAS_PALLAS and jax.default_backend() == "tpu"

    if not (use_pallas or interpret) or (h_in, w_in) == (h_out, w_out):
        from ..resize import resize

        x = u8.astype(jnp.float32) / 255.0
        x = resize(x, out_size, method=method)
        if mean is not None:
            x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
        return x.astype(out_dtype)

    wh = jnp.asarray(resize_matrix(h_in, h_out, method))
    ww = jnp.asarray(resize_matrix(w_in, w_out, method))
    kernel = functools.partial(
        _preprocess_kernel,
        mean=None if mean is None else tuple(mean),
        std=None if std is None else tuple(std),
        out_dtype=out_dtype,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, c), out_dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h_in, w_in, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((h_out, h_in), lambda i: (0, 0)),
            pl.BlockSpec((w_out, w_in), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h_out, w_out, c), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
    )(u8, wh, ww)
