"""Image resize with TF-v2 numerics, formulated as two matmuls.

The reference resizes with ``tf.image.resize(img, size, method='bicubic')``
(dataset/dataset.py:33-34, method set at main.py:222). Matching those numerics
is accuracy-critical (SURVEY.md §7 "hard parts": the 0.1% parity budget is
dominated by the data path).

TF-v2 semantics reproduced here:
- half-pixel centers: ``src = (dst + 0.5) * in/out - 0.5``
- bicubic = Keys kernel with A = -0.5
- ``antialias=False`` by default (no kernel widening on downscale)
- taps outside the image are index-clamped (weights kept)

TPU-native formulation: resampling along an axis is a sparse linear map; we
materialize it as a dense (out, in) matrix at trace time (static shapes) and
apply it with two ``jnp.einsum`` contractions — both land on the MXU, fusing
with the surrounding normalize ops, instead of gather loops on the VPU.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np


def _keys_cubic(t: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic kernel, A = -0.5 (TF-v2 resize uses the scale_and_translate
    path: Keys A=-0.5, out-of-range taps dropped, weights renormalized —
    verified empirically against tf.image.resize delta responses)."""
    t = np.abs(t)
    out = np.where(
        t <= 1.0,
        ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0,
        np.where(t < 2.0, ((t - 5.0) * t + 8.0) * t * a - 4.0 * a, 0.0),
    )
    return out


def _triangle(t: np.ndarray) -> np.ndarray:
    t = np.abs(t)
    return np.maximum(0.0, 1.0 - t)


_KERNELS = {
    "bicubic": (_keys_cubic, 2.0),
    "bilinear": (_triangle, 1.0),
}


@functools.lru_cache(maxsize=128)
def resize_matrix(in_size: int, out_size: int, method: str = "bicubic", antialias: bool = False) -> np.ndarray:
    """Dense (out_size, in_size) resampling matrix with TF-v2 numerics."""
    if method == "nearest":
        idx = np.minimum(
            (np.arange(out_size) + 0.5) * (in_size / out_size), in_size - 1
        ).astype(np.int64)
        mat = np.zeros((out_size, in_size), dtype=np.float32)
        mat[np.arange(out_size), idx] = 1.0
        return mat

    kernel_fn, radius = _KERNELS[method]
    scale = in_size / out_size
    kscale = max(1.0, scale) if antialias else 1.0
    r = radius * kscale

    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5  # half-pixel centers
    if method == "bicubic" and not antialias:
        # tf.image.resize's non-antialiased bicubic is the legacy
        # ResizeBicubic op: the fractional offset is quantized to a
        # 1024-entry coefficient table (lrintf(frac * 1024)) before the Keys
        # weights are computed. Reproduce for bit-level parity.
        fl = np.floor(src)
        frac = np.round((src - fl) * 1024.0) / 1024.0
        src = fl + frac
    lo = np.floor(src - r).astype(np.int64) + 1
    ntaps = int(np.ceil(2.0 * r)) + 1
    taps = lo[:, None] + np.arange(ntaps)[None, :]
    weights = kernel_fn((src[:, None] - taps) / kscale) / kscale
    # TF boundary rule: out-of-range taps are dropped, the rest renormalized
    valid = (taps >= 0) & (taps < in_size)
    weights = np.where(valid, weights, 0.0)
    wsum = weights.sum(axis=1, keepdims=True)
    weights = weights / np.where(wsum == 0.0, 1.0, wsum)

    taps_clamped = np.clip(taps, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.repeat(np.arange(out_size), ntaps), taps_clamped.ravel()), weights.ravel())
    return mat.astype(np.float32)


def resize(
    x: jnp.ndarray,
    size: Union[int, Sequence[int]],
    method: str = "bicubic",
    antialias: bool = False,
) -> jnp.ndarray:
    """Resize NHWC (or HWC) images to ``size`` = (H, W).

    Two MXU contractions: rows then columns. Identity when the size already
    matches (the reference skips resize for 200x200 inputs —
    dataset/dataset.py:33-34).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = (size, size) if isinstance(size, int) else tuple(size)
    if (h_in, w_in) == (h_out, w_out):
        return x[0] if squeeze else x

    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if h_in != h_out:
        wh = jnp.asarray(resize_matrix(h_in, h_out, method, antialias))
        xf = jnp.einsum("oh,bhwc->bowc", wh, xf)
    if w_in != w_out:
        ww = jnp.asarray(resize_matrix(w_in, w_out, method, antialias))
        xf = jnp.einsum("ow,bhwc->bhoc", ww, xf)
    out = xf.astype(dtype)
    return out[0] if squeeze else out


def resize_positional_embedding(
    pos_emb: jnp.ndarray, src_grid: Tuple[int, int], dst_grid: Tuple[int, int], num_prefix_tokens: int = 1
) -> jnp.ndarray:
    """Interpolate transformer position embeddings between grid sizes
    (parity: tfimm layers/transformers.py:13-77 interpolate_pos_embeddings and
    kecam load_resized_pos_emb)."""
    if src_grid == dst_grid:
        return pos_emb
    prefix = pos_emb[:, :num_prefix_tokens]
    grid = pos_emb[:, num_prefix_tokens:]
    c = grid.shape[-1]
    grid = grid.reshape(1, src_grid[0], src_grid[1], c)
    grid = resize(grid, dst_grid, method="bilinear")
    grid = grid.reshape(1, dst_grid[0] * dst_grid[1], c)
    return jnp.concatenate([prefix, grid], axis=1)
