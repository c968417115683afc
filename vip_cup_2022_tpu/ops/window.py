"""Window tiling for local attention.

Parity: gcvit layers/window.py:3-15 (window_partition/window_reverse) and
FitWindow pad-to-multiple (layers/feature.py:234-249). Under XLA these are
pure static reshapes/transposes — free at the HLO level — which is exactly the
TPU-friendly formulation (SURVEY.md §5 long-context notes).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, ws, ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window_size, window_size, w // window_size, window_size, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, window_size, window_size, c)


def window_reverse(windows: jnp.ndarray, window_size: int, h: int, w: int) -> jnp.ndarray:
    """(B * nH * nW, ws, ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // window_size) * (w // window_size))
    x = windows.reshape(b, h // window_size, w // window_size, window_size, window_size, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, c)


def pad_to_window(x: jnp.ndarray, window_size: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Zero-pad H/W up to multiples of window_size (FitWindow). Shapes are
    static under jit, so the pad amounts are Python ints."""
    _, h, w, _ = x.shape
    pad_h = (window_size - h % window_size) % window_size
    pad_w = (window_size - w % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return x, (h + pad_h, w + pad_w)


def crop_from_window(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Crop back to the pre-pad spatial size (gcvit level.py:61-63)."""
    return x[:, :h, :w, :]
