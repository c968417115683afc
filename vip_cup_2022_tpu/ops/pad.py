"""Padding helpers.

The reference zoos are timm ports and therefore use *torch-style* symmetric
padding (``k // 2`` on every side) instead of TF's asymmetric ``SAME``
(reference: kecam ``common_layers.py:230-266`` ``conv2d_no_bias`` +
ZeroPadding2D; tfimm ``layers/conv.py`` PadConv2D; resnet_rs
``Conv2DFixedPadding`` ``resnet_rs_model.py:64-84``). For stride-1 odd kernels
the two coincide; for strided convs they do not, and getting this wrong is a
silent accuracy killer (SURVEY.md §7 hard parts).
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

KernelSize = Union[int, Sequence[int]]


def to_tuple(v: KernelSize, n: int = 2) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def symmetric_padding(kernel_size: KernelSize, dilation: KernelSize = 1):
    """Exact torch semantics: pad = k // 2 each side (odd kernels)."""
    ks = to_tuple(kernel_size)
    dl = to_tuple(dilation, len(ks))
    return [(d * (k // 2), d * (k // 2)) for k, d in zip(ks, dl)]


def resolve_padding(padding, kernel_size: KernelSize, dilation: KernelSize = 1):
    """Map a padding spec to something ``flax.linen.Conv`` accepts.

    - "torch"/"same_torch": symmetric k//2 zero padding (reference default)
    - "same"/"valid": TF semantics, passed through
    - int or list of (lo, hi): explicit
    """
    if isinstance(padding, str):
        p = padding.lower()
        if p in ("torch", "same_torch"):
            return symmetric_padding(kernel_size, dilation)
        return padding.upper()
    if isinstance(padding, int):
        return [(padding, padding)] * len(to_tuple(kernel_size))
    return padding
