"""Convolution wrappers (NHWC, torch-padding-faithful).

Parity surface:
- ``conv2d_no_bias`` / ``depthwise_conv2d_no_bias`` (kecam common_layers.py:230-266)
- ``Conv2DFixedPadding`` (resnet_rs resnet_rs_model.py:64-84)
- ``ScaledStandardizedConv2D`` + ``ZeroInitGain`` (nfnets/nfnets.py:42-90)
- ``anti_alias_downsample`` (common_layers.py:385-397) / tfimm BlurPool2D
- ``StdConv2D`` (tfimm layers/conv.py — ViT-hybrid / resnetv2)
- ``make_divisible`` (common_layers.py:398-407)

All kernels are HWIO (same as Keras), so converted weights drop straight in.
"""
from __future__ import annotations

from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .pad import resolve_padding, to_tuple

Dtype = Any


def make_divisible(v, divisor: int = 4, min_value=None, limit_round_down: float = 0.9) -> int:
    """Round channel counts to hardware-friendly multiples (mobilenet rule)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < limit_round_down * v:
        new_v += divisor
    return int(new_v)


class Conv(nn.Module):
    """2-D conv with torch-style padding by default, bias off by default."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 1
    strides: Union[int, Sequence[int]] = 1
    padding: Any = "torch"
    use_bias: bool = False
    groups: int = 1
    dilation: Union[int, Sequence[int]] = 1
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = to_tuple(self.kernel_size)
        pad = resolve_padding(self.padding, ks, self.dilation)
        return nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=to_tuple(self.strides),
            padding=pad,
            use_bias=self.use_bias,
            feature_group_count=max(1, self.groups),
            kernel_dilation=to_tuple(self.dilation),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


def _use_blockdiag_dw() -> bool:
    """Gate for the depthwise-as-block-diagonal-grouped-conv lowering
    (exact math; lands on the MXU instead of XLA's slow true-depthwise
    path — measured 1.6x on a 7x7 dw at 99x99x96 on v5e). Opt-in via
    VIPTPU_DW_BLOCKDIAG=1 while per-family wins are being validated."""
    import os

    if not int(os.environ.get("VIPTPU_DW_BLOCKDIAG", "0")):
        return False
    import jax

    return jax.default_backend() == "tpu"


class DepthwiseConv(nn.Module):
    """Depthwise 2-D conv, torch padding. Kernel stored HWIO with I=channels,
    O=channels via feature_group_count=channels (keras DepthwiseConv2D kernel is
    (h, w, c, 1); the converter transposes)."""

    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Any = "torch"
    use_bias: bool = False
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        ks = to_tuple(self.kernel_size)
        pad = resolve_padding(self.padding, ks)
        conv = nn.Conv(
            features=ch,
            kernel_size=ks,
            strides=to_tuple(self.strides),
            padding=pad,
            use_bias=self.use_bias,
            feature_group_count=ch,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="dw_conv",
        )
        g = 8
        if ch % g == 0 and not self.is_initializing() and _use_blockdiag_dw():
            import jax

            p = self.variables["params"]["dw_conv"]
            # mirror nn.Conv's dtype rule: explicit dtype wins; with
            # dtype=None flax promotes x with the (f32) params, so a bf16
            # input computes in f32 — match that so this opt-in path stays
            # numerically identical to the nn.Conv it replaces
            compute_dtype = self.dtype or jnp.promote_types(x.dtype, self.param_dtype)
            kern = jnp.asarray(p["kernel"], compute_dtype)  # (h, w, 1, ch)
            lane = jax.lax.broadcasted_iota(jnp.int32, (g, ch), 0)
            chan = jax.lax.broadcasted_iota(jnp.int32, (g, ch), 1)
            mask = (chan % g == lane).astype(kern.dtype)
            kern_bd = kern * mask[None, None]  # (h, w, g, ch), off-diag zero
            if isinstance(pad, str):
                pad_arg = pad
            else:
                pad_arg = [tuple(p_) for p_ in pad]
            y = jax.lax.conv_general_dilated(
                jnp.asarray(x, kern.dtype), kern_bd, to_tuple(self.strides),
                pad_arg, dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=ch // g,
            )
            if self.use_bias:
                y = y + jnp.asarray(p["bias"], y.dtype)
            return y
        return conv(x)


def apply_depthwise_conv(parent, x, kernel_size, strides, padding, name,
                         dtype=None, use_bias: bool = False):
    """Inline depthwise conv for functional model builders (kecam-style
    ``depthwise_conv2d_no_bias`` call sites). Declares the standard
    ``nn.Conv(feature_group_count=C)`` params, but at inference on TPU (gated
    by VIPTPU_DW_BLOCKDIAG) lowers to the numerically-identical
    block-diagonal grouped conv that lands on the MXU (see
    :func:`_use_blockdiag_dw`). ``parent`` is the calling compact module."""
    import jax

    ch = x.shape[-1]
    ks = to_tuple(kernel_size)
    conv = nn.Conv(
        ch, ks, strides=to_tuple(strides), padding=padding,
        feature_group_count=ch, use_bias=use_bias, dtype=dtype, name=name,
    )
    g = 8
    if ch % g == 0 and not parent.is_initializing() and _use_blockdiag_dw():
        p = parent.variables["params"][name]
        # same dtype-promotion rule as DepthwiseConv (match nn.Conv exactly)
        compute_dtype = dtype or jnp.promote_types(x.dtype, p["kernel"].dtype)
        kern = jnp.asarray(p["kernel"], compute_dtype)  # (h, w, 1, ch)
        lane = jax.lax.broadcasted_iota(jnp.int32, (g, ch), 0)
        chan = jax.lax.broadcasted_iota(jnp.int32, (g, ch), 1)
        mask = (chan % g == lane).astype(kern.dtype)
        kern_bd = kern * mask[None, None]
        pad_arg = padding if isinstance(padding, str) else [tuple(p_) for p_ in padding]
        y = jax.lax.conv_general_dilated(
            jnp.asarray(x, kern.dtype), kern_bd, to_tuple(strides), pad_arg,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ch // g,
        )
        if use_bias:
            y = y + jnp.asarray(p["bias"], y.dtype)
        return y
    return conv(x)


class ScaledStdConv(nn.Module):
    """Weight-standardized conv with learnable per-filter gain and a
    variance-preserving ``gamma`` (NF-Nets).

    Numerics match reference ``ScaledStandardizedConv2D`` (nfnets.py:42-81):
    kernel moments over HWI axes;
    ``scale = rsqrt(max(var * fan_in, eps)) * gain * gamma``;
    conv uses ``(w - mean) * scale``.
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Any = "torch"
    use_bias: bool = True
    groups: int = 1
    gamma: float = 1.0
    eps: float = 1e-5
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = to_tuple(self.kernel_size)
        in_ch = x.shape[-1] // max(1, self.groups)
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (*ks, in_ch, self.features),
            self.param_dtype,
        )
        gain = self.param("gain", nn.initializers.ones, (self.features,), self.param_dtype)

        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        fan_in = float(np.prod(kernel.shape[:-1]))
        scale = jax.lax.rsqrt(jnp.maximum(var * fan_in, self.eps)) * (gain * self.gamma)
        w = (kernel - mean) * scale

        pad = resolve_padding(self.padding, ks)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            w.astype(self.dtype or x.dtype),
            window_strides=to_tuple(self.strides),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=max(1, self.groups),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y


class ZeroInitGain(nn.Module):
    """Scalar learnable gain initialized to zero (nfnets.py:85-90)."""

    @nn.compact
    def __call__(self, x):
        gain = self.param("gain", nn.initializers.zeros, (), jnp.float32)
        return x * gain.astype(x.dtype)


def _blur_kernel(kernel_size: int) -> np.ndarray:
    ww = np.poly1d((0.5, 0.5)) ** (kernel_size - 1)
    ww = np.asarray(ww.coeffs, dtype=np.float32)
    return ww[:, None] * ww[None, :]


class AntiAliasDownsample(nn.Module):
    """Fixed binomial-filter depthwise downsample (BlurPool).

    Parity: kecam ``anti_alias_downsample`` (common_layers.py:385-397, TF SAME
    padding, non-trainable) / tfimm ``BlurPool2D``.
    """

    kernel_size: int = 3
    strides: int = 2
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        k = _blur_kernel(self.kernel_size)
        w = jnp.asarray(k, dtype=x.dtype)[:, :, None, None]
        w = jnp.tile(w, (1, 1, 1, ch))  # HWIO with I=1, O=ch, grouped
        return jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(self.strides, self.strides),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ch,
        )


class StdConv(nn.Module):
    """Weight-standardized conv without gain/gamma (tfimm StdConv2D, used by
    ResNet-V2 / ViT-hybrid): normalize kernel to zero mean / unit variance over
    HWI with eps inside sqrt."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Any = "torch"
    use_bias: bool = True
    eps: float = 1e-8
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = to_tuple(self.kernel_size)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*ks, x.shape[-1], self.features),
            self.param_dtype,
        )
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        w = (kernel - mean) / jnp.sqrt(var + self.eps)
        pad = resolve_padding(self.padding, ks)
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=to_tuple(self.strides),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y
