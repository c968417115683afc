"""Post-training int8 quantization (PTQ) for TPU inference.

The v5e MXU runs s8 x s8 -> s32 at ~2.8x the bf16 rate (measured 496.6 TOPS
vs 174.8 TFLOP/s on an 8192^3 chained-marginal GEMM, tools/int8_spike.py), so
the GEMM/conv-bound ensemble members leave real throughput on the table in
bf16. This module adds a model-agnostic PTQ pass over any Flax member:

- **calibration**: run a representative batch eagerly under
  :func:`calibration`; every eligible conv/dense records the abs-max of its
  input activation (per-tensor).
- **quantized inference**: wrap the same ``module.apply`` in
  :func:`quantized`; eligible sites quantize the activation with the frozen
  calibration scale (symmetric int8), quantize the weight per output channel,
  run the conv/dot in int8 with ``preferred_element_type=int32`` (XLA lowers
  this to the MXU int8 path), and dequantize into the original compute dtype.

Everything else — norms, activations, depthwise convs, SE gates, heads —
stays in the original dtype; eligibility rules below keep the numerically
delicate sites out of int8.

The mechanism is ``flax.linen.intercept_methods``: ``nn.Conv``/``nn.Dense``
calls (which every heavy op in ``ops/`` funnels through) plus the
weight-standardized convs (``ScaledStdConv`` for NF-Nets, ``StdConv`` for
ResNet-V2/ViT-hybrid, which call ``lax.conv_general_dilated`` directly) are
re-executed with quantized operands; any module attribute combination this
pass does not model falls through to the original implementation.

Reference analogue: the reference ships TFLite int8 conversion for kecam
models (keras_cv_attention_models/model_surgery/model_surgery.py:569-629,
``convert_to_tflite`` with DEFAULT optimizations); this is the TPU-native
equivalent, running through XLA's int8 MXU path instead of a CPU runtime.
"""
from __future__ import annotations

import contextlib
import dataclasses
import json
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class PTQConfig:
    """Eligibility and numeric knobs for the int8 pass.

    A site is quantized only when ALL of:
    - per-group input features >= ``min_group_features`` (depthwise convs have
      1 input feature per group -> always excluded; int8 wins come from the
      MXU, depthwise lives on the VPU)
    - total input features >= ``min_in_features`` (excludes the RGB stem)
    - output features >= ``min_out_features``
    - for convs: spatial extent > 1x1 position (excludes SE gates operating
      on pooled (B, 1, 1, C) features, whose sigmoid is scale-sensitive and
      whose compute is negligible)
    - no path component starts with one of ``skip_name_prefixes`` (classifier
      heads keep full precision: the 1 - p[:, 0] binary map feeds a 0.487
      threshold, reference main.py:113-114,144)
    """

    min_in_features: int = 32
    min_out_features: int = 32
    min_group_features: int = 32
    skip_name_prefixes: Tuple[str, ...] = (
        "head", "predictions", "classifier", "logits", "se", "attn",
        "stem",
    )

    def eligible(self, site: str, in_per_group: int, fgc: int,
                 out_features: int, spatial_positions: int) -> bool:
        if in_per_group < self.min_group_features:
            return False
        if in_per_group * fgc < self.min_in_features:
            return False
        if out_features < self.min_out_features:
            return False
        if spatial_positions <= 1:
            return False
        parts = [p.lower() for p in site.split("/")]
        return not any(
            p.startswith(pref) for p in parts for pref in self.skip_name_prefixes
        )


class PTQState:
    """Mutable carrier for one calibration or quantized-inference pass."""

    def __init__(self, mode: str, config: Optional[PTQConfig] = None,
                 scales: Optional[Dict[str, float]] = None):
        assert mode in ("calib", "quant")
        self.mode = mode
        self.config = config or PTQConfig()
        # site -> abs-max of the input activation (f32, python float)
        self.scales: Dict[str, float] = dict(scales or {})
        # site -> jnp scalar abs-max collected during a calibration pass
        # (concrete when eager, tracer when the pass runs under jit)
        self.traced: Dict[str, jax.Array] = {}
        # sites actually quantized during tracing (for reporting/tests)
        self.quantized_sites: list = []
        self.skipped_sites: list = []


_ACTIVE: Optional[PTQState] = None


@contextlib.contextmanager
def _activate(state: PTQState):
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = state
    try:
        with nn.intercept_methods(_interceptor):
            yield state
    finally:
        _ACTIVE = prev


def _site(mod: nn.Module) -> str:
    return "/".join(str(p) for p in mod.path)


def _record(state: PTQState, site: str, x: jax.Array):
    # works eagerly AND under jit: the jnp scalar is a tracer when tracing;
    # calibrate() returns the collected dict as outputs of the traced fn
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    prev = state.traced.get(site)
    state.traced[site] = amax if prev is None else jnp.maximum(prev, amax)


def _quant_act(x: jax.Array, amax: float) -> Tuple[jax.Array, float]:
    """Symmetric per-tensor int8: returns (q, scale) with x ~ q * scale."""
    s = max(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s)), -127, 127)
    return q.astype(jnp.int8), s


def _quant_weight(w: jax.Array, reduce_axes: Tuple[int, ...]):
    """Symmetric per-output-channel int8: returns (q, scale[out])."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s.reshape(-1)  # (out,)


def _canon_padding(padding: Any, ks: Tuple[int, ...]):
    """Mirror flax nn.Conv padding canonicalization for the cases the model
    zoo uses (str / int / per-dim ints or pairs). Returns a value accepted by
    lax.conv_general_dilated, or None for unsupported forms (-> fallback)."""
    if isinstance(padding, str):
        if padding in ("SAME", "VALID", "SAME_LOWER"):
            return padding
        return None  # CIRCULAR / CAUSAL: fall back to the original op
    if isinstance(padding, int):
        return [(padding, padding)] * len(ks)
    out = []
    try:
        for p in padding:
            if isinstance(p, int):
                out.append((p, p))
            else:
                lo, hi = p
                out.append((int(lo), int(hi)))
    except (TypeError, ValueError):
        return None
    return out if len(out) == len(ks) else None


def _int8_conv(qx, qw, *, strides, padding, rhs_dilation, fgc):
    return jax.lax.conv_general_dilated(
        qx, qw,
        window_strides=strides,
        padding=padding,
        rhs_dilation=rhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=fgc,
        preferred_element_type=jnp.int32,
    )


def _dequant(y_i32, s_x: float, s_w, out_dtype):
    y = y_i32.astype(jnp.float32) * (s_x * s_w)
    return y, out_dtype


def _handle_conv(state: PTQState, mod: nn.Conv, x: jax.Array,
                 next_fun: Callable):
    # unsupported attribute combinations -> original op
    if getattr(mod, "mask", None) is not None:
        return next_fun(x)
    ks = tuple(mod.kernel_size) if not isinstance(mod.kernel_size, int) \
        else (mod.kernel_size,) * 2
    if len(ks) != 2 or x.ndim != 4:
        return next_fun(x)
    lhs_dil = mod.input_dilation
    if lhs_dil not in (None, 1) and tuple(np.atleast_1d(lhs_dil)) != (1, 1):
        return next_fun(x)
    fgc = int(mod.feature_group_count)
    in_per_group = x.shape[-1] // max(fgc, 1)
    site = _site(mod)
    spatial = int(x.shape[1]) * int(x.shape[2])
    if not state.config.eligible(site, in_per_group, fgc, int(mod.features), spatial):
        state.skipped_sites.append(site)
        return next_fun(x)

    if state.mode == "calib":
        _record(state, site, x)
        return next_fun(x)

    if site not in state.scales:  # never calibrated (shape-gated path etc.)
        state.skipped_sites.append(site)
        return next_fun(x)

    params = mod.variables["params"]
    kernel = params["kernel"]
    st = mod.strides if mod.strides is not None else 1
    strides = (st,) * 2 if isinstance(st, int) else tuple(st)
    kdil = mod.kernel_dilation
    rhs_dilation = (kdil,) * 2 if isinstance(kdil, int) else tuple(kdil or (1, 1))
    padding = _canon_padding(mod.padding, ks)
    if padding is None:
        return next_fun(x)

    qx, s_x = _quant_act(x, state.scales[site])
    qw, s_w = _quant_weight(kernel, (0, 1, 2))
    y = _int8_conv(qx, qw, strides=strides, padding=padding,
                   rhs_dilation=rhs_dilation, fgc=fgc)
    y = y.astype(jnp.float32) * (s_x * s_w)
    if mod.use_bias:
        y = y + params["bias"].astype(jnp.float32)
    state.quantized_sites.append(site)
    return y.astype(mod.dtype or x.dtype)


def _handle_dense(state: PTQState, mod: nn.Dense, x: jax.Array,
                  next_fun: Callable):
    site = _site(mod)
    in_f = int(x.shape[-1])
    # Dense has no spatial axes; treat the flattened leading size as
    # "positions" so 1-row matmuls (pooled heads) are excluded.
    positions = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    if not state.config.eligible(site, in_f, 1, int(mod.features), positions):
        state.skipped_sites.append(site)
        return next_fun(x)
    if state.mode == "calib":
        _record(state, site, x)
        return next_fun(x)
    if site not in state.scales:
        state.skipped_sites.append(site)
        return next_fun(x)
    params = mod.variables["params"]
    kernel = params["kernel"]  # (in, out)
    qx, s_x = _quant_act(x, state.scales[site])
    qw, s_w = _quant_weight(kernel, (0,))
    y = jax.lax.dot_general(
        qx, qw, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * s_w)
    if mod.use_bias:
        y = y + params["bias"].astype(jnp.float32)
    state.quantized_sites.append(site)
    return y.astype(mod.dtype or x.dtype)


def _standardized_weight(mod, kernel, gain=None):
    """Replicate ScaledStdConv/StdConv weight standardization (ops/conv.py)."""
    mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
    if gain is not None:  # ScaledStdConv (nfnets.py:42-81 numerics)
        fan_in = float(np.prod(kernel.shape[:-1]))
        scale = jax.lax.rsqrt(jnp.maximum(var * fan_in, mod.eps)) * (
            gain * mod.gamma
        )
        return (kernel - mean) * scale
    return (kernel - mean) / jnp.sqrt(var + mod.eps)  # StdConv


def _handle_stdconv(state: PTQState, mod, x: jax.Array, next_fun: Callable,
                    scaled: bool):
    from ..ops.conv import resolve_padding, to_tuple

    ks = to_tuple(mod.kernel_size)
    fgc = max(1, getattr(mod, "groups", 1))
    in_per_group = x.shape[-1] // fgc
    site = _site(mod)
    spatial = int(x.shape[1]) * int(x.shape[2])
    if not state.config.eligible(site, in_per_group, fgc, int(mod.features), spatial):
        state.skipped_sites.append(site)
        return next_fun(x)
    if state.mode == "calib":
        _record(state, site, x)
        return next_fun(x)
    if site not in state.scales:
        state.skipped_sites.append(site)
        return next_fun(x)
    params = mod.variables["params"]
    w = _standardized_weight(mod, params["kernel"],
                             params["gain"] if scaled else None)
    qx, s_x = _quant_act(x, state.scales[site])
    qw, s_w = _quant_weight(w, (0, 1, 2))
    y = _int8_conv(qx, qw, strides=to_tuple(mod.strides),
                   padding=resolve_padding(mod.padding, ks),
                   rhs_dilation=(1, 1), fgc=fgc)
    y = y.astype(jnp.float32) * (s_x * s_w)
    if mod.use_bias:
        y = y + params["bias"].astype(jnp.float32)
    state.quantized_sites.append(site)
    return y.astype(mod.dtype or x.dtype)


def _interceptor(next_fun, args, kwargs, context):
    state = _ACTIVE
    if state is None or context.method_name != "__call__" or not args:
        return next_fun(*args, **kwargs)
    mod = context.module
    x = args[0]
    if not isinstance(x, jax.Array):
        return next_fun(*args, **kwargs)
    try:
        if isinstance(mod, nn.Dense):
            return _handle_dense(state, mod, x, lambda a: next_fun(a, *args[1:], **kwargs))
        if isinstance(mod, nn.Conv):
            return _handle_conv(state, mod, x, lambda a: next_fun(a, *args[1:], **kwargs))
        # local import: ops.conv imports nothing from quant (no cycle)
        from ..ops.conv import ScaledStdConv, StdConv

        if isinstance(mod, ScaledStdConv):
            return _handle_stdconv(state, mod, x,
                                   lambda a: next_fun(a, *args[1:], **kwargs),
                                   scaled=True)
        if isinstance(mod, StdConv):
            return _handle_stdconv(state, mod, x,
                                   lambda a: next_fun(a, *args[1:], **kwargs),
                                   scaled=False)
    except KeyError:
        # params not materialized (init pass) -> original op
        return next_fun(*args, **kwargs)
    return next_fun(*args, **kwargs)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------
def calibrate(apply_fn: Callable, batches: Iterable[Any],
              config: Optional[PTQConfig] = None,
              use_jit: bool = False) -> Dict[str, float]:
    """Run ``apply_fn`` over ``batches`` and return the per-site activation
    abs-max table. ``apply_fn`` takes one batch.

    ``use_jit=True`` compiles ONE program per batch shape that returns every
    site's abs-max as outputs (the interceptor records tracers at trace
    time) — the only sane mode on TPU, where eager per-op dispatch through
    the runtime costs 26-800 ms per op (NOTES_r3 tunnel rules)."""
    out: Dict[str, float] = {}

    def merge(d):
        for k, v in d.items():
            out[k] = max(out.get(k, 0.0), float(v))

    if use_jit:
        def traced(b):
            state = PTQState("calib", config=config)
            with _activate(state):
                apply_fn(b)
            return dict(state.traced)

        f = jax.jit(traced)
        for b in batches:
            merge(jax.device_get(f(b)))
        return out

    state = PTQState("calib", config=config)
    with _activate(state):
        for b in batches:
            jax.block_until_ready(apply_fn(b))
    merge(jax.device_get(state.traced))
    return out


def quantized(apply_fn: Callable, scales: Dict[str, float],
              config: Optional[PTQConfig] = None,
              report: Optional[dict] = None) -> Callable:
    """Wrap an apply-style callable so eligible conv/dense sites run in int8
    with the given calibration ``scales``. Jit-compatible (the interception
    happens at trace time). ``report``, if given, receives
    ``quantized_sites`` / ``skipped_sites`` lists after the first call."""

    def wrapped(*args, **kwargs):
        state = PTQState("quant", config=config, scales=scales)
        with _activate(state):
            out = apply_fn(*args, **kwargs)
        if report is not None:
            report["quantized_sites"] = list(state.quantized_sites)
            report["skipped_sites"] = list(state.skipped_sites)
        return out

    return wrapped


def save_scales(path: str, scales: Dict[str, float]):
    with open(path, "w") as fh:
        json.dump(scales, fh, indent=1, sort_keys=True)


def load_scales(path: str) -> Dict[str, float]:
    with open(path) as fh:
        return {k: float(v) for k, v in json.load(fh).items()}
