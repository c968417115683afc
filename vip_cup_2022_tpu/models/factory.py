"""Model factory: create, initialize, and load weights.

Parity surface: tfimm models/factory.py:13-114 (``create_model`` with
cache / convert / fresh-build paths), :117-160 (``create_preprocessing``),
:163-269 (``transfer_weights`` with first-conv channel adaptation and
classifier swap). TPU-native differences: models are pure Flax modules and
"weights" are pytrees; loading never deserializes a graph (the reference's
``tf.keras.models.load_model`` has no analogue — architecture comes from the
registry, weights from the checkpoint).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.core import freeze, unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict

from .base import ModelConfig, preprocess_input
from .registry import is_model, model_entry


def create_model(
    name: str,
    pretrained: bool = False,
    model_path: str = "",
    *,
    in_channels: Optional[int] = None,
    nb_classes: Optional[int] = None,
    input_size: Optional[Tuple[int, int]] = None,
    rng: Optional[jax.Array] = None,
    init: bool = True,
    **kwargs,
):
    """Build ``(module, variables, cfg)`` for a registered model.

    ``model_path`` may point to a native checkpoint (``.msgpack`` file or a
    dir containing one) or a Keras ``.h5`` whose weights are converted on the fly via
    :mod:`..weights`. Overridden ``in_channels`` / ``nb_classes`` trigger the
    same adaptations as the reference's ``transfer_weights``.
    """
    if not is_model(name):
        raise KeyError(f"unknown model '{name}'")
    cls, cfg = model_entry(name)

    overrides: Dict[str, Any] = dict(kwargs)
    if in_channels is not None:
        overrides["in_channels"] = in_channels
    if nb_classes is not None:
        overrides["nb_classes"] = nb_classes
    if input_size is not None:
        overrides["input_size"] = tuple(input_size)
    valid = {f.name for f in dataclasses.fields(cfg)}
    unknown = set(overrides) - valid
    if unknown:
        raise TypeError(f"unknown config overrides for {name}: {sorted(unknown)}")
    cfg = cfg.replace(**overrides)

    module = cls(cfg)
    if not init:
        return module, None, cfg

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, *cfg.input_size, cfg.in_channels), jnp.float32)
    # jit the init: one compiled program instead of hundreds of eager op
    # dispatches (order-of-magnitude faster for deep models)
    variables = jax.jit(module.init)(rng, dummy)

    if model_path:
        loaded = load_weights(model_path, name)
        variables = transfer_weights(loaded, variables)
    elif pretrained:
        raise NotImplementedError(
            "pretrained-weight download is not wired in this (no-egress) "
            "environment; pass model_path to a local checkpoint instead — "
            ".h5/.msgpack, a SavedModel dir, or a timm/PyTorch .pt/.pth "
            "state dict (weights/torch_pt.py converts on the fly)"
        )
    return module, variables, cfg


def load_weights(model_path: str, model_name: str = ""):
    """Load a variables pytree from a native, Keras-h5, or SavedModel
    checkpoint (the three formats the reference's manifest resolves,
    main.py:186-194)."""
    from ..utils.checkpoint import load_variables
    from ..weights.savedmodel import savedmodel_dir

    if model_path.endswith((".h5", ".hdf5")):
        from ..weights.keras_h5 import convert_keras_h5

        return convert_keras_h5(model_path, model_name)
    if model_path.endswith((".pt", ".pth", ".bin")):
        from ..weights.torch_pt import convert_torch_weights

        return convert_torch_weights(model_path, model_name)
    if savedmodel_dir(model_path):
        from ..weights.savedmodel import convert_savedmodel

        return convert_savedmodel(model_path, model_name)
    if os.path.isdir(model_path):
        candidate = os.path.join(model_path, "variables.msgpack")
        if os.path.isfile(candidate):
            return load_variables(candidate)
    return load_variables(model_path)


# Destination paths whose components start with any of these are the
# classifier head; shape mismatches there are the intended "classifier swap"
# (tfimm factory.py:196-221) and never an error. Prefix-matched so ConvNeXt's
# 'head_fc'/'head_norm' and ViT's 'head_dist' count as classifier modules.
_CLASSIFIER_PREFIXES = ("predictions", "head", "classifier", "logits")


def _is_classifier_path(path) -> bool:
    return any(
        isinstance(part, str) and part.startswith(_CLASSIFIER_PREFIXES)
        for part in path
    )


def transfer_weights(
    src_vars,
    dst_vars,
    adapt_first_conv: bool = True,
    verbose: bool = False,
    on_mismatch: str = "warn",
):
    """Copy matching-path weights from ``src_vars`` into ``dst_vars``.

    Reference semantics (tfimm factory.py:163-269):
    - exact path+shape match -> copy
    - first conv with different input-channel count -> adapt by summing /
      tiling the kernel over the channel axis (``_transform_first_conv``)
    - classifier shape mismatch -> keep destination init (classifier swap)

    Unlike the reference's ``tf.keras.models.load_model`` a mapper regression
    would otherwise fail *silently* (random-init weights -> wrong ensemble
    outputs), so non-classifier destination params left at init are reported:
    ``on_mismatch`` is ``"warn"`` (default, stderr summary), ``"raise"``, or
    ``"silent"`` (intentional partial transfer).
    """
    if on_mismatch not in ("warn", "raise", "silent"):
        raise ValueError(f"on_mismatch must be warn|raise|silent, got {on_mismatch!r}")
    src = flatten_dict(unfreeze(src_vars))
    dst = flatten_dict(unfreeze(dst_vars))
    out = dict(dst)
    missing, mismatched = [], []
    for path, value in dst.items():
        name = "/".join(map(str, path))
        is_classifier = _is_classifier_path(path)
        if path not in src:
            if not is_classifier:
                missing.append(name)
            if verbose:
                print(f"[transfer] missing in src: {name}")
            continue
        sv = np.asarray(src[path])
        if sv.shape == value.shape:
            out[path] = jnp.asarray(sv, dtype=value.dtype)
        elif adapt_first_conv and sv.ndim == 4 and sv.shape[:2] == tuple(value.shape[:2]) and sv.shape[3] == value.shape[3]:
            out[path] = jnp.asarray(_adapt_in_channels(sv, value.shape[2]), dtype=value.dtype)
        else:
            if not is_classifier:
                mismatched.append(f"{name}: {sv.shape} -> {tuple(value.shape)}")
            if verbose:
                print(
                    f"[transfer] shape mismatch {name}: "
                    f"{sv.shape} -> {value.shape} (keeping dst init)"
                )
    if (missing or mismatched) and on_mismatch != "silent":
        msg = (
            f"transfer_weights: {len(missing)} param(s) missing from source, "
            f"{len(mismatched)} shape-mismatched (kept at random init): "
            + "; ".join((missing + mismatched)[:8])
            + (" ..." if len(missing) + len(mismatched) > 8 else "")
        )
        if on_mismatch == "raise":
            raise ValueError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    return freeze(unflatten_dict(out)) if hasattr(dst_vars, "unfreeze") else unflatten_dict(out)


def _adapt_in_channels(kernel: np.ndarray, in_channels: int) -> np.ndarray:
    """First-conv input-channel adaptation (tfimm factory.py:224-269):
    1 channel -> sum over RGB; N channels -> tile and rescale."""
    src_ch = kernel.shape[2]
    if in_channels == 1:
        return kernel.sum(axis=2, keepdims=True)
    reps = int(np.ceil(in_channels / src_ch))
    tiled = np.tile(kernel, (1, 1, reps, 1))[:, :, :in_channels, :]
    return tiled * (src_ch / in_channels)


def create_preprocessing(cfg: ModelConfig):
    """Return the [0,1]->normalized preprocessing fn for a model (parity:
    tfimm create_preprocessing, factory.py:117-160)."""

    def fn(x):
        return preprocess_input(x, cfg)

    return fn
