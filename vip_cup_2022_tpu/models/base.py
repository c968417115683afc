"""Model base config + shared head/preprocess helpers.

One typed config replaces the reference's three conventions (tfimm ModelConfig
dataclasses, kecam constructor-kwarg tables, gcvit NAME2CONFIG dicts) —
SURVEY.md §5 "Config / flag system".
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp

# ImageNet preprocessing constants (tfimm utils/constants.py parity)
IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Base config shared by every backbone family."""

    name: str = ""
    url: str = ""
    input_size: Tuple[int, int] = (224, 224)
    in_channels: int = 3
    nb_classes: int = 1000
    # preprocessing: pipeline feeds [0, 1] floats; model normalizes internally
    mean: Tuple[float, ...] = IMAGENET_DEFAULT_MEAN
    std: Tuple[float, ...] = IMAGENET_DEFAULT_STD
    # 'softmax' | 'sigmoid' | None — baked into the forward like the
    # reference's serialized Keras heads (common_layers.py output_block)
    classifier_activation: Optional[str] = "softmax"
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    # team modification: stem stride knob for small-input fine-tuning
    # (reference: first_strides threaded through every family — SURVEY §2.5)
    first_strides: int = 2
    pool: str = "avg"  # 'avg' | 'max' | '' (no pooling: return features)
    dtype: Any = None  # compute dtype; None = float32

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def _adapt_stats(values, channels: int):
    """Adapt mean/std vectors to a non-RGB channel count (tfimm
    create_preprocessing semantics: 1ch -> average, Nch -> tile)."""
    import numpy as np

    v = np.asarray(values, dtype=np.float32).reshape(-1)
    if v.size == channels:
        return v
    if channels == 1:
        return v.mean(keepdims=True)
    reps = -(-channels // v.size)
    return np.tile(v, reps)[:channels]


def preprocess_input(x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Normalize [0,1] input with the model's mean/std (kecam PreprocessInput
    / tfimm create_preprocessing parity)."""
    if cfg.mean is None and cfg.std is None:
        return x
    ch = x.shape[-1]
    mean = jnp.asarray(_adapt_stats(cfg.mean if cfg.mean is not None else (0.0,), ch))
    std = jnp.asarray(_adapt_stats(cfg.std if cfg.std is not None else (1.0,), ch))
    return ((x.astype(jnp.float32) - mean) / std).astype(cfg.dtype or x.dtype)
