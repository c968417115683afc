"""Single model registry replacing all four vendored zoos' registries.

Parity surface: tfimm models/registry.py:27-199 (register_model, list_models,
is_model, model_class, model_config) plus the kecam/keras-serializable and
gcvit NAME2CONFIG registration styles. One namespace; wildcard listing.
"""
from __future__ import annotations

from typing import Callable, List, Tuple, Type

from ..core.registry import Registry
from .base import ModelConfig

_MODELS = Registry("model")


def register_model(fn: Callable[[], Tuple[Type, ModelConfig]]):
    """Register a zero-arg factory returning ``(ModuleClass, ModelConfig)``.

    The function's __name__ is the model name (tfimm convention).
    """
    _MODELS.add(fn.__name__, fn)
    return fn


def is_model(name: str) -> bool:
    return name in _MODELS


def list_models(pattern: str = "*") -> List[str]:
    return _MODELS.list(pattern)


def model_entry(name: str) -> Tuple[Type, ModelConfig]:
    return _MODELS[name]()


def model_class(name: str) -> Type:
    return model_entry(name)[0]


def model_config(name: str) -> ModelConfig:
    return model_entry(name)[1]
