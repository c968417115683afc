"""Generic string-keyed registry, shared by models, optimizers, losses, augments.

Replaces the reference's per-zoo registries (tfimm models/registry.py:27-199,
kecam keras-serializable registration, train/registry.py) with one mechanism.
"""
from __future__ import annotations

import fnmatch
from typing import Any, Callable, Dict, Iterable, List


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._items: Dict[str, Any] = {}

    def register(self, key: str | None = None) -> Callable:
        def deco(obj):
            k = key or getattr(obj, "__name__", None)
            if k is None:
                raise ValueError("registry key required")
            if k in self._items:
                raise KeyError(f"duplicate {self.name} registry key: {k}")
            self._items[k] = obj
            return obj

        return deco

    def add(self, key: str, obj: Any) -> None:
        if key in self._items:
            raise KeyError(f"duplicate {self.name} registry key: {key}")
        self._items[key] = obj

    def __contains__(self, key: str) -> bool:
        return key in self._items

    def __getitem__(self, key: str) -> Any:
        if key not in self._items:
            raise KeyError(
                f"unknown {self.name} '{key}'. known: {sorted(self._items)[:20]}..."
            )
        return self._items[key]

    def get(self, key: str, default: Any = None) -> Any:
        return self._items.get(key, default)

    def keys(self) -> Iterable[str]:
        return self._items.keys()

    def list(self, pattern: str = "*") -> List[str]:
        """Wildcard listing (parity: tfimm list_models, models/registry.py)."""
        return sorted(fnmatch.filter(self._items.keys(), pattern))
