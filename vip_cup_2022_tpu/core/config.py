"""Config system.

Two generations in the reference are unified here (see SURVEY.md §5 "Config"):

1. the competition path's untyped attribute bag ``Config``
   (reference ``utils/config.py:4-48``) — kept verbatim-compatible because the
   inference CLI populates it imperatively;
2. tfimm's typed dataclass/YAML/CLI system (reference
   ``models/tfimm/train/config.py:14-421``) — reproduced as
   :func:`parse_config` / :func:`load_yaml_config` over plain dataclasses with
   ``*_class``-keyed nesting.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any, Dict, Type

import numpy as np


class Config:
    """Untyped attribute-bag config (parity: reference utils/config.py:4-6)."""

    def __init__(self, data: Dict[str, Any] | None = None):
        self.__dict__.update(**(data or {}))

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"Config({self.__dict__!r})"


def dict2cfg(cfg_dict: Dict[str, Any]) -> Config:
    """dict -> Config; mirrors reference utils/config.py:8-20."""
    cfg = Config(cfg_dict)
    if hasattr(cfg, "class_labels") and hasattr(cfg, "class_names"):
        cfg.label2name = dict(zip(cfg.class_labels, cfg.class_names))
    return cfg


def cfg2dict(cfg: Config) -> Dict[str, Any]:
    """Config -> dict; mirrors reference utils/config.py:23-33."""
    return {k: v for k, v in dict(vars(cfg)).items() if "__" not in k}


class NumpyEncoder(json.JSONEncoder):
    """JSON encoder for numpy scalars/arrays (parity: utils/config.py:36-48)."""

    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return json.JSONEncoder.default(self, obj)


# ---------------------------------------------------------------------------
# Typed config system (dataclass <-> YAML <-> CLI), the tfimm-train equivalent.
# ---------------------------------------------------------------------------

_CFG_CLASS_REGISTRY: Dict[str, Any] = {}


def cfg_serializable(cls):
    """Register a class whose ``cfg_class`` dataclass participates in nested
    config parsing (parity: reference models/tfimm/train/registry.py:5-58)."""
    _CFG_CLASS_REGISTRY[cls.__name__] = cls
    return cls


def get_cfg_class(name: str):
    return _CFG_CLASS_REGISTRY[name]


def _coerce(value: Any, typ) -> Any:
    if typ in (int, float, str):
        return typ(value)
    if typ is bool:
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "y")
        return bool(value)
    return value


def dataclass_from_dict(cls: Type, data: Dict[str, Any]):
    """Build a (possibly nested) dataclass from a dict.

    Nesting follows the reference convention (tfimm train/config.py): a field
    ``foo`` whose sibling key ``foo_class`` names a registered class gets
    instantiated from that class's ``cfg_class`` dataclass.
    """
    kwargs: Dict[str, Any] = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in data.items():
        if key not in fields:
            continue
        f = fields[key]
        if isinstance(value, dict):
            class_key = f"{key}_class"
            if class_key in data and data[class_key] in _CFG_CLASS_REGISTRY:
                sub_cls = _CFG_CLASS_REGISTRY[data[class_key]].cfg_class
                kwargs[key] = dataclass_from_dict(sub_cls, value)
            elif dataclasses.is_dataclass(f.type):
                kwargs[key] = dataclass_from_dict(f.type, value)
            else:
                kwargs[key] = value
        else:
            kwargs[key] = _coerce(value, f.type) if not isinstance(value, (list, tuple)) else value
    return cls(**kwargs)


def load_yaml_config(path: str, cls: Type):
    import yaml

    with open(path) as fh:
        data = yaml.safe_load(fh)
    return dataclass_from_dict(cls, data)


def parse_config(cls: Type, argv=None, yaml_path: str | None = None):
    """YAML -> defaults -> CLI override chain, flat ``--a.b=value`` dotted keys
    (parity with reference tfimm train/config.py merge order)."""
    data: Dict[str, Any] = {}
    if yaml_path:
        import yaml

        with open(yaml_path) as fh:
            data = yaml.safe_load(fh) or {}

    parser = argparse.ArgumentParser(add_help=False)
    known, unknown = parser.parse_known_args(argv or [])
    i = 0
    unknown = list(unknown)
    while i < len(unknown):
        tok = unknown[i]
        if tok.startswith("--"):
            if "=" in tok:
                key, val = tok[2:].split("=", 1)
                i += 1
            else:
                key = tok[2:]
                val = unknown[i + 1] if i + 1 < len(unknown) else "true"
                i += 2
            node = data
            parts = key.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = val
        else:
            i += 1
    return dataclass_from_dict(cls, data)
