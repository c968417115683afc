"""Keras .h5 checkpoint reader + per-family name mappers.

The reference's ensemble checkpoints are whole Keras models (``.h5`` /
SavedModel, loaded at main.py:106-107). We never deserialize graphs; instead
the h5 weight arrays are read directly and mapped onto the matching Flax
module paths. Each model family registers a mapper; families share the
generic helpers here.

Keras h5 layouts handled:
- full ``model.save``: weights under the ``model_weights`` group
- ``model.save_weights``: layers at root, ``layer_names`` attrs

Weight-array conventions (same memory layout, so mapping is mostly renames):
- Conv2D kernel HWIO == flax nn.Conv kernel
- DepthwiseConv2D kernel (h, w, C, 1) -> flax grouped-conv (h, w, 1, C)
- Dense kernel (in, out) == flax
- BatchNorm gamma/beta -> params, moving_mean/moving_variance -> batch_stats
"""
from __future__ import annotations

import re
from typing import Callable, Dict

import numpy as np

_WEIGHT_MAPPERS: Dict[str, Callable] = {}


def register_weight_mapper(*names: str):
    def deco(fn):
        for n in names:
            _WEIGHT_MAPPERS[n.lower()] = fn
        return fn

    return deco


def read_keras_h5(path: str) -> Dict[str, np.ndarray]:
    """Flatten a Keras h5 into {'layer/weight': array} with ':0' stripped."""
    import h5py

    out: Dict[str, np.ndarray] = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                key = name.split(":")[0]
                out[key] = np.asarray(obj)

        root.visititems(visit)
    # drop optimizer state if present at top level
    return {k: v for k, v in out.items() if not k.startswith("optimizer")}


def _dedupe_layer_prefix(key: str) -> str:
    """Keras h5 nests 'layer_name/layer_name/weight'; collapse the repeat."""
    parts = key.split("/")
    if len(parts) >= 2 and parts[0] == parts[1]:
        parts = parts[1:]
    return "/".join(parts)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_keras_h5(path: str, model_name: str):
    """Convert an h5 checkpoint to a variables pytree using the family mapper
    registered for ``model_name``."""
    weights = {_dedupe_layer_prefix(k): v for k, v in read_keras_h5(path).items()}
    key = model_name.lower()
    mapper = None
    for prefix, fn in sorted(_WEIGHT_MAPPERS.items(), key=lambda kv: -len(kv[0])):
        if key.startswith(prefix):
            mapper = fn
            break
    if mapper is None:
        raise KeyError(
            f"no weight mapper registered for '{model_name}' "
            f"(have: {sorted(_WEIGHT_MAPPERS)})"
        )
    return mapper(weights, model_name)


# ---------------------------------------------------------------------------
# ResNet-RS (reference models/resnet_rs/resnet_rs_model.py layer names)
# ---------------------------------------------------------------------------

_RS_BLOCK_RE = re.compile(r"^(c\d+)_(block_\d+)_(.+)$")


@register_weight_mapper("resnetrs", "resnet-rs")
def map_resnet_rs(weights: Dict[str, np.ndarray], model_name: str):
    params: Dict = {}
    batch_stats: Dict = {}

    for key, value in weights.items():
        layer, wname = key.rsplit("/", 1)
        m = _RS_BLOCK_RE.match(layer)
        if m:
            block = f"{m.group(1)}_{m.group(2)}"
            sub = m.group(3)
        else:
            block, sub = None, layer

        if "batch_norm" in sub:
            target = batch_stats if wname.startswith("moving_") else params
            path = ([block] if block else []) + [sub, wname]
            _set(target, tuple(path), value)
        elif sub in ("se_reduce", "se_expand"):
            _set(params, (block, "se", sub, wname), value)
        elif sub.startswith(("conv", "projection_conv", "stem_conv")) or sub.endswith("conv"):
            # our Conv wrapper nests an nn.Conv named 'conv'
            path = ([block] if block else []) + [sub, "conv", wname]
            _set(params, tuple(path), value)
        elif sub == "predictions":
            _set(params, ("predictions", wname), value)
        # anything else (normalization preprocessing layers etc.) is skipped

    return {"params": params, "batch_stats": batch_stats}
