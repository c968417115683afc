"""Checkpoint save/load.

The reference coexists with three formats (SURVEY.md §5 checkpoint/resume):
whole-model Keras .h5, tf.train.Checkpoint manager state, and SavedModel
exports. Here the single native format is a msgpack-serialized variables
pytree — training state (params + optimizer + step) uses the same format
(train/trainer.py _save/restore_latest).
"""
from __future__ import annotations

import os
from typing import Any

import flax.serialization
from flax.traverse_util import flatten_dict


def save_variables(path: str, variables: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = flax.serialization.to_bytes(variables)
    with open(path, "wb") as fh:
        fh.write(data)


def load_variables(path: str) -> Any:
    with open(path, "rb") as fh:
        data = fh.read()
    return flax.serialization.msgpack_restore(data)


def param_count(variables: Any, collection: str = "params") -> int:
    tree = variables.get(collection, variables) if isinstance(variables, dict) else variables
    import numpy as np

    return int(sum(np.prod(v.shape) for v in flatten_dict(tree).values()))
