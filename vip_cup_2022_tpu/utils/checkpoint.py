"""Checkpoint save/load.

The reference coexists with three formats (SURVEY.md §5 checkpoint/resume):
whole-model Keras .h5, tf.train.Checkpoint manager state, and SavedModel
exports. Here the single native format is a msgpack-serialized variables
pytree — training state (params + optimizer + step) uses the same format
(train/trainer.py _save/restore_latest).

Integrity: every save writes an ``<path>.md5`` sidecar and loads verify it
when present — the TPU-native stand-in for the reference's md5-verified
release downloads (download_and_load.py:6-79 ``keras.utils.get_file`` with
``file_hash``; resnet_rs_model.py:28-51 per-weight hash tables). A corrupted
or truncated checkpoint fails loudly instead of producing silently-wrong
ensemble outputs.
"""
from __future__ import annotations

import hashlib
import os
from typing import Any, Optional

import flax.serialization
from flax.traverse_util import flatten_dict


def file_md5(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as fh:
        while True:
            block = fh.read(chunk)
            if not block:
                break
            h.update(block)
    return h.hexdigest()


def save_variables(path: str, variables: Any, checksum: bool = True) -> Optional[str]:
    """Serialize a variables pytree; writes an ``<path>.md5`` sidecar unless
    ``checksum=False``. Returns the hex digest (None when disabled)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = flax.serialization.to_bytes(variables)
    with open(path, "wb") as fh:
        fh.write(data)
    if not checksum:
        return None
    digest = hashlib.md5(data).hexdigest()
    with open(path + ".md5", "w") as fh:
        fh.write(f"{digest}  {os.path.basename(path)}\n")
    return digest


def load_variables(path: str, verify: bool = True) -> Any:
    """Restore a pytree; when an ``<path>.md5`` sidecar exists (written by
    :func:`save_variables` or a converter) the payload digest is verified
    first (reference ``file_hash`` contract, download_and_load.py:40-44)."""
    with open(path, "rb") as fh:
        data = fh.read()
    sidecar = path + ".md5"
    if verify and os.path.isfile(sidecar):
        with open(sidecar) as fh:
            expected = fh.read().split()[0].strip()
        actual = hashlib.md5(data).hexdigest()
        if actual != expected:
            raise ValueError(
                f"checksum mismatch for {path}: md5 {actual} != recorded "
                f"{expected} (sidecar {sidecar}); the checkpoint is corrupt "
                "or was modified without updating its sidecar"
            )
    return flax.serialization.msgpack_restore(data)


def param_count(variables: Any, collection: str = "params") -> int:
    tree = variables.get(collection, variables) if isinstance(variables, dict) else variables
    import numpy as np

    return int(sum(np.prod(v.shape) for v in flatten_dict(tree).values()))
