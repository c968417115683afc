"""Relocatable serving artifact for the fused ensemble.

The reference exports a self-contained SavedModel with preprocessing and
logit normalization baked in (tfimm train/problems/classification.py:202-247)
so serving needs no model code. The TPU-native analogue serializes the fused
whole-ensemble program — uint8 preprocess, every member x fold forward,
TTA/fold/member aggregation — as a `jax.export` StableHLO artifact:

  <dir>/program.jaxexport   serialized StableHLO, batch shape pinned
  <dir>/weights.msgpack     all_variables pytree (list per member, per fold)
  <dir>/manifest.json       members, dims, batch, dtype, thr, jax version

Loading needs jax alone — no model definitions and no retracing; the
deserialized program recompiles from StableHLO (seconds) instead of
re-tracing + re-lowering the whole ensemble (the expensive half), and the
persistent compilation cache (main.py/bench.py knob) removes even that on a
warm host. Weights stay outside the program so a fold can be re-exported by
rewriting msgpack alone.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..utils.checkpoint import load_variables, save_variables

_PROGRAM = "program.jaxexport"
_WEIGHTS = "weights.msgpack"
_MANIFEST = "manifest.json"


def export_ensemble(
    engine,
    members,
    all_variables,
    out_dir: str,
    *,
    batch_size: int = 256,
    tta: int = 1,
    member_names: Optional[Sequence[str]] = None,
    thr: float = 0.487,
    native_size=(200, 200),
) -> str:
    """Serialize the fused-ensemble program + weights into ``out_dir``.

    ``engine``/``members``/``all_variables`` as in
    ``EnsembleEngine.build_fused_ensemble``. The exported callable has
    signature ``(all_variables, u8[batch,H,W,3], rng_key) -> probs[batch,1]``
    with the batch shape pinned (serving pads the tail batch, exactly like
    the CSV engine does)."""
    # unsharded: a mesh-sharded program pins the artifact to the exporting
    # device count; the artifact is a PER-CHIP program (serving replicates)
    fwd = engine.build_fused_ensemble(members, tta=tta, sharded=False)
    var_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        all_variables,
    )
    u8_spec = jax.ShapeDtypeStruct((batch_size, *native_size, 3), jnp.uint8)
    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)  # legacy PRNGKey layout
    exported = jax.export.export(fwd)(var_specs, u8_spec, key_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _PROGRAM), "wb") as fh:
        fh.write(exported.serialize())
    save_variables(os.path.join(out_dir, _WEIGHTS), all_variables)
    manifest = {
        "members": list(member_names or [getattr(m, "name", None) or type(m).__name__
                                         for m, _ in members]),
        "dims": [list(d) for _, d in members],
        "batch_size": batch_size,
        "native_size": list(native_size),
        "tta": tta,
        "thr": thr,
        "compute_dtype": jnp.dtype(engine.compute_dtype).name,
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "n_folds": [len(fv) for fv in all_variables],
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return out_dir


def load_exported(art_dir: str):
    """Load an artifact dir -> (call, all_variables, manifest).

    ``call(all_variables, u8, rng)`` executes the deserialized StableHLO —
    model code is NOT imported; only jax + the msgpack weights are needed.
    The weights template for deserialization comes from the artifact itself.
    """
    with open(os.path.join(art_dir, _PROGRAM), "rb") as fh:
        exported = jax.export.deserialize(bytearray(fh.read()))
    raw = load_variables(os.path.join(art_dir, _WEIGHTS))
    with open(os.path.join(art_dir, _MANIFEST)) as fh:
        manifest = json.load(fh)
    # flax msgpack stores lists as {"0": ..} dicts; rebuild the member/fold
    # list nesting the program was exported with from the manifest
    all_variables = [
        [raw[str(m)][str(f)] for f in range(n)]
        for m, n in enumerate(manifest["n_folds"])
    ]
    return exported.call, all_variables, manifest
