"""Dtype policy for TPU execution.

Replaces the reference's Keras mixed-precision policies
(``mixed_bfloat16`` on TPU / ``mixed_float16`` on GPU — reference
models/keras_cv_attention_models/imagenet/train_func.py:12-41): parameters are
kept in float32, activations/matmuls run in bfloat16 on TPU (MXU-native), and
reductions/normalization statistics stay float32.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype used for softmax / norm statistics / loss accumulation
    reduce_dtype: jnp.dtype = jnp.float32


MIXED_BF16 = DtypePolicy()
FULL_F32 = DtypePolicy(compute_dtype=jnp.float32)


def policy(name: str = "mixed_bfloat16") -> DtypePolicy:
    return {
        "mixed_bfloat16": MIXED_BF16,
        "bfloat16": MIXED_BF16,
        "float32": FULL_F32,
        "f32": FULL_F32,
    }[name]
