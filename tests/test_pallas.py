"""Pallas kernels vs their XLA reference implementations (interpret mode on
CPU; the driver's TPU bench exercises the compiled path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vip_cup_2022_tpu.ops.pallas.preprocess import fused_preprocess
from vip_cup_2022_tpu.ops.pallas.window_attention import window_attention


def test_window_attention_matches_reference():
    rng = np.random.RandomState(0)
    b, h, n, d = 4, 2, 49, 32
    q = rng.randn(b, h, n, d).astype(np.float32)
    k = rng.randn(b, h, n, d).astype(np.float32)
    v = rng.randn(b, h, n, d).astype(np.float32)
    bias = rng.randn(h, n, n).astype(np.float32)
    scale = d**-0.5

    ref = window_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias), scale, use_pallas=False)
    out = window_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias), scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_preprocess_matches_reference():
    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, size=(2, 50, 50, 3), dtype=np.uint8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

    ref = fused_preprocess(jnp.asarray(u8), (64, 64), mean, std, out_dtype=jnp.float32, use_pallas=False)
    out = fused_preprocess(jnp.asarray(u8), (64, 64), mean, std, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_preprocess_identity_size():
    u8 = jnp.zeros((1, 32, 32, 3), jnp.uint8)
    out = fused_preprocess(u8, (32, 32), None, None, out_dtype=jnp.float32)
    assert out.shape == (1, 32, 32, 3)
