"""Resize parity vs tf.image.resize (the reference's data-path op —
dataset/dataset.py:33-34). The matmul formulation must match TF-v2 numerics."""
import jax.numpy as jnp
import numpy as np
import pytest

from vip_cup_2022_tpu.ops.resize import resize, resize_matrix

tf = pytest.importorskip("tensorflow")


@pytest.mark.parametrize("method", ["bicubic", "bilinear"])
@pytest.mark.parametrize("in_size,out_size", [
    ((200, 200), (224, 224)),   # the GCViT/EffNetV1B4 path
    ((200, 200), (160, 160)),   # downscale
    ((37, 61), (200, 200)),     # odd sizes up
    ((224, 224), (200, 200)),
])
def test_resize_matches_tf(method, in_size, out_size):
    x = np.random.uniform(0, 255, size=(2, *in_size, 3)).astype(np.float32)
    ours = np.asarray(resize(jnp.asarray(x), out_size, method=method))
    theirs = tf.image.resize(x, out_size, method=method, antialias=False).numpy()
    # bicubic (the reference's path) reproduces TF's LUT op to float rounding;
    # bilinear differs only by f32 accumulation order in TF's lerp
    atol = 1e-3 if method == "bicubic" else 5e-3
    np.testing.assert_allclose(ours, theirs, atol=atol)


def test_resize_identity_skip():
    x = jnp.asarray(np.random.randn(1, 200, 200, 3).astype(np.float32))
    out = resize(x, (200, 200))
    assert out is x or np.allclose(np.asarray(out), np.asarray(x))


def test_resize_matrix_rows_sum_to_one():
    m = resize_matrix(200, 224, "bicubic")
    np.testing.assert_allclose(m.sum(axis=1), np.ones(224), atol=1e-5)


def test_resize_hwc_rank():
    x = jnp.asarray(np.random.randn(31, 29, 3).astype(np.float32))
    out = resize(x, (64, 64))
    assert out.shape == (64, 64, 3)
