"""RandAugment / AutoAugment policies: pixel-op parity vs the reference TF
ops (imagenet/augment.py) and policy-machinery behavior."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vip_cup_2022_tpu.data import randaugment as ra


@pytest.fixture(scope="module")
def ref_augment(reference_models_path):
    """The reference's TF-graph augment module (kecam imagenet/augment.py),
    loaded standalone by file path — the package __init__ pulls tfds, and the
    module expects legacy 'keras.layers.preprocessing' paths."""
    import importlib.util

    pytest.importorskip("tensorflow")
    tf_keras = pytest.importorskip("tf_keras")
    sys.modules.setdefault("keras", tf_keras)
    sys.modules.setdefault(
        "keras.layers.preprocessing",
        importlib.import_module("tf_keras.src.layers.preprocessing"),
    )
    sys.modules.setdefault(
        "keras.layers.preprocessing.image_preprocessing",
        importlib.import_module("tf_keras.src.layers.preprocessing.image_preprocessing"),
    )
    path = os.path.join(
        reference_models_path, "keras_cv_attention_models", "imagenet", "augment.py"
    )
    spec = importlib.util.spec_from_file_location("ref_augment_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def img255():
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, size=(24, 20, 3)).astype(np.float32)


@pytest.mark.parity
@pytest.mark.parametrize(
    "name,args",
    [
        ("invert", ()),
        ("solarize", (96,)),
        ("solarize_add", (77,)),
        ("posterize", (2,)),
        ("autocontrast", ()),
        ("equalize", ()),
        ("color", (1.54,)),
        ("contrast", (0.28,)),
        ("brightness", (1.9,)),
        ("sharpness", (0.64,)),
    ],
)
def test_pixel_op_parity_vs_reference(ref_augment, img255, name, args):
    import tensorflow as tf

    ref_fn = getattr(ref_augment, name)
    ref_in = tf.constant(np.clip(img255, 0, 255).astype(np.uint8))
    ref_out = np.asarray(ref_fn(ref_in, *args), np.float32)

    ours_fn = getattr(ra, name)
    fargs = tuple(jnp.asarray(a, jnp.float32) for a in args)
    ours = np.asarray(ours_fn(jnp.asarray(img255), *fargs), np.float32)
    # the reference rounds through uint8 inside the ops (grayscale/blur
    # degenerates are cast before blending); allow 2 intensity steps
    np.testing.assert_allclose(ours, ref_out, atol=2.0)


def test_auto_augment_test_policy_exact():
    """policy 'test' = TranslateX(p=1, lvl 4) then Equalize(p=1): output must
    equal one of the two sign-expansions of our own ops."""
    rng = np.random.RandomState(1)
    img = rng.uniform(0, 1, size=(1, 16, 16, 3)).astype(np.float32)
    out = ra.auto_augment(jax.random.PRNGKey(0), jnp.asarray(img), policy="test")
    x255 = jnp.asarray(img[0]) * 255.0
    pixels = 4 / 10.0 * 250.0
    cands = [
        np.asarray(jnp.clip(ra.equalize(ra.translate_x(x255, s * pixels)) / 255.0, 0, 1))
        for s in (-1.0, 1.0)
    ]
    err = min(np.abs(np.asarray(out[0]) - c).max() for c in cands)
    assert err < 1e-5, err


def test_auto_augment_batch_properties():
    rng = np.random.RandomState(2)
    img = rng.uniform(0, 1, size=(8, 20, 20, 3)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    out1 = ra.auto_augment(key, jnp.asarray(img))
    out2 = ra.auto_augment(key, jnp.asarray(img))
    assert out1.shape == img.shape and out1.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))  # seeded
    assert float(out1.min()) >= 0.0 and float(out1.max()) <= 1.0
    # different images get different sub-policies -> batch isn't constant
    deltas = np.abs(np.asarray(out1) - img).reshape(8, -1).max(1)
    assert (deltas > 1e-3).sum() >= 4  # v0: most sub-policies modify

    with pytest.raises(ValueError):
        ra.auto_augment(key, jnp.asarray(img), policy="nope")


def test_rand_augment_batch_properties():
    rng = np.random.RandomState(3)
    img = rng.uniform(0, 1, size=(4, 20, 20, 3)).astype(np.float32)
    key = jax.random.PRNGKey(5)
    out = ra.rand_augment(key, jnp.asarray(img), num_layers=2, magnitude=9.0)
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(ra.rand_augment(key, jnp.asarray(img), num_layers=2, magnitude=9.0))
    )


# ---------------------------------------------------------------------------
# JpegCompress (reference dataset/augment.py:110-113)
# ---------------------------------------------------------------------------
def _smooth_test_image(h=64, w=64):
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    img = np.stack([
        0.5 + 0.4 * np.sin(6 * xx) * np.cos(4 * yy),
        0.5 + 0.3 * np.cos(9 * xx * yy),
        0.4 + 0.4 * yy * xx,
    ], axis=-1).astype(np.float32)
    rng = np.random.RandomState(0)
    img += rng.uniform(-0.05, 0.05, img.shape).astype(np.float32)  # texture
    return np.clip(img, 0, 1)


@pytest.mark.parity
def test_device_jpeg_matches_tf_roundtrip():
    """The DCT-quantization approximation must track the real codec
    (tf.image.adjust_jpeg_quality) closely across qualities."""
    tf = pytest.importorskip("tensorflow")
    from vip_cup_2022_tpu.data.augment import jpeg_roundtrip

    img = _smooth_test_image()
    for q in (85, 95):
        ref = tf.image.adjust_jpeg_quality(tf.constant(img), q).numpy()
        ours = np.asarray(jpeg_roundtrip(jnp.asarray(img), jnp.float32(q)))
        mae = np.abs(ours - ref).mean() * 255.0
        assert mae < 3.0, (q, mae)  # within ~3 intensity steps on average
        # and both must be lossy in the same ballpark vs the original
        ref_err = np.abs(ref - img).mean()
        ours_err = np.abs(ours - img).mean()
        assert ours_err < 3 * ref_err + 1e-3, (q, ours_err, ref_err)


def test_random_jpeg_quality_gate_and_range():
    from vip_cup_2022_tpu.data.augment import random_jpeg_quality

    img = jnp.asarray(np.stack([_smooth_test_image(32, 32)] * 8))
    out = random_jpeg_quality(jax.random.PRNGKey(0), img, prob=0.5)
    assert out.shape == img.shape
    deltas = np.abs(np.asarray(out) - np.asarray(img)).reshape(8, -1).max(1)
    assert 0 < (deltas > 1e-6).sum() < 8  # some compressed, some passed through
    out_all = random_jpeg_quality(jax.random.PRNGKey(1), img, prob=1.0)
    deltas = np.abs(np.asarray(out_all) - np.asarray(img)).reshape(8, -1).max(1)
    assert (deltas > 1e-6).all()


def test_host_jpeg_compress():
    from vip_cup_2022_tpu.data.augment import jpeg_compress_host

    img = (_smooth_test_image(32, 32) * 255).astype(np.uint8)
    rng = np.random.RandomState(0)
    out = jpeg_compress_host([img] * 6, rng, prob=1.0)
    assert all(o.shape == img.shape and o.dtype == np.uint8 for o in out)
    assert any(np.abs(o.astype(int) - img.astype(int)).max() > 0 for o in out)
