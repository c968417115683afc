"""ResNet-RS: registry/factory behavior, forward shapes, and full numerical
parity against the reference Keras implementation via the h5 converter."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vip_cup_2022_tpu.models import create_model, list_models, transfer_weights
from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5


def test_registry_lists_family():
    names = list_models("resnetrs*")
    assert {"resnetrs50", "resnetrs101", "resnetrs200"}.issubset(set(names))
    assert "ResNetRS50" in list_models("ResNetRS*")


def test_forward_shape_and_sigmoid_head():
    module, variables, cfg = create_model(
        "resnetrs50", input_size=(64, 64), nb_classes=1, classifier_activation="sigmoid"
    )
    x = jnp.asarray(np.random.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    y = module.apply(variables, x)
    assert y.shape == (2, 1)
    assert np.all((np.asarray(y) >= 0) & (np.asarray(y) <= 1))


def test_features_only():
    module, variables, _ = create_model("resnetrs50", input_size=(64, 64))
    x = jnp.zeros((1, 64, 64, 3))
    feats = module.apply(variables, x, features_only=True)
    assert feats.shape == (1, 2, 2, 2048)


def test_first_strides_knob():
    # team modification: stem stride 1 doubles the feature-map resolution
    module, variables, _ = create_model("resnetrs50", input_size=(64, 64), first_strides=1)
    x = jnp.zeros((1, 64, 64, 3))
    feats = module.apply(variables, x, features_only=True)
    assert feats.shape == (1, 4, 4, 2048)


def test_transfer_weights_first_conv_adaptation():
    _, src_vars, _ = create_model("resnetrs50", input_size=(64, 64))
    module, dst_vars, _ = create_model("resnetrs50", input_size=(64, 64), in_channels=1)
    out = transfer_weights(src_vars, dst_vars)
    k_src = np.asarray(src_vars["params"]["stem_conv_1"]["conv"]["kernel"])
    k_dst = np.asarray(out["params"]["stem_conv_1"]["conv"]["kernel"])
    assert k_dst.shape[2] == 1
    np.testing.assert_allclose(k_dst[:, :, 0], k_src.sum(axis=2), atol=1e-6)


@pytest.mark.parity
def test_parity_vs_reference_keras(reference_models_path, tmp_path):
    """Golden test: random-init reference Keras ResNetRS50, convert its h5
    weights, and require max |Δ| < 1e-4 on the softmax outputs."""
    tf = pytest.importorskip("tensorflow")
    tf_keras = pytest.importorskip("tf_keras")
    # the reference zoo is Keras-2 code; route its bare `keras` imports to the
    # legacy package (tf.keras already redirects via TF_USE_LEGACY_KERAS)
    from tf_keras.src.applications import imagenet_utils as _iu

    keras_apps = type(sys)("keras.applications")
    keras_apps.imagenet_utils = _iu
    sys.modules.setdefault("keras.applications", keras_apps)
    sys.path.insert(0, reference_models_path)
    try:
        from resnet_rs import ResNetRS50 as RefResNetRS50  # reference zoo
    finally:
        sys.path.remove(reference_models_path)

    ref_model = RefResNetRS50(weights=None, input_shape=(96, 96, 3), classes=11)
    h5_path = os.path.join(tmp_path, "rs50.h5")
    ref_model.save_weights(h5_path)

    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    y_ref = ref_model(x, training=False).numpy()

    module, variables, _ = create_model(
        "resnetrs50", input_size=(96, 96), nb_classes=11, mean=None, std=None
    )
    loaded = convert_keras_h5(h5_path, "resnetrs50")
    variables = transfer_weights(loaded, variables)
    y = np.asarray(module.apply(variables, jnp.asarray(x)))

    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)
