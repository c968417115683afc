"""EfficientNet (kecam) + ConvNeXt (tfimm): shapes and h5-conversion parity
against the reference zoos."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vip_cup_2022_tpu.models import create_model, transfer_weights
from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5


def _assert_all_matched(loaded, variables):
    from flax.traverse_util import flatten_dict

    src = set(flatten_dict(loaded["params"]))
    dst = flatten_dict(variables["params"])
    missing = [k for k in dst if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"


def test_effnet_shapes():
    m, v, _ = create_model("EfficientNetV2B0", input_size=(96, 96), nb_classes=4)
    y = m.apply(v, jnp.zeros((1, 96, 96, 3)))
    assert y.shape == (1, 4)


def test_convnext_first_down_fd2():
    # team semantics (convnext.py:115,:323): stem stride = first_down*2, so the
    # DEFAULT is stride 2 (fine grid for 200x200 inputs) and _fd2 restores the
    # standard stride-4 patchify stem
    m, v, _ = create_model("convnext_tiny", input_size=(64, 64), nb_classes=0)
    f = m.apply(v, jnp.zeros((1, 64, 64, 3)), features_only=True)
    assert f.shape == (1, 3, 3, 768)  # 64 ->31 (k4 s2 valid) ->15 ->7 ->3
    m2, v2, _ = create_model("convnext_tiny", input_size=(64, 64), nb_classes=0, first_down=2)
    f2 = m2.apply(v2, jnp.zeros((1, 64, 64, 3)), features_only=True)
    assert f2.shape == (1, 2, 2, 768)  # 64 ->16 ->8 ->4 ->2


@pytest.fixture()
def ref_path(reference_models_path):
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    yield reference_models_path
    sys.path.remove(reference_models_path)


@pytest.mark.parity
def test_parity_efficientnet_v2t(ref_path, tmp_path):
    from keras_cv_attention_models.efficientnet import EfficientNetV2T

    ref = EfficientNetV2T(input_shape=(96, 96, 3), pretrained=None, num_classes=7)
    h5 = os.path.join(tmp_path, "v2t.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "EfficientNetV2T", input_size=(96, 96), nb_classes=7, rescale_mode="raw"
    )
    loaded = convert_keras_h5(h5, "EfficientNetV2T")
    merged = transfer_weights(loaded, v)
    _assert_all_matched(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_efficientnet_v1b0(ref_path, tmp_path):
    from keras_cv_attention_models.efficientnet import EfficientNetV1B0

    ref = EfficientNetV1B0(input_shape=(96, 96, 3), pretrained=None, num_classes=5)
    h5 = os.path.join(tmp_path, "v1b0.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "EfficientNetV1B0", input_size=(96, 96), nb_classes=5, rescale_mode="raw"
    )
    loaded = convert_keras_h5(h5, "EfficientNetV1B0")
    merged = transfer_weights(loaded, v)
    _assert_all_matched(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_convnext_tiny(ref_path, tmp_path):
    from tfimm.architectures.convnext import ConvNeXt as RefConvNeXt
    from tfimm.architectures.convnext import ConvNeXtConfig as RefCfg

    cfg = RefCfg(name="convnext_tiny", nb_classes=6, input_size=(64, 64))
    ref = RefConvNeXt(cfg)
    ref(ref.dummy_inputs)  # build
    h5 = os.path.join(tmp_path, "cnx.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "convnext_tiny", input_size=(64, 64), nb_classes=6,
        mean=None, std=None, classifier_activation=None,
    )
    loaded = convert_keras_h5(h5, "convnext_tiny")
    merged = transfer_weights(loaded, v)
    _assert_all_matched(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)
