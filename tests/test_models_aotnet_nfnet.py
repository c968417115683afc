"""ResNest (aotnet/split-attention) + ECA_NFNet: h5-conversion parity."""
import os
import sys

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


@pytest.fixture()
def ref_path(reference_models_path):
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    yield reference_models_path
    sys.path.remove(reference_models_path)


@pytest.mark.parity
def test_parity_resnest50(ref_path, tmp_path):
    from keras_cv_attention_models.resnest import ResNest50

    ref = ResNest50(input_shape=(96, 96, 3), pretrained=None, num_classes=5)
    h5 = os.path.join(tmp_path, "rn.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model("ResNest50", input_size=(96, 96), nb_classes=5, mean=None, std=None)
    loaded = convert_keras_h5(h5, "ResNest50")
    merged = transfer_weights(loaded, v)
    _assert_all_matched(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_eca_nfnetl0(ref_path, tmp_path):
    from keras_cv_attention_models.nfnets import ECA_NFNetL0

    ref = ECA_NFNetL0(input_shape=(96, 96, 3), pretrained=None, num_classes=5)
    h5 = os.path.join(tmp_path, "nf.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model("ECA_NFNetL0", input_size=(96, 96), nb_classes=5, mean=None, std=None)
    loaded = convert_keras_h5(h5, "ECA_NFNetL0")
    merged = transfer_weights(loaded, v)
    _assert_all_matched(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_resnet50d(ref_path, tmp_path):
    from keras_cv_attention_models.resnet_family import ResNet50D

    ref = ResNet50D(input_shape=(96, 96, 3), pretrained=None, num_classes=5)
    h5 = os.path.join(tmp_path, "rd.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model("ResNet50D", input_size=(96, 96), nb_classes=5, mean=None, std=None)
    loaded = convert_keras_h5(h5, "ResNet50D")
    merged = transfer_weights(loaded, v)
    _assert_all_matched(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)
