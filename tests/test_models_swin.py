"""Swin-V2: shapes + h5-conversion parity vs kecam reference."""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from vip_cup_2022_tpu.models import create_model, transfer_weights
from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5


def test_swin_shapes_odd_input():
    # 200x200: stem /4 -> 50 -> ceil-pad shifted windows exercise the mask path
    m, v, _ = create_model("SwinTransformerV2Tiny_window8", input_size=(200, 200), nb_classes=1, classifier_activation="sigmoid")
    y = m.apply(v, jnp.zeros((1, 200, 200, 3)))
    assert y.shape == (1, 1)


@pytest.mark.parity
def test_parity_swin_v2_tiny(reference_models_path, tmp_path):
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    try:
        from keras_cv_attention_models.swin_transformer_v2 import SwinTransformerV2Tiny_window8
    finally:
        sys.path.remove(reference_models_path)

    ref = SwinTransformerV2Tiny_window8(input_shape=(128, 128, 3), pretrained=None, num_classes=5)
    h5 = os.path.join(tmp_path, "swin.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 128, 128, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "SwinTransformerV2Tiny_window8", input_size=(128, 128), nb_classes=5,
        mean=None, std=None,
    )
    loaded = convert_keras_h5(h5, "kecam_swin")  # generic kecam mapper
    merged = transfer_weights(loaded, v)

    from flax.traverse_util import flatten_dict

    src = set(flatten_dict(loaded["params"]))
    dst = flatten_dict(v["params"])
    missing = [k for k in dst if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"

    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_hornet_tiny_gf(reference_models_path, tmp_path):
    """HorNet with FFT global filters — exercises gnconv + rfft2d parity."""
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    try:
        from keras_cv_attention_models.hornet import HorNetTinyGF
    finally:
        sys.path.remove(reference_models_path)

    ref = HorNetTinyGF(input_shape=(64, 64, 3), pretrained=None, num_classes=5)
    h5 = os.path.join(tmp_path, "hornet.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "HorNetTinyGF", input_size=(64, 64), nb_classes=5, mean=None, std=None
    )
    loaded = convert_keras_h5(h5, "HorNetTinyGF")
    merged = transfer_weights(loaded, v)

    from flax.traverse_util import flatten_dict

    src = set(flatten_dict(loaded["params"]))
    dst = flatten_dict(v["params"])
    missing = [k for k in dst if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"

    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)
