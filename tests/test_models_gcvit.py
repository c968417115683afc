"""GCViT: shapes, window/global-query mechanics, and numerical parity against
the reference gcvit-tf zoo via the h5 converter."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vip_cup_2022_tpu.models import create_model, list_models, transfer_weights
from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5


def test_registry():
    assert {"gcvit_xxtiny", "gcvit_tiny", "gcvit_base"}.issubset(set(list_models("gcvit*")))
    assert "GCViTTiny" in list_models("GCViT*")


def test_forward_shapes_224_and_200():
    # tiny dims: the geometry (stem grid, fit-window pads, level count) is
    # what's under test, not the full xxtiny width/depth
    tiny = dict(dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8))
    module, variables, _ = create_model(
        "gcvit_xxtiny", input_size=(224, 224), nb_classes=5, **tiny
    )
    y = module.apply(variables, jnp.zeros((2, 224, 224, 3)))
    assert y.shape == (2, 5)
    # the competition's 200x200 path: stem grid 50 -> fit-window pads to 56
    module, variables, _ = create_model(
        "gcvit_xxtiny", input_size=(200, 200), nb_classes=1,
        classifier_activation="sigmoid", **tiny
    )
    y = module.apply(variables, jnp.zeros((1, 200, 200, 3)))
    assert y.shape == (1, 1)


def test_features_only_grid():
    module, variables, _ = create_model(
        "gcvit_xxtiny", input_size=(224, 224), dim=16, depths=(1, 1, 1, 1),
        num_heads=(1, 2, 4, 8),
    )
    f = module.apply(variables, jnp.zeros((1, 224, 224, 3)), features_only=True)
    assert f.shape == (1, 7, 7, 128)


@pytest.mark.parity
def test_parity_vs_reference_keras(reference_models_path, tmp_path):
    """Random-init reference GCViT-XXTiny -> h5 -> converted weights must
    reproduce the Keras outputs."""
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    try:
        from gcvit import GCViTXXTiny as RefGCViTXXTiny
    finally:
        sys.path.remove(reference_models_path)

    ref_model = RefGCViTXXTiny(input_shape=(224, 224, 3), pretrain=False)
    h5_path = os.path.join(tmp_path, "gcvit_xxt.h5")
    ref_model.save_weights(h5_path)

    x = np.random.uniform(0, 1, size=(2, 224, 224, 3)).astype(np.float32)
    y_ref = ref_model(x, training=False).numpy()

    module, variables, _ = create_model("gcvit_xxtiny", input_size=(224, 224))
    loaded = convert_keras_h5(h5_path, "gcvit_xxtiny")
    merged = transfer_weights(loaded, variables)
    y = np.asarray(module.apply(merged, jnp.asarray(x)))

    # every parameter must have been matched (no silent dst-init keeps)
    from flax.traverse_util import flatten_dict

    src_flat = flatten_dict(loaded["params"])
    dst_flat = flatten_dict(variables["params"])
    missing = [k for k in dst_flat if k not in src_flat]
    assert not missing, f"unmatched params: {missing[:10]}"

    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)
