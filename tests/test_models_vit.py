"""ViT/DeiT: shapes + h5-conversion parity vs reference tfimm."""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from vip_cup_2022_tpu.models import create_model, list_models, transfer_weights
from vip_cup_2022_tpu.ops.resize import resize_positional_embedding
from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5


def test_variants_registered():
    assert "vit_base_patch16_224" in list_models("vit*")
    assert "deit_base_distilled_patch16_384" in list_models("deit*")
    assert "vit_huge_patch14_224_in21k" in list_models("vit*")


def test_pos_embed_interpolation():
    pe = jnp.asarray(np.random.randn(1, 1 + 4 * 4, 8).astype(np.float32))
    out = resize_positional_embedding(pe, (4, 4), (7, 7), num_prefix_tokens=1)
    assert out.shape == (1, 1 + 49, 8)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(pe[:, 0]))


@pytest.mark.parity
def test_parity_vit_tiny(reference_models_path, tmp_path):
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    try:
        from tfimm.architectures.vit import ViT as RefViT, ViTConfig as RefCfg
    finally:
        sys.path.remove(reference_models_path)

    cfg = RefCfg(
        name="vit_tiny_test", nb_classes=6, input_size=(96, 96), patch_size=16,
        embed_dim=192, nb_blocks=4, nb_heads=3,
    )
    ref = RefViT(cfg)
    ref(ref.dummy_inputs)
    h5 = os.path.join(tmp_path, "vit.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "vit_tiny_patch16_224", input_size=(96, 96), nb_classes=6, nb_blocks=4,
        mean=None, std=None, classifier_activation=None,
    )
    loaded = convert_keras_h5(h5, "vit_tiny_test")
    merged = transfer_weights(loaded, v)

    from flax.traverse_util import flatten_dict

    src = set(flatten_dict(loaded["params"]))
    dst = flatten_dict(v["params"])
    missing = [k for k in dst if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"

    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)
