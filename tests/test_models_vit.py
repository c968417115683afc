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


@pytest.mark.parity
def test_parity_cait(reference_models_path, tmp_path):
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    try:
        from tfimm.architectures.cait import CaiT as RefCaiT, CaiTConfig as RefCfg
    finally:
        sys.path.remove(reference_models_path)

    cfg = RefCfg(
        name="cait_test", nb_classes=7, input_size=(96, 96), patch_size=16,
        embed_dim=64, nb_blocks=2, nb_heads=2, init_scale=1e-5,
    )
    ref = RefCaiT(cfg)
    ref(ref.dummy_inputs)
    h5 = os.path.join(tmp_path, "cait.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "cait_xxs24_224", input_size=(96, 96), nb_classes=7, embed_dim=64,
        nb_blocks=2, nb_heads=2, mean=None, std=None, classifier_activation=None,
    )
    loaded = convert_keras_h5(h5, "cait_test")
    merged = transfer_weights(loaded, v)

    from flax.traverse_util import flatten_dict

    src = set(flatten_dict(loaded["params"]))
    dst = flatten_dict(v["params"])
    missing = [k for k in dst if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"

    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_pit(reference_models_path, tmp_path):
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    try:
        from tfimm.architectures.pit import (
            PoolingVisionTransformer as RefPiT,
            PoolingVisionTransformerConfig as RefCfg,
        )
    finally:
        sys.path.remove(reference_models_path)

    cfg = RefCfg(
        name="pit_test", nb_classes=7, input_size=(96, 96), patch_size=16, stride=8,
        embed_dim=(32, 64, 128), nb_blocks=(1, 2, 1), nb_heads=(2, 4, 8),
        distilled=True,
    )
    ref = RefPiT(cfg)
    ref(ref.dummy_inputs)
    h5 = os.path.join(tmp_path, "pit.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "pit_ti_distilled_224", input_size=(96, 96), nb_classes=7,
        embed_dim=(32, 64, 128), nb_blocks=(1, 2, 1), nb_heads=(2, 4, 8),
        mean=None, std=None, classifier_activation=None,
    )
    loaded = convert_keras_h5(h5, "pit_test")
    merged = transfer_weights(loaded, v)

    from flax.traverse_util import flatten_dict

    src = set(flatten_dict(loaded["params"]))
    dst = flatten_dict(v["params"])
    missing = [k for k in dst if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"

    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_pvt_v1_and_v2(reference_models_path, tmp_path):
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    try:
        from tfimm.architectures.pvt import (
            PyramidVisionTransformer as RefPVT,
            PyramidVisionTransformerConfig as RefCfg,
        )
        from tfimm.architectures.pvt_v2 import (
            PyramidVisionTransformerV2 as RefPVT2,
            PyramidVisionTransformerV2Config as RefCfg2,
        )
    finally:
        sys.path.remove(reference_models_path)

    from flax.traverse_util import flatten_dict

    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)

    cfg = RefCfg(name="pvt_test", nb_classes=7, input_size=(96, 96),
                 embed_dim=(16, 32, 64, 128), nb_blocks=(1, 1, 1, 1),
                 nb_heads=(1, 2, 4, 8))
    ref = RefPVT(cfg)
    ref(ref.dummy_inputs)
    h5 = os.path.join(tmp_path, "pvt.h5")
    ref.save_weights(h5)
    y_ref = ref(x, training=False).numpy()
    m, v, _ = create_model(
        "pvt_tiny", input_size=(96, 96), nb_classes=7, embed_dim=(16, 32, 64, 128),
        nb_blocks=(1, 1, 1, 1), nb_heads=(1, 2, 4, 8),
        mean=None, std=None, classifier_activation=None,
    )
    loaded = convert_keras_h5(h5, "pvt_test")
    merged = transfer_weights(loaded, v)
    src = set(flatten_dict(loaded["params"]))
    missing = [k for k in flatten_dict(v["params"]) if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)

    cfg2 = RefCfg2(name="pvt_v2_test", nb_classes=7, input_size=(96, 96),
                   embed_dim=(16, 32, 64, 128), nb_blocks=(1, 1, 1, 1),
                   nb_heads=(1, 2, 4, 8))
    ref2 = RefPVT2(cfg2)
    ref2(ref2.dummy_inputs)
    h5b = os.path.join(tmp_path, "pvt2.h5")
    ref2.save_weights(h5b)
    y_ref2 = ref2(x, training=False).numpy()
    m2, v2, _ = create_model(
        "pvt_v2_b0", input_size=(96, 96), nb_classes=7, embed_dim=(16, 32, 64, 128),
        nb_blocks=(1, 1, 1, 1), nb_heads=(1, 2, 4, 8),
        mean=None, std=None, classifier_activation=None,
    )
    loaded2 = convert_keras_h5(h5b, "pvt_v2_test")
    merged2 = transfer_weights(loaded2, v2)
    src2 = set(flatten_dict(loaded2["params"]))
    missing2 = [k for k in flatten_dict(v2["params"]) if k not in src2]
    assert not missing2, f"unmatched params: {missing2[:10]}"
    y2 = np.asarray(m2.apply(merged2, jnp.asarray(x)))
    np.testing.assert_allclose(y2, y_ref2, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_swin_v1(reference_models_path, tmp_path):
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    try:
        from tfimm.architectures.swin import (
            SwinTransformer as RefSwin,
            SwinTransformerConfig as RefCfg,
        )
    finally:
        sys.path.remove(reference_models_path)

    cfg = RefCfg(
        name="swin_test", nb_classes=7, input_size=(224, 224), patch_size=4,
        embed_dim=24, nb_blocks=(1, 2, 1, 1), nb_heads=(2, 2, 4, 4),
        window_size=7, drop_path_rate=0.0,
    )
    ref = RefSwin(cfg)
    ref(ref.dummy_inputs)
    h5 = os.path.join(tmp_path, "swin.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(1, 224, 224, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "swin_tiny_patch4_window7_224", input_size=(224, 224), nb_classes=7,
        embed_dim=24, nb_blocks=(1, 2, 1, 1), nb_heads=(2, 2, 4, 4),
        drop_path_rate=0.0, mean=None, std=None, classifier_activation=None,
    )
    loaded = convert_keras_h5(h5, "swin_test")
    merged = transfer_weights(loaded, v)

    from flax.traverse_util import flatten_dict

    src = set(flatten_dict(loaded["params"]))
    missing = [k for k in flatten_dict(v["params"]) if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_resnetv2(reference_models_path, tmp_path):
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    try:
        from tfimm.architectures.resnetv2 import ResNetV2 as RefRV2, ResNetV2Config as RefCfg
    finally:
        sys.path.remove(reference_models_path)

    cfg = RefCfg(
        name="resnetv2_test", nb_classes=7, input_size=(96, 96),
        nb_blocks=(1, 1, 1, 1), nb_channels=(128, 128, 256, 256), width_factor=1,
    )
    ref = RefRV2(cfg)
    ref(ref.dummy_inputs)
    h5 = os.path.join(tmp_path, "rv2.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "resnetv2_50x1_bitm", input_size=(96, 96), nb_classes=7,
        nb_blocks=(1, 1, 1, 1), nb_channels=(128, 128, 256, 256),
        mean=None, std=None, classifier_activation=None,
    )
    loaded = convert_keras_h5(h5, "resnetv2_test")
    merged = transfer_weights(loaded, v)

    from flax.traverse_util import flatten_dict

    src = set(flatten_dict(loaded["params"]))
    missing = [k for k in flatten_dict(v["params"]) if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_resnetv2_nonpreact(reference_models_path, tmp_path):
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    try:
        from tfimm.architectures.resnetv2 import ResNetV2 as RefRV2, ResNetV2Config as RefCfg
    finally:
        sys.path.remove(reference_models_path)

    cfg = RefCfg(
        name="resnetv2_np_test", nb_classes=7, input_size=(96, 96), preact=False,
        nb_blocks=(1, 1, 1, 1), nb_channels=(128, 128, 256, 256), width_factor=1,
    )
    ref = RefRV2(cfg)
    ref(ref.dummy_inputs)
    h5 = os.path.join(tmp_path, "rv2np.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "resnetv2_50x1_bitm", input_size=(96, 96), nb_classes=7, preact=False,
        nb_blocks=(1, 1, 1, 1), nb_channels=(128, 128, 256, 256),
        mean=None, std=None, classifier_activation=None,
    )
    loaded = convert_keras_h5(h5, "resnetv2_np_test")
    merged = transfer_weights(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_vit_hybrid(reference_models_path, tmp_path):
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    try:
        from tfimm.architectures.vit import ViT as RefViT, ViTConfig as RefCfg
    finally:
        sys.path.remove(reference_models_path)

    cfg = RefCfg(
        name="vit_hy_test", nb_classes=7, input_size=(128, 128),
        patch_layer="hybrid_embeddings", patch_nb_blocks=(1, 1),
        patch_size=1, embed_dim=64, nb_blocks=2, nb_heads=2,
    )
    ref = RefViT(cfg)
    ref(ref.dummy_inputs)
    h5 = os.path.join(tmp_path, "vith.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 128, 128, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "vit_small_r26_s32_224", input_size=(128, 128), nb_classes=7,
        patch_nb_blocks=(1, 1), embed_dim=64, nb_blocks=2, nb_heads=2,
        mean=None, std=None, classifier_activation=None,
    )
    loaded = convert_keras_h5(h5, "vit_hy_test")
    merged = transfer_weights(loaded, v)

    from flax.traverse_util import flatten_dict

    src = set(flatten_dict(loaded["params"]))
    missing = [k for k in flatten_dict(v["params"]) if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)
