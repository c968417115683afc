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


@pytest.mark.parity
def test_parity_regnety(ref_path, tmp_path):
    from keras_cv_attention_models.resnet_family.regnet import RegNetY

    ref = RegNetY(
        num_blocks=[1, 1, 1, 1], out_channels=[32, 64, 96, 128],
        input_shape=(64, 64, 3), num_classes=7, pretrained=None,
        model_name="regnety_test",
    )
    h5 = os.path.join(tmp_path, "ry.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    se = (
        (0.25 * 32 / 32, 0.25),
        (0.25 * 32 / 64, 0.25),
        (0.25 * 64 / 96, 0.25),
        (0.25 * 96 / 128, 0.25),
    )
    m, v, _ = create_model(
        "RegNetY032", input_size=(64, 64), nb_classes=7,
        num_blocks=(1, 1, 1, 1), out_channels=(32, 64, 96, 128), se_ratio=se,
        mean=None, std=None,
    )
    loaded = convert_keras_h5(h5, "regnety_test")
    merged = transfer_weights(loaded, v)
    _assert_all_matched(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_regnetz_b16(ref_path, tmp_path):
    from keras_cv_attention_models.resnet_family import RegNetZB16

    ref = RegNetZB16(input_shape=(64, 64, 3), num_classes=7, pretrained=None)
    h5 = os.path.join(tmp_path, "rz.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(1, 64, 64, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model("RegNetZB16", input_size=(64, 64), nb_classes=7, mean=None, std=None)
    loaded = convert_keras_h5(h5, "regnetz_b16")
    merged = transfer_weights(loaded, v)
    _assert_all_matched(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_resnet51q(ref_path, tmp_path):
    from keras_cv_attention_models.resnet_family.resnet_quad import ResNetQ as RefQ

    ref = RefQ(
        num_blocks=[1, 1, 1, 1], out_channels=[32, 64, 96, 128],
        stem_width=64, expansion=[4, 4, 4, 1], groups_div=[32, 32, 32, 1],
        num_features=256, input_shape=(64, 64, 3), num_classes=7,
        pretrained=None, model_name="resnetq_test",
    )
    h5 = os.path.join(tmp_path, "rq.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "ResNet51Q", input_size=(64, 64), nb_classes=7,
        num_blocks=(1, 1, 1, 1), out_channels=(32, 64, 96, 128),
        stem_width=64, num_features=256, mean=None, std=None,
    )
    loaded = convert_keras_h5(h5, "resnetq_test")
    merged = transfer_weights(loaded, v)
    _assert_all_matched(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_resnet61q(ref_path, tmp_path):
    from keras_cv_attention_models.resnet_family.resnet_quad import ResNetQ as RefQ

    ref = RefQ(
        num_blocks=[1, 1, 1, 1], out_channels=[64, 64, 96, 128],
        stem_width=64, stem_act=True, expansion=[1, 4, 4, 1],
        groups_div=[0, 32, 32, 1], extra_conv=True, num_features=256,
        input_shape=(64, 64, 3), num_classes=7, pretrained=None,
        model_name="resnetq61_test",
    )
    h5 = os.path.join(tmp_path, "rq61.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "ResNet61Q", input_size=(64, 64), nb_classes=7,
        num_blocks=(1, 1, 1, 1), out_channels=(64, 64, 96, 128),
        stem_width=64, num_features=256, mean=None, std=None,
    )
    loaded = convert_keras_h5(h5, "resnetq61_test")
    merged = transfer_weights(loaded, v)
    _assert_all_matched(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_regnetz_evo(ref_path, tmp_path):
    from keras_cv_attention_models.resnet_family import RegNetZC16_EVO

    ref = RegNetZC16_EVO(input_shape=(64, 64, 3), num_classes=7, pretrained=None)
    h5 = os.path.join(tmp_path, "rzevo.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(1, 64, 64, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model("RegNetZC16_EVO", input_size=(64, 64), nb_classes=7, mean=None, std=None)
    loaded = convert_keras_h5(h5, "regnetz_c16_evo")
    merged = transfer_weights(loaded, v)
    _assert_all_matched(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_timm_resnet(ref_path, tmp_path):
    """tfimm resnet: deep_tiered stem + avg downsample + eca + bottleneck."""
    from tfimm.architectures.resnet import ResNet as RefResNet, ResNetConfig as RefCfg

    cfg = RefCfg(
        name="resnet_test", nb_classes=7, input_size=(96, 96), block="bottleneck",
        nb_blocks=(1, 1, 1, 1), stem_type="deep_tiered", stem_width=32,
        downsample_mode="avg", attn_layer="eca",
    )
    ref = RefResNet(cfg)
    ref(ref.dummy_inputs)
    h5 = os.path.join(tmp_path, "timm_rn.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "ecaresnet26t", input_size=(96, 96), nb_classes=7,
        nb_blocks=(1, 1, 1, 1), mean=None, std=None, classifier_activation=None,
    )
    loaded = convert_keras_h5(h5, "resnet_test", mapper="timm_resnet")
    merged = transfer_weights(loaded, v)
    _assert_all_matched(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_timm_resnet_basic_se_blur(ref_path, tmp_path):
    """tfimm resnet: basic block + se + blurpool + default stem + conv down."""
    from tfimm.architectures.resnet import ResNet as RefResNet, ResNetConfig as RefCfg

    cfg = RefCfg(
        name="seresnet_test", nb_classes=7, input_size=(96, 96), block="basic_block",
        nb_blocks=(1, 1, 1, 1), attn_layer="se", aa_layer="blur_pool",
    )
    ref = RefResNet(cfg)
    ref(ref.dummy_inputs)
    h5 = os.path.join(tmp_path, "timm_rn2.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "resnet18", input_size=(96, 96), nb_classes=7,
        nb_blocks=(1, 1, 1, 1), attn_layer="se", aa_layer="blur_pool",
        mean=None, std=None, classifier_activation=None,
    )
    loaded = convert_keras_h5(h5, "seresnet_test")
    merged = transfer_weights(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)
