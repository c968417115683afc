"""MLP family (Mixer/ResMLP/gMLP) + further kecam families: h5-conversion parity."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vip_cup_2022_tpu.models import create_model, transfer_weights
from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5


@pytest.fixture()
def ref_path(reference_models_path):
    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    yield reference_models_path
    sys.path.remove(reference_models_path)


def _check(ref_model, our_name, tmp_path, input_size=(64, 64), nb_classes=5, jit_ref=False, **kw):
    h5 = os.path.join(tmp_path, "m.h5")
    ref_model.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, *input_size, 3)).astype(np.float32)
    if jit_ref:  # some reference ops (6-D softmax) lack eager CPU kernels
        import tensorflow as tf

        y_ref = tf.function(lambda v: ref_model(v, training=False), jit_compile=True)(x).numpy()
    else:
        y_ref = ref_model(x, training=False).numpy()

    m, v, _ = create_model(
        our_name, input_size=input_size, nb_classes=nb_classes, mean=None, std=None, **kw
    )
    loaded = convert_keras_h5(h5, our_name)
    merged = transfer_weights(loaded, v)

    from flax.traverse_util import flatten_dict

    src = set(flatten_dict(loaded["params"]))
    dst = flatten_dict(v["params"])
    missing = [k for k in dst if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"

    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_mlp_mixer_s32(ref_path, tmp_path):
    from keras_cv_attention_models.mlp_family import MLPMixerS32

    ref = MLPMixerS32(input_shape=(64, 64, 3), pretrained=None, num_classes=5)
    _check(ref, "MLPMixerS32", tmp_path)


@pytest.mark.parity
def test_parity_resmlp12(ref_path, tmp_path):
    from keras_cv_attention_models.mlp_family import ResMLP12

    ref = ResMLP12(input_shape=(64, 64, 3), pretrained=None, num_classes=5)
    _check(ref, "ResMLP12", tmp_path)


@pytest.mark.parity
def test_parity_gmlp_tiny16(ref_path, tmp_path):
    from keras_cv_attention_models.mlp_family import GMLPTiny16

    ref = GMLPTiny16(input_shape=(64, 64, 3), pretrained=None, num_classes=5)
    _check(ref, "GMLPTiny16", tmp_path)


@pytest.mark.parity
def test_parity_mobilenetv3_small(ref_path, tmp_path):
    from keras_cv_attention_models.mobilenetv3_family import MobileNetV3Small100

    ref = MobileNetV3Small100(input_shape=(96, 96, 3), pretrained=None, num_classes=5)
    _check(ref, "MobileNetV3Small100", tmp_path, input_size=(96, 96))


@pytest.mark.parity
def test_parity_mobilenetv3_large(ref_path, tmp_path):
    from keras_cv_attention_models.mobilenetv3_family import MobileNetV3Large100

    ref = MobileNetV3Large100(input_shape=(96, 96, 3), pretrained=None, num_classes=5)
    _check(ref, "MobileNetV3Large100", tmp_path, input_size=(96, 96))


@pytest.mark.parity
def test_parity_beit_base(ref_path, tmp_path):
    from keras_cv_attention_models.beit import Beit

    # small beit via the builder (depth 2) for speed; exercises the rel-pos
    # table with cls-token entries and q/v bias layers
    ref = Beit(depth=2, embed_dim=192, num_heads=3, input_shape=(96, 96, 3),
               pretrained=None, num_classes=5, model_name="beit_test")
    _check(ref, "BeitBasePatch16", tmp_path, input_size=(96, 96),
           depth=2, embed_dim=192, num_heads=3)


@pytest.mark.parity
def test_parity_uniformer_small64(ref_path, tmp_path):
    from keras_cv_attention_models.uniformer import UniformerSmall64

    ref = UniformerSmall64(input_shape=(64, 64, 3), pretrained=None, num_classes=5)
    _check(ref, "UniformerSmall64", tmp_path, input_size=(64, 64))


@pytest.mark.parity
def test_parity_botnet26t(ref_path, tmp_path):
    from keras_cv_attention_models.botnet import BotNet26T

    ref = BotNet26T(input_shape=(128, 128, 3), pretrained=None, num_classes=5)
    _check(ref, "BotNet26T", tmp_path, input_size=(128, 128))


@pytest.mark.parity
def test_parity_halonet26t(ref_path, tmp_path):
    from keras_cv_attention_models.halonet import HaloNet26T

    ref = HaloNet26T(input_shape=(256, 256, 3), pretrained=None, num_classes=5)
    _check(ref, "HaloNet26T", tmp_path, input_size=(256, 256), jit_ref=True)


@pytest.mark.parity
def test_parity_cotnet50(ref_path, tmp_path):
    from keras_cv_attention_models.cotnet import CotNet50

    ref = CotNet50(input_shape=(96, 96, 3), pretrained=None, num_classes=5)
    _check(ref, "CotNet50", tmp_path, input_size=(96, 96))


@pytest.mark.parity
def test_parity_coatnet0(ref_path, tmp_path):
    from keras_cv_attention_models.coatnet import CoAtNet0

    ref = CoAtNet0(input_shape=(96, 96, 3), pretrained=None, num_classes=5)
    _check(ref, "CoAtNet0", tmp_path, input_size=(96, 96))


@pytest.mark.parity
def test_parity_wavemlp_t(ref_path, tmp_path):
    from keras_cv_attention_models.mlp_family import WaveMLP_T

    ref = WaveMLP_T(input_shape=(64, 64, 3), pretrained=None, num_classes=5)
    _check(ref, "WaveMLP_T", tmp_path, input_size=(64, 64))


@pytest.mark.parity
def test_parity_edgenext_xx_small(ref_path, tmp_path):
    from keras_cv_attention_models.edgenext import EdgeNeXt_XX_Small

    ref = EdgeNeXt_XX_Small(input_shape=(96, 96, 3), pretrained=None, num_classes=5)
    _check(ref, "EdgeNeXt_XX_Small", tmp_path, input_size=(96, 96))


@pytest.mark.parity
def test_parity_efficientformer_l1(ref_path, tmp_path):
    from keras_cv_attention_models.efficientformer import EfficientFormerL1

    ref = EfficientFormerL1(input_shape=(96, 96, 3), pretrained=None, num_classes=5)
    h5 = os.path.join(tmp_path, "ef.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 96, 96, 3)).astype(np.float32)
    outs = ref(x, training=False)
    y_ref = ((outs[0] + outs[1]) / 2.0).numpy()  # twin heads averaged

    from vip_cup_2022_tpu.models import create_model, transfer_weights
    from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5

    m, v, _ = create_model("EfficientFormerL1", input_size=(96, 96), nb_classes=5, mean=None, std=None)
    loaded = convert_keras_h5(h5, "EfficientFormerL1")
    merged = transfer_weights(loaded, v)
    from flax.traverse_util import flatten_dict

    missing = [k for k in flatten_dict(v["params"]) if k not in set(flatten_dict(loaded["params"]))]
    assert not missing, f"unmatched params: {missing[:10]}"
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_davit_t(ref_path, tmp_path):
    from keras_cv_attention_models.davit import DaViT_T

    ref = DaViT_T(input_shape=(96, 96, 3), pretrained=None, num_classes=5)
    _check(ref, "DaViT_T", tmp_path, input_size=(96, 96))


@pytest.mark.parity
def test_parity_levit128s(ref_path, tmp_path):
    from keras_cv_attention_models.levit import LeViT128S

    ref = LeViT128S(input_shape=(128, 128, 3), pretrained=None, num_classes=5)
    h5 = os.path.join(tmp_path, "lv.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 128, 128, 3)).astype(np.float32)
    outs = ref(x, training=False)
    y_ref = ((outs[0] + outs[1]) / 2.0).numpy()

    from vip_cup_2022_tpu.models import create_model, transfer_weights
    from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5

    m, v, _ = create_model("LeViT128S", input_size=(128, 128), nb_classes=5, mean=None, std=None)
    loaded = convert_keras_h5(h5, "LeViT128S")
    merged = transfer_weights(loaded, v)
    from flax.traverse_util import flatten_dict

    missing = [k for k in flatten_dict(v["params"]) if k not in set(flatten_dict(loaded["params"]))]
    assert not missing, f"unmatched params: {missing[:10]}"
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_mobilevit_xxs(ref_path, tmp_path):
    from keras_cv_attention_models.mobilevit import MobileViT_XXS

    ref = MobileViT_XXS(input_shape=(128, 128, 3), pretrained=None, num_classes=5)
    _check(ref, "MobileViT_XXS", tmp_path, input_size=(128, 128))


@pytest.mark.parity
def test_parity_poolformer_s12(ref_path, tmp_path):
    from tfimm.architectures.poolformer import PoolFormer as RefPF
    from tfimm.architectures.poolformer import PoolFormerConfig as RefCfg

    cfg = RefCfg(name="poolformer_s12", nb_classes=5, input_size=(96, 96),
                 embed_dim=(64, 128, 320, 512), nb_blocks=(2, 2, 6, 2))
    ref = RefPF(cfg)
    ref(ref.dummy_inputs)
    _check(ref, "poolformer_s12", tmp_path, input_size=(96, 96),
           classifier_activation=None)


@pytest.mark.parity
def test_parity_convmixer(ref_path, tmp_path):
    from tfimm.architectures.convmixer import ConvMixer as RefCM
    from tfimm.architectures.convmixer import ConvMixerConfig as RefCfg

    cfg = RefCfg(name="convmixer_test", nb_classes=5, input_size=(96, 96),
                 embed_dim=256, depth=4, patch_size=7, kernel_size=7, act_layer="relu")
    ref = RefCM(cfg)
    ref(ref.dummy_inputs)
    _check(ref, "convmixer_768_32", tmp_path, input_size=(96, 96),
           embed_dim=256, depth=4, classifier_activation=None)


@pytest.mark.parity
def test_parity_nat_mini(ref_path, tmp_path):
    from keras_cv_attention_models.nat import NAT_Mini

    ref = NAT_Mini(input_shape=(128, 128, 3), pretrained=None, num_classes=5)
    _check(ref, "NAT_Mini", tmp_path, input_size=(128, 128), jit_ref=True)


@pytest.mark.parity
def test_parity_cmt_tiny(ref_path, tmp_path):
    from keras_cv_attention_models.cmt import CMTTiny

    ref = CMTTiny(input_shape=(160, 160, 3), pretrained=None, num_classes=5)
    _check(ref, "CMTTiny", tmp_path, input_size=(160, 160))


@pytest.mark.parity
def test_parity_outlook_attention_op(ref_path, tmp_path):
    """Op-level parity for volo outlook attention via a 1-layer keras model."""
    import tensorflow as tf
    from keras_cv_attention_models.volo.volo import outlook_attention

    inp = tf.keras.Input((28, 28, 32))
    out = outlook_attention(inp, 32, num_heads=4, name="oa_")
    ref = tf.keras.Model(inp, out)
    h5 = os.path.join(tmp_path, "oa.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 28, 28, 32)).astype(np.float32)
    # 6-D softmax has no eager CPU kernel; compile the reference with XLA
    y_ref = tf.function(lambda v: ref(v, training=False), jit_compile=True)(x).numpy()

    import flax.linen as nn_flax

    from vip_cup_2022_tpu.models.aotnet import AotNet, AotNetConfig

    class OAModule(AotNet):
        """Expose the outlook-attention op standalone with matching names."""

        @nn_flax.compact
        def __call__(self, x):
            return self._outlook_attention(
                x, 32, {"num_heads": 4, "kernel_size": 3, "strides": 2}, "oa_", False
            )

    m = OAModule(AotNetConfig())
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))

    from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5
    from vip_cup_2022_tpu.models import transfer_weights

    loaded = convert_keras_h5(h5, "aotnet_oa")
    merged = transfer_weights(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_volo(ref_path, tmp_path):
    from keras_cv_attention_models.volo.volo import VOLO as RefVOLO

    ref = RefVOLO(
        num_blocks=[2, 2], embed_dims=[64, 128], num_heads=[2, 4],
        mlp_ratios=[3, 3], stem_hidden_dim=32, input_shape=(112, 112, 3),
        num_classes=7, pretrained=None, model_name="volo_test",
    )
    _check(
        ref, "VOLO_d1", tmp_path, input_size=(112, 112), nb_classes=7,
        jit_ref=True, num_blocks=(2, 2), embed_dims=(64, 128),
        num_heads=(2, 4), stem_hidden_dim=32,
    )


@pytest.mark.parity
def test_parity_coat(ref_path, tmp_path):
    from keras_cv_attention_models.coat.coat import CoaT as RefCoaT

    ref = RefCoaT(
        serial_depths=[1, 1, 1, 1], embed_dims=[32, 32, 32, 32],
        mlp_ratios=[2, 2, 2, 2], parallel_depth=2, patch_size=4, num_heads=8,
        input_shape=(64, 64, 3), num_classes=7, pretrained=None,
        model_name="coat_test",
    )
    _check(
        ref, "CoaTTiny", tmp_path, input_size=(64, 64), nb_classes=7,
        serial_depths=(1, 1, 1, 1), embed_dims=(32, 32, 32, 32),
        mlp_ratios=(2, 2, 2, 2), parallel_depth=2,
    )


@pytest.mark.parity
def test_parity_coat_lite(ref_path, tmp_path):
    from keras_cv_attention_models.coat.coat import CoaT as RefCoaT

    ref = RefCoaT(
        serial_depths=[1, 1, 1, 1], embed_dims=[32, 32, 32, 32],
        mlp_ratios=[2, 2, 2, 2], parallel_depth=0, patch_size=4, num_heads=8,
        input_shape=(64, 64, 3), num_classes=7, pretrained=None,
        model_name="coat_lite_test",
    )
    _check(
        ref, "CoaTLiteTiny", tmp_path, input_size=(64, 64), nb_classes=7,
        serial_depths=(1, 1, 1, 1), embed_dims=(32, 32, 32, 32),
        mlp_ratios=(2, 2, 2, 2),
    )


@pytest.mark.parity
def test_parity_cmt_torch(ref_path, tmp_path):
    from keras_cv_attention_models.cmt.cmt import CMT_torch

    ref = CMT_torch(
        num_blocks=[1, 1, 2, 1], out_channels=(32, 64, 128, 256), stem_width=16,
        ffn_expansion=3.6, input_shape=(128, 128, 3), num_classes=7,
        pretrained=None, model_name="cmt_torch_test",
    )
    _check(
        ref, "CMTTiny_torch", tmp_path, input_size=(128, 128), nb_classes=7,
        num_blocks=(1, 1, 2, 1), out_channels=(32, 64, 128, 256),
    )
