"""int8 PTQ pass: eligibility rules, calibration, quantized-vs-f32 closeness.

The pass is the TPU analogue of the reference's TFLite int8 conversion
(model_surgery.py:569-629); these tests run the XLA int8 conv/dot path on CPU
(same semantics as TPU, minus the MXU speed)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vip_cup_2022_tpu.ops.conv import ScaledStdConv  # noqa: E402
from vip_cup_2022_tpu.quant import (  # noqa: E402
    PTQConfig,
    calibrate,
    load_scales,
    quantized,
    save_scales,
)


class TinyNet(nn.Module):
    """Stem (skip: RGB in), two quantizable convs, a depthwise conv (skip),
    an SE-style 1x1-spatial conv (skip), global pool, head dense (skip)."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (3, 3), name="stem_conv")(x)          # in=3: skip
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=(2, 2), name="c1")(x)  # quant
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), feature_group_count=64, name="dw")(x)  # skip
        x = nn.relu(x)
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(64, (1, 1), name="se_gate")(se)           # 1x1 pos: skip
        x = x * jax.nn.sigmoid(se)
        x = nn.Conv(128, (1, 1), name="c2")(x)                 # quant
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(10, name="head_fc")(x)                 # head: skip


class StdNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ScaledStdConv(48, 3, name="in_conv")(x)
        x = nn.relu(x)
        x = ScaledStdConv(64, 3, strides=2, name="mid_conv")(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(5, name="head_fc")(x)


@pytest.fixture(scope="module")
def tiny():
    mod = TinyNet()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3), jnp.float32)
    variables = mod.init(rng, x)
    return mod, variables, x


def test_calibration_sites(tiny):
    mod, variables, x = tiny
    scales = calibrate(lambda b: mod.apply(variables, b), [x])
    assert set(scales) == {"c1", "c2"}, scales
    assert all(v > 0 for v in scales.values())


def test_quantized_close_and_site_report(tiny):
    mod, variables, x = tiny
    scales = calibrate(lambda b: mod.apply(variables, b), [x])
    ref = mod.apply(variables, x)
    report = {}
    qfn = quantized(lambda b: mod.apply(variables, b), scales, report=report)
    got = qfn(x)
    assert sorted(report["quantized_sites"]) == ["c1", "c2"]
    # int8 PTQ tolerance: logits should track closely on unit-scale inputs
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    rng_ = np.abs(np.asarray(ref)).max()
    assert err < 0.05 * max(rng_, 1.0), (err, rng_)


def test_quantized_under_jit(tiny):
    mod, variables, x = tiny
    scales = calibrate(lambda b: mod.apply(variables, b), [x])
    qfn = jax.jit(quantized(lambda b: mod.apply(variables, b), scales))
    ref = mod.apply(variables, x)
    got = qfn(x)
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 0.1


def test_int8_ops_actually_in_graph(tiny):
    """The quantized trace must contain s8xs8->s32 convs, not just f32."""
    mod, variables, x = tiny
    scales = calibrate(lambda b: mod.apply(variables, b), [x])
    qfn = quantized(lambda b: mod.apply(variables, b), scales)
    txt = jax.make_jaxpr(qfn)(x).pretty_print()
    assert "preferred_element_type=int32" in txt
    assert "convert_element_type[new_dtype=int8" in txt


def test_scaled_std_conv_quant():
    mod = StdNet()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 12, 36), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    scales = calibrate(lambda b: mod.apply(variables, b), [x])
    assert set(scales) == {"in_conv", "mid_conv"}
    ref = mod.apply(variables, x)
    report = {}
    got = quantized(lambda b: mod.apply(variables, b), scales, report=report)(x)
    assert sorted(report["quantized_sites"]) == ["in_conv", "mid_conv"]
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert err < 0.05 * max(np.abs(np.asarray(ref)).max(), 1.0), err


def test_scales_roundtrip(tmp_path, tiny):
    mod, variables, x = tiny
    scales = calibrate(lambda b: mod.apply(variables, b), [x])
    p = str(tmp_path / "scales.json")
    save_scales(p, scales)
    assert load_scales(p) == pytest.approx(scales)


def test_engine_fused_ensemble_int8(tiny):
    """build_fused_ensemble(quant_scales=...) quantizes that member inside
    the fused program and matches the f32 program closely."""
    from vip_cup_2022_tpu.infer.engine import NATIVE_SIZE, EnsembleEngine

    engine = EnsembleEngine(verbose=0, compute_dtype=jnp.float32)
    mod = TinyNet()
    u8 = np.random.RandomState(0).randint(
        0, 256, (2, *NATIVE_SIZE, 3), np.uint8
    )
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, *NATIVE_SIZE, 3), jnp.float32))
    scales = engine._calibrate_member(mod, variables, NATIVE_SIZE, u8)
    assert scales, "no sites calibrated"
    key = jax.random.PRNGKey(0)
    f32 = engine.build_fused_ensemble([(mod, NATIVE_SIZE)], tta=1,
                                      sharded=False)
    i8 = engine.build_fused_ensemble([(mod, NATIVE_SIZE)], tta=1,
                                     sharded=False, quant_scales=[scales])
    a = np.asarray(f32([[variables]], u8, key))
    b = np.asarray(i8([[variables]], u8, key))
    assert np.abs(a - b).max() < 0.02, np.abs(a - b).max()


def test_member_model_quantizes():
    """A real zoo member (ResNetRS50 at tiny input) calibrates and quantizes
    with many sites and close outputs."""
    from vip_cup_2022_tpu.models import create_model

    module, variables, _ = create_model(
        "ResNetRS50", input_size=(64, 64), nb_classes=8
    )
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3), jnp.float32)
    scales = calibrate(lambda b: module.apply(variables, b), [x])
    assert len(scales) > 20, len(scales)
    ref = module.apply(variables, x)
    report = {}
    got = quantized(lambda b: module.apply(variables, b), scales,
                    report=report)(x)
    assert len(report["quantized_sites"]) > 20
    # head stays f32: the final probabilities should track within PTQ noise
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert err < 0.08, err
