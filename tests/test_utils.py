"""Utility subsystems: surgery (conv-BN fuse, FLOPs), profiling, Grad-CAM,
visualizing (filter ascent, attention rollout), eval metrics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vip_cup_2022_tpu.models import create_model


@pytest.fixture(scope="module")
def small_resnet():
    return create_model("resnetrs50", input_size=(64, 64), nb_classes=4)


def test_conv_bn_fusion_preserves_output(small_resnet):
    from vip_cup_2022_tpu.utils.surgery import fuse_conv_bn

    module, variables, _ = small_resnet
    x = jnp.asarray(np.random.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    y0 = module.apply(variables, x)
    fused = fuse_conv_bn(variables, ("stem_conv_1", "conv"), ("stem_batch_norm_1",))
    y1 = module.apply(fused, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)


def test_count_params_and_flops(small_resnet):
    from vip_cup_2022_tpu.utils.surgery import count_params, get_flops

    module, variables, _ = small_resnet
    n = count_params(variables)
    assert n > 1e6
    flops = get_flops(lambda v, x: module.apply(v, x), variables, jnp.zeros((1, 64, 64, 3)))
    assert flops > 1e8  # ~GFLOP scale


def test_gradcam(small_resnet):
    from vip_cup_2022_tpu.utils.gradcam import make_gradcam_heatmap, saliency_map

    module, variables, _ = small_resnet
    x = jnp.asarray(np.random.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    cam, logits = make_gradcam_heatmap(module, variables, x)
    assert cam.shape == (2, 2, 2) and logits.shape == (2, 4)
    assert float(jnp.max(cam)) <= 1.0 and float(jnp.min(cam)) >= 0.0
    sal = saliency_map(module, variables, x)
    assert sal.shape == (2, 64, 64)


def test_filter_ascent_and_attention_rollout():
    from vip_cup_2022_tpu.utils.visualizing import (
        attention_rollout,
        get_attention_scores,
        visualize_filters,
    )

    module, variables, _ = create_model("vit_tiny_patch16_224", input_size=(64, 64), nb_classes=3, nb_blocks=2)
    img, losses = visualize_filters(module, variables, filter_index=0, input_shape=(64, 64), iterations=3)
    assert img.shape == (64, 64, 3)
    assert losses[-1] >= losses[0] - 1e-3  # ascending

    x = jnp.asarray(np.random.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    scores = get_attention_scores(module, variables, x)
    assert len(scores) == 2  # one per block
    mask = attention_rollout(scores)
    assert mask.shape == (2, 16)  # 4x4 grid tokens


def test_time_function():
    from vip_cup_2022_tpu.utils.profile import time_function

    f = jax.jit(lambda x: x * 2)
    sec = time_function(f, jnp.ones((128, 128)), iters=3)
    assert sec > 0


def test_convert_precision(small_resnet):
    from vip_cup_2022_tpu.utils.surgery import convert_precision

    _, variables, _ = small_resnet
    out = convert_precision(variables["params"], jnp.bfloat16)
    from flax.traverse_util import flatten_dict

    assert all(v.dtype == jnp.bfloat16 for v in flatten_dict(out).values())
