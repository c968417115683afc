"""Unit tests for the ops toolkit — numerics vs torch (padding / depthwise /
activations oracles) and internal invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vip_cup_2022_tpu import ops


def test_make_divisible():
    # kecam semantics (common_layers.py:398-407)
    assert ops.make_divisible(16, 8) == 16
    assert ops.make_divisible(17, 8) == 16
    # round-down guard: 8 < 0.9*10 so bumped up a divisor step
    assert ops.make_divisible(10, 8) == 16
    assert ops.make_divisible(4, 8) == 8
    assert ops.make_divisible(30, 8) == 32


@pytest.mark.parametrize("act,x,expected", [
    ("hard_swish", 3.0, 3.0),
    ("hard_swish", -3.0, 0.0),
    ("hard_sigmoid_torch", 0.0, 0.5),
    ("hard_sigmoid_torch", 3.0, 1.0),
    ("relu6", 7.0, 6.0),
])
def test_activation_values(act, x, expected):
    out = ops.apply_activation(jnp.asarray(x), act)
    assert np.allclose(out, expected, atol=1e-6)


def test_mish_vs_torch():
    torch = pytest.importorskip("torch")
    x = np.random.randn(64).astype(np.float32)
    ours = ops.apply_activation(jnp.asarray(x), "mish")
    theirs = torch.nn.functional.mish(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


@pytest.mark.parametrize("stride,kernel", [(1, 3), (2, 3), (2, 7), (1, 1)])
def test_torch_padding_conv_matches_torch(stride, kernel):
    """Our 'torch' padding must reproduce torch Conv2d(padding=k//2)."""
    torch = pytest.importorskip("torch")
    x = np.random.randn(2, 16, 16, 8).astype(np.float32)
    conv = ops.Conv(features=4, kernel_size=kernel, strides=stride, padding="torch")
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = conv.apply(variables, jnp.asarray(x))

    w = np.asarray(variables["params"]["conv"]["kernel"])  # HWIO
    tconv = torch.nn.Conv2d(8, 4, kernel, stride=stride, padding=kernel // 2, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
        ty = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    assert y.shape == ty.shape
    np.testing.assert_allclose(np.asarray(y), ty, atol=1e-4)


def test_depthwise_conv_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.randn(2, 12, 12, 6).astype(np.float32)
    conv = ops.DepthwiseConv(kernel_size=3, strides=2)
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = conv.apply(variables, jnp.asarray(x))

    w = np.asarray(variables["params"]["dw_conv"]["kernel"])  # (3,3,1,6)
    tconv = torch.nn.Conv2d(6, 6, 3, stride=2, padding=1, groups=6, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
        ty = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), ty, atol=1e-4)


def test_batchnorm_inference_numerics():
    bn = ops.BatchNorm(epsilon=1e-5)
    x = jnp.asarray(np.random.randn(4, 8, 8, 16).astype(np.float32))
    variables = bn.init(jax.random.PRNGKey(0), x)
    # hand-set stats
    stats = {"moving_mean": jnp.full((16,), 0.5), "moving_variance": jnp.full((16,), 4.0)}
    params = {"gamma": jnp.full((16,), 2.0), "beta": jnp.full((16,), 1.0)}
    y = bn.apply({"params": params, "batch_stats": stats}, x)
    expected = (np.asarray(x) - 0.5) / np.sqrt(4.0 + 1e-5) * 2.0 + 1.0
    np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5)


def test_batchnorm_training_updates_stats():
    bn = ops.BatchNorm(momentum=0.9)
    x = jnp.asarray(np.random.randn(8, 4, 4, 3).astype(np.float32) * 3 + 1)
    variables = bn.init(jax.random.PRNGKey(0), x)
    _, updated = bn.apply(variables, x, training=True, mutable=["batch_stats"])
    mm = np.asarray(updated["batch_stats"]["moving_mean"])
    expected = 0.9 * 0.0 + 0.1 * np.asarray(x).mean(axis=(0, 1, 2))
    np.testing.assert_allclose(mm, expected, atol=1e-5)


def test_layernorm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.randn(2, 7, 32).astype(np.float32)
    ln = ops.LayerNorm(epsilon=1e-5)
    variables = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = ln.apply(variables, jnp.asarray(x))
    ty = torch.nn.functional.layer_norm(torch.from_numpy(x), (32,), eps=1e-5).numpy()
    np.testing.assert_allclose(np.asarray(y), ty, atol=1e-5)


def test_groupnorm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.randn(2, 6, 6, 32).astype(np.float32)
    gn = ops.GroupNorm(groups=8, epsilon=1e-5)
    variables = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = gn.apply(variables, jnp.asarray(x))
    ty = (
        torch.nn.functional.group_norm(torch.from_numpy(x.transpose(0, 3, 1, 2)), 8, eps=1e-5)
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(np.asarray(y), ty, atol=1e-4)


def test_scaled_std_conv_standardization():
    """Standardized kernel must have ~zero mean and gain-scaled magnitude."""
    conv = ops.ScaledStdConv(features=8, kernel_size=3, gamma=1.7, use_bias=False)
    x = jnp.asarray(np.random.randn(1, 8, 8, 4).astype(np.float32))
    variables = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(variables, x)
    assert y.shape == (1, 8, 8, 8)
    # constant input + standardized (zero-mean) kernel -> output invariant to
    # adding a constant to the kernel
    k = variables["params"]["kernel"]
    v2 = {"params": {**variables["params"], "kernel": k + 5.0}}
    xc = jnp.ones_like(x)
    y1 = conv.apply(variables, xc)
    y2 = conv.apply(v2, xc)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-3)


def test_se_module_shapes_and_range():
    se = ops.SEModule(se_ratio=0.25)
    x = jnp.asarray(np.random.randn(2, 8, 8, 32).astype(np.float32))
    variables = se.init(jax.random.PRNGKey(0), x)
    y = se.apply(variables, x)
    assert y.shape == x.shape


def test_eca_kernel_size_rule():
    # C=32: t = int((5+1)/2) = 3 -> k=3 ; C=256: t = int((8+1)/2)=4 -> k=5
    eca = ops.EcaModule()
    for ch, expected_k in [(32, 3), (256, 5)]:
        x = jnp.zeros((1, 4, 4, ch))
        variables = eca.init(jax.random.PRNGKey(0), x)
        k = variables["params"]["conv1d"]["kernel"].shape[0]
        assert k == expected_k, (ch, k)


def test_drop_path_inference_identity_and_train_mask():
    dp = ops.DropPath(rate=0.5)
    x = jnp.ones((8, 4, 4, 2))
    y = dp.apply({}, x)  # inference: identity, no params
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    y_tr = dp.apply({}, x, training=True, rngs={"dropout": jax.random.PRNGKey(0)})
    vals = np.unique(np.asarray(y_tr))
    assert set(np.round(vals, 4)).issubset({0.0, 2.0})  # dropped or 1/keep-scaled


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.randn(2, 8, 8, 3).astype(np.float32))
    w = ops.window_partition(x, 4)
    assert w.shape == (2 * 4, 4, 4, 3)
    back = ops.window_reverse(w, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_pad_crop_window():
    x = jnp.ones((1, 10, 13, 2))
    padded, (h, w) = ops.pad_to_window(x, 4)
    assert padded.shape == (1, 12, 16, 2) and (h, w) == (12, 16)
    cropped = ops.crop_from_window(padded, 10, 13)
    assert cropped.shape == x.shape


def test_evonorm_b0_inference_shape():
    en = ops.EvoNorm(nonlinearity=True, num_groups=-1)
    x = jnp.asarray(np.random.randn(2, 6, 6, 16).astype(np.float32))
    variables = en.init(jax.random.PRNGKey(0), x)
    y = en.apply(variables, x)
    assert y.shape == x.shape


def test_evonorm_s0_groups():
    en = ops.EvoNorm(nonlinearity=True, num_groups=8)
    x = jnp.asarray(np.random.randn(2, 6, 6, 32).astype(np.float32))
    variables = en.init(jax.random.PRNGKey(0), x)
    y = en.apply(variables, x)
    assert y.shape == x.shape
    assert "moving_variance" not in variables.get("batch_stats", {})


def test_depthwise_blockdiag_lowering_matches():
    """DepthwiseConv's block-diagonal grouped-conv lowering (MXU path) is
    numerically identical to the true-depthwise path."""
    import vip_cup_2022_tpu.ops.conv as convmod
    from vip_cup_2022_tpu.ops.conv import DepthwiseConv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 11, 11, 16)).astype(np.float32))
    m = DepthwiseConv(kernel_size=5, strides=2, padding="torch", use_bias=True)
    v = m.init(jax.random.PRNGKey(0), x)
    # bias isn't created with use_bias in init? ensure flag consistency
    y_ref = m.apply(v, x)
    orig = convmod._use_blockdiag_dw
    convmod._use_blockdiag_dw = lambda: True
    try:
        y_bd = m.apply(v, x)
    finally:
        convmod._use_blockdiag_dw = orig
    np.testing.assert_allclose(np.asarray(y_bd), np.asarray(y_ref), atol=1e-5)
