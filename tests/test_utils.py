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


def test_history_combine_and_curve_fit(tmp_path):
    """combine_hist_into_one + log-cubic curve-fit extrapolation + plot_hists
    (reference imagenet/eval_func.py:157-273)."""
    import json

    from vip_cup_2022_tpu.train.history import (
        combine_hist_into_one,
        curve_fit,
        plot_hists,
    )

    h1 = {"loss": [1.0, 0.8, 0.6], "val_loss": [1.1, 0.9, 0.7], "acc": [0.3, 0.5, 0.6], "lr": [0.1, 0.1, 0.05]}
    h2 = {"loss": [0.5, 0.4], "val_loss": [0.6, 0.55], "acc": [0.7, 0.75], "lr": [0.05, 0.01]}
    p1, p2 = tmp_path / "h1.json", tmp_path / "h2.json"
    p1.write_text(json.dumps(h1))
    p2.write_text(json.dumps(h2))
    combined = combine_hist_into_one([str(p1), str(p2)], save_file=str(tmp_path / "all.json"))
    assert combined["loss"] == [1.0, 0.8, 0.6, 0.5, 0.4]
    assert len(combined["acc"]) == 5

    # a curve following a*log(x)+d exactly extrapolates exactly
    xs = np.arange(1, 30, dtype=np.float64)
    src = (0.5 * np.log(xs) + 2.0).tolist()
    ext = curve_fit(src, target_len=5, skip=1, use_recent=20)
    assert len(ext) == len(src) + 5
    want = 0.5 * np.log(np.arange(30, 35)) + 2.0
    np.testing.assert_allclose(ext[-5:], want, rtol=1e-3)

    fig = plot_hists(combined, names="run", pred_curve=0, save_path=str(tmp_path / "h.png"))
    assert (tmp_path / "h.png").exists()
    assert len(fig.axes) == 3  # loss, acc, lr


def test_collect_files_with_suffix(tmp_path):
    from vip_cup_2022_tpu.utils.files import (
        collect_files_with_suffix,
        collect_tfrecord_files,
    )

    (tmp_path / "sub").mkdir()
    (tmp_path / "a.tfrecord").write_text("x")
    (tmp_path / "sub" / "b.tfrec").write_text("x")
    (tmp_path / "c.txt").write_text("x")

    found = collect_tfrecord_files(str(tmp_path))
    assert [f.rsplit("/", 1)[1] for f in found] == ["a.tfrecord", "b.tfrec"]
    # single file, iterable, and missing cases
    assert collect_files_with_suffix(str(tmp_path / "a.tfrecord"), ".tfrecord") == [str(tmp_path / "a.tfrecord")]
    assert collect_files_with_suffix([str(tmp_path / "sub"), str(tmp_path / "c.txt")], ".txt") == [str(tmp_path / "c.txt")]
    assert collect_files_with_suffix(None, ".txt") == []
    # s3 url with suffix short-circuits without boto3
    assert collect_files_with_suffix("s3://b/k/x.tfrecord", ".tfrecord") == ["s3://b/k/x.tfrecord"]
    with pytest.raises(NotImplementedError):
        collect_files_with_suffix("s3://bucket/prefix", ".tfrecord")


def test_torch_model_interf_and_parity_diff():
    """TorchModelInterf + JaxModelInterf: the cross-backend diff shims
    (reference eval_func.py:7-21) agree on an identical tiny conv model."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    from vip_cup_2022_tpu.eval.interop import JaxModelInterf, TorchModelInterf

    rng = np.random.RandomState(0)
    w = rng.uniform(-0.3, 0.3, (4, 3, 3, 3)).astype(np.float32)  # torch OIHW
    b = rng.uniform(-0.1, 0.1, (4,)).astype(np.float32)

    tmodel = torch.nn.Sequential(
        torch.nn.Conv2d(3, 4, 3), torch.nn.ReLU(), torch.nn.AdaptiveAvgPool2d(1),
        torch.nn.Flatten(),
    )
    with torch.no_grad():
        tmodel[0].weight.copy_(torch.from_numpy(w))
        tmodel[0].bias.copy_(torch.from_numpy(b))

    class JModel(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(4, (3, 3), padding="VALID", name="conv")(x)
            x = nn.relu(x)
            return jnp.mean(x, axis=(1, 2))

    jm = JModel()
    variables = {"params": {"conv": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                                     "bias": jnp.asarray(b)}}}
    x = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    t_out = TorchModelInterf(tmodel, device="cpu")(x)
    j_out = JaxModelInterf(jm, variables)(x)
    np.testing.assert_allclose(j_out, t_out, atol=1e-5)


def test_parse_timm_log(tmp_path):
    from vip_cup_2022_tpu.eval.interop import parse_timm_log

    log = """Train: 0 [   0/312 (  0%)]  Loss: 6.932 (6.93)  Time: 1.0s  LR: 1.0e-04  Data: 0.4
Train: 0 [ 311/312 (100%)]  Loss: 6.100 (6.52)  Time: 1.0s  LR: 2.0e-04  Data: 0.2
Test: [   0/25]  Time: 0.2  Loss:  5.900 (5.90)  Acc@1:  4.000 ( 4.000)  Acc@5: 12.000 (12.000)
Test: [  24/25]  Time: 0.2  Loss:  5.800 (5.85)  Acc@1:  5.000 ( 4.500)  Acc@5: 13.000 (12.500)
Train: 1 [   0/312 (  0%)]  Loss: 5.800 (5.80)  Time: 1.0s  LR: 3.0e-04  Data: 0.3
Train: 1 [ 311/312 (100%)]  Loss: 5.500 (5.65)  Time: 1.0s  LR: 4.0e-04  Data: 0.2
Test: [   0/25]  Time: 0.2  Loss:  5.300 (5.30)  Acc@1:  8.000 ( 8.000)  Acc@5: 20.000 (20.000)
Test: [  24/25]  Time: 0.2  Loss:  5.200 (5.25)  Acc@1:  9.000 ( 8.500)  Acc@5: 21.000 (20.500)
"""
    p = tmp_path / "timm.log"
    p.write_text(log)
    hh = parse_timm_log(str(p))
    assert hh["loss"] == [6.52, 5.65]
    assert hh["lr"] == [2.0e-04, 4.0e-04]
    assert hh["val_loss"] == [5.85, 5.25]
    np.testing.assert_allclose(hh["val_acc"], [0.045, 0.085])
    assert set(parse_timm_log(str(p), ["loss"])) == {"loss"}


def test_fuse_all_conv_bn_whole_model(small_resnet):
    """Whole-model auto-fusion (VERDICT r2 item 8): every discovered conv->BN
    pair folds and the model output is preserved; BN moments are neutralized
    exactly (var = 1 - eps so rsqrt(var + eps) == 1)."""
    from vip_cup_2022_tpu.utils.surgery import (
        discover_conv_bn_pairs, fuse_all_conv_bn,
    )

    module, variables, cfg = small_resnet
    pairs = discover_conv_bn_pairs(variables)
    # resnet_rs: every BN sits behind a conv (stem x2, per-block 3 + projection)
    from flax.traverse_util import flatten_dict
    n_bns = len({p[:-1] for p in flatten_dict(variables["batch_stats"]) if p[-1] == "moving_mean"})
    assert len(pairs) == n_bns, f"paired {len(pairs)} of {n_bns} BNs"

    x = jnp.asarray(np.random.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    y0 = module.apply(variables, x)
    fused, used = fuse_all_conv_bn(variables, eps=cfg.bn_epsilon)
    assert used == pairs
    y1 = module.apply(fused, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-5)


def test_fuse_all_conv_bn_kecam_naming():
    """The discovery heuristic also covers kecam-style flat X_conv/X_bn
    names (EfficientNetV2) including depthwise convs, with tf-mode eps."""
    from vip_cup_2022_tpu.utils.surgery import fuse_all_conv_bn

    module, variables, cfg = create_model(
        "EfficientNetV2B0", input_size=(64, 64), nb_classes=3
    )
    x = jnp.asarray(np.random.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    y0 = module.apply(variables, x)
    eps = 1e-3 if cfg.is_torch_mode is False else 1e-5
    fused, pairs = fuse_all_conv_bn(variables, eps=eps)
    assert len(pairs) >= 20  # stem + per-block pw/dw + head
    y1 = module.apply(fused, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-5)


def test_flip_rate_harness_runs():
    """The bf16-vs-f32 decision-flip harness (tools/flip_rate.py, VERDICT r2
    item 2) executes end to end and emits the JSON schema PARITY.md records."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "flip_rate.py"), "--cpu",
         "--members", "1", "--n", "8", "--batch", "8", "--head-scales", "1"],
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["thr"] == 0.487
    r = summary["results"]["head_scale_1"]
    assert set(r) >= {"flip_rate", "balanced_acc_bf16_vs_f32", "max_abs_dp"}
    assert 0.0 <= r["flip_rate"] <= 1.0


def test_checkpoint_md5_sidecar(tmp_path):
    """save_variables writes an .md5 sidecar; load verifies and fails loudly
    on corruption (reference file_hash contract, download_and_load.py:40-44)."""
    from vip_cup_2022_tpu.utils.checkpoint import (
        file_md5, load_variables, save_variables,
    )

    variables = {"params": {"w": jnp.arange(8, dtype=jnp.float32)}}
    path = str(tmp_path / "ck.msgpack")
    digest = save_variables(path, variables)
    assert digest and (tmp_path / "ck.msgpack.md5").exists()
    assert file_md5(path) == digest
    restored = load_variables(path)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(8, dtype=np.float32)
    )
    with open(path, "r+b") as fh:  # flip a payload byte -> verified load fails
        fh.seek(10)
        b = fh.read(1)
        fh.seek(10)
        fh.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="checksum mismatch"):
        load_variables(path)
    # sidecar removed -> unverified load proceeds (legacy checkpoints)
    (tmp_path / "ck.msgpack.md5").unlink()
    save_variables(path, variables, checksum=False)
    assert not (tmp_path / "ck.msgpack.md5").exists()
    load_variables(path)


def test_stochastic_depth_add_swap():
    """Config-level replace_add_with_stochastic_depth / back
    (model_surgery.py:188-271): rates land in the config, variables carry
    over (drop-path is weightless), eval outputs are unchanged."""
    from vip_cup_2022_tpu.utils.surgery import (
        add_stochastic_depth, remove_stochastic_depth,
    )

    module, variables, cfg = create_model("resnetrs50", input_size=(64, 64),
                                          nb_classes=4)
    cfg_sd = add_stochastic_depth(cfg, survivals=(1.0, 0.8))
    assert abs(cfg_sd.drop_path_rate - 0.2) < 1e-9
    x = jnp.asarray(np.random.RandomState(0).uniform(size=(1, 64, 64, 3)),
                    dtype=jnp.float32)
    y0 = module.apply(variables, x)
    y1 = type(module)(cfg_sd).apply(variables, x)  # eval: identity drop-path
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-6)
    cfg_back = remove_stochastic_depth(cfg_sd)
    assert cfg_back.drop_path_rate == 0.0
    with pytest.raises(ValueError, match="start at 1.0"):
        add_stochastic_depth(cfg, survivals=(0.9, 0.8))


def test_change_input_shape_vit():
    """change_model_input_shape analogue (model_surgery.py:170-185): ViT
    rebuilt at a new size gets its (1, 1+N, C) pos_embed grid-interpolated;
    all other weights copy exactly."""
    from vip_cup_2022_tpu.utils.surgery import change_input_shape

    module, variables, cfg = create_model("vit_tiny_patch16_224",
                                          nb_classes=4)
    m2, v2, cfg2 = change_input_shape("vit_tiny_patch16_224", variables,
                                      (192, 192), nb_classes=4)
    assert cfg2.input_size == (192, 192)
    from flax.traverse_util import flatten_dict

    f1, f2 = flatten_dict(variables), flatten_dict(v2)
    pos_key = [k for k in f2 if k[-1] == "pos_embed"]
    assert pos_key, "vit should expose pos_embed"
    k = pos_key[0]
    assert f2[k].shape[1] == 1 + (192 // 16) ** 2
    n_exact = sum(
        1 for kk in f2
        if kk in f1 and f1[kk].shape == f2[kk].shape
        and np.allclose(np.asarray(f1[kk]), np.asarray(f2[kk]))
    )
    assert n_exact >= len(f2) - 2  # everything but pos_embed copied
    out = m2.apply(v2, jnp.zeros((1, 192, 192, 3), jnp.float32))
    assert out.shape == (1, 4)


def test_change_input_shape_swin_rel_bias():
    """Swin relative_position_bias_table (M, heads) with M=(2w-1)^2 resizes
    on its (2w-1, 2w-1) grid when the window changes with input size."""
    from flax.traverse_util import flatten_dict

    from vip_cup_2022_tpu.utils.surgery import change_input_shape

    module, variables, cfg = create_model(
        "swin_tiny_patch4_window7_224", nb_classes=4)
    m2, v2, cfg2 = change_input_shape(
        "swin_tiny_patch4_window7_224", variables, (256, 256), nb_classes=4,
        window_size=8)
    f2 = flatten_dict(v2)
    tables = [k for k in f2 if k[-1] == "relative_position_bias_table"]
    assert tables
    assert all(f2[k].shape[0] == (2 * 8 - 1) ** 2 for k in tables)
    out = m2.apply(v2, jnp.zeros((1, 256, 256, 3), jnp.float32))
    assert out.shape == (1, 4)
