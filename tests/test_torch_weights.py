"""timm/PyTorch -> Flax weight conversion (reference tfimm utils/timm.py
rules + factory '[timm]' path). Synthetic state dicts in timm layout are
converted and must fill EVERY destination parameter; the layout rules are
oracled against torch.nn.functional."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")

from vip_cup_2022_tpu.models import create_model
from vip_cup_2022_tpu.models.factory import transfer_weights
from vip_cup_2022_tpu.weights.torch_pt import (
    conv_kernel,
    convert_torch_weights,
    linear_kernel,
    read_torch_checkpoint,
)


def _synthetic_vit_state(depth=12, dim=192, patch=16, img=224, classes=10):
    rng = np.random.RandomState(0)
    t = lambda *s: torch.from_numpy(rng.uniform(-0.1, 0.1, s).astype(np.float32))
    n_tok = (img // patch) ** 2 + 1
    sd = {
        "cls_token": t(1, 1, dim),
        "pos_embed": t(1, n_tok, dim),
        "patch_embed.proj.weight": t(dim, 3, patch, patch),
        "patch_embed.proj.bias": t(dim),
        "norm.weight": t(dim),
        "norm.bias": t(dim),
        "head.weight": t(classes, dim),
        "head.bias": t(classes),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": t(dim), f"{b}.norm1.bias": t(dim),
            f"{b}.attn.qkv.weight": t(3 * dim, dim), f"{b}.attn.qkv.bias": t(3 * dim),
            f"{b}.attn.proj.weight": t(dim, dim), f"{b}.attn.proj.bias": t(dim),
            f"{b}.norm2.weight": t(dim), f"{b}.norm2.bias": t(dim),
            f"{b}.mlp.fc1.weight": t(4 * dim, dim), f"{b}.mlp.fc1.bias": t(4 * dim),
            f"{b}.mlp.fc2.weight": t(dim, 4 * dim), f"{b}.mlp.fc2.bias": t(dim),
        })
    return sd


def _synthetic_convnext_state(depths=(1, 1, 1, 1), dims=(96, 192, 384, 768), classes=10):
    rng = np.random.RandomState(1)
    t = lambda *s: torch.from_numpy(rng.uniform(-0.1, 0.1, s).astype(np.float32))
    sd = {
        "stem.0.weight": t(dims[0], 3, 4, 4), "stem.0.bias": t(dims[0]),
        "stem.1.weight": t(dims[0]), "stem.1.bias": t(dims[0]),
        "head.norm.weight": t(dims[-1]), "head.norm.bias": t(dims[-1]),
        "head.fc.weight": t(classes, dims[-1]), "head.fc.bias": t(classes),
    }
    for s, (n, d) in enumerate(zip(depths, dims)):
        if s:
            sd.update({
                f"stages.{s}.downsample.0.weight": t(dims[s - 1]),
                f"stages.{s}.downsample.0.bias": t(dims[s - 1]),
                f"stages.{s}.downsample.1.weight": t(d, dims[s - 1], 2, 2),
                f"stages.{s}.downsample.1.bias": t(d),
            })
        for b in range(n):
            base = f"stages.{s}.blocks.{b}"
            sd.update({
                f"{base}.conv_dw.weight": t(d, 1, 7, 7), f"{base}.conv_dw.bias": t(d),
                f"{base}.norm.weight": t(d), f"{base}.norm.bias": t(d),
                f"{base}.mlp.fc1.weight": t(4 * d, d), f"{base}.mlp.fc1.bias": t(4 * d),
                f"{base}.mlp.fc2.weight": t(d, 4 * d), f"{base}.mlp.fc2.bias": t(d),
                f"{base}.gamma": t(d),
            })
    return sd


def test_vit_state_dict_fills_every_param():
    sd = _synthetic_vit_state()
    loaded = convert_torch_weights(sd, "vit_tiny_patch16_224")
    _, variables, _ = create_model("vit_tiny_patch16_224", input_size=(224, 224), nb_classes=10)
    merged = transfer_weights(loaded, variables, on_mismatch="raise")
    got = np.asarray(merged["params"]["blocks_0"]["attn"]["qkv"]["kernel"])
    want = linear_kernel(sd["blocks.0.attn.qkv.weight"].numpy())
    np.testing.assert_allclose(got, want)


def test_convnext_state_dict_fills_every_param():
    sd = _synthetic_convnext_state()
    loaded = convert_torch_weights(sd, "convnext_tiny_in22k")
    _, variables, _ = create_model(
        "convnext_tiny_in22k", input_size=(64, 64), nb_classes=10, nb_blocks=(1, 1, 1, 1)
    )
    merged = transfer_weights(loaded, variables, on_mismatch="raise")
    got = np.asarray(merged["params"]["stages_0_blocks_0"]["conv_dw"]["kernel"])
    want = conv_kernel(sd["stages.0.blocks.0.conv_dw.weight"].numpy())
    np.testing.assert_allclose(got, want)


def test_conv_transpose_rule_matches_torch_functional():
    """OIHW->HWIO: flax conv with the converted kernel == torch F.conv2d."""
    rng = np.random.RandomState(2)
    x = rng.uniform(-1, 1, (2, 5, 5, 3)).astype(np.float32)
    w = rng.uniform(-1, 1, (8, 3, 3, 3)).astype(np.float32)
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(conv_kernel(w)), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    theirs = torch.nn.functional.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w)
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    # depthwise (C,1,k,k)
    wd = rng.uniform(-1, 1, (3, 1, 3, 3)).astype(np.float32)
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(conv_kernel(wd)), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=3,
    )
    theirs = torch.nn.functional.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(wd), groups=3
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_read_torch_checkpoint_from_file(tmp_path):
    sd = {"a.weight": torch.ones(3, 2), "a.bias": torch.zeros(3)}
    path = tmp_path / "ckpt.pt"
    torch.save(sd, str(path))
    out = read_torch_checkpoint(str(path))
    assert set(out) == {"a.weight", "a.bias"}
    np.testing.assert_allclose(out["a.weight"], np.ones((3, 2)))
    # nested training-checkpoint format
    torch.save({"state_dict": sd}, str(path))
    assert set(read_torch_checkpoint(str(path))) == {"a.weight", "a.bias"}
