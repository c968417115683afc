"""Pallas kernels vs their XLA reference implementations (interpret mode on
CPU; the driver's TPU bench exercises the compiled path)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vip_cup_2022_tpu.ops.pallas.window_attention import window_attention


def test_window_attention_matches_reference():
    rng = np.random.RandomState(0)
    b, h, n, d = 4, 2, 49, 32
    q = rng.randn(b, h, n, d).astype(np.float32)
    k = rng.randn(b, h, n, d).astype(np.float32)
    v = rng.randn(b, h, n, d).astype(np.float32)
    bias = rng.randn(h, n, n).astype(np.float32)
    scale = d**-0.5

    ref = window_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias), scale, use_pallas=False)
    out = window_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias), scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestFusedConvNeXtBlock:
    def _args(self, C, rng):
        import jax.numpy as jnp

        return [
            jnp.asarray(rng.uniform(-0.2, 0.2, s).astype(np.float32))
            for s in [(7, 7, C), (C,), (C,), (C,), (C, 4 * C), (4 * C,), (4 * C, C), (C,), (C,)]
        ]

    def _reference(self, x, args, C):
        import jax
        import jax.numpy as jnp

        dw, dwb, g, bt, w1, b1, w2, b2, ls = args
        y = jax.lax.conv_general_dilated(
            x, dw[:, :, None, :], (1, 1), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        ) + dwb
        m = y.mean(-1, keepdims=True)
        v = ((y - m) ** 2).mean(-1, keepdims=True)
        y = (y - m) * jax.lax.rsqrt(v + 1e-6) * g + bt
        h = jax.nn.gelu(y @ w1 + b1, approximate=False)
        return x + (h @ w2 + b2) * ls

    @pytest.mark.parametrize("C", [16, 256])
    def test_whole_block_matches_reference(self, C):
        import jax.numpy as jnp

        from vip_cup_2022_tpu.ops.pallas.convnext_block import fused_convnext_block

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 9, 9, C)).astype(np.float32))
        args = self._args(C, rng)
        out = fused_convnext_block(x, *args, interpret=True)
        ref = self._reference(x, args, C)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    def test_ragged_row_tile(self):
        import jax.numpy as jnp

        from vip_cup_2022_tpu.ops.pallas.convnext_block import fused_convnext_block

        rng = np.random.RandomState(1)
        C = 16
        x = jnp.asarray(rng.uniform(-1, 1, (2, 13, 11, C)).astype(np.float32))
        args = self._args(C, rng)
        out = fused_convnext_block(x, *args, row_tile=5, interpret=True)
        ref = self._reference(x, args, C)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    @pytest.mark.parametrize("group,n_split", [(2, 1), (4, 2), (2, 4)])
    def test_batch_fold_and_hidden_split(self, group, n_split):
        """g-image fold + fc1 N-chunking == the unfolded reference block
        (same math: the fold only concatenates rows into the GEMM; the split
        only chunks fc2's f32 accumulation)."""
        import jax.numpy as jnp

        from vip_cup_2022_tpu.ops.pallas.convnext_block import fused_convnext_block

        rng = np.random.RandomState(7)
        C = 128  # hp_ = 512 -> n_split up to 4 legal
        x = jnp.asarray(rng.uniform(-1, 1, (4, 6, 7, C)).astype(np.float32))
        args = self._args(C, rng)
        out = fused_convnext_block(x, *args, group=group, n_split=n_split,
                                   interpret=True)
        ref = self._reference(x, args, C)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)

    def test_int8_mm_close_to_f32(self):
        """int8 MLP dots (dynamic activation scale + per-channel weights)
        track the f32 kernel within PTQ tolerance."""
        import jax.numpy as jnp

        from vip_cup_2022_tpu.ops.pallas.convnext_block import fused_convnext_block

        rng = np.random.RandomState(8)
        C = 128
        x = jnp.asarray(rng.uniform(-1, 1, (2, 6, 7, C)).astype(np.float32))
        args = self._args(C, rng)
        out = fused_convnext_block(x, *args, int8_mm=True, n_split=2,
                                   interpret=True)
        ref = self._reference(x, args, C)
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        scale = np.abs(np.asarray(ref)).max()
        assert err < 0.02 * scale, (err, scale)

    def test_blockdiag_dw_matches_depthwise(self):
        import jax
        import jax.numpy as jnp

        from vip_cup_2022_tpu.ops.pallas.convnext_block import blockdiag_dw7x7

        rng = np.random.RandomState(2)
        C = 24
        x = jnp.asarray(rng.uniform(-1, 1, (2, 11, 11, C)).astype(np.float32))
        k = jnp.asarray(rng.uniform(-0.2, 0.2, (7, 7, C)).astype(np.float32))
        b = jnp.asarray(rng.uniform(-0.1, 0.1, (C,)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, k[:, :, None, :], (1, 1), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        ) + b
        out = blockdiag_dw7x7(x, k, b, group=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    @pytest.mark.parametrize("C", [16, 96])
    def test_batchlane_block_matches_reference(self, C):
        """Batch-last (H, W, C, B) whole block == the NHWC reference block."""
        import jax.numpy as jnp

        from vip_cup_2022_tpu.ops.pallas.convnext_block import (
            fused_convnext_block_batchlane,
        )

        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.uniform(-1, 1, (3, 9, 11, C)).astype(np.float32))
        args = self._args(C, rng)
        xt = jnp.transpose(x, (1, 2, 3, 0))
        out = jnp.transpose(
            fused_convnext_block_batchlane(xt, *args, interpret=True), (3, 0, 1, 2)
        )
        ref = self._reference(x, args, C)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    def test_batchlane_int8_close_to_f32(self):
        """int8 lane-fold MLP dots in the batch-lane kernel (per-column
        dynamic activation scales x per-row weight scales) track the f32
        kernel within PTQ tolerance."""
        import jax.numpy as jnp

        from vip_cup_2022_tpu.ops.pallas.convnext_block import (
            fused_convnext_block_batchlane,
        )

        rng = np.random.RandomState(9)
        C = 96
        x = jnp.asarray(rng.uniform(-1, 1, (2, 9, 11, C)).astype(np.float32))
        args = self._args(C, rng)
        xt = jnp.transpose(x, (1, 2, 3, 0))
        ref = self._reference(x, args, C)
        try:
            os.environ["VIPTPU_INT8_KERNELS"] = "1"
            out = jnp.transpose(
                fused_convnext_block_batchlane(xt, *args, interpret=True),
                (3, 0, 1, 2),
            )
        finally:
            os.environ.pop("VIPTPU_INT8_KERNELS", None)
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        scale = np.abs(np.asarray(ref)).max()
        assert err < 0.03 * scale, (err, scale)

    def test_model_fused_gate_matches_unfused(self):
        """ConvNeXt with the fused paths (batch-last at C<256, whole-image at
        C>=256) produces the same output as the plain Flax path
        (interpret-mode pallas on CPU)."""
        import jax.numpy as jnp

        from vip_cup_2022_tpu.models import create_model

        rng = np.random.RandomState(3)
        kw = dict(
            input_size=(32, 32), nb_classes=3, nb_blocks=(1, 1, 1, 1),
            embed_dim=(32, 64, 256, 512),
        )
        m1, v1, _ = create_model("convnext_tiny_in22k", fused_block=True, **kw)
        m0, _, _ = create_model("convnext_tiny_in22k", fused_block=False, init=False, **kw)
        x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        y1 = m1.apply(v1, x)
        y0 = m0.apply(v1, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)


class TestFusedGCViTBlock:
    def test_model_fused_matches_unfused(self):
        """GCViT with the fused window-block pipeline (LN+qkv -> grouped
        block-diagonal attention -> proj/LN/MLP) matches the Flax path,
        covering both local and global-query blocks."""
        import jax.numpy as jnp

        from vip_cup_2022_tpu.models import create_model

        rng = np.random.RandomState(0)
        kw = dict(
            input_size=(224, 224), nb_classes=3, depths=(2, 1, 1, 1), dim=16,
            num_heads=(1, 2, 4, 8),
        )
        m1, v1, _ = create_model("gcvit_xxtiny", fused_block=True, **kw)
        m0, _, _ = create_model("gcvit_xxtiny", fused_block=False, init=False, **kw)
        # batch 2: exercises the single-window batch-fold (L3 nwin=1 folds
        # two images into one block-diagonal attention, local AND global-q)
        x = jnp.asarray(rng.uniform(0, 1, (2, 224, 224, 3)).astype(np.float32))
        y1 = m1.apply(v1, x)
        y0 = m0.apply(v1, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)

    def test_model_lane_packed_matches_unpacked(self):
        """C=64 levels lane-pack image pairs (pack_lanes + block-diagonal
        weights + per-half LN stats) — the packed level must be bit-identical
        to the unpacked pipeline, local AND global-query blocks. dim=64 +
        batch 2 triggers pack=2 at L1 (the production GCViTTiny shape)."""
        import jax.numpy as jnp

        from vip_cup_2022_tpu.models import create_model

        rng = np.random.RandomState(1)
        kw = dict(
            input_size=(224, 224), nb_classes=3, depths=(2, 1, 1, 1), dim=64,
            num_heads=(2, 4, 8, 16),
        )
        m1, v1, _ = create_model("gcvit_xxtiny", fused_block=True, **kw)
        m0, _, _ = create_model("gcvit_xxtiny", fused_block=False, init=False, **kw)
        x = jnp.asarray(rng.uniform(0, 1, (2, 224, 224, 3)).astype(np.float32))
        packed = {}
        for gemm_mode in ("rows", "kron"):
            try:
                os.environ["VIPTPU_GCVIT_PACK"] = "1"
                os.environ["VIPTPU_GCVIT_PACK_GEMM"] = gemm_mode
                packed[gemm_mode] = m1.apply(v1, x)   # pack=2 at L1
            finally:
                os.environ.pop("VIPTPU_GCVIT_PACK", None)
                os.environ.pop("VIPTPU_GCVIT_PACK_GEMM", None)
        y0 = m0.apply(v1, x)                      # flax reference
        for gemm_mode, y1 in packed.items():
            np.testing.assert_allclose(
                np.asarray(y1), np.asarray(y0), atol=1e-5,
                err_msg=f"pack_gemm={gemm_mode}")
        y2 = m1.apply(v1, x)                      # unpacked pipeline (default)
        np.testing.assert_array_equal(np.asarray(packed["rows"]), np.asarray(y2))
        np.testing.assert_array_equal(np.asarray(packed["kron"]), np.asarray(y2))

    def test_model_int8_kernels_close_to_bf16_path(self):
        """VIPTPU_INT8_KERNELS=1: the GCViT qkv/proj/MLP GEMMs run s8 with
        per-output-channel weight scales + dynamic per-row activation scales
        (attention GEMMs unchanged); the model output must track the
        full-precision fused path within PTQ tolerance. MIN_C=0 covers every
        level incl. the C<128 ones the production gate skips."""
        import jax.numpy as jnp

        from vip_cup_2022_tpu.models import create_model

        rng = np.random.RandomState(5)
        kw = dict(
            input_size=(224, 224), nb_classes=3, depths=(2, 1, 1, 1), dim=16,
            num_heads=(1, 2, 4, 8),
        )
        m1, v1, _ = create_model("gcvit_xxtiny", fused_block=True, **kw)
        x = jnp.asarray(rng.uniform(0, 1, (2, 224, 224, 3)).astype(np.float32))
        ref = m1.apply(v1, x)
        try:
            os.environ["VIPTPU_INT8_KERNELS"] = "1"
            os.environ["VIPTPU_GCVIT_INT8_MIN_C"] = "0"
            out = m1.apply(v1, x)
        finally:
            os.environ.pop("VIPTPU_INT8_KERNELS", None)
            os.environ.pop("VIPTPU_GCVIT_INT8_MIN_C", None)
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        scale = np.abs(np.asarray(ref)).max()
        assert err < 0.05 * scale, (err, scale)

    def test_pack_lanes_roundtrip(self):
        from vip_cup_2022_tpu.ops.pallas.gcvit_block import (pack_lanes,
                                                             unpack_lanes)

        x = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3)
        p = pack_lanes(jnp.asarray(x), 2)
        assert p.shape == (2, 6, 6)
        # image i of the pair occupies lanes [i*C, (i+1)*C)
        np.testing.assert_array_equal(np.asarray(p[0, :, :3]), x[0])
        np.testing.assert_array_equal(np.asarray(p[0, :, 3:]), x[1])
        np.testing.assert_array_equal(np.asarray(unpack_lanes(p, 2)), x)

    @pytest.mark.parametrize("mode", ["masked", "batched", "unroll"])
    def test_grouped_attention_matches_einsum(self, mode):
        """Block-diagonal grouping == independent per-window attentions, in
        every score-layout mode (masked big GEMM / f32 batch dots / unrolled
        per-window dots)."""
        import jax
        import jax.numpy as jnp

        from vip_cup_2022_tpu.ops.pallas.gcvit_block import grouped_window_attention

        rng = np.random.RandomState(1)
        b, nwin, n, heads, hd = 2, 4, 9, 2, 8
        c = heads * hd
        mk = lambda: jnp.asarray(rng.uniform(-1, 1, (b, nwin * n, c)).astype(np.float32))
        q, k, v = mk(), mk(), mk()
        bias = jnp.asarray(rng.uniform(-1, 1, (heads, n, n)).astype(np.float32))
        scale = hd ** -0.5

        out = grouped_window_attention(
            q, k, v, heads, n, bias=bias, scale=scale, group=2, mode=mode,
            interpret=True
        )

        qh = q.reshape(b * nwin, n, heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b * nwin, n, heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b * nwin, n, heads, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("whnd,whmd->whnm", qh * scale, kh) + bias[None]
        p = jax.nn.softmax(s, axis=-1)
        ref = jnp.einsum("whnm,whmd->whnd", p, vh).transpose(0, 2, 1, 3)
        ref = ref.reshape(b, nwin * n, c)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_masked_synth_bias_matches_dense(self, monkeypatch):
        """The in-kernel synthesized bias (per-window (n, n) input, g x g
        tiling + iota block mask built in-register) must match the
        precomputed dense (gN, gN) masked-bias path exactly — it is what
        unlocks the deep single-window batch folds (L4 fold=8's dense block
        is 9.8 MB of VMEM; synth is 153 KB + a transient tile)."""
        import jax.numpy as jnp

        from vip_cup_2022_tpu.ops.pallas.gcvit_block import (
            grouped_window_attention,
        )

        rng = np.random.RandomState(7)
        b, nwin, n, heads, hd = 2, 8, 9, 2, 8
        c = heads * hd
        mk = lambda: jnp.asarray(
            rng.uniform(-1, 1, (b, nwin * n, c)).astype(np.float32))
        q, k, v = mk(), mk(), mk()
        bias = jnp.asarray(
            rng.uniform(-1, 1, (heads, n, n)).astype(np.float32))
        scale = hd ** -0.5

        kw = dict(heads=heads, bias=bias, scale=scale, group=4,
                  mode="masked", interpret=True)
        monkeypatch.setenv("VIPTPU_GCVIT_BIAS", "dense")
        dense = grouped_window_attention(q, k, v, n=n, **kw)
        monkeypatch.setenv("VIPTPU_GCVIT_BIAS", "synth")
        synth = grouped_window_attention(q, k, v, n=n, **kw)
        np.testing.assert_allclose(
            np.asarray(synth), np.asarray(dense), atol=1e-6)

    def test_model_fold_synth_matches_flax(self, monkeypatch):
        """Whole GCViT model with forced synth bias at every grouped level ==
        the unfused flax model (the production gate at the folded L3/L4
        levels takes exactly this path once the dense block exceeds the
        budget), covering local + global-query blocks and the batch fold."""
        import jax.numpy as jnp

        from vip_cup_2022_tpu.models import create_model

        monkeypatch.setenv("VIPTPU_GCVIT_BIAS", "synth")
        kw = dict(
            input_size=(224, 224), nb_classes=3, depths=(2, 1, 1, 1), dim=16,
            num_heads=(1, 2, 4, 8),
        )
        m1, v1, _ = create_model("gcvit_xxtiny", fused_block=True, **kw)
        m0, _, _ = create_model("gcvit_xxtiny", fused_block=False, init=False, **kw)
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.uniform(0, 1, (2, 224, 224, 3)).astype(np.float32))
        y1 = m1.apply(v1, x)
        y0 = m0.apply(v1, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)


class TestPolyGelu:
    """The 'poly' GELU flavor (clamped odd-polynomial erf, pure FMAs — no
    exp/reciprocal on the VPU) must stay within its documented 8.6e-5
    absolute envelope of exact GELU everywhere, including the clamp tails."""

    def test_erf_poly_accuracy(self):
        import math

        from vip_cup_2022_tpu.ops.pallas.convnext_block import _erf_poly

        x = np.linspace(-10, 10, 100001).astype(np.float32)
        got = np.asarray(_erf_poly(jnp.asarray(x)))
        exact = np.array([math.erf(float(v)) for v in x])
        assert np.max(np.abs(got - exact)) < 4e-5

    def test_gelu_poly_accuracy(self):
        from vip_cup_2022_tpu.ops.pallas.convnext_block import _gelu

        x = np.linspace(-12, 12, 100001).astype(np.float32)
        got = np.asarray(_gelu(jnp.asarray(x), "poly"))
        exact = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
        assert np.max(np.abs(got - exact)) < 1e-4

    def test_fused_block_poly_flavor(self):
        from vip_cup_2022_tpu.ops.pallas.convnext_block import fused_convnext_block

        helper = TestFusedConvNeXtBlock()
        rng = np.random.RandomState(3)
        C = 16
        x = jnp.asarray(rng.uniform(-1, 1, (2, 9, 9, C)).astype(np.float32))
        args = helper._args(C, rng)
        out = fused_convnext_block(x, *args, gelu="poly", interpret=True)
        ref = helper._reference(x, args, C)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


class TestPallasLayerNorm:
    def test_matches_reference(self):
        """Fused one-pass LN kernel == the module's f32 two-pass form."""
        import jax.numpy as jnp

        from vip_cup_2022_tpu.ops.pallas.norms import _pallas_ln2, _ref_ln

        rng = np.random.RandomState(0)
        for m, c, dt in [(35, 96, jnp.float32), (64, 64, jnp.bfloat16),
                         (1000, 256, jnp.bfloat16)]:
            x = jnp.asarray(rng.randn(m, c) * 2 + 0.5, dt)
            g = jnp.asarray(rng.randn(c) * 0.3 + 1, jnp.float32)
            b = jnp.asarray(rng.randn(c) * 0.2, jnp.float32)
            got = _pallas_ln2(x, g, b, 1e-6, interpret=True)
            ref = _ref_ln(x, g, b, 1e-6)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(ref, np.float32),
                atol=2e-3 if dt == jnp.bfloat16 else 1e-6)

    def test_backward_is_reference_grad(self):
        """custom_vjp backward == jax.grad of the reference LN (training
        path correctness; the pallas forward is inference-only math)."""
        import jax
        import jax.numpy as jnp

        from vip_cup_2022_tpu.ops.pallas.norms import _bwd, _ref_ln

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(6, 32), jnp.float32)
        g = jnp.asarray(rng.randn(32) * 0.2 + 1, jnp.float32)
        b = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)
        dy = jnp.asarray(rng.randn(6, 32), jnp.float32)
        got = _bwd(1e-6, (x, g, b), dy)
        _, vjp = jax.vjp(lambda a, c, d: _ref_ln(a, c, d, 1e-6), x, g, b)
        ref = vjp(dy)
        for got_i, ref_i in zip(got, ref):
            np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i),
                                       atol=1e-6)


class TestDepthwisePallas:
    """ops/pallas/depthwise.py — tap-loop depthwise kernel (kept as a
    documented NEGATIVE result: on v5e it loses to XLA's true-depthwise
    lowering at every EfficientNet shape and Mosaic rejects several, see
    NOTES_r3.md; the kernel stays for interpret-mode reference and forward
    hardware). Reference op: keras DepthwiseConv2D(use_bias=False) as used
    by kecam common_layers.depthwise_conv2d_no_bias."""

    def test_matches_xla_depthwise(self):
        import jax
        import jax.numpy as jnp

        from vip_cup_2022_tpu.ops.pallas.depthwise import depthwise_conv_nhwc

        rng = np.random.RandomState(0)
        for (b, h, w, c, k, pad) in [
            (2, 14, 14, 96, 5, ((2, 2), (2, 2))),
            (3, 9, 9, 64, 3, ((1, 1), (1, 1))),
            (2, 8, 10, 32, 3, ((0, 2), (1, 1))),  # asymmetric (torch SAME)
        ]:
            x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
            kern = jnp.asarray(rng.randn(k, k, 1, c), jnp.float32)
            ref = jax.lax.conv_general_dilated(
                x, kern, (1, 1), [pad[0], pad[1]],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)
            got = depthwise_conv_nhwc(x, kern, padding=pad, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4)
