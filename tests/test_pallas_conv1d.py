"""Fused dilated conv1d Pallas kernel vs lax.conv reference (interpreter mode),
including the frozen-weight custom VJP and the HiFi-GAN wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffmusic_tpu.pallas.conv1d_kernel as ck
from diffmusic_tpu.pallas.conv1d_kernel import conv1d_fused, _conv1d_reference

pytestmark = pytest.mark.slow  # measured >45 s/module on the CPU mesh (r5)


@pytest.fixture(autouse=True)
def _interpret_mode():
    ck._INTERPRET = True
    yield
    ck._INTERPRET = False


class TestConv1dFused:
    @pytest.mark.parametrize("k,d", [(3, 1), (7, 3), (11, 5)])
    def test_matches_reference(self, rng, k, d):
        x = jnp.asarray(rng.standard_normal((1, 700, 32)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, 32, 16)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.float32)
        got = conv1d_fused(x, w, b, None, d, 0.1, False)
        want = _conv1d_reference(x, w, b, d, 0.1, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_residual_and_no_activation(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 300, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 8, 8)) * 0.2, jnp.float32)
        b = jnp.zeros((8,))
        r = jnp.asarray(rng.standard_normal((2, 300, 8)), jnp.float32)
        got = conv1d_fused(x, w, b, r, 1, None, True)
        want = _conv1d_reference(x, w, b, 1, None, r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("k,d,slope", [(3, 1, None), (7, 3, 0.1)])
    def test_gradient_matches_autodiff(self, rng, k, d, slope):
        """dx from the custom VJP must equal autodiff through the lax.conv
        reference (weights frozen, so only dx matters)."""
        x = jnp.asarray(rng.standard_normal((1, 260, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, 8, 8)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)

        def loss_fused(x_):
            return jnp.sum(conv1d_fused(x_, w, b, x_, d, slope, True) ** 2)

        def loss_ref(x_):
            return jnp.sum(_conv1d_reference(x_, w, b, d, slope, x_) ** 2)

        g_fused = jax.grad(loss_fused)(x)
        g_ref = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("k,d,slope", [(3, 1, None), (7, 3, 0.1)])
    def test_pretransposed_adjoint_gradient(self, rng, k, d, slope):
        """With a precomputed flip/transpose kernel threaded in (the production
        path: with_adjoint_weights at load time), the backward runs the forward
        Pallas kernel on the cotangent — dx must still equal autodiff."""
        x = jnp.asarray(rng.standard_normal((1, 260, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, 8, 8)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)
        w_adj = jnp.flip(w, axis=0).swapaxes(1, 2)

        def loss_fused(x_):
            return jnp.sum(
                conv1d_fused(x_, w, b, x_, d, slope, True, w_adj=w_adj) ** 2)

        def loss_ref(x_):
            return jnp.sum(_conv1d_reference(x_, w, b, d, slope, x_) ** 2)

        g_fused = jax.grad(loss_fused)(x)
        g_ref = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-3)

    def test_with_adjoint_weights_collection(self, rng):
        """with_adjoint_weights attaches kernel_adj for every FusedConv1D and
        the vocoder still applies (CPU path ignores it, semantics unchanged)."""
        from diffmusic_tpu.models.hifigan import (ResidualBlock,
                                                  with_adjoint_weights)

        blk = ResidualBlock(channels=8, kernel_size=3, dilations=(1, 3),
                            slope=0.1)
        x = jnp.asarray(rng.standard_normal((1, 200, 8)), jnp.float32)
        params = blk.init(jax.random.key(0), x)
        aug = with_adjoint_weights(params)
        assert "adjoint" in aug
        for name in ("convs1_0", "convs2_0", "convs1_1", "convs2_1"):
            adj = aug["adjoint"][name]["kernel_adj"]
            ker = params["params"][name]["kernel"]
            assert adj.shape == (ker.shape[0], ker.shape[2], ker.shape[1])
        np.testing.assert_allclose(np.asarray(blk.apply(aug, x)),
                                   np.asarray(blk.apply(params, x)),
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("k,d,t", [(3, 1, 700), (7, 3, 1024), (11, 5, 1300)])
    def test_canvas_matches_reference(self, rng, k, d, t):
        """Canvas-contract conv == pad-once reference, including the zero-
        margin invariant of the output (margins and tail exactly zero)."""
        x = jnp.asarray(rng.standard_normal((1, t, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, 128, 128)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
        xc = ck.to_canvas(x)
        yc = ck.conv1d_fused_canvas(xc, w, b, None, t, d, 0.1, False)
        want = _conv1d_reference(x, w, b, d, 0.1, None)
        np.testing.assert_allclose(np.asarray(ck.from_canvas(yc, t)),
                                   np.asarray(want), rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(ck.to_canvas(
            ck.from_canvas(yc, t))), np.asarray(yc))  # invariant holds

    def test_canvas_chain_gradient(self, rng):
        """Gradient through a canvas resblock-style chain (conv -> conv+res)
        must equal autodiff through the plain reference composition."""
        t, c = 900, 128
        x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((7, c, c)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((3, c, c)) * 0.05, jnp.float32)
        b = jnp.zeros((c,))
        w2_adj = jnp.flip(w2, axis=0).swapaxes(1, 2)

        def loss_canvas(x_):
            xc = ck.to_canvas(x_)
            h = ck.conv1d_fused_canvas(xc, w1, b, None, t, 3, 0.1, False)
            y = ck.conv1d_fused_canvas(h, w2, b, xc, t, 1, 0.1, True,
                                       w_adj=w2_adj)
            return jnp.sum(ck.from_canvas(y, t) ** 2)

        def loss_ref(x_):
            h = _conv1d_reference(x_, w1, b, 3, 0.1, None)
            return jnp.sum(_conv1d_reference(h, w2, b, 1, 0.1, x_) ** 2)

        np.testing.assert_allclose(np.asarray(jax.grad(loss_canvas)(x)),
                                   np.asarray(jax.grad(loss_ref)(x)),
                                   rtol=1e-3, atol=1e-3)

    def test_vocoder_canvas_routing_semantics(self, rng):
        """The stage-level canvas routing in SpeechT5HifiGan must not change
        outputs: interpret-mode canvas vocoder == plain CPU-path vocoder."""
        from diffmusic_tpu.models.configs import HiFiGANConfig
        from diffmusic_tpu.models.hifigan import SpeechT5HifiGan

        cfg = HiFiGANConfig(model_in_dim=64, upsample_initial_channel=256,
                            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                            resblock_kernel_sizes=(3,),
                            resblock_dilation_sizes=((1, 3),))
        voc = SpeechT5HifiGan(cfg)
        mel = jnp.asarray(rng.standard_normal((1, 40, 64)), jnp.float32)
        params = voc.init(jax.random.key(0), mel)
        got = voc.apply(params, mel)           # canvas path (interpret mode)
        ck._INTERPRET = False
        want = voc.apply(params, mel)          # plain XLA path
        ck._INTERPRET = True
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_hifigan_residual_block_unchanged_semantics(self, rng):
        """The rewired ResidualBlock must match the original
        leaky->conv->leaky->conv(+res) composition parameter-for-parameter."""
        import flax.linen as nn
        from diffmusic_tpu.models.hifigan import ResidualBlock

        blk = ResidualBlock(channels=8, kernel_size=3, dilations=(1, 3),
                            slope=0.1)
        x = jnp.asarray(rng.standard_normal((1, 200, 8)), jnp.float32)
        params = blk.init(jax.random.key(0), x)
        got = blk.apply(params, x)

        # hand-rolled original composition from the same params
        def conv(h, p, dil):
            k = p["kernel"].shape[0]
            pad = (k - 1) * dil // 2
            out = jax.lax.conv_general_dilated(
                h, p["kernel"], (1,), [(pad, pad)], rhs_dilation=(dil,),
                dimension_numbers=("NWC", "WIO", "NWC"))
            return out + p["bias"][None, None, :]

        want = x
        for i, d in enumerate((1, 3)):
            res = want
            h = nn.leaky_relu(want, negative_slope=0.1)
            h = conv(h, params["params"][f"convs1_{i}"], d)
            h = nn.leaky_relu(h, negative_slope=0.1)
            want = conv(h, params["params"][f"convs2_{i}"], 1) + res
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("k,d,t", [(3, 1, 700), (7, 3, 1024), (11, 5, 900)])
    def test_pair_matches_two_convs(self, rng, k, d, t):
        """Fused pair kernel == conv2(leaky(conv1(leaky(x))+b1))+b2+x."""
        c = 128
        x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        got = ck.conv1d_fused_pair(x, w1, b1, w2, b2, d, 0.1)
        h = _conv1d_reference(x, w1, b1, d, 0.1, None)
        want = _conv1d_reference(h, w2, b2, 1, 0.1, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_pair_gradient_matches_autodiff(self, rng):
        t, c, k, d = 800, 128, 7, 3
        x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32)
        b = jnp.zeros((c,))

        def loss_pair(x_):
            return jnp.sum(ck.conv1d_fused_pair(x_, w1, b, w2, b, d, 0.1) ** 2)

        def loss_ref(x_):
            h = _conv1d_reference(x_, w1, b, d, 0.1, None)
            return jnp.sum(_conv1d_reference(h, w2, b, 1, 0.1, x_) ** 2)

        np.testing.assert_allclose(np.asarray(jax.grad(loss_pair)(x)),
                                   np.asarray(jax.grad(loss_ref)(x)),
                                   rtol=1e-3, atol=1e-3)

    def test_pair_ok_gating(self):
        assert ck.pair_ok(3, 128, 128, jnp.bfloat16)
        assert ck.pair_ok(7, 512, 512, jnp.bfloat16)
        assert not ck.pair_ok(11, 512, 512, jnp.bfloat16)  # 11.5 MB weights
        assert not ck.pair_ok(3, 64, 64, jnp.bfloat16)     # misaligned lanes

    def test_residual_block_pair_routing_semantics(self, rng):
        """ResidualBlock with pair routing (interpret) == plain XLA path."""
        from diffmusic_tpu.models.hifigan import ResidualBlock
        blk = ResidualBlock(channels=128, kernel_size=3, dilations=(1, 3, 5),
                            slope=0.1)
        x = jnp.asarray(rng.standard_normal((1, 300, 128)), jnp.float32)
        params = blk.init(jax.random.key(0), x)
        got = blk.apply(params, x)              # pair path (interpret mode)
        ck._INTERPRET = False
        want = blk.apply(params, x)             # per-conv XLA path
        ck._INTERPRET = True
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


class TestPairCanvasXbwd:
    """Round-4 canvas-pair quadrant: canvas-contract fused pair forward +
    canvas-wide XLA adjoint backward (conv1d_pair_canvas / conv1d_canvas_xbwd
    — docs/PERF_NOTES.md round-4)."""

    @pytest.mark.parametrize("k,d,t", [(3, 1, 700), (7, 3, 1024),
                                       (11, 5, 1300)])
    def test_pair_canvas_matches_reference(self, rng, k, d, t):
        c = 128
        x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        xc = ck.to_canvas(x)
        yc = ck.conv1d_pair_canvas(xc, w1, b1, w2, b2, t, d, 0.1)
        want, _h = ck._pair_reference(x, w1, b1, w2, b2, d, 0.1)
        np.testing.assert_allclose(np.asarray(ck.from_canvas(yc, t)),
                                   np.asarray(want), rtol=1e-4, atol=1e-4)
        # zero-margin invariant of the output
        np.testing.assert_array_equal(np.asarray(ck.to_canvas(
            ck.from_canvas(yc, t))), np.asarray(yc))

    def test_pair_canvas_chain_gradient(self, rng):
        """Grad through TWO chained canvas pairs (margins crossed twice) ==
        autodiff of the plain pair-reference composition."""
        t, c, k = 900, 128, 7
        x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        ws = [jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32)
              for _ in range(4)]
        bs = [jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
              for _ in range(4)]

        def loss_canvas(x_):
            xc = ck.to_canvas(x_)
            xc = ck.conv1d_pair_canvas(xc, ws[0], bs[0], ws[1], bs[1], t, 3,
                                       0.1)
            xc = ck.conv1d_pair_canvas(xc, ws[2], bs[2], ws[3], bs[3], t, 5,
                                       0.1)
            return jnp.sum(ck.from_canvas(xc, t) ** 2)

        def loss_ref(x_):
            y, _ = ck._pair_reference(x_, ws[0], bs[0], ws[1], bs[1], 3, 0.1)
            y, _ = ck._pair_reference(y, ws[2], bs[2], ws[3], bs[3], 5, 0.1)
            return jnp.sum(y ** 2)

        np.testing.assert_allclose(np.asarray(jax.grad(loss_canvas)(x)),
                                   np.asarray(jax.grad(loss_ref)(x)),
                                   rtol=1e-3, atol=1e-3)

    def test_canvas_xbwd_single_gradient(self, rng):
        """Single-conv canvas with XLA backward (the k=11 ch512 fallback):
        value and grad equal the reference, including the residual path."""
        t, c = 700, 128
        x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((11, c, c)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)

        def loss_canvas(x_):
            xc = ck.to_canvas(x_)
            h = ck.conv1d_canvas_xbwd(xc, w, b, None, t, 5, 0.1, False)
            y = ck.conv1d_canvas_xbwd(h, w, b, xc, t, 1, 0.1, True)
            return jnp.sum(ck.from_canvas(y, t) ** 2)

        def loss_ref(x_):
            h = _conv1d_reference(x_, w, b, 5, 0.1, None)
            return jnp.sum(_conv1d_reference(h, w, b, 1, 0.1, x_) ** 2)

        np.testing.assert_allclose(float(loss_canvas(x)), float(loss_ref(x)),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(jax.grad(loss_canvas)(x)),
                                   np.asarray(jax.grad(loss_ref)(x)),
                                   rtol=1e-3, atol=1e-3)

    def test_vocoder_xbwd_canvas_gradient_semantics(self, rng, monkeypatch):
        """Full vocoder value AND input-gradient under the xbwd canvas routing
        == the plain XLA path (stage canvas entry/exit + pair/single mixing,
        tail blocks, packed stages untouched)."""
        from diffmusic_tpu.models.configs import HiFiGANConfig
        from diffmusic_tpu.models.hifigan import SpeechT5HifiGan

        monkeypatch.setenv("DIFFMUSIC_TPU_CANVAS", "xbwd")
        cfg = HiFiGANConfig(model_in_dim=64, upsample_initial_channel=256,
                            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                            resblock_kernel_sizes=(3, 7),
                            resblock_dilation_sizes=((1, 3), (1, 3)))
        voc = SpeechT5HifiGan(cfg)
        mel = jnp.asarray(rng.standard_normal((1, 41, 64)), jnp.float32)
        params = voc.init(jax.random.key(0), mel)

        def loss(m, interpret):
            ck._INTERPRET = interpret
            try:
                return jnp.sum(voc.apply(params, m) ** 2)
            finally:
                ck._INTERPRET = True

        got = float(loss(mel, True))
        want = float(loss(mel, False))
        np.testing.assert_allclose(got, want, rtol=1e-3)
        g_canvas = jax.grad(lambda m: loss(m, True))(mel)
        g_plain = jax.grad(lambda m: loss(m, False))(mel)
        np.testing.assert_allclose(np.asarray(g_canvas), np.asarray(g_plain),
                                   rtol=1e-3, atol=1e-3)
