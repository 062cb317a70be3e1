"""Phase-GEMM ConvTranspose Pallas kernel vs flax nn.ConvTranspose
(interpreter mode), including the frozen-weight custom VJP and the HiFi-GAN
upsampler wiring at all three unpacked stage geometries."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffmusic_tpu.pallas.upsampler_kernel as uk
from diffmusic_tpu.pallas.upsampler_kernel import (_tap_table,
                                                   phase_convtranspose)


@pytest.fixture(autouse=True)
def _interpret_mode():
    uk._INTERPRET = True
    yield
    uk._INTERPRET = False


def _flax_ct(x, w_math, b, stride, k, slope=None):
    """Reference: the exact module models/hifigan.py uses on the XLA path."""
    if slope is not None:
        x = jnp.where(x >= 0, x, slope * x)
    pad = k - 1 - (k - stride) // 2
    mod = nn.ConvTranspose(w_math.shape[2], (k,), strides=(stride,),
                           padding=[(pad, pad)], transpose_kernel=True)
    # transpose_kernel=True layout: (k, Cout, Cin) = math (k, Cin, Cout).T
    params = {"params": {"kernel": jnp.swapaxes(w_math, 1, 2), "bias": b}}
    return mod.apply(params, x)


# the three unpacked MusicLDM vocoder stages (channels shrunk 4x for CPU
# speed; alignment stays 128-multiples so the pallas path is exercised)
STAGES = [
    (16, 5, 256, 128, 40),   # stage0: RAGGED (t_out = 5*T + 1)
    (16, 4, 128, 128, 48),   # stage1
    (8, 2, 256, 128, 52),    # stage2
]


class TestTapTable:
    @pytest.mark.parametrize("k,s", [(16, 5), (16, 4), (8, 2), (4, 2)])
    def test_every_tap_used_once(self, k, s):
        taps, d_lo, d_hi = _tap_table(k, s)
        js = sorted(j for lst in taps.values() for _, j in lst)
        assert js == list(range(k))
        assert all(d_lo <= d <= d_hi for lst in taps.values()
                   for d, _ in lst)

    @pytest.mark.parametrize("k,s", [(16, 5), (16, 4), (8, 2)])
    def test_tap_identity(self, k, s):
        # j = rho + p_ct - s*d must reproduce torch ConvTranspose semantics
        p = (k - s) // 2
        taps, _, _ = _tap_table(k, s)
        for rho, lst in taps.items():
            for d, j in lst:
                assert j == rho + p - s * d


class TestPhaseConvTranspose:
    @pytest.mark.parametrize("k,s,cin,cout,t", STAGES)
    def test_matches_flax(self, rng, k, s, cin, cout, t):
        x = jnp.asarray(rng.standard_normal((1, t, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
        t_out = (t - 1) * s + k - 2 * ((k - s) // 2)
        got = phase_convtranspose(x, w, b, s, k, t_out, slope=0.1)
        want = _flax_ct(x, w, b, s, k, slope=0.1)
        assert got.shape == want.shape == (1, t_out, cout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_cout_split_path(self, rng):
        # a tiny VMEM budget forces cb < cout, exercising the c-grid axis
        # (the full-scale stage0 takes this path)
        old = uk.VMEM_BUDGET
        uk.VMEM_BUDGET = 1
        try:
            k, s, cin, cout, t = 16, 4, 128, 256, 40
            x = jnp.asarray(rng.standard_normal((1, t, cin)), jnp.float32)
            w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.1,
                            jnp.float32)
            b = jnp.zeros((cout,))
            t_out = t * s
            got = phase_convtranspose(x, w, b, s, k, t_out)
            want = _flax_ct(x, w, b, s, k)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-4)
        finally:
            uk.VMEM_BUDGET = old

    @pytest.mark.parametrize("k,s,cin,cout,t", STAGES[:2])
    def test_gradient_matches_autodiff(self, rng, k, s, cin, cout, t):
        x = jnp.asarray(rng.standard_normal((1, t, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
        t_out = (t - 1) * s + k - 2 * ((k - s) // 2)

        def loss_phase(x_):
            return jnp.sum(phase_convtranspose(x_, w, b, s, k, t_out,
                                               slope=0.1) ** 2)

        def loss_ref(x_):
            return jnp.sum(_flax_ct(x_, w, b, s, k, slope=0.1) ** 2)

        g = jax.grad(loss_phase)(x)
        g_ref = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-3)

    def test_unaligned_channels_fall_back(self, rng):
        # tiny configs (cin 32) must route to the native path and stay exact
        k, s, cin, cout, t = 16, 5, 32, 16, 25
        x = jnp.asarray(rng.standard_normal((1, t, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.1, jnp.float32)
        b = jnp.zeros((cout,))
        t_out = (t - 1) * s + k - 2 * ((k - s) // 2)
        got = phase_convtranspose(x, w, b, s, k, t_out)
        want = _flax_ct(x, w, b, s, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


class TestHifiganWiring:
    def test_vocoder_forward_matches_xla_routing(self, rng, monkeypatch):
        """Full tiny vocoder with DIFFMUSIC_TPU_UPS=phase (unaligned tiny
        channels fall back internally, so this checks the routing seam) and
        an aligned-channel custom config exercising the kernel in situ."""
        import diffmusic_tpu.models.hifigan as hg
        from diffmusic_tpu.models.configs import HiFiGANConfig

        cfg = HiFiGANConfig(model_in_dim=64, upsample_initial_channel=256,
                            upsample_rates=(5, 4), upsample_kernel_sizes=(16, 16),
                            resblock_kernel_sizes=(3,),
                            resblock_dilation_sizes=((1,),))
        model = hg.SpeechT5HifiGan(cfg)
        x = jnp.asarray(rng.standard_normal((1, 24, 64)), jnp.float32)
        params = model.init(jax.random.key(0), x)

        monkeypatch.setenv("DIFFMUSIC_TPU_UPS", "xla")
        want = model.apply(params, x)
        monkeypatch.setenv("DIFFMUSIC_TPU_UPS", "phase")
        got = model.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
