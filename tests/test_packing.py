"""Space-to-depth packing (ops/packing.py): exactness vs the unpacked convs.

The packed path must be bit-for-bit the same math as the reference XLA convs
(same accumulation dtype) — these tests pin equality at fp32 and the full
vocoder routing through models/hifigan.py's packed stages.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmusic_tpu.ops import packing
from diffmusic_tpu.pallas.conv1d_kernel import _conv1d_reference

pytestmark = pytest.mark.slow  # measured >45 s/module on the CPU mesh (r5)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestPackTime:
    def test_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 12, 3)), jnp.float32)
        for r in (2, 4):
            assert (packing.unpack_time(packing.pack_time(x, r), r) == x).all()

    def test_layout_phase_major(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 3)), jnp.float32)
        xp = packing.pack_time(x, 2)
        # row 0 = [x[0], x[1]] concatenated over channels
        np.testing.assert_array_equal(np.asarray(xp[0, 0, :3]),
                                      np.asarray(x[0, 0]))
        np.testing.assert_array_equal(np.asarray(xp[0, 0, 3:]),
                                      np.asarray(x[0, 1]))


class TestPackedConv1d:
    @pytest.mark.parametrize("k,d,r", [(3, 1, 2), (3, 3, 2), (3, 5, 4),
                                       (7, 1, 4), (7, 3, 2), (7, 5, 4),
                                       (11, 1, 2), (11, 3, 4), (11, 5, 4)])
    def test_matches_unpacked(self, rng, k, d, r):
        t, cin, cout = 48, 6, 6
        x = jnp.asarray(rng.standard_normal((2, t, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        want = _conv1d_reference(x, w, b, d, 0.1, None)
        got = packing.unpack_time(
            packing.packed_conv1d(packing.pack_time(x, r), w, b, d, r, 0.1), r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_residual_and_no_slope(self, rng):
        t, c, k, d, r = 32, 4, 7, 3, 4
        x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        res = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, c, c)) * 0.2, jnp.float32)
        b = jnp.zeros((c,))
        want = _conv1d_reference(x, w, b, d, None, res)
        got = packing.unpack_time(
            packing.packed_conv1d(packing.pack_time(x, r), w, b, d, r, None,
                                  residual=packing.pack_time(res, r)), r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_gradient_matches(self, rng):
        t, c, k, d, r = 40, 4, 7, 3, 4
        x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, c, c)) * 0.2, jnp.float32)
        b = jnp.zeros((c,))

        def loss_ref(x_):
            return jnp.sum(_conv1d_reference(x_, w, b, d, 0.1, None) ** 2)

        def loss_packed(x_):
            y = packing.packed_conv1d(packing.pack_time(x_, r), w, b, d, r, 0.1)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        np.testing.assert_allclose(np.asarray(jax.grad(loss_packed)(x)),
                                   np.asarray(jax.grad(loss_ref)(x)),
                                   rtol=1e-4, atol=1e-4)


class TestPackedConvTranspose:
    @pytest.mark.parametrize("r_in,r_out,cin,cout", [(1, 2, 8, 4),
                                                     (2, 4, 4, 2),
                                                     (1, 4, 8, 2)])
    def test_matches_flax_convtranspose(self, rng, r_in, r_out, cin, cout):
        k, stride, t = 4, 2, 24
        assert packing.can_pack_transpose(k, stride, r_in, r_out)
        x = jnp.asarray(rng.standard_normal((1, t, cin)), jnp.float32)
        mod = nn.ConvTranspose(cout, (k,), strides=(stride,),
                               padding=[(k - 1 - (k - stride) // 2,) * 2],
                               transpose_kernel=True)
        params = mod.init(jax.random.key(0), x)
        want = mod.apply(params, nn.leaky_relu(x, negative_slope=0.1))
        w = params["params"]["kernel"]  # (k, Cout, Cin)
        b = params["params"]["bias"]
        got = packing.unpack_time(
            packing.packed_convtranspose(packing.pack_time(x, r_in),
                                         w.swapaxes(1, 2), b, stride,
                                         r_in, r_out, slope=0.1), r_out)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestVocoderPackedRouting:
    def _cfg(self):
        from diffmusic_tpu.models.configs import HiFiGANConfig
        # two stages landing on ch64 (r=2) and ch32 (r=4)
        return HiFiGANConfig(model_in_dim=8, upsample_initial_channel=128,
                             upsample_rates=(2, 2),
                             upsample_kernel_sizes=(4, 4))

    def test_forward_matches_unpacked(self, rng):
        from diffmusic_tpu.models import hifigan
        voc = hifigan.SpeechT5HifiGan(self._cfg())
        x = jnp.asarray(rng.standard_normal((1, 40, 8)), jnp.float32)
        params = voc.init(jax.random.key(0), x)
        want = voc.apply(params, x)
        hifigan._PACK_ON_CPU = True
        try:
            got = voc.apply(params, x)
        finally:
            hifigan._PACK_ON_CPU = False
        assert got.shape == want.shape == (1, 160)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_param_tree_identical(self, rng):
        from diffmusic_tpu.models import hifigan
        voc = hifigan.SpeechT5HifiGan(self._cfg())
        x = jnp.asarray(rng.standard_normal((1, 40, 8)), jnp.float32)
        plain = jax.tree.map(jnp.shape, voc.init(jax.random.key(0), x))
        hifigan._PACK_ON_CPU = True
        try:
            packed = jax.tree.map(jnp.shape, voc.init(jax.random.key(0), x))
        finally:
            hifigan._PACK_ON_CPU = False
        assert plain == packed

    def test_gradient_matches_unpacked(self, rng):
        from diffmusic_tpu.models import hifigan
        voc = hifigan.SpeechT5HifiGan(self._cfg())
        x = jnp.asarray(rng.standard_normal((1, 40, 8)), jnp.float32)
        params = voc.init(jax.random.key(0), x)

        def loss(x_):
            return jnp.sum(voc.apply(params, x_).astype(jnp.float32) ** 2)

        want = jax.grad(loss)(x)
        hifigan._PACK_ON_CPU = True
        try:
            got = jax.grad(loss)(x)
        finally:
            hifigan._PACK_ON_CPU = False
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


class TestDenseConvTranspose:
    """Dense stride-packed ConvTranspose formulation for the unpacked
    upsampler stages (ops/packing.py::dense_convtranspose), including the
    ragged MusicLDM first stage (rate 5, k 16: T -> 5T+1)."""

    def test_matches_flax_convtranspose(self, rng):
        import flax.linen as nn
        from diffmusic_tpu.ops.packing import dense_convtranspose
        for (t, cin, cout, rate, k) in [(50, 16, 8, 5, 16), (51, 12, 6, 4, 16),
                                        (40, 8, 8, 2, 8), (33, 8, 4, 2, 4)]:
            x = jnp.asarray(rng.standard_normal((2, t, cin)), jnp.float32)
            pad = k - 1 - (k - rate) // 2
            m = nn.ConvTranspose(cout, (k,), strides=(rate,),
                                 padding=[(pad, pad)], transpose_kernel=True)
            want, vs = m.init_with_output(jax.random.key(1), x)
            w, b = vs["params"]["kernel"], vs["params"]["bias"]
            t_out = (t - 1) * rate + k - 2 * ((k - rate) // 2)
            got = dense_convtranspose(x, jnp.swapaxes(w, 1, 2), b, rate, k,
                                      t_out)
            assert got.shape == want.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)

    def test_vocoder_ragged_stage_fwd_and_grad(self, rng):
        """Full vocoder with a rate-5/k-16 ch128 stage: dense-CT routing
        (_PACK_ON_CPU) must match the nn.ConvTranspose path in value and
        input-gradient."""
        from diffmusic_tpu.models import hifigan
        from diffmusic_tpu.models.configs import HiFiGANConfig
        cfg = HiFiGANConfig(model_in_dim=8, upsample_initial_channel=256,
                            upsample_rates=(5, 4),
                            upsample_kernel_sizes=(16, 16),
                            resblock_kernel_sizes=(3,),
                            resblock_dilation_sizes=((1, 3),))
        voc = hifigan.SpeechT5HifiGan(cfg)
        x = jnp.asarray(rng.standard_normal((1, 10, 8)), jnp.float32)
        params = voc.init(jax.random.key(0), x)
        want = voc.apply(params, x)

        def loss(x_):
            return jnp.sum(voc.apply(params, x_).astype(jnp.float32) ** 2)

        want_g = jax.grad(loss)(x)
        hifigan._PACK_ON_CPU = True
        try:
            got = voc.apply(params, x)
            got_g = jax.grad(loss)(x)
        finally:
            hifigan._PACK_ON_CPU = False
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                                   rtol=1e-3, atol=1e-3)
