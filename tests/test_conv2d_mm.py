"""Tap-GEMM conv2d routing (ops/conv2d_mm.py, layers.Conv2DSame): value and
input-gradient parity with nn.Conv, and VAE decoder equivalence under the
CPU routing hook."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from diffmusic_tpu.models import layers

pytestmark = pytest.mark.slow  # measured >45 s/module on the CPU mesh (r5)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestConv2DSame:
    @pytest.mark.parametrize("h,w,cin,cout,k", [
        (25, 16, 32, 48, 3),   # skinny-W latent geometry
        (10, 7, 8, 8, 3),      # odd sizes
        (9, 5, 4, 6, 1),       # 1x1
    ])
    def test_matches_nn_conv(self, rng, h, w, cin, cout, k):
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
        m_ref = nn.Conv(cout, (k, k), padding=k // 2)
        want, vs = m_ref.init_with_output(jax.random.key(1), x)
        m = layers.Conv2DSame(cout, kernel_size=k)
        layers._CONV2D_MM_ON_CPU = True
        try:
            got = m.apply(vs, x)
            g_want = jax.grad(
                lambda x_: jnp.sum(m_ref.apply(vs, x_) ** 2))(x)
            g_got = jax.grad(lambda x_: jnp.sum(m.apply(vs, x_) ** 2))(x)
        finally:
            layers._CONV2D_MM_ON_CPU = False
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=1e-4, atol=1e-4)

    def test_vae_decode_routing_equivalence(self, rng):
        """Full tiny VAE decode + input grad: tap-GEMM routing vs XLA conv."""
        from diffmusic_tpu.models.configs import tiny_vae_config
        from diffmusic_tpu.models.vae import AutoencoderKL
        vae = AutoencoderKL(tiny_vae_config())
        z = jnp.asarray(rng.standard_normal((1, 8, 10, 8)), jnp.float32)
        params = vae.init(jax.random.key(0), jnp.zeros((1, 1, 40, 32)))

        def loss(z_):
            return jnp.sum(vae.apply(params, z_,
                                     method=AutoencoderKL.decode) ** 2)

        want = vae.apply(params, z, method=AutoencoderKL.decode)
        g_want = jax.grad(loss)(z)
        layers._CONV2D_MM_ON_CPU = True
        try:
            got = vae.apply(params, z, method=AutoencoderKL.decode)
            g_got = jax.grad(loss)(z)
        finally:
            layers._CONV2D_MM_ON_CPU = False
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=1e-3, atol=1e-3)
