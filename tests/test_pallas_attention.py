"""Flash attention Pallas kernel vs jax.nn.dot_product_attention (interpreter
mode on CPU; real-TPU numbers come from bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffmusic_tpu.pallas.attention_kernel as ak


@pytest.fixture(autouse=True)
def _interpret_mode():
    ak._INTERPRET = True
    yield
    ak._INTERPRET = False


class TestFlashAttention:
    @pytest.mark.parametrize("t", [256, 1000])  # aligned and ragged lengths
    def test_matches_dpa(self, rng, t):
        b, h, d = 2, 4, 8
        q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
        want = jax.nn.dot_product_attention(q, k, v)
        got = ak.flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_gradient_matches(self, rng):
        b, t, h, d = 1, 256, 2, 8
        q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)

        g_flash = jax.grad(lambda q_: jnp.sum(ak.flash_attention(q_, k, v) ** 2))(q)
        g_ref = jax.grad(lambda q_: jnp.sum(
            jax.nn.dot_product_attention(q_, k, v) ** 2))(q)
        np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_bf16_inputs(self, rng):
        b, t, h, d = 1, 512, 4, 8
        q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
        got = ak.flash_attention(q, q, q)
        want = jax.nn.dot_product_attention(q, q, q)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_attention_layer_routes_long_self_attn(self, rng):
        """layers.Attention must produce identical results whichever path it
        takes (flash for long unmasked self-attn, dpa otherwise)."""
        from diffmusic_tpu.models.layers import Attention
        x = jnp.asarray(rng.standard_normal((1, 600, 32)), jnp.float32)
        m = Attention(heads=4, head_dim=8)
        p = m.init(jax.random.key(0), x)
        got = m.apply(p, x)  # routes through flash (t=600 >= 512)
        ak._INTERPRET = False  # force the XLA reference path on CPU
        want = m.apply(p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)
