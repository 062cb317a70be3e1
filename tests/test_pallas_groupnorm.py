"""Fused GroupNorm(+SiLU) kernel vs flax nn.GroupNorm."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffmusic_tpu.pallas.groupnorm_kernel as gk
from diffmusic_tpu.models.layers import FusedGroupNorm


@pytest.fixture(autouse=True)
def _interpret_mode():
    gk._INTERPRET = True
    yield
    gk._INTERPRET = False


def _flax_gn(x, scale, bias, groups, eps, use_silu):
    y = nn.GroupNorm(num_groups=groups, epsilon=eps).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    return nn.silu(y) if use_silu else y


class TestFusedGroupNorm:
    # (B, H, W, C): UNet level-0/1 geometries, a non-multiple-of-8 row count
    # (level-2 H*W=252), and the padded-row masking path
    @pytest.mark.parametrize("shape,groups", [
        ((2, 50, 16, 128), 32),
        ((2, 25, 8, 256), 32),
        ((1, 63, 4, 128), 32),   # 252 rows -> pad to 256, masked stats
        ((2, 4, 2, 384), 32),
    ])
    @pytest.mark.parametrize("use_silu", [False, True])
    def test_matches_flax(self, rng, shape, groups, use_silu):
        x = jnp.asarray(rng.standard_normal(shape) * 2.0 + 0.3, jnp.float32)
        c = shape[-1]
        scale = jnp.asarray(rng.standard_normal(c) * 0.2 + 1.0, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
        got = gk.fused_group_norm(x, scale, bias, groups, 1e-5, use_silu)
        want = _flax_gn(x, scale, bias, groups, 1e-5, use_silu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_bf16_io(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 10, 16, 128)),
                        jnp.float32).astype(jnp.bfloat16)
        scale = jnp.ones(128, jnp.bfloat16)
        bias = jnp.zeros(128, jnp.bfloat16)
        got = gk.fused_group_norm(x, scale, bias, 32, 1e-5, True)
        assert got.dtype == jnp.bfloat16
        want = _flax_gn(x.astype(jnp.float32), scale.astype(jnp.float32),
                        bias.astype(jnp.float32), 32, 1e-5, True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), rtol=2e-2, atol=2e-2)

    def test_gradient_matches_composition(self, rng):
        """custom_vjp backward (XLA recompute) must match autodiff through
        the plain composition — DITTO/optim_prompt differentiate the UNet."""
        x = jnp.asarray(rng.standard_normal((1, 8, 4, 128)), jnp.float32)
        scale = jnp.asarray(rng.standard_normal(128) * 0.1 + 1.0, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(128) * 0.1, jnp.float32)

        def loss_fused(x_, s_, b_):
            return jnp.sum(jnp.square(
                gk.fused_group_norm(x_, s_, b_, 32, 1e-5, True)))

        def loss_ref(x_, s_, b_):
            return jnp.sum(jnp.square(_flax_gn(x_, s_, b_, 32, 1e-5, True)))

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_module_param_names_match_groupnorm(self, rng):
        """FusedGroupNorm must be checkpoint-compatible with nn.GroupNorm:
        same param names/shapes, same output."""
        x = jnp.asarray(rng.standard_normal((1, 6, 4, 128)), jnp.float32)
        mod = FusedGroupNorm(num_groups=32, epsilon=1e-6)
        params = mod.init(jax.random.key(0), x)
        assert set(params["params"].keys()) == {"scale", "bias"}
        assert params["params"]["scale"].shape == (128,)
        ref = nn.GroupNorm(num_groups=32, epsilon=1e-6)
        want = ref.apply(params, x)
        got = mod.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("shape,groups", [
        ((2, 50, 16, 128), 32),     # exact row-block divisor path
        ((1, 63, 4, 128), 32),      # 252 rows: padded + masked moments
        ((1, 25, 10, 512), 32),     # VAE mid geometry (scaled)
    ])
    @pytest.mark.parametrize("use_silu", [False, True])
    def test_stats_mode_matches_flax(self, rng, shape, groups, use_silu):
        x = jnp.asarray(rng.standard_normal(shape) * 2.0 + 0.3, jnp.float32)
        c = shape[-1]
        scale = jnp.asarray(rng.standard_normal(c) * 0.2 + 1.0, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
        got = gk.stats_group_norm(x, scale, bias, groups, 1e-5, use_silu)
        want = _flax_gn(x, scale, bias, groups, 1e-5, use_silu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)

    def test_channel_moments_gradient_is_exact(self, rng):
        """channel_moments' hand-written VJP (dx = ds + 2x*dss — elementwise,
        keeping the pallas call out of the transposed region) must match
        autodiff through the reference reduction."""
        x = jnp.asarray(rng.standard_normal((2, 24, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((2, 2, 128)), jnp.float32)

        g1 = jax.grad(lambda x_: jnp.sum(gk.channel_moments(x_) * w))(x)
        g2 = jax.grad(lambda x_: jnp.sum(gk._moments_reference(x_) * w))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-5)

    def test_stats_mode_gradient_matches_composition(self, rng):
        """VAE decode is differentiated every guided step: the stats-mode
        GroupNorm gradient must match autodiff through flax nn.GroupNorm."""
        x = jnp.asarray(rng.standard_normal((1, 8, 4, 128)), jnp.float32)
        scale = jnp.asarray(rng.standard_normal(128) * 0.1 + 1.0, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(128) * 0.1, jnp.float32)

        def loss_stats(x_, s_, b_):
            return jnp.sum(jnp.square(
                gk.stats_group_norm(x_, s_, b_, 32, 1e-5, True)))

        def loss_ref(x_, s_, b_):
            return jnp.sum(jnp.square(_flax_gn(x_, s_, b_, 32, 1e-5, True)))

        g1 = jax.grad(loss_stats, argnums=(0, 1, 2))(x, scale, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_moments_block_rows_divisors(self):
        """Every VAE/UNet level at MusicLDM 10-s scale gets an exact-divisor
        row block (no pad copy): (N, C) from the swapped decoder + UNet."""
        for n, c in [(4000, 512), (16000, 256), (64000, 128),
                     (4000, 128), (1000, 256), (252, 384)]:
            rb = gk._moments_block_rows(n, c)
            assert rb % 8 == 0 and rb * c <= gk._MOMENT_BLOCK_ELEMS
            if n % 8 == 0:
                assert n % rb == 0, (n, c, rb)

    def test_ineligible_shapes_use_reference(self, rng):
        """Non-128-multiple channels and >VMEM tensors route to the XLA
        composition (the whole VAE decoder at full scale)."""
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 64)), jnp.float32)
        scale, bias = jnp.ones(64), jnp.zeros(64)
        assert not gk._eligible(x)
        got = gk.fused_group_norm(x, scale, bias, 32, 1e-5, False)
        want = _flax_gn(x, scale, bias, 32, 1e-5, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        big = jax.ShapeDtypeStruct((1, 250, 16, 512), jnp.float32)
        assert not gk._eligible(jnp.zeros(big.shape))
