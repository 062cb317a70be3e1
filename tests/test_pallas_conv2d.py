"""conv2d_same_fused (pallas/conv2d_kernel.py) in interpreter mode vs XLA.

The kernel flattens (H, W) into rows with periodic W-boundary masks; these
tests pin forward exactness, the activation-gradient contract (both backward
routings), and the XLA fallback for ineligible geometries.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmusic_tpu.pallas import conv2d_kernel as ck
from diffmusic_tpu.pallas.conv2d_kernel import (_conv2d_reference,
                                                conv2d_same_fused)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(ck, "_INTERPRET", True)


# (B, H, W, Cin, Cout, kh, kw) — VAE/UNet decoder geometries scaled down in H
GEOMS = [
    (1, 64, 16, 128, 128, 3, 3),   # W=16 (latent res), square kernel
    (1, 32, 32, 128, 256, 3, 3),   # W=32, channel-raising
    (2, 16, 64, 128, 128, 3, 3),   # W=64, batch 2 (CFG doubling)
    (1, 64, 16, 128, 128, 1, 3),   # non-square taps
    (1, 64, 16, 128, 128, 3, 1),
]


@pytest.mark.parametrize("b,h,w,cin,cout,kh,kw", GEOMS)
def test_forward_matches_xla(b, h, w, cin, cout, kh, kw):
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (b, h, w, cin))
    wt = jax.random.normal(k2, (kh, kw, cin, cout)) * 0.05
    bias = jax.random.normal(k3, (cout,))
    got = conv2d_same_fused(x, wt, bias)
    want = _conv2d_reference(x, wt, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bwd", ["xla", "pallas"])
def test_activation_gradient_matches_xla(bwd, monkeypatch):
    monkeypatch.setenv("DIFFMUSIC_TPU_CONV2D_BWD", bwd)
    key = jax.random.key(1)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (1, 48, 16, 128))
    wt = jax.random.normal(k2, (3, 3, 128, 128)) * 0.05
    bias = jnp.zeros((128,))

    def loss_fused(x):
        return jnp.sum(jnp.sin(conv2d_same_fused(x, wt, bias)))

    def loss_ref(x):
        return jnp.sum(jnp.sin(_conv2d_reference(x, wt, bias)))

    gx = jax.grad(loss_fused)(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)


def test_weight_cotangents_are_zero():
    # documented contract: frozen-weight inference framework (SURVEY.md 3.3)
    x = jax.random.normal(jax.random.key(2), (1, 32, 16, 128))
    wt = jax.random.normal(jax.random.key(3), (3, 3, 128, 128)) * 0.05
    bias = jnp.zeros((128,))
    gw = jax.grad(lambda w: jnp.sum(conv2d_same_fused(x, w, bias)))(wt)
    assert float(jnp.abs(gw).max()) == 0.0


def test_ineligible_routes_to_xla(monkeypatch):
    # Cin=8 (the VAE conv_in) is not lane-aligned: must fall back, stay exact
    monkeypatch.setattr(ck, "_INTERPRET", False)
    x = jax.random.normal(jax.random.key(4), (1, 64, 16, 8))
    wt = jax.random.normal(jax.random.key(5), (3, 3, 8, 128)) * 0.05
    bias = jnp.zeros((128,))
    got = conv2d_same_fused(x, wt, bias)
    want = _conv2d_reference(x, wt, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
