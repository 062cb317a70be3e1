"""pallas/mask_kernel.py (leaky-ReLU backward masks) vs jnp.where, interpret
mode — incl. ragged T (non-multiple of ROW_BLOCK, masked by Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import pytest

from diffmusic_tpu.pallas import mask_kernel as mk
from diffmusic_tpu.pallas.mask_kernel import leaky_mask, leaky_mask_add


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(mk, "_INTERPRET", True)


SHAPES = [(1, 4096, 128), (1, 5001, 256), (2, 2048, 128), (1, 20016, 128)]


@pytest.mark.parametrize("shape", SHAPES, ids=[str(s) for s in SHAPES])
def test_leaky_mask(shape):
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    h = jax.random.normal(k1, shape, jnp.float32)
    g = jax.random.normal(k2, shape, jnp.float32)
    r = jax.random.normal(k3, shape, jnp.float32)
    slope = 0.1
    ref = jnp.where(h >= 0, g, slope * g)
    got = leaky_mask(h, g, slope)
    assert got.shape == shape
    assert jnp.max(jnp.abs(ref - got)) < 1e-6
    ref2 = ref + r
    got2 = leaky_mask_add(h, g, r, slope)
    assert jnp.max(jnp.abs(ref2 - got2)) < 1e-6


def test_mask_ok_gates():
    assert mk.mask_ok(jnp.zeros((1, 4096, 128)))
    assert not mk.mask_ok(jnp.zeros((1, 4096, 64)))   # unaligned lanes
    assert not mk.mask_ok(jnp.zeros((1, 512, 128)))   # too few rows
