"""ops/conv2d_rows.py (rows-decomposed 'same' conv2d) vs XLA's conv emitter.

Pure-XLA formulation (no pallas): kw dilated conv1ds over flattened rows.
Measured slower than the conv2d emitter everywhere except W=16 (see
docs/PERF_NOTES.md round-2 'rows-decomposed conv2d'); kept unrouted for
future emitter regressions. These tests pin forward and input-adjoint
exactness across geometries incl. non-square kernels and odd W.
"""

import jax
import jax.numpy as jnp
import pytest

from diffmusic_tpu.ops.conv2d_rows import conv2d_same_rows


def _conv_ref(x, w, b):
    kh, kw = w.shape[:2]
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=dn)
    return out + b


GEOMS = [
    (1, 250, 16, 64, 64, 3, 3),   # VAE mid geometry (channels shrunk)
    (2, 10, 7, 5, 9, 3, 3),       # odd W, Cin != Cout, batch 2
    (1, 33, 8, 16, 32, 5, 5),     # k=5
    (1, 9, 4, 3, 3, 1, 3),        # kh=1
    (1, 12, 5, 8, 8, 5, 3),       # kh != kw
]


@pytest.mark.parametrize("geom", GEOMS, ids=[str(g) for g in GEOMS])
def test_forward_matches_conv2d(geom):
    bsz, h, w_, cin, cout, kh, kw = geom
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(k1, (bsz, h, w_, cin), jnp.float32)
    w = jax.random.normal(k2, (kh, kw, cin, cout), jnp.float32) * 0.1
    b = jax.random.normal(k3, (cout,), jnp.float32)
    ref = _conv_ref(x, w, b)
    got = conv2d_same_rows(x, w, b)
    assert jnp.max(jnp.abs(ref - got)) < 1e-4


@pytest.mark.parametrize("geom", GEOMS[:3], ids=[str(g) for g in GEOMS[:3]])
def test_input_adjoint_matches_conv2d(geom):
    bsz, h, w_, cin, cout, kh, kw = geom
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(k1, (bsz, h, w_, cin), jnp.float32)
    w = jax.random.normal(k2, (kh, kw, cin, cout), jnp.float32) * 0.1
    b = jax.random.normal(k3, (cout,), jnp.float32)
    g = jax.random.normal(k3, (bsz, h, w_, cout), jnp.float32)
    dref = jax.vjp(lambda x_: _conv_ref(x_, w, b), x)[1](g)[0]
    dgot = jax.vjp(lambda x_: conv2d_same_rows(x_, w, b), x)[1](g)[0]
    assert jnp.max(jnp.abs(dref - dgot)) < 1e-4
