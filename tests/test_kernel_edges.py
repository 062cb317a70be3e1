"""Edge-case sweep for the Pallas kernels: ragged lengths, sub-block inputs,
signals shorter than n_fft — forward AND gradient parity vs the XLA paths
(interpreter mode; relative tolerance since mel magnitudes are large)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffmusic_tpu.pallas.conv1d_kernel as ck
import diffmusic_tpu.pallas.mel_kernel as mk
from diffmusic_tpu.pallas.mel_kernel import (_reference_mel,
                                             fused_mel_spectrogram,
                                             mel_spectrogram_fast_grad)

pytestmark = pytest.mark.slow  # measured >45 s/module on the CPU mesh (r5)


@pytest.fixture(autouse=True)
def _interpret_mode():
    mk._INTERPRET = True
    ck._INTERPRET = True
    yield
    mk._INTERPRET = False
    ck._INTERPRET = False


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))


class TestMelEdges:
    @pytest.mark.parametrize("length", [800, 1024, 1025, 4001])
    def test_fwd_and_grad_parity(self, rng, length):
        x = jnp.asarray(rng.standard_normal((1, length)), jnp.float32)
        want = _reference_mel(x, 1024, 160, 1024, 64, 16000, 0.0, None, 2.0,
                              True)
        assert _rel(fused_mel_spectrogram(x), want) < 1e-5

        g1 = jax.grad(lambda s: jnp.sum(mel_spectrogram_fast_grad(s)))(x)
        g2 = jax.grad(lambda s: jnp.sum(
            _reference_mel(s, 1024, 160, 1024, 64, 16000, 0.0, None, 2.0,
                           True)))(x)
        assert _rel(g1, g2) < 1e-5


class TestConvEdges:
    @pytest.mark.parametrize("t", [100, 512, 1030])
    def test_ragged_lengths(self, rng, t):
        x = jnp.asarray(rng.standard_normal((2, t, 16)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((11, 16, 16)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.float32)
        got = ck.conv1d_fused(x, w, b, None, 5, 0.1, False)
        want = ck._conv1d_reference(x, w, b, 5, 0.1, None)
        assert _rel(got, want) < 1e-5
