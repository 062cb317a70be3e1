"""Fused Pallas mel-spectrogram kernel vs the plain-XLA reference path.

Runs the kernel in Pallas interpreter mode on CPU (bit-accurate semantics,
no TPU needed); the real-TPU compile is exercised by bench.py / tools.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffmusic_tpu.pallas.mel_kernel as mk
from diffmusic_tpu.ops.mel import MelSpectrogram


@pytest.fixture(autouse=True)
def _interpret_mode():
    mk._INTERPRET = True
    yield
    mk._INTERPRET = False


class TestFusedMel:
    @pytest.mark.parametrize("length", [16000, 16000 * 2 + 123])
    def test_matches_reference(self, rng, length):
        x = jnp.asarray(rng.standard_normal((2, length)), jnp.float32)
        want = MelSpectrogram()(x)
        got = mk.fused_mel_spectrogram(x)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-3)

    def test_nondefault_geometry(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8000)), jnp.float32)
        kw = dict(n_fft=512, hop_length=128, win_length=400, n_mels=40)
        want = MelSpectrogram(sample_rate=16000, **kw)(x)
        got = mk.fused_mel_spectrogram(x, kw["n_fft"], kw["hop_length"],
                                       kw["win_length"], kw["n_mels"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-3)

    def test_gradient_matches_reference(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8000)), jnp.float32)

        def loss_fused(s):
            return jnp.sum(mk.fused_mel_spectrogram(s) ** 0.5)

        def loss_ref(s):
            return jnp.sum(MelSpectrogram()(s) ** 0.5)

        g_fused = jax.grad(loss_fused)(x)
        g_ref = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_batched_shapes(self, rng):
        x = jnp.asarray(rng.standard_normal((3, 2, 4000)), jnp.float32)
        got = mk.fused_mel_spectrogram(x)
        assert got.shape == (3, 2, 64, 1 + 4000 // 160)
        assert np.isfinite(np.asarray(got)).all()
