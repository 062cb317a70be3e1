"""STFT/iSTFT/mel parity against torch (CPU) and analytic cases."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffmusic_tpu.ops import (
    stft, istft, spectrogram, magphase_spectrogram, hann_window,
    mel_filterbank, amplitude_to_db, MelScale, InverseMelScale,
)
from diffmusic_tpu.ops.mel import MelSpectrogram, Wav2Mel


def _rand_wave(rng, n=16000, b=1):
    return rng.standard_normal((b, n)).astype(np.float32) * 0.3


class TestSTFT:
    def test_matches_torch_rect_window(self, rng):
        x = _rand_wave(rng, 8000)
        re, im = stft(jnp.asarray(x), n_fft=1024, hop_length=160, win_length=1024,
                      use_hann=False)
        ref = torch.stft(torch.from_numpy(x), n_fft=1024, hop_length=160,
                         win_length=1024, return_complex=True)
        np.testing.assert_allclose(np.asarray(re), ref.real.numpy(),
                                   rtol=1e-3, atol=2e-2)
        np.testing.assert_allclose(np.asarray(im), ref.imag.numpy(),
                                   rtol=1e-3, atol=2e-2)

    def test_matches_torch_hann_window(self, rng):
        x = _rand_wave(rng, 8000)
        re, im = stft(jnp.asarray(x), n_fft=1024, hop_length=160, win_length=1024,
                      use_hann=True)
        ref = torch.stft(torch.from_numpy(x), n_fft=1024, hop_length=160,
                         win_length=1024, window=torch.hann_window(1024),
                         return_complex=True)
        np.testing.assert_allclose(np.asarray(re), ref.real.numpy(),
                                   rtol=1e-3, atol=2e-2)

    def test_num_frames(self, rng):
        x = _rand_wave(rng, 80000)
        re, _ = stft(jnp.asarray(x))
        assert re.shape == (1, 513, 1 + 80000 // 160)

    def test_magphase_matches_torch(self, rng):
        x = _rand_wave(rng, 4800)
        mag, phase = magphase_spectrogram(jnp.asarray(x))
        ref = torch.stft(torch.from_numpy(x), n_fft=1024, hop_length=160,
                         win_length=1024, return_complex=True)
        np.testing.assert_allclose(np.asarray(mag), ref.abs().numpy(),
                                   rtol=1e-3, atol=2e-2)

    def test_istft_roundtrip_rect(self, rng):
        x = _rand_wave(rng, 4800)
        re, im = stft(jnp.asarray(x), use_hann=False)
        y = istft(re, im, use_hann=False, length=4800)
        np.testing.assert_allclose(np.asarray(y), x, rtol=1e-3, atol=1e-3)

    def test_istft_matches_torch(self, rng):
        x = _rand_wave(rng, 4800)
        spec = torch.stft(torch.from_numpy(x), n_fft=1024, hop_length=160,
                          win_length=1024, return_complex=True)
        ref = torch.istft(spec, n_fft=1024, hop_length=160, win_length=1024)
        y = istft(jnp.asarray(spec.real.numpy()), jnp.asarray(spec.imag.numpy()),
                  use_hann=False)
        assert y.shape[-1] == ref.shape[-1]
        np.testing.assert_allclose(np.asarray(y), ref.numpy(), rtol=1e-3, atol=1e-3)

    def test_spectrogram_is_differentiable(self, rng):
        import jax
        x = jnp.asarray(_rand_wave(rng, 3200))
        g = jax.grad(lambda w: jnp.sum(spectrogram(w)))(x)
        assert np.isfinite(np.asarray(g)).all()


class TestMel:
    def test_filterbank_shape_and_partition(self):
        fb = mel_filterbank(513, 64, 16000)
        assert fb.shape == (513, 64)
        # interior frequencies are covered by the triangle partition
        assert (fb.sum(axis=1)[5:-5] > 0).all()

    def test_amplitude_to_db(self):
        x = jnp.asarray([1.0, 10.0, 100.0])
        np.testing.assert_allclose(np.asarray(amplitude_to_db(x, "power")),
                                   [0.0, 10.0, 20.0], atol=1e-5)
        # clamp at amin
        assert float(amplitude_to_db(jnp.asarray([0.0]))[0]) == -100.0

    def test_mel_spectrogram_shape(self, rng):
        x = jnp.asarray(_rand_wave(rng, 80000))
        mel = MelSpectrogram()(x)
        assert mel.shape == (1, 64, 501)
        assert np.isfinite(np.asarray(mel)).all()

    def test_wav2mel_range(self, rng):
        x = jnp.asarray(_rand_wave(rng, 16000))
        db = Wav2Mel()(x)
        assert np.asarray(db).max() <= 100.0 and np.asarray(db).min() >= -100.0

    def test_inverse_mel_is_right_inverse_on_smooth_spectra(self):
        # A mel-bandlimited spectrum should survive mel -> pinv -> mel
        fb = mel_filterbank(513, 64, 16000)
        mel_in = np.abs(np.random.default_rng(1).standard_normal((1, 64, 10))
                        ).astype(np.float32)
        lin = np.einsum("bmt,mf->bft", mel_in, np.linalg.pinv(fb).astype(np.float32))
        mel_rt = np.einsum("bft,fm->bmt", np.asarray(lin), fb)
        np.testing.assert_allclose(mel_rt, mel_in, rtol=1e-3, atol=1e-4)

    def test_inverse_melscale_shapes(self):
        inv = InverseMelScale(n_stft=513, n_mels=64)
        out = inv(jnp.ones((2, 64, 7)))
        assert out.shape == (2, 513, 7)
        assert (np.asarray(out) >= 0).all()

    def test_melscale_matches_manual(self, rng):
        spec = jnp.asarray(np.abs(rng.standard_normal((1, 513, 5))).astype(np.float32))
        out = MelScale(n_mels=64, sample_rate=16000, n_stft=513)(spec)
        fb = mel_filterbank(513, 64, 16000)
        np.testing.assert_allclose(np.asarray(out),
                                   np.einsum("bft,fm->bmt", np.asarray(spec), fb),
                                   rtol=1e-4, atol=1e-5)
