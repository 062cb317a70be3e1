"""utils loader + FreeU filter tests."""

import numpy as np
import jax.numpy as jnp

from diffmusic_tpu.utils import load_audio_files, waveform_to_spectrogram
from diffmusic_tpu.ops.freeu import fourier_filter, apply_freeu
from diffmusic_tpu.data import write_wav


class TestUtils:
    def test_load_audio_files_threaded(self, tmp_path, rng):
        for i in range(3):
            wav = (rng.standard_normal((1, 8000)) * 0.2).astype(np.float32)
            write_wav(tmp_path / f"f{i}.wav", wav, 16000)
        waves, names = load_audio_files(tmp_path, 16000)
        assert len(waves) == 3 and names == ["f0.wav", "f1.wav", "f2.wav"]
        assert all(w.shape == (8000,) for w in waves)

    def test_waveform_to_spectrogram_reexport(self, rng):
        x = jnp.asarray((rng.standard_normal((1, 3200)) * 0.2).astype(np.float32))
        mag, phase = waveform_to_spectrogram(x)
        assert mag.shape == phase.shape == (1, 513, 21)


class TestFreeU:
    def test_fourier_filter_scale_one_is_identity(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 2, 8, 8)).astype(np.float32))
        y = fourier_filter(x, threshold=1, scale=1.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_fourier_filter_zero_kills_dc(self):
        x = jnp.ones((1, 1, 8, 8))
        y = fourier_filter(x, threshold=1, scale=0.0)
        assert np.abs(np.asarray(y)).max() < 1e-5  # constant signal is all-DC

    def test_apply_freeu_shapes(self, rng):
        h = jnp.asarray(rng.standard_normal((1, 8, 4, 4)).astype(np.float32))
        r = jnp.asarray(rng.standard_normal((1, 8, 4, 4)).astype(np.float32))
        h2, r2 = apply_freeu(0, h, r, b1=1.2, b2=1.4, s1=0.9, s2=0.2)
        assert h2.shape == h.shape and r2.shape == r.shape
        np.testing.assert_allclose(np.asarray(h2[:, 4:]), np.asarray(h[:, 4:]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(h2[:, :4]),
                                   np.asarray(h[:, :4]) * 1.2, rtol=1e-5)
