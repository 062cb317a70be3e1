"""Mel-scale transforms (torchaudio-compatible math, pure JAX).

Replaces `torchaudio.transforms.{MelSpectrogram, MelScale, InverseMelScale,
AmplitudeToDB}` as used by the reference operators
(diffmusic/inverse_problem/operator.py:23-33,145-149) and runner (run.py:229-236).
The mel projection is a single dense matmul (n_freqs x n_mels) — MXU-friendly and
trivially differentiable, which matters because every guidance step backprops
through it.
"""

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _hz_to_mel(f, mel_scale: str = "htk"):
    f = np.asarray(f, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(m, mel_scale: str = "htk"):
    m = np.asarray(m, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                   f_min: float = 0.0, f_max: float | None = None,
                   norm: str | None = None, mel_scale: str = "htk") -> np.ndarray:
    """Triangular mel filterbank, shape (n_freqs, n_mels).

    Defaults (htk scale, no norm) match torchaudio.functional.melscale_fbanks as
    instantiated by the reference's MelSpectrogram/MelScale calls.
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_min, m_max = _hz_to_mel(f_min, mel_scale), _hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)

    f_diff = np.diff(f_pts)                                # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]           # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2:n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


@partial(jax.jit, static_argnames=("stype", "top_db"))
def amplitude_to_db(x: jax.Array, stype: str = "power",
                    top_db: float | None = None) -> jax.Array:
    """torchaudio.transforms.AmplitudeToDB: 10 (or 20) * log10(clamp(x, 1e-10))."""
    multiplier = 10.0 if stype == "power" else 20.0
    db = multiplier * jnp.log10(jnp.maximum(x, 1e-10))
    if top_db is not None:
        db = jnp.maximum(db, jnp.max(db) - top_db)
    return db


@dataclass(frozen=True)
class MelScale:
    """Project a (..., n_freqs, time) spectrogram to (..., n_mels, time)."""
    n_mels: int = 64
    sample_rate: int = 16000
    n_stft: int = 513
    f_min: float = 0.0
    f_max: float | None = None
    norm: str | None = None
    mel_scale: str = "htk"

    def filterbank(self) -> np.ndarray:
        return mel_filterbank(self.n_stft, self.n_mels, self.sample_rate,
                              self.f_min, self.f_max, self.norm, self.mel_scale)

    def __call__(self, spec: jax.Array) -> jax.Array:
        fb = jnp.asarray(self.filterbank(), dtype=spec.dtype)
        # (..., n_freqs, T) -> (..., n_mels, T)
        return jnp.einsum("...ft,fm->...mt", spec, fb)


@dataclass(frozen=True)
class InverseMelScale:
    """mel -> linear spectrogram via the filterbank pseudo-inverse.

    The reference uses torchaudio's iterative least-squares InverseMelScale
    (pipeline_musicldm.py:278-282); a precomputed pinv projection is the
    jit/grad-friendly equivalent: one matmul, no data-dependent iteration.
    """
    n_stft: int = 513
    n_mels: int = 64
    sample_rate: int = 16000
    f_min: float = 0.0
    f_max: float | None = None
    norm: str | None = None
    mel_scale: str = "htk"

    def pinv(self) -> np.ndarray:
        fb = mel_filterbank(self.n_stft, self.n_mels, self.sample_rate,
                            self.f_min, self.f_max, self.norm, self.mel_scale)
        return np.linalg.pinv(fb).astype(np.float32)  # (n_mels, n_freqs)

    def __call__(self, mel: jax.Array) -> jax.Array:
        """(..., n_mels, T) -> (..., n_freqs, T), clamped to >= 0."""
        pinv = jnp.asarray(self.pinv(), dtype=mel.dtype)
        lin = jnp.einsum("...mt,mf->...ft", mel, pinv)
        return jnp.maximum(lin, 0.0)


@dataclass(frozen=True)
class MelSpectrogram:
    """torchaudio.transforms.MelSpectrogram equivalent.

    (..., L) waveform -> (..., n_mels, num_frames) mel power spectrogram. Hann
    window, center/reflect padding, htk mels, no norm — the exact configuration the
    reference builds at operator.py:23-33 and run.py:229-236.
    """
    sample_rate: int = 16000
    n_fft: int = 1024
    hop_length: int = 160
    win_length: int = 1024
    n_mels: int = 64
    power: float = 2.0
    f_min: float = 0.0
    f_max: float | None = None

    def __call__(self, x: jax.Array) -> jax.Array:
        # XLA forward + manual scatter-free backward. The Pallas forward
        # (pallas.mel_kernel.fused_mel_spectrogram, 10.8x faster STANDALONE)
        # was re-measured inside the guidance grad even after the manual
        # backward removed all activation sharing: full guidance 100.9 vs
        # 58.5 ms/iter (docs/PERF_NOTES.md) — the kernel boundary inside the
        # big differentiated program loses regardless. It stays on the
        # forward-only metrics/eval paths.
        from ..pallas.mel_kernel import mel_spectrogram_fast_grad
        return mel_spectrogram_fast_grad(
            x, self.n_fft, self.hop_length, self.win_length, self.n_mels,
            self.sample_rate, self.f_min, self.f_max, self.power, True)


@dataclass(frozen=True)
class Wav2Mel:
    """MelSpectrogram + AmplitudeToDB(power): the reference's `wav2mel` pipeline."""
    sample_rate: int = 16000
    n_fft: int = 1024
    hop_length: int = 160
    win_length: int = 1024
    n_mels: int = 64
    power: float = 2.0
    mel: MelSpectrogram = field(init=False)

    def __post_init__(self):
        object.__setattr__(self, "mel", MelSpectrogram(
            self.sample_rate, self.n_fft, self.hop_length, self.win_length,
            self.n_mels, self.power))

    def __call__(self, x: jax.Array) -> jax.Array:
        return amplitude_to_db(self.mel(x), stype="power")
