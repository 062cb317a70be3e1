"""Differentiable degradation operators A(x) for each inverse problem.

Reference: diffmusic/inverse_problem/operator.py. Each operator is a frozen
dataclass (a static pytree leaf-free object), so jitted sampling loops close over
its constants (masks, filterbanks, impulse responses) as compile-time data.

Interface (operator.py:6-14):
  - forward(audio, key):       the measurement model A(.)
  - transform(audio_or_mag):   map into the supervision space (mel dB by default)
  - inverse_transform(mel, vocoder): latent mel -> waveform via the vocoder
"""

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import MelScale, MelSpectrogram, amplitude_to_db
from ..ops.stft import spectrogram
from ..ops.resample import resample
from ..ops.filters import convolve1d, generate_impulse_response
from ..ops.masks import box_mask, periodic_mask, random_mask
from .noise import BaseNoise, GaussianNoise


def _squeeze_mel(mel: jax.Array) -> jax.Array:
    """(B, 1, T, n_mels) -> (B, T, n_mels): drop the channel axis for the vocoder."""
    if mel.ndim == 4:
        mel = mel[:, 0]
    return mel


class BaseOperator:
    noiser: BaseNoise

    def transform(self, data, *args, **kwargs):
        raise NotImplementedError

    def inverse_transform(self, mel_spectrogram, vocoder: Callable):
        """mel (B, 1, T, n_mels) or (B, T, n_mels) -> waveform (B, L)."""
        return vocoder(_squeeze_mel(mel_spectrogram))

    def forward(self, data, key=None):
        raise NotImplementedError


def _default_wav2mel(sample_rate: int = 16000):
    return MelSpectrogram(sample_rate=sample_rate, n_fft=1024, hop_length=160,
                          win_length=1024, n_mels=64, power=2.0)


@dataclass(frozen=True)
class IdentityOperator(BaseOperator):
    """A(x) = x (unconditional generation / style guidance substrate).

    Reference: operator.py:17-45. transform clamps the dB mel to [-80, 80].
    """
    sample_rate: int = 16000
    noiser: BaseNoise = field(default_factory=GaussianNoise)

    def transform(self, audio):
        mel = _default_wav2mel(self.sample_rate)(audio)
        return jnp.clip(amplitude_to_db(mel, "power"), -80.0, 80.0)

    def forward(self, data, key=None):
        return data


@dataclass(frozen=True)
class MusicInpaintingOperator(BaseOperator):
    """A(x) = mask * x with box / random / periodic time-domain masks.

    Reference: operator.py:48-133. Note the reference's transform has NO clamp for
    this operator (operator.py:123-124) — preserved here.
    """
    audio_length_in_s: float = 5.0
    sample_rate: int = 16000
    mask_type: str = "box"
    start_inpainting_s: Optional[float] = None
    end_inpainting_s: Optional[float] = None
    mask_percentage: float = 0.3
    mask_duration_s: float = 0.1
    interval_s: float = 1.0
    noiser: BaseNoise = field(default_factory=GaussianNoise)
    mask_key: Optional[jax.Array] = None  # only used for mask_type="random"
    mask: np.ndarray = field(init=False, repr=False)

    def __post_init__(self):
        total = int(self.audio_length_in_s * self.sample_rate)
        if self.mask_type == "box":
            m = box_mask(total, self.sample_rate, self.start_inpainting_s,
                         self.end_inpainting_s)
        elif self.mask_type == "random":
            key = self.mask_key if self.mask_key is not None else jax.random.key(0)
            m = random_mask(key, total, self.sample_rate, self.mask_percentage,
                            self.mask_duration_s)
        elif self.mask_type == "periodic":
            m = periodic_mask(total, self.sample_rate, self.interval_s,
                              self.mask_duration_s)
        else:
            raise ValueError(f"Unknown mask type: {self.mask_type}")
        object.__setattr__(self, "mask", m)

    def transform(self, audio):
        return amplitude_to_db(_default_wav2mel(self.sample_rate)(audio), "power")

    def forward(self, data, key=None):
        mask = jnp.asarray(self.mask, dtype=data.dtype)
        n = data.shape[-1]
        return self.noiser(data * mask[..., :n], key)


@dataclass(frozen=True)
class PhaseRetrievalOperator(BaseOperator):
    """A(x) = |STFT(x)| (rectangular window); transform maps magnitude -> mel.

    Reference: operator.py:136-171. The measurement lives in magnitude space; the
    supervision transform is a plain MelScale on the magnitude, clamped to [-80, 80].
    """
    n_fft: int = 1024
    hop_length: int = 160
    win_length: int = 1024
    sample_rate: int = 16000
    noiser: BaseNoise = field(default_factory=GaussianNoise)

    def transform(self, magnitude):
        mel = MelScale(n_mels=64, sample_rate=self.sample_rate,
                       n_stft=self.n_fft // 2 + 1)(magnitude)
        return jnp.clip(mel, -80.0, 80.0)

    def forward(self, data, key=None):
        mag = spectrogram(data, self.n_fft, self.hop_length, self.win_length,
                          power=1.0, center=True, use_hann=False)
        return self.noiser(mag, key)


@dataclass(frozen=True)
class SuperResolutionOperator(BaseOperator):
    """A(x) = downsample(x) by `scale` with windowed-sinc resampling.

    Reference: operator.py:174-205.
    """
    sample_rate: int = 16000
    scale: int = 10
    noiser: BaseNoise = field(default_factory=GaussianNoise)

    def transform(self, audio):
        mel = _default_wav2mel(16000)(audio)
        return jnp.clip(amplitude_to_db(mel, "power"), -80.0, 80.0)

    def forward(self, data, key=None):
        low = resample(data, self.sample_rate, self.sample_rate // self.scale)
        return self.noiser(low, key)


@dataclass(frozen=True)
class MusicDereverberationOperator(BaseOperator):
    """A(x) = x * h with a random cumsum impulse response.

    Reference: operator.py:208-250. The reference resamples a fresh IR on every
    forward call from global torch RNG; here the IR is drawn once from `ir_key` and
    closed over, which keeps A(.) deterministic inside the jitted guidance loop (the
    reference's per-call redraws make the "measurement" inconsistent between steps —
    a bug we do not reproduce).
    """
    ir_length: int = 800
    decay_factor: float = 0.85
    noiser: BaseNoise = field(default_factory=GaussianNoise)
    ir_key: Optional[jax.Array] = None
    ir: np.ndarray = field(init=False, repr=False)

    def __post_init__(self):
        key = self.ir_key if self.ir_key is not None else jax.random.key(0)
        ir = generate_impulse_response(key, self.ir_length, self.decay_factor)
        object.__setattr__(self, "ir", np.asarray(ir))

    def transform(self, audio):
        mel = _default_wav2mel(16000)(audio)
        return jnp.clip(amplitude_to_db(mel, "power"), -80.0, 80.0)

    def forward(self, data, key=None):
        ir = jnp.asarray(self.ir, dtype=data.dtype)
        return self.noiser(convolve1d(data, ir), key)


@dataclass(frozen=True)
class StyleGuidanceOperator(BaseOperator):
    """A(x) = x; transform = CLAP gram matrix of audio features.

    Reference: operator.py:253-271 — imported by run.py but never constructed (the
    style_guidance task raises at run.py:213-214). Here it is wired: `clap_embed`
    maps a waveform to patch features (B, T, D) and transform returns the gram
    matrix used as the style target.
    """
    clap_embed: Optional[Callable] = None
    noiser: BaseNoise = field(default_factory=GaussianNoise)

    def transform(self, audio):
        if self.clap_embed is None:
            raise ValueError("StyleGuidanceOperator requires a clap_embed callable")
        feats = self.clap_embed(audio)  # (B, T, D)
        gram = jnp.einsum("btd,bte->bde", feats, feats) / feats.shape[1]
        return gram

    def forward(self, data, key=None):
        return data
