"""Pure-JAX DSP ops (replaces the reference's torch/torchaudio L1 signal layer).

Everything here is differentiable, static-shape, and jit/scan-friendly. The hot
transforms (STFT, mel projection) are expressed as dense matmuls so XLA maps them
onto the MXU instead of scalar FFT butterflies.
"""

from .stft import stft, istft, spectrogram, magphase_spectrogram, hann_window
from .mel import (
    mel_filterbank,
    MelSpectrogram,
    MelScale,
    InverseMelScale,
    amplitude_to_db,
)
from .resample import resample, resample_kernel
from .filters import convolve1d, generate_impulse_response
from .masks import box_mask, random_mask, periodic_mask

__all__ = [
    "stft",
    "istft",
    "spectrogram",
    "magphase_spectrogram",
    "hann_window",
    "mel_filterbank",
    "MelSpectrogram",
    "MelScale",
    "InverseMelScale",
    "amplitude_to_db",
    "resample",
    "resample_kernel",
    "convolve1d",
    "generate_impulse_response",
    "box_mask",
    "random_mask",
    "periodic_mask",
]
