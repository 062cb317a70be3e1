"""Pallas TPU kernels for the hot DSP paths.

The guided samplers evaluate waveform -> mel transforms inside every denoising
step (forward AND backward through jax.grad — SURVEY.md section 3.3), so the
mel pipeline is the highest-leverage fusion target outside the UNet itself.
"""

from .mel_kernel import fused_mel_spectrogram

__all__ = ["fused_mel_spectrogram"]
