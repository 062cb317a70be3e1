"""Polyphase windowed-sinc resampling (torchaudio.transforms.Resample math, JAX).

Used by the super-resolution degradation operator
(diffmusic/inverse_problem/operator.py:180,203-205). Implemented as a strided 1-D
convolution so it is differentiable and XLA maps it onto the conv/MXU units.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def resample_kernel(orig_freq: int, new_freq: int,
                    lowpass_filter_width: int = 6, rolloff: float = 0.99):
    """Sinc-interp kernel with Hann window (torchaudio default method).

    Returns (kernel, width): kernel has shape (new_freq_r, kernel_width) with the
    gcd-reduced rates; width is the one-sided pad in input samples.
    """
    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig = int(orig_freq) // gcd
    new = int(new_freq) // gcd

    base_freq = min(orig, new) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig / base_freq))

    idx = np.arange(-width, width + orig, dtype=np.float64) / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx[None, :]
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t = t * np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * (base_freq / orig)
    return kernel.astype(np.float32), width, orig, new


@partial(jax.jit, static_argnames=("orig_freq", "new_freq", "lowpass_filter_width",
                                   "rolloff"))
def resample(x: jax.Array, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6, rolloff: float = 0.99) -> jax.Array:
    """Resample (..., L) -> (..., ceil(L * new / orig))."""
    if orig_freq == new_freq:
        return x
    kernel, width, orig, new = resample_kernel(orig_freq, new_freq,
                                               lowpass_filter_width, rolloff)
    length = x.shape[-1]
    batch_shape = x.shape[:-1]
    xb = x.reshape(-1, 1, length)
    xb = jnp.pad(xb, ((0, 0), (0, 0), (width, width + orig)))

    k = jnp.asarray(kernel, dtype=x.dtype)[:, None, :]  # (new, 1, Kw) OIW
    y = jax.lax.conv_general_dilated(
        xb, k, window_strides=(orig,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"))
    # (B, new, L//orig+1) -> interleave phases -> (B, new * frames)
    y = jnp.swapaxes(y, 1, 2).reshape(xb.shape[0], -1)
    target_length = int(math.ceil(new * length / orig))
    y = y[:, :target_length]
    return y.reshape(*batch_shape, target_length)
