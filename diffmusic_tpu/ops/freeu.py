"""FreeU Fourier filtering (reference: diffmusic/torch_utils.py:86-144).

Present-but-unused in the reference pipelines; provided for API completeness.
fourier_filter low-passes the skip features' spectrum; apply_freeu rescales
backbone channels and filters skips at resolutions s1/s2/b1/b2.
"""

from typing import Dict, Tuple

import jax.numpy as jnp


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """Scale frequencies inside a centered (2*threshold)^2 box of the 2-D FFT.

    x: (B, C, H, W) — same semantics as the reference's FFT filter
    (torch_utils.py:86-117), fftshift/ifftshift included.
    """
    dtype = x.dtype
    x = x.astype(jnp.float32)
    x_freq = jnp.fft.fftn(x, axes=(-2, -1))
    x_freq = jnp.fft.fftshift(x_freq, axes=(-2, -1))

    b, c, h, w = x_freq.shape
    mask = jnp.ones((b, c, h, w), jnp.float32)
    crow, ccol = h // 2, w // 2
    mask = mask.at[..., crow - threshold:crow + threshold,
                   ccol - threshold:ccol + threshold].set(scale)
    x_freq = x_freq * mask

    x_freq = jnp.fft.ifftshift(x_freq, axes=(-2, -1))
    x_filtered = jnp.fft.ifftn(x_freq, axes=(-2, -1)).real
    return x_filtered.astype(dtype)


def apply_freeu(resolution_idx: int, hidden_states: jnp.ndarray,
                res_hidden_states: jnp.ndarray,
                **freeu_kwargs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backbone rescale + skip Fourier filter (torch_utils.py:120-144)."""
    if resolution_idx == 0:
        num_half = hidden_states.shape[1] // 2
        scaled = hidden_states[:, :num_half] * freeu_kwargs["b1"]
        hidden_states = jnp.concatenate(
            [scaled, hidden_states[:, num_half:]], axis=1)
        res_hidden_states = fourier_filter(res_hidden_states, threshold=1,
                                           scale=freeu_kwargs["s1"])
    if resolution_idx == 1:
        num_half = hidden_states.shape[1] // 2
        scaled = hidden_states[:, :num_half] * freeu_kwargs["b2"]
        hidden_states = jnp.concatenate(
            [scaled, hidden_states[:, num_half:]], axis=1)
        res_hidden_states = fourier_filter(res_hidden_states, threshold=1,
                                           scale=freeu_kwargs["s2"])
    return hidden_states, res_hidden_states
