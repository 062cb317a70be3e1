"""STFT / iSTFT as MXU matmuls.

Semantics match `torch.stft` / `torch.istft` with `center=True`,
`pad_mode="reflect"`, `onesided=True` (the settings used by the reference at
diffmusic/utils.py:11-20 and diffmusic/inverse_problem/operator.py:163-170), but the
transform is computed as `frames @ DFT_basis` — two real matmuls per signal — instead
of an FFT. On TPU this keeps the whole op on the 128x128 systolic array, avoids
complex dtypes entirely, and gives exact, cheap gradients for the guidance backward
pass.
"""

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _dft_basis(n_fft: int, dtype=np.float32):
    """Real/imag DFT basis for the onesided transform: (n_fft, n_fft//2+1) each."""
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(dtype), (-np.sin(ang)).astype(dtype)


def frame_signal(x: jax.Array, n_fft: int, hop_length: int, center: bool = True,
                 pad_mode: str = "reflect") -> jax.Array:
    """(..., L) -> (..., num_frames, n_fft) with center padding.

    num_frames = 1 + L // hop_length when center=True (torch.stft convention).

    Gather-free: a (frames, n_fft) fancy-index gather serializes on TPU, so
    the overlapping windows are built as a hop-strided reshape + k shifted
    dense slices concatenated on the last axis — the exact mirror of the
    scatter-free overlap_add below. frame[i] = concat_c x[(i+c)h:(i+c+1)h]
    sliced to n_fft.
    """
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)
    batch = x.shape[:-1]
    length = x.shape[-1]
    num_frames = (length - n_fft) // hop_length + 1
    k = -(-n_fft // hop_length)  # ceil
    need = (num_frames + k - 1) * hop_length
    if need > length:
        x = jnp.pad(x, [(0, 0)] * len(batch) + [(0, need - length)])
    v = x[..., :need].reshape(*batch, num_frames + k - 1, hop_length)
    parts = [v[..., c:c + num_frames, :] for c in range(k)]
    return jnp.concatenate(parts, axis=-1)[..., :n_fft]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "center",
                                   "use_hann"))
def stft(x: jax.Array, n_fft: int = 1024, hop_length: int = 160,
         win_length: int = 1024, center: bool = True, use_hann: bool = False):
    """Onesided STFT. Returns (real, imag), each (..., n_freqs, num_frames).

    use_hann=False matches `torch.stft(window=None)` (rectangular window), which is
    what the reference's phase-retrieval operator and waveform_to_spectrogram use.
    """
    frames = frame_signal(x, n_fft, hop_length, center)
    if use_hann:
        w = hann_window(win_length, dtype=frames.dtype)
        if win_length < n_fft:
            lpad = (n_fft - win_length) // 2
            w = jnp.pad(w, (lpad, n_fft - win_length - lpad))
        frames = frames * w
    cos_b, sin_b = _dft_basis(n_fft)
    cos_b = jnp.asarray(cos_b, dtype=frames.dtype)
    sin_b = jnp.asarray(sin_b, dtype=frames.dtype)
    # (..., F, n_fft) @ (n_fft, n_freqs) -> (..., F, n_freqs) -> transpose to torch
    # layout (..., n_freqs, F)
    re = jnp.matmul(frames, cos_b)
    im = jnp.matmul(frames, sin_b)
    return jnp.moveaxis(re, -1, -2), jnp.moveaxis(im, -1, -2)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "center",
                                   "use_hann", "power"))
def spectrogram(x: jax.Array, n_fft: int = 1024, hop_length: int = 160,
                win_length: int = 1024, power: float = 2.0, center: bool = True,
                use_hann: bool = True) -> jax.Array:
    """|STFT|^power with a Hann window: torchaudio.transforms.Spectrogram semantics.

    Returns (..., n_freqs, num_frames).
    """
    re, im = stft(x, n_fft, hop_length, win_length, center, use_hann)
    # power==2 avoids the sqrt (and its 0-gradient singularity) entirely
    mag_sq = re * re + im * im
    if power == 2.0:
        return mag_sq
    if power == 1.0:
        return jnp.sqrt(mag_sq + 1e-24)
    return jnp.power(mag_sq + 1e-24, power / 2.0)


def overlap_add(frames: jax.Array, hop_length: int) -> jax.Array:
    """Scatter-free overlap-add: (..., T, n_fft) -> (..., (T-1)*hop + n_fft).

    TPU scatters (`.at[idx].add`) serialize badly; decomposing each frame into
    ceil(n_fft/hop) hop-sized chunks turns the overlap-add into K shifted dense
    adds of contiguous arrays, which XLA fuses into a handful of vector ops.
    """
    *batch, t, n_fft = frames.shape
    k = -(-n_fft // hop_length)  # ceil
    pad = k * hop_length - n_fft
    fr = jnp.pad(frames, [(0, 0)] * len(batch) + [(0, 0), (0, pad)])
    fr = fr.reshape(*batch, t, k, hop_length)
    out_len = (t + k - 1) * hop_length
    th = t * hop_length
    bpad = [(0, 0)] * len(batch)
    # k padded copies summed in one tree — all-parallel adds, no in-place
    # update chain for XLA to serialize
    shifted = [jnp.pad(fr[..., :, c, :].reshape(*batch, th),
                       bpad + [(c * hop_length, out_len - th - c * hop_length)])
               for c in range(k)]
    out = functools.reduce(jnp.add, shifted)
    return out[..., :(t - 1) * hop_length + n_fft]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "center"))
def magphase_spectrogram(x: jax.Array, n_fft: int = 1024, hop_length: int = 160,
                         win_length: int = 1024, center: bool = True):
    """(magnitude, phase) of the rectangular-window STFT.

    Replaces the reference's waveform_to_spectrogram (diffmusic/utils.py:11-20).
    """
    re, im = stft(x, n_fft, hop_length, win_length, center, use_hann=False)
    mag = jnp.sqrt(re * re + im * im + 1e-24)
    phase = jnp.arctan2(im, re)
    return mag, phase


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "center",
                                   "use_hann", "length"))
def istft(re: jax.Array, im: jax.Array, n_fft: int = 1024, hop_length: int = 160,
          win_length: int = 1024, center: bool = True, use_hann: bool = False,
          length: int | None = None) -> jax.Array:
    """Inverse onesided STFT via inverse-DFT matmul + scatter overlap-add.

    Matches torch.istft (used by the reference's phase-aware mel->wav path,
    pipeline_musicldm.py:284-290). Inputs are (..., n_freqs, num_frames).
    """
    n_freqs = n_fft // 2 + 1
    assert re.shape[-2] == n_freqs
    num_frames = re.shape[-1]

    # inverse real DFT: x_n = (1/n_fft) * sum_k c_k * (re_k cos - im_k sin), where
    # interior bins are double-counted by onesided storage.
    cos_b, sin_b = _dft_basis(n_fft)
    scale = np.ones((n_freqs,), np.float32)
    scale[1:-1] = 2.0 if n_fft % 2 == 0 else 2.0
    if n_fft % 2 == 1:
        scale[-1] = 2.0
    inv_cos = jnp.asarray((cos_b * scale[None, :] / n_fft).astype(np.float32),
                          dtype=re.dtype)
    inv_sin = jnp.asarray((sin_b * scale[None, :] / n_fft).astype(np.float32),
                          dtype=re.dtype)

    re_t = jnp.moveaxis(re, -1, -2)  # (..., F, n_freqs)
    im_t = jnp.moveaxis(im, -1, -2)
    frames = jnp.matmul(re_t, inv_cos.T) + jnp.matmul(im_t, inv_sin.T)

    if use_hann:
        w = hann_window(win_length, dtype=frames.dtype)
    else:
        w = jnp.ones((win_length,), dtype=frames.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = jnp.pad(w, (lpad, n_fft - win_length - lpad))

    frames = frames * w

    y = overlap_add(frames, hop_length)

    # window-envelope normalization
    wsq = jnp.broadcast_to((w * w).astype(jnp.float32), (num_frames, n_fft))
    env = overlap_add(wsq, hop_length)
    y = y / jnp.maximum(env, 1e-11).astype(y.dtype)

    if center:
        y = y[..., n_fft // 2:]
        default_len = hop_length * (num_frames - 1)
        y = y[..., :default_len if length is None else length]
    elif length is not None:
        y = y[..., :length]
    return y
