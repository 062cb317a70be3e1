"""Fused mel-spectrogram Pallas kernel: frame -> window -> DFT -> |.|^2 -> mel.

The unfused path (ops/stft.py + ops/mel.py) materializes the framed signal
((T_frames, n_fft): a 6.4x data expansion at hop=160) and the full linear
spectrogram ((T_frames, 513)) in HBM between ops. This kernel streams a block of
frames through VMEM instead: one DMA of the overlapping signal span, an unrolled
static-slice framing into a VMEM scratch, one (FB, n_fft) @ (n_fft, 2*n_freqs)
MXU matmul against the windowed cos|sin basis, the squared-magnitude epilogue on
the VPU, and the (FB, n_freqs) @ (n_freqs, n_mels) mel projection — only the
(FB, n_mels) result ever returns to HBM.

Gradient: custom VJP whose backward recomputes the framed spectrum with plain
XLA matmuls (rematerialization beats saving the 6.4x residuals — HBM bandwidth
is the bottleneck, SURVEY.md section 7 step 8).

Semantics match ops.mel.MelSpectrogram (torchaudio MelSpectrogram: Hann window,
center/reflect pad, htk mels, power=2) and are tested against it to 1e-3.
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.mel import mel_filterbank
from ..ops.stft import _dft_basis

FRAME_BLOCK = 128  # frames per grid step (MXU-aligned)

# test hook: route through the Pallas kernel in interpreter mode on CPU
_INTERPRET = False


def _bases(n_fft: int, win_length: int, n_mels: int, sample_rate: int,
           f_min: float, f_max, use_hann: bool, n_mels_pad: int):
    """(windowed [cos|sin] basis (n_fft, 2*n_freqs), mel fbank padded to
    (n_freqs, n_mels_pad))."""
    cos_b, sin_b = _dft_basis(n_fft)
    if use_hann:
        n = np.arange(win_length)
        w = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)
        if win_length < n_fft:
            lpad = (n_fft - win_length) // 2
            w = np.pad(w, (lpad, n_fft - win_length - lpad))
        basis = np.concatenate([cos_b * w[:, None], sin_b * w[:, None]], axis=1)
    else:
        basis = np.concatenate([cos_b, sin_b], axis=1)
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max)
    fb = np.pad(fb, ((0, 0), (0, n_mels_pad - n_mels)))
    return basis.astype(np.float32), fb.astype(np.float32)


def _span(hop: int, n_fft: int) -> int:
    """Signal span per frame block, rounded to Mosaic's 128-lane DMA alignment."""
    raw = (FRAME_BLOCK - 1) * hop + n_fft
    return ((raw + 127) // 128) * 128


def _mel_block_kernel(x_hbm, basis_ref, fb_ref, out_ref, xs_ref, frames_ref,
                      sem, *, n_fft: int, hop: int, n_freqs: int, power: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
    span = _span(hop, n_fft)

    # one DMA for the whole overlapping span of this frame block; the block
    # start is FRAME_BLOCK*hop-aligned, which is 128-aligned for any hop
    # multiple of 1 since FRAME_BLOCK=128
    start = i * (FRAME_BLOCK * hop)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(b, 1), pl.ds(start, span)], xs_ref, sem)
    dma.start()
    dma.wait()

    # static-offset framing into VMEM scratch (j and j*hop are Python ints)
    for j in range(FRAME_BLOCK):
        frames_ref[j, :] = xs_ref[0, pl.ds(j * hop, n_fft)]

    spec2 = jnp.dot(frames_ref[:, :], basis_ref[:, :],
                    preferred_element_type=jnp.float32)  # (FB, 2*n_freqs)
    re, im = spec2[:, :n_freqs], spec2[:, n_freqs:]
    mag_sq = re * re + im * im
    if power == 2.0:
        spec = mag_sq
    elif power == 1.0:
        spec = jnp.sqrt(mag_sq + 1e-24)
    else:
        spec = jnp.power(mag_sq + 1e-24, power / 2.0)
    out_ref[0, :, :] = jnp.dot(spec, fb_ref[:, :],
                               preferred_element_type=jnp.float32)


def _mel_pallas_raw(x_pad: jax.Array, basis: jax.Array, fb_pad: jax.Array,
                    num_frames: int, *, n_fft: int, hop: int,
                    power: float) -> jax.Array:
    """x_pad: (B, L_pad) already center-padded AND span-padded. Returns
    (B, blocks*FRAME_BLOCK, n_mels_pad)."""
    bsz = x_pad.shape[0]
    n_freqs = n_fft // 2 + 1
    n_mels_pad = fb_pad.shape[1]
    blocks = math.ceil(num_frames / FRAME_BLOCK)
    span = _span(hop, n_fft)

    kernel = functools.partial(_mel_block_kernel, n_fft=n_fft, hop=hop,
                               n_freqs=n_freqs, power=power)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, blocks * FRAME_BLOCK, n_mels_pad),
                                       jnp.float32),
        grid=(bsz, blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # signal stays in HBM
            pl.BlockSpec((n_fft, 2 * n_freqs), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),      # basis resident
            pl.BlockSpec((n_freqs, n_mels_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),      # fbank resident
        ],
        out_specs=pl.BlockSpec((1, FRAME_BLOCK, n_mels_pad),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, span), jnp.float32),
            pltpu.VMEM((FRAME_BLOCK, n_fft), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * blocks * FRAME_BLOCK
            * (n_fft * 2 * n_freqs + n_freqs * n_mels_pad),
            bytes_accessed=4 * bsz * blocks * (span + FRAME_BLOCK * n_mels_pad),
            transcendentals=0),
        interpret=_INTERPRET,
    )(x_pad, basis, fb_pad)


def _reference_mel(x, n_fft, hop, win_length, n_mels, sample_rate, f_min, f_max,
                   power, use_hann):
    """Plain-XLA path (also the recompute used by the backward pass)."""
    from ..ops.stft import spectrogram
    spec = spectrogram(x, n_fft, hop, win_length, power=power, center=True,
                       use_hann=use_hann)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate,
                                    f_min, f_max), dtype=spec.dtype)
    return jnp.einsum("...ft,fm->...mt", spec, fb)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))
def fused_mel_spectrogram(x: jax.Array, n_fft: int = 1024, hop_length: int = 160,
                          win_length: int = 1024, n_mels: int = 64,
                          sample_rate: int = 16000, f_min: float = 0.0,
                          f_max: Optional[float] = None, power: float = 2.0,
                          use_hann: bool = True) -> jax.Array:
    """(..., L) -> (..., n_mels, 1 + L // hop) mel power spectrogram.

    Pallas on TPU; identical-semantics XLA path elsewhere (and under vmap/
    interpret). Differentiable via a rematerializing custom VJP.
    """
    from .attention_kernel import _on_tpu
    if not _INTERPRET and not _on_tpu():
        return _reference_mel(x, n_fft, hop_length, win_length, n_mels,
                              sample_rate, f_min, f_max, power, use_hann)

    batch_shape = x.shape[:-1]
    length = x.shape[-1]
    xb = x.reshape(-1, length).astype(jnp.float32)
    num_frames = 1 + length // hop_length
    blocks = math.ceil(num_frames / FRAME_BLOCK)

    # center reflect pad + tail pad so every block's aligned DMA span is in range
    xb = jnp.pad(xb, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    need = (blocks - 1) * FRAME_BLOCK * hop_length + _span(hop_length, n_fft)
    if need > xb.shape[1]:
        xb = jnp.pad(xb, ((0, 0), (0, need - xb.shape[1])))

    n_mels_pad = max(128, ((n_mels + 127) // 128) * 128)
    basis, fb_pad = _bases(n_fft, win_length, n_mels, sample_rate, f_min, f_max,
                           use_hann, n_mels_pad)
    out = _mel_pallas_raw(xb, jnp.asarray(basis), jnp.asarray(fb_pad),
                          num_frames, n_fft=n_fft, hop=hop_length, power=power)
    out = out[:, :num_frames, :n_mels]                  # (B, T, n_mels)
    out = jnp.swapaxes(out, -1, -2)                     # (B, n_mels, T)
    return out.reshape(*batch_shape, n_mels, num_frames)


def _fused_mel_fwd(x, n_fft, hop_length, win_length, n_mels, sample_rate,
                   f_min, f_max, power, use_hann):
    out = fused_mel_spectrogram(x, n_fft, hop_length, win_length, n_mels,
                                sample_rate, f_min, f_max, power, use_hann)
    return out, x


def _reflect_pad_adjoint(gp: jax.Array, pad: int, length: int) -> jax.Array:
    """Adjoint of jnp.pad(x, pad, mode='reflect') on the last axis."""
    g = gp[..., pad:pad + length]
    left = gp[..., :pad]                      # came from x[pad], ..., x[1]
    right = gp[..., pad + length:]            # came from x[L-2], ..., x[L-1-pad]
    g = g.at[..., 1:pad + 1].add(left[..., ::-1])
    g = g.at[..., length - pad - 1:length - 1].add(right[..., ::-1])
    return g


def _fused_mel_bwd(n_fft, hop_length, win_length, n_mels, sample_rate, f_min,
                   f_max, power, use_hann, x, g):
    """Manual scatter-free backward (power=2): recompute the framed spectrum
    with two MXU matmuls (residual = input signal only), push the cotangent
    back through the mel/DFT matmuls, and overlap-add chunk-wise instead of
    letting autodiff emit a 160k-element scatter (TPU scatters serialize).
    """
    if power != 2.0:
        _, vjp = jax.vjp(
            lambda s: _reference_mel(s, n_fft, hop_length, win_length, n_mels,
                                     sample_rate, f_min, f_max, power,
                                     use_hann), x)
        return (vjp(g)[0],)

    from ..ops.stft import frame_signal, overlap_add
    n_freqs = n_fft // 2 + 1
    basis, fb = _bases(n_fft, win_length, n_mels, sample_rate, f_min, f_max,
                       use_hann, n_mels)
    basis = jnp.asarray(basis, x.dtype)       # (n_fft, 2*n_freqs), window folded
    fb = jnp.asarray(fb, x.dtype)             # (n_freqs, n_mels)

    batch_shape = x.shape[:-1]
    length = x.shape[-1]
    xb = x.reshape(-1, length)
    gb = jnp.swapaxes(g.reshape(-1, n_mels, g.shape[-1]), -1, -2)  # (B, T, M)

    frames = frame_signal(xb, n_fft, hop_length, center=True)      # (B, T, n_fft)
    spec2 = jnp.matmul(frames, basis)                              # recompute
    re, im = spec2[..., :n_freqs], spec2[..., n_freqs:]

    gmag = jnp.matmul(gb.astype(jnp.float32), fb.T)                # (B, T, n_freqs)
    gspec2 = jnp.concatenate([2.0 * re * gmag, 2.0 * im * gmag], axis=-1)
    gframes = jnp.matmul(gspec2, basis.T)                          # (B, T, n_fft)
    gx_pad = overlap_add(gframes, hop_length)
    # frame_signal's padded length is L + n_fft; the last padded samples past
    # the final frame received no contributions (zero gradient)
    pad_len = length + n_fft
    if gx_pad.shape[-1] < pad_len:
        gx_pad = jnp.pad(gx_pad, ((0, 0), (0, pad_len - gx_pad.shape[-1])))
    else:
        gx_pad = gx_pad[..., :pad_len]
    gx = _reflect_pad_adjoint(gx_pad, n_fft // 2, length)
    return (gx.reshape(*batch_shape, length).astype(x.dtype),)


fused_mel_spectrogram.defvjp(_fused_mel_fwd, _fused_mel_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))
def mel_spectrogram_fast_grad(x: jax.Array, n_fft: int = 1024,
                              hop_length: int = 160, win_length: int = 1024,
                              n_mels: int = 64, sample_rate: int = 16000,
                              f_min: float = 0.0, f_max: Optional[float] = None,
                              power: float = 2.0,
                              use_hann: bool = True) -> jax.Array:
    """XLA forward (fuses with surrounding programs / shares activations) +
    the manual scatter-free backward. The guidance loss differentiates the mel
    transform every step; autodiff's VJP of the frame gather is a scatter over
    the whole signal."""
    return _reference_mel(x, n_fft, hop_length, win_length, n_mels,
                          sample_rate, f_min, f_max, power, use_hann)


def _fast_grad_fwd(x, n_fft, hop_length, win_length, n_mels, sample_rate,
                   f_min, f_max, power, use_hann):
    out = mel_spectrogram_fast_grad(x, n_fft, hop_length, win_length, n_mels,
                                    sample_rate, f_min, f_max, power, use_hann)
    return out, x


mel_spectrogram_fast_grad.defvjp(_fast_grad_fwd, _fused_mel_bwd)
