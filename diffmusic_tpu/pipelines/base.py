"""Shared pipeline machinery: geometry, scan-compiled denoise loop, NaN-retry,
DITTO outer optimization, mel PNG/waveform output helpers.

The reference's per-step Python loop with torch.enable_grad
(pipeline_musicldm.py:677-771) becomes ONE jitted `lax.scan` whose body contains
the UNet forward, the guided sampler step, and the jax.grad guidance chain; the
NaN-retry wrapper (pipeline_musicldm.py:742-756) runs at the host level around the
compiled scan, re-seeding via jax.random.fold_in.
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..samplers import DiffusionSchedule, SamplerConfig, make_step_fn


@dataclass
class AudioPipelineOutput:
    audios: np.ndarray


def compute_geometry(audio_length_in_s: float, sampling_rate: int,
                     hop_length: int, vae_scale_factor: int):
    """Spectrogram height + original waveform length (pipeline_musicldm.py:604-619)."""
    vocoder_upsample_factor = hop_length / sampling_rate
    height = int(audio_length_in_s / vocoder_upsample_factor)
    original_waveform_length = int(audio_length_in_s * sampling_rate)
    if height % vae_scale_factor != 0:
        height = int(np.ceil(height / vae_scale_factor)) * vae_scale_factor
    return height, original_waveform_length


def prepare_latents(key, batch: int, channels: int, height: int, width: int,
                    vae_scale_factor: int, dtype=jnp.float32):
    shape = (batch, channels, height // vae_scale_factor, width // vae_scale_factor)
    return jax.random.normal(key, shape, dtype)  # init_noise_sigma = 1 for DDIM


def _progress_print(t, loss):
    print(f"  t={int(t):4d}  distance: {float(loss):.6f}")


def run_denoise_scan(step_fn, model_fn, latents, timesteps, key,
                     remat: bool = False, progress: bool = False,
                     callback=None, callback_steps: int = 1):
    """Scan `prev, x0, loss = step_fn(model_fn(x, t), t, x, key_t)` over timesteps.

    Returns (final_latents, per-step losses). The caller jits this (usually via a
    closed-over jitted wrapper) so the whole loop is one XLA program.

    progress=True streams the per-step guidance loss to the host via
    jax.debug.callback — the TPU equivalent of the reference's tqdm description
    (pipeline_musicldm.py:761-763). jax.profiler scopes name the phases for
    xprof traces.

    callback(step_index, timestep, latents) fires every `callback_steps` steps
    (reference pipeline_musicldm.py:760-766) — delivered through an unordered
    jax.debug.callback, so it observes latents without breaking the compiled
    scan; the cadence filter runs host-side.
    """
    if callback is not None:
        def _cb_host(i, t, lat):
            if int(i) % callback_steps == 0:
                # keep non-integer timesteps (continuous-sigma schedules)
                # intact instead of truncating
                tv = float(t)
                callback(int(i), int(tv) if tv.is_integer() else tv,
                         np.asarray(lat))

    def body(carry, it):
        i, tk = it
        x, k = carry
        k, sub = jax.random.split(k)
        with jax.profiler.TraceAnnotation("unet_forward"):
            eps = model_fn(x, tk)
        with jax.profiler.TraceAnnotation("guided_step"):
            prev, _x0, loss = step_fn(eps, tk, x, sub)
        if progress:
            jax.debug.callback(_progress_print, tk, loss, ordered=False)
        if callback is not None:
            jax.debug.callback(_cb_host, i, tk, prev, ordered=False)
        return (prev, k), loss

    if remat:
        body = jax.checkpoint(body)
    steps = jnp.arange(len(timesteps), dtype=jnp.int32)
    (final, _), losses = jax.lax.scan(body, (latents, key), (steps, timesteps))
    return final, losses


def denoise_with_nan_retry(run_fn, init_latents, key, max_retries: int = 10):
    """Host-level NaN guard: re-init latents and rerun, <=10 times
    (reference pipeline_musicldm.py:742-756).

    Note: a retry reruns the whole scan, so any per-step callback wired into
    run_fn fires again with repeated step indices — consumers that accumulate
    per-step state should reset when step_index restarts at 0 (the reference
    has the same behavior: its retry re-enters the timestep loop)."""
    latents = init_latents
    for attempt in range(max_retries + 1):
        final, losses = run_fn(latents, jax.random.fold_in(key, attempt))
        if not bool(jnp.isnan(losses[-1])) and not bool(
                jnp.isnan(final).any()):
            return final, losses
        retry_key = jax.random.fold_in(key, 1000 + attempt)
        latents = jax.random.normal(retry_key, init_latents.shape,
                                    init_latents.dtype)
    return final, losses


def _commit_latents(latents):
    """Commit the initial latent to its device: iteration >= 2 of a DITTO loop
    feeds back grad_fn's own (committed) output, and jit keys committed and
    uncommitted arguments differently — without this the SAME program compiles
    twice per process (measured: two persistent-cache entries and a doubled
    DITTO cold start through the remote-compile tunnel). Host numpy arrays are
    normalized through jnp.asarray so they get committed too; multi-device
    (sharded) arrays are left alone — their sharding IS the commitment."""
    if not isinstance(latents, jax.Array):
        latents = jnp.asarray(latents)
    if len(latents.devices()) == 1:
        latents = jax.device_put(latents, next(iter(latents.devices())))
    return latents


def run_ditto(loss_of_init, decode_fn, init_latents, key,
              optim_outer_loop: int, lr: float):
    """DITTO: SGD on the initial latent through the full differentiable chain.

    loss_of_init(init_latents, key) -> (final_loss, final_latents); grad w.r.t.
    the init latent (reference scheduling_ditto.py:205-208 +
    pipeline_musicldm.py:677-684). Plain SGD like the reference's
    torch.optim.SGD([init_latents], lr=ip_guidance_rate).
    """
    grad_fn = jax.jit(jax.value_and_grad(loss_of_init, has_aux=True))
    latents = _commit_latents(init_latents)
    losses = []
    for it in range(optim_outer_loop):
        (loss, final), grad = grad_fn(latents, key)
        losses.append(float(loss))
        latents = latents - lr * grad
    return final, np.asarray(losses)


def save_mel_spectrogram(mel: np.ndarray, path, sample_rate: int = 16000,
                         hop_length: int = 160, gt_mel_spectrogram=None,
                         gt_sample_rate: int = 16000):
    """Save a (T, n_mels) dB mel spectrogram as a PNG (host-side matplotlib),
    mirroring the reference's save_mel_spectrogram (pipeline_musicldm.py:462-489).

    gt_mel_spectrogram: optional ground-truth mel; when given, the frequency
    axis is clamped to the ground truth's Nyquist band so a downsampled input
    renders on the same scale as its clean label (reference call site
    run.py:293-299)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mel = np.asarray(mel)
    while mel.ndim > 2:
        mel = mel[0]
    fig, ax = plt.subplots(figsize=(10, 4))
    extent = [0, mel.shape[0] * hop_length / sample_rate, 0, sample_rate / 2]
    im = ax.imshow(mel.T, aspect="auto", origin="lower", extent=extent,
                   cmap="magma", vmin=-80, vmax=80)
    fig.colorbar(im, ax=ax, label="Amplitude (dB)")
    ax.set_xlabel("time (s)")
    ax.set_ylabel("freq (Hz)")
    if gt_mel_spectrogram is not None:
        ax.set_ylim(0, gt_sample_rate / 2)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def mel_spectrogram_to_waveform_with_phase(mel, phase, n_fft: int = 1024,
                                           hop_length: int = 160,
                                           win_length: int = 1024,
                                           sample_rate: int = 16000,
                                           original_waveform_length: int = 0,
                                           linear_magnitude=None):
    """Phase-aware mel -> waveform: pinv mel inversion + known-phase iSTFT.

    Reference: pipeline_musicldm.py:263-301 (torchaudio's iterative
    InverseMelScale replaced by the jit/grad-friendly pinv projection in
    ops.mel.InverseMelScale; the scatter-free istft in ops.stft).
    mel: (B, 1, T, n_mels) or (B, T, n_mels) magnitude-scale mel;
    phase: (..., n_freqs, frames) from ops.stft.magphase_spectrogram.
    linear_magnitude: optional (..., n_freqs, frames) linear |STFT| to use
    directly instead of pinv-inverting the mel — the phase_retrieval task's
    measurement IS that magnitude, so its recon path passes it here
    (MusicLDMPipeline.__call__) and only the phase is estimated.
    """
    import jax.numpy as jnp
    from ..ops.mel import InverseMelScale
    from ..ops.stft import istft

    if linear_magnitude is not None:
        linear = jnp.asarray(linear_magnitude)
    else:
        if mel.ndim == 4:
            mel = mel[:, 0]
        mel = jnp.swapaxes(mel, -1, -2)  # (B, n_mels, T)
        linear = InverseMelScale(n_stft=n_fft // 2 + 1, n_mels=mel.shape[-2],
                                 sample_rate=sample_rate)(mel)
    frames = min(linear.shape[-1], phase.shape[-1])
    linear = linear[..., :frames]
    phase = phase[..., :frames]
    re = linear * jnp.cos(phase)
    im = linear * jnp.sin(phase)
    wav = istft(re, im, n_fft=n_fft, hop_length=hop_length,
                win_length=win_length)
    if original_waveform_length > 0:
        if wav.shape[-1] > original_waveform_length:
            wav = wav[..., :original_waveform_length]
        elif wav.shape[-1] < original_waveform_length:
            pad = original_waveform_length - wav.shape[-1]
            wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, pad)])
    return wav
