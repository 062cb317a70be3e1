"""CLAP audio feature extraction: waveform -> (B, 1, T, 64) log-mel input_features.

Behavioral parity with transformers ClapFeatureExtractor in the non-fusion
('rand_trunc') configuration used by laion/clap-htsat-unfused — the feature
extractor both pipelines carry (reference pipeline_musicldm.py:86-88,
plpeline_audioldm2.py:469-481). Pure JAX, differentiable, so the style-guidance
gram-matrix loss can backprop through it.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import mel_filterbank
from ..ops.stft import spectrogram
from ..ops.resample import resample


@dataclass(frozen=True)
class ClapFeatureConfig:
    sampling_rate: int = 48000
    hop_length: int = 480
    fft_window_size: int = 1024
    feature_size: int = 64
    frequency_min: float = 0.0
    frequency_max: float = 14000.0
    max_length_s: float = 10.0

    @property
    def nb_max_samples(self) -> int:
        return int(self.max_length_s * self.sampling_rate)


@partial(jax.jit, static_argnames=("cfg",))
def clap_mel_features(wav: jax.Array, cfg: ClapFeatureConfig = ClapFeatureConfig()):
    """(B, L) waveform at cfg.sampling_rate -> (B, 1, T, feature_size) log-mel dB.

    Matches ClapFeatureExtractor._np_extract_fbank_features with the slaney
    filterbank (rand_trunc path): |STFT|^2 (hann, center/reflect) -> slaney mel ->
    power_to_db with top_db=80.
    """
    spec = spectrogram(wav, cfg.fft_window_size, cfg.hop_length,
                       cfg.fft_window_size, power=2.0, center=True,
                       use_hann=True)  # (B, F, T)
    fb = jnp.asarray(mel_filterbank(
        cfg.fft_window_size // 2 + 1, cfg.feature_size, cfg.sampling_rate,
        f_min=cfg.frequency_min, f_max=cfg.frequency_max,
        norm="slaney", mel_scale="slaney"), spec.dtype)
    mel = jnp.einsum("bft,fm->bmt", spec, fb)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db = jnp.maximum(db, jnp.max(db) - 80.0)
    return jnp.transpose(db, (0, 2, 1))[:, None, :, :]  # (B, 1, T, mel)


def prepare_clap_input(wav_16k: jax.Array,
                       cfg: ClapFeatureConfig = ClapFeatureConfig()):
    """16 kHz waveform -> CLAP input_features: resample to 48 kHz, repeat-pad /
    truncate to 10 s, log-mel (ClapFeatureExtractor 'repeatpad' padding)."""
    wav = resample(wav_16k, 16000, cfg.sampling_rate)
    n = wav.shape[-1]
    want = cfg.nb_max_samples
    if n < want:
        # 'repeatpad': tile whole copies, zero-pad the remainder
        n_repeat = want // n
        tail = want - n_repeat * n
        wav = jnp.concatenate(
            [jnp.tile(wav, (1, n_repeat)),
             jnp.zeros((wav.shape[0], tail), wav.dtype)], axis=1)
    else:
        wav = wav[:, :want]
    return clap_mel_features(wav, cfg)


def make_clap_audio_embed(htsat_model, htsat_params,
                          cfg: ClapFeatureConfig = ClapFeatureConfig()):
    """waveform(16k) -> normalized CLAP audio embedding, one callable for
    pipelines (prompt_type='clap') and StyleGuidanceOperator."""
    def embed(wav_16k):
        feats = prepare_clap_input(wav_16k, cfg)
        emb = htsat_model.apply(htsat_params, feats)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return embed
