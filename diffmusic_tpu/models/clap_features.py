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
    pipelines (prompt_type='clap') and score_waveforms re-ranking."""
    def embed(wav_16k):
        feats = prepare_clap_input(wav_16k, cfg)
        emb = htsat_model.apply(htsat_params, feats)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return embed


def tiny_clap_feature_config() -> ClapFeatureConfig:
    """16 kHz, 1-s window, 16 mel bins: matches htsat.tiny_clap_audio_config
    and avoids the 48 kHz resample — the fake-backend feature path for tests
    and the --tiny CLI mode."""
    return ClapFeatureConfig(sampling_rate=16000, hop_length=160,
                             fft_window_size=256, feature_size=16,
                             frequency_max=8000.0, max_length_s=1.0)


def make_tiny_clap_audio_embeds(key, projection_dim: int = None):
    """Random tiny HTSAT tower -> (pooled embed, frame embed) callables, the
    CLAP-audio fake backend for MusicLDMPipeline.tiny/AudioLDM2Pipeline.tiny.
    projection_dim must match the tiny CLAP TEXT tower's (real CLAP shares
    one 512-d joint space; prompt_type='clap' feeds the audio embedding where
    the text embedding would go, plpeline_audioldm2.py:469-481)."""
    from dataclasses import replace
    from .htsat import ClapAudioModelWithProjection, tiny_clap_audio_config
    a_cfg = tiny_clap_audio_config()
    if projection_dim is not None:
        a_cfg = replace(a_cfg, projection_dim=projection_dim)
    f_cfg = tiny_clap_feature_config()
    tower = ClapAudioModelWithProjection(a_cfg)
    params = tower.init(key, jnp.zeros((1, 1, 8, a_cfg.num_mel_bins)))
    return (make_clap_audio_embed(tower, params, f_cfg),
            make_clap_frame_embed(tower, params, f_cfg))


def make_clap_frame_embed(htsat_model, htsat_params,
                          cfg: ClapFeatureConfig = ClapFeatureConfig()):
    """waveform(16k) -> L2-normalized per-frame CLAP features (B, T', D) — the
    patch-feature map behind StyleGuidanceOperator's gram-matrix style loss
    (reference operator.py:253-271's clap_model.get_gram_matrix, which the
    reference never defines; here the frame features come from the same HTSAT
    tower with frequency-only pooling, htsat.py features='frames').
    Fully differentiable: resample -> STFT -> mel -> Swin -> projection."""
    def embed(wav_16k):
        feats = prepare_clap_input(wav_16k, cfg)
        emb = htsat_model.apply(htsat_params, feats, features="frames")
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return embed
