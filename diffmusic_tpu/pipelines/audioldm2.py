"""AudioLDM2 pipeline: dual-text-encoder latent diffusion (CLAP + T5 -> projection
-> GPT-2 hidden-state generation -> dual cross-attention UNet).

Reference: diffmusic/pipelines/plpeline_audioldm2.py (AudioLDM2Pipeline). The
conditioning stack runs once per prompt on top of the same scan-compiled guided
denoise core as MusicLDM (pipelines/base.py).
"""

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..inverse_problem.operator import BaseOperator, IdentityOperator
from ..models.clap import ClapTextModelWithProjection
from ..models.configs import (ClapTextConfig, GPT2Config, HiFiGANConfig,
                              ProjectionConfig, T5Config, UNetConfig, VAEConfig,
                              tiny_clap_text_config, tiny_gpt2_config,
                              tiny_hifigan_config, tiny_projection_config,
                              tiny_t5_config, tiny_unet_config, tiny_vae_config)
from ..models.gpt2 import GPT2Model, generate_hidden_states
from ..models.hifigan import SpeechT5HifiGan
from ..models.projection import AudioLDM2ProjectionModel
from ..models.t5 import T5EncoderModel
from ..models.unet import UNet2DConditionModel
from ..models.vae import AutoencoderKL
from ..samplers import DiffusionSchedule, SamplerConfig, make_step_fn
from .base import (AudioPipelineOutput, compute_geometry, denoise_with_nan_retry,
                   prepare_latents, run_denoise_scan, run_ditto)
from .musicldm import MusicLDMPipeline


@dataclass
class AudioLDM2Pipeline(MusicLDMPipeline):
    """Inherits geometry/denoise/loss plumbing; overrides prompt encoding and the
    UNet conditioning signature."""
    t5_cfg: T5Config = field(default_factory=T5Config)
    gpt2_cfg: GPT2Config = field(default_factory=GPT2Config)
    proj_cfg: ProjectionConfig = field(default_factory=ProjectionConfig)
    t5_params: Optional[dict] = None
    gpt2_params: Optional[dict] = None
    proj_params: Optional[dict] = None
    t5_tokenizer: Optional[Callable] = None
    max_new_tokens: int = 8
    clap_audio_embed: Optional[Callable] = None  # waveform -> pooled 512-d
    # TTS variant: VITS text encoder replaces T5 for the transcription stream
    # (reference plpeline_audioldm2.py:428-501)
    vits_cfg: Optional[object] = None
    vits_params: Optional[dict] = None
    vits_tokenizer: Optional[Callable] = None

    def __post_init__(self):
        super().__post_init__()
        self.t5 = T5EncoderModel(self.t5_cfg)
        self.gpt2 = GPT2Model(self.gpt2_cfg)
        self.projection = AudioLDM2ProjectionModel(self.proj_cfg)
        if self.vits_cfg is not None:
            from ..models.vits import VitsTextEncoder
            self.vits = VitsTextEncoder(self.vits_cfg)

    # ------------------------------------------------------------------ text
    def _encode_one(self, text: str, measurement=None, prompt_type=None,
                    transcription: str = ""):
        """One prompt -> (generated_gpt2_states, t5_seq, t5_mask).

        Mirrors plpeline_audioldm2.py:440-526: CLAP pooled (or CLAP audio features
        of the measurement when prompt_type == 'clap'), T5 sequence, projection
        with SOS/EOS, GPT-2 embedding-space generation of 8 states. For the TTS
        variant a VITS text encoder encodes `transcription` instead of T5
        encoding the prompt (plpeline_audioldm2.py:428-501).
        """
        if prompt_type == "clap":
            if self.clap_audio_embed is None:
                raise ValueError(
                    "prompt_type='clap' requires a CLAP audio tower "
                    "(clap_audio_embed); load one via from_pretrained")
            clap_pooled = self.clap_audio_embed(measurement)
        else:
            ids, mask = self.tokenizer([text])
            clap_pooled = self.text_encoder.apply(
                self.text_params, jnp.asarray(ids), jnp.asarray(mask))
            clap_pooled = clap_pooled / jnp.linalg.norm(clap_pooled, axis=-1,
                                                        keepdims=True)
        clap_seq = clap_pooled[:, None, :]          # (B, 1, 512)
        clap_mask = jnp.ones(clap_seq.shape[:2], jnp.int32)

        if transcription and self.vits_params is None:
            raise ValueError(
                "transcription (TTS) requires the AudioLDM2-TTS variant "
                "with a VITS text encoder; load one via from_pretrained")
        if self.vits_params is not None:
            # TTS variant: the second stream is ALWAYS the VITS encoding of the
            # transcription (empty for the negative/uncond branch), mirroring
            # plpeline_audioldm2.py:428-501
            v_ids, v_mask = (self.vits_tokenizer or self.t5_tokenizer)(
                [transcription])
            t5_seq = self.vits.apply(self.vits_params, jnp.asarray(v_ids),
                                     jnp.asarray(v_mask))
            t5_mask = jnp.asarray(v_mask)
        else:
            t5_ids, t5_mask = self.t5_tokenizer([text])
            t5_seq = self.t5.apply(self.t5_params, jnp.asarray(t5_ids),
                                   jnp.asarray(t5_mask))
            t5_mask = jnp.asarray(t5_mask)

        projected, proj_mask = self.projection.apply(
            self.proj_params, clap_seq, t5_seq, clap_mask, t5_mask)
        generated = generate_hidden_states(self.gpt2, self.gpt2_params, projected,
                                           proj_mask, self.max_new_tokens)
        return generated, t5_seq, t5_mask

    def encode_prompt(self, prompt, negative_prompt=None,
                      do_classifier_free_guidance=True, measurement=None,
                      prompt_type=None, transcription: str = ""):
        gen, t5_seq, t5_mask = self._encode_one(prompt or "", measurement,
                                                prompt_type, transcription)
        if not do_classifier_free_guidance:
            return gen, t5_seq, t5_mask
        ngen, nt5_seq, nt5_mask = self._encode_one(negative_prompt or "")
        # pad T5 streams to a common length for the CFG concat
        L = max(t5_seq.shape[1], nt5_seq.shape[1])

        def pad(seq, mask):
            d = L - seq.shape[1]
            if d:
                seq = jnp.pad(seq, ((0, 0), (0, d), (0, 0)))
                mask = jnp.pad(mask, ((0, 0), (0, d)))
            return seq, mask

        t5_seq, t5_mask = pad(t5_seq, t5_mask)
        nt5_seq, nt5_mask = pad(nt5_seq, nt5_mask)
        return (jnp.concatenate([ngen, gen], axis=0),
                jnp.concatenate([nt5_seq, t5_seq], axis=0),
                jnp.concatenate([nt5_mask, t5_mask], axis=0))

    # --------------------------------------------------------------- denoise
    def _apply_unet(self, prompt_embeds, x_in, t, unet_params=None):
        """Dual-stream conditioning: GPT-2 generated states + T5 sequence
        (reference plpeline_audioldm2.py:1147-1154)."""
        generated, t5_seq, t5_mask = prompt_embeds
        params = unet_params if unet_params is not None else self.unet_params
        dt = self._tree_dtype(params)
        eps = self.unet.apply(
            params, x_in.astype(dt), t,
            encoder_hidden_states=generated.astype(dt),
            encoder_hidden_states_1=t5_seq.astype(dt),
            encoder_attention_mask_1=t5_mask)
        return eps.astype(x_in.dtype)

    def _optim_prompt_split(self, prompt_embeds):
        generated, t5_seq, t5_mask = prompt_embeds
        return (generated, t5_seq), lambda d: (d[0], d[1], t5_mask)

    def __call__(self, prompt=None, measurement=None, prompt_type=None,
                 guidance_scale: float = 3.5, negative_prompt=None,
                 prompt_embeds=None, transcription: str = "", **kwargs):
        if prompt_embeds is None:
            prompt_embeds = self.encode_prompt(
                prompt, negative_prompt, guidance_scale > 1.0,
                measurement=measurement, prompt_type=prompt_type,
                transcription=transcription)
        return super().__call__(prompt=prompt, measurement=measurement,
                                guidance_scale=guidance_scale,
                                prompt_embeds=prompt_embeds, **kwargs)

    # -------------------------------------------------------------- ranking
    def score_waveforms(self, text: str, audio, num_waveforms_per_prompt=None):
        """Re-rank generated waveforms by CLAP text-audio cosine similarity.

        Reference: plpeline_audioldm2.py:721-738 defines this but its call
        site (:1240) is commented out — here it is wired and usable. audio:
        (N, L) 16 kHz waveforms; returns (audio_sorted, similarity_scores)
        with the best match first.
        """
        if self.clap_audio_embed is None:
            raise ValueError(
                "score_waveforms requires a CLAP audio tower "
                "(clap_audio_embed); load one via from_pretrained")
        audio = jnp.asarray(audio)
        ids, mask = self.tokenizer([text or ""])
        tfeat = self.text_encoder.apply(self.text_params, jnp.asarray(ids),
                                        jnp.asarray(mask))
        tfeat = tfeat / jnp.linalg.norm(tfeat, axis=-1, keepdims=True)
        afeat = self.clap_audio_embed(audio)          # (N, 512), normalized
        sim = (afeat @ tfeat.T)[:, 0]                 # cosine similarity
        # rank ALL candidates, then keep the best num_waveforms_per_prompt —
        # reference plpeline_audioldm2.py:741 selects after the argsort
        order = jnp.argsort(-sim)
        if num_waveforms_per_prompt is not None:
            order = order[:num_waveforms_per_prompt]
        return np.asarray(audio[order]), np.asarray(sim[order])

    # ------------------------------------------------------------- factories
    @classmethod
    def from_pretrained(cls, checkpoint_dir, scheduler_name: str = "ddim",
                        operator=None, schedule=None):
        from ..models.checkpoint import load_audioldm2
        return load_audioldm2(checkpoint_dir, scheduler_name=scheduler_name,
                              operator=operator, schedule=schedule)

    @classmethod
    def tiny(cls, scheduler_name: str = "ddim", operator=None, seed: int = 0):
        t5_cfg = tiny_t5_config()
        gpt2_cfg = tiny_gpt2_config()
        proj_cfg = tiny_projection_config()
        txt_cfg = tiny_clap_text_config()
        # CLAP pooled dim must equal proj.text_encoder_dim; T5 d_model must equal
        # proj.text_encoder_1_dim; GPT2 n_embd equals langauge_model_dim
        proj_cfg = ProjectionConfig(text_encoder_dim=txt_cfg.projection_dim,
                                    text_encoder_1_dim=t5_cfg.d_model,
                                    langauge_model_dim=gpt2_cfg.n_embd)
        unet_cfg = tiny_unet_config(
            cross_attention_dims=(gpt2_cfg.n_embd, t5_cfg.d_model))
        vae_cfg = tiny_vae_config()
        voc_cfg = tiny_hifigan_config()

        k = jax.random.key(seed)
        keys = jax.random.split(k, 7)
        unet = UNet2DConditionModel(unet_cfg)
        vae = AutoencoderKL(vae_cfg)
        voc = SpeechT5HifiGan(voc_cfg)
        txt = ClapTextModelWithProjection(txt_cfg)
        t5 = T5EncoderModel(t5_cfg)
        gpt2 = GPT2Model(gpt2_cfg)
        proj = AudioLDM2ProjectionModel(proj_cfg)

        height = 40
        lat = jnp.zeros((1, unet_cfg.in_channels, height // vae_cfg.scale_factor,
                         voc_cfg.model_in_dim // vae_cfg.scale_factor))
        unet_params = unet.init(
            keys[0], lat, jnp.asarray([0]),
            encoder_hidden_states=jnp.zeros((1, 8, gpt2_cfg.n_embd)),
            encoder_hidden_states_1=jnp.zeros((1, 4, t5_cfg.d_model)))
        vae_params = vae.init(keys[1], jnp.zeros((1, 1, height, voc_cfg.model_in_dim)))
        voc_params = voc.init(keys[2], jnp.zeros((1, height, voc_cfg.model_in_dim)))
        txt_params = txt.init(keys[3], jnp.zeros((1, 8), jnp.int32))
        t5_params = t5.init(keys[4], jnp.zeros((1, 8), jnp.int32))
        gpt2_params = gpt2.init(keys[5], jnp.zeros((1, 8, gpt2_cfg.n_embd)))
        proj_params = proj.init(keys[6], jnp.zeros((1, 1, proj_cfg.text_encoder_dim)),
                                jnp.zeros((1, 4, proj_cfg.text_encoder_1_dim)),
                                jnp.ones((1, 1), jnp.int32),
                                jnp.ones((1, 4), jnp.int32))

        def byte_tokenizer(texts, maxlen=12):
            ids = np.ones((len(texts), maxlen), np.int32)
            mask = np.zeros((len(texts), maxlen), np.int32)
            for i, t in enumerate(texts):
                b = list(t.encode("utf-8"))[: maxlen - 2]
                row = [0] + [2 + (c % 250) for c in b] + [2]
                ids[i, :len(row)] = row
                mask[i, :len(row)] = 1
            return ids, mask

        from ..models.clap_features import make_tiny_clap_audio_embeds
        clap_audio_embed, clap_frame_embed = make_tiny_clap_audio_embeds(
            jax.random.fold_in(k, 99), projection_dim=txt_cfg.projection_dim)

        return cls(unet_cfg=unet_cfg, vae_cfg=vae_cfg, vocoder_cfg=voc_cfg,
                   text_cfg=txt_cfg, unet_params=unet_params,
                   vae_params=vae_params, vocoder_params=voc_params,
                   text_params=txt_params, scheduler_name=scheduler_name,
                   operator=operator if operator is not None else IdentityOperator(),
                   tokenizer=byte_tokenizer,
                   t5_cfg=t5_cfg, gpt2_cfg=gpt2_cfg, proj_cfg=proj_cfg,
                   t5_params=t5_params, gpt2_params=gpt2_params,
                   proj_params=proj_params, t5_tokenizer=byte_tokenizer,
                   clap_audio_embed=clap_audio_embed,
                   clap_frame_embed=clap_frame_embed)
