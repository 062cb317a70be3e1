"""StableAudio pipeline: T5-conditioned DiT over Oobleck waveform latents.

The reference ships a 756-line StableAudioPipeline (pipeline_stable_audio.py)
that is DORMANT — its factory only returns audioldm2/musicldm
(reference pipelines/__init__.py:11-13), so the path is unreachable there. Here
the pipeline is fully implemented AND wired: `get_pipeline("stable_audio")`
returns it (an improvement over the reference's dead code, recorded in
SURVEY.md section 2 StableAudio row).

Architecture (reference pipeline_stable_audio.py:82-756 behavior, rebuilt
TPU-first): T5 sequence features + learned duration conditioners
(StableAudioProjectionModel) -> StableAudioDiTModel with CFG -> EDM
DPM-Solver++(2M) lax.scan -> AutoencoderOobleck decode to stereo waveform.
The whole denoise loop compiles to one XLA program; CFG doubles the batch
through the DiT so the MXU sees one large matmul stream.
"""

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import (OobleckConfig, StableAudioDiTConfig,
                              StableAudioProjectionConfig, T5Config,
                              tiny_oobleck_config, tiny_stable_audio_dit_config,
                              tiny_stable_audio_projection_config,
                              tiny_t5_config)
from ..models.oobleck import AutoencoderOobleck
from ..models.stable_audio_dit import (StableAudioDiTModel,
                                       StableAudioProjectionModel)
from ..models.t5 import T5EncoderModel
from ..samplers.edm import EDMDPMSolverMultistepSchedule, make_edm_sampler
from .base import AudioPipelineOutput


@dataclass
class StableAudioPipeline:
    dit_cfg: StableAudioDiTConfig
    vae_cfg: OobleckConfig
    text_cfg: T5Config
    proj_cfg: StableAudioProjectionConfig
    dit_params: dict
    vae_params: dict
    text_params: dict
    proj_params: dict
    schedule: EDMDPMSolverMultistepSchedule = field(
        default_factory=EDMDPMSolverMultistepSchedule)
    tokenizer: Optional[Callable] = None
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        self.dit = StableAudioDiTModel(self.dit_cfg)
        self.vae = AutoencoderOobleck(self.vae_cfg)
        self.text_encoder = T5EncoderModel(self.text_cfg)
        self.projection = StableAudioProjectionModel(self.proj_cfg)
        self._sampler_cache = {}

    # ------------------------------------------------------------------ text
    def encode_prompt(self, prompt, negative_prompt=None,
                      do_classifier_free_guidance=True):
        """T5 sequence embeddings, CFG-stacked [uncond; cond] (reference
        pipeline_stable_audio.py encode_prompt behavior)."""
        if self.tokenizer is None:
            raise ValueError("No tokenizer configured; pass prompt_embeds instead")
        texts = [negative_prompt or "", prompt or ""] \
            if do_classifier_free_guidance else [prompt or ""]
        ids, mask = self.tokenizer(texts)
        emb = self.text_encoder.apply(self.text_params, jnp.asarray(ids),
                                      jnp.asarray(mask))
        return emb * jnp.asarray(mask, emb.dtype)[..., None]

    def _conditioning(self, prompt_embeds, seconds_start, seconds_total):
        return self.projection.apply(self.proj_params, prompt_embeds,
                                     jnp.asarray(seconds_start, jnp.float32),
                                     jnp.asarray(seconds_total, jnp.float32))

    # --------------------------------------------------------------- denoise
    def __call__(self,
                 prompt: Optional[str] = None,
                 negative_prompt: Optional[str] = None,
                 audio_end_in_s: Optional[float] = None,
                 audio_start_in_s: float = 0.0,
                 num_inference_steps: int = 100,
                 guidance_scale: float = 7.0,
                 num_waveforms_per_prompt: int = 1,
                 key: Optional[jax.Array] = None,
                 latents: Optional[jax.Array] = None,
                 prompt_embeds: Optional[jax.Array] = None,
                 output_type: str = "np",
                 **_ignored):
        key = key if key is not None else jax.random.key(0)
        sr = self.vae_cfg.sampling_rate
        hop = self.vae_cfg.hop_length
        audio_end_in_s = (audio_end_in_s if audio_end_in_s is not None
                          else self.dit_cfg.sample_size * hop / sr)
        length = int(audio_end_in_s * sr)
        latent_t = int(np.ceil(length / hop))

        do_cfg = guidance_scale > 1.0
        if prompt_embeds is None:
            prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch = num_waveforms_per_prompt
        n_cond = prompt_embeds.shape[0]  # 2 with CFG else 1
        seconds = jnp.full((n_cond,), audio_start_in_s), \
            jnp.full((n_cond,), audio_end_in_s)
        text_ctx, global_states = self._conditioning(prompt_embeds, *seconds)

        key, lat_key = jax.random.split(key)
        if latents is None:
            latents = jax.random.normal(
                lat_key, (batch, self.dit_cfg.in_channels, latent_t), self.dtype)

        cache_key = (num_inference_steps, guidance_scale, latents.shape,
                     text_ctx.shape)
        if cache_key not in self._sampler_cache:
            # params and conditioning are jit ARGUMENTS, not closure constants:
            # closures would bake the weights into the HLO (huge compile
            # payloads) and would silently reuse a stale prompt across calls
            def run(params, lat, ctx_seq, glob_vec):
                from .musicldm import MusicLDMPipeline
                dt = MusicLDMPipeline._tree_dtype(params["dit"])

                def model_fn(x, t):
                    # network boundary: model compute dtype (bf16 checkpoints
                    # must not promote the 24-layer stream to fp32); the EDM
                    # solver algebra around this stays fp32
                    x = x.astype(dt)
                    if do_cfg:
                        x_in = jnp.concatenate([x, x], axis=0)
                        ctx = jnp.repeat(ctx_seq.astype(dt), batch, axis=0)
                        glob = jnp.repeat(glob_vec.astype(dt), batch, axis=0)
                        tt = jnp.full((2 * batch,), t)
                        out = self.dit.apply(params["dit"], x_in, tt, ctx, glob)
                        uncond, cond = jnp.split(out.astype(jnp.float32), 2,
                                                 axis=0)
                        return uncond + guidance_scale * (cond - uncond)
                    tt = jnp.full((batch,), t)
                    return self.dit.apply(
                        params["dit"], x, tt,
                        jnp.repeat(ctx_seq.astype(dt), batch, axis=0),
                        jnp.repeat(glob_vec.astype(dt), batch, axis=0),
                    ).astype(jnp.float32)

                sampler = make_edm_sampler(self.schedule, num_inference_steps,
                                           model_fn)
                final = sampler(lat)
                audio = self.vae.apply(
                    params["vae"],
                    final.astype(MusicLDMPipeline._tree_dtype(params["vae"])),
                    method=AutoencoderOobleck.decode)
                return final, audio

            self._sampler_cache[cache_key] = jax.jit(run)

        final, audio = self._sampler_cache[cache_key](
            {"dit": self.dit_params, "vae": self.vae_params},
            latents, text_ctx, global_states)
        if output_type == "latent":
            return AudioPipelineOutput(audios=np.asarray(final))
        audio = np.asarray(audio[:, :, :length], np.float32)  # (B, C, T)
        return AudioPipelineOutput(audios=audio)

    # ------------------------------------------------------------- factories
    @classmethod
    def from_pretrained(cls, checkpoint_dir, **kwargs):
        from ..models.checkpoint import load_stable_audio
        return load_stable_audio(checkpoint_dir, **kwargs)

    @classmethod
    def tiny(cls, seed: int = 0):
        """Random tiny-weight pipeline (the CPU-fast fake backend)."""
        dit_cfg = tiny_stable_audio_dit_config()
        vae_cfg = tiny_oobleck_config()
        txt_cfg = tiny_t5_config()
        proj_cfg = StableAudioProjectionConfig(
            text_encoder_dim=txt_cfg.d_model,
            conditioning_dim=dit_cfg.cross_attention_input_dim,
            max_value=64.0)
        assert dit_cfg.global_states_input_dim == 2 * proj_cfg.conditioning_dim

        k = jax.random.key(seed)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        dit = StableAudioDiTModel(dit_cfg)
        vae = AutoencoderOobleck(vae_cfg)
        txt = T5EncoderModel(txt_cfg)
        proj = StableAudioProjectionModel(proj_cfg)

        t_lat = 16
        dit_params = dit.init(
            k1, jnp.zeros((1, dit_cfg.in_channels, t_lat)), jnp.zeros((1,)),
            jnp.zeros((1, 4, dit_cfg.cross_attention_input_dim)),
            jnp.zeros((1, dit_cfg.global_states_input_dim)))
        vae_params = vae.init(k2, jnp.zeros((1, vae_cfg.audio_channels,
                                             vae_cfg.hop_length * t_lat)))
        txt_params = txt.init(k3, jnp.zeros((1, 8), jnp.int32))
        proj_params = proj.init(k4, jnp.zeros((1, 4, txt_cfg.d_model)),
                                jnp.zeros((1,)), jnp.zeros((1,)))

        def byte_tokenizer(texts, maxlen=12):
            ids = np.zeros((len(texts), maxlen), np.int32)
            mask = np.zeros((len(texts), maxlen), np.int32)
            for i, t in enumerate(texts):
                b = list(t.encode("utf-8"))[: maxlen - 1]
                row = [2 + (c % 250) for c in b] + [1]  # T5 eos id 1
                ids[i, :len(row)] = row
                mask[i, :len(row)] = 1
            return ids, mask

        return cls(dit_cfg=dit_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg,
                   proj_cfg=proj_cfg, dit_params=dit_params,
                   vae_params=vae_params, text_params=txt_params,
                   proj_params=proj_params, tokenizer=byte_tokenizer)
