"""MusicLDM pipeline: CLAP-conditioned latent diffusion for music inverse problems.

Reference: diffmusic/pipelines/pipeline_musicldm.py (class MusicLDMPipeline).
TPU re-design: prompt encoding happens once on the host side of the jit boundary;
the denoise loop (UNet CFG forward + guided sampler step + guidance grad through
VAE decode -> HiFi-GAN -> operator) compiles to a single lax.scan program.
"""

import os
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..inverse_problem.operator import BaseOperator, IdentityOperator
from ..models.clap import ClapTextModelWithProjection
from ..models.configs import (ClapTextConfig, HiFiGANConfig, UNetConfig, VAEConfig,
                              tiny_clap_text_config, tiny_hifigan_config,
                              tiny_unet_config, tiny_vae_config)
from ..models.hifigan import SpeechT5HifiGan
from ..models.unet import UNet2DConditionModel
from ..models.vae import AutoencoderKL
from ..samplers import DiffusionSchedule, SamplerConfig, make_step_fn
from .base import (AudioPipelineOutput, compute_geometry, denoise_with_nan_retry,
                   prepare_latents, run_denoise_scan, run_ditto,
                   save_mel_spectrogram)


@dataclass
class MusicLDMPipeline:
    unet_cfg: UNetConfig
    vae_cfg: VAEConfig
    vocoder_cfg: HiFiGANConfig
    text_cfg: ClapTextConfig
    unet_params: dict
    vae_params: dict
    vocoder_params: dict
    text_params: dict
    schedule: DiffusionSchedule = field(default_factory=DiffusionSchedule)
    scheduler_name: str = "ddim"
    operator: BaseOperator = field(default_factory=IdentityOperator)
    tokenizer: Optional[Callable] = None  # texts -> (ids, attention_mask)
    clap_audio_embed: Optional[Callable] = None  # waveform -> pooled 512-d
    # waveform -> per-frame CLAP features (B, T', D); feeds the
    # StyleGuidanceOperator gram matrix (reference operator.py:253-271)
    clap_frame_embed: Optional[Callable] = None
    dtype: jnp.dtype = jnp.float32
    # device mesh for the num_waveforms_per_prompt batch axis (dp) and weight
    # output channels (tp); None = single device. GSPMD propagates the input
    # shardings through the whole jitted denoise scan (parallel/mesh.py).
    mesh: Optional[object] = None

    def __post_init__(self):
        self.unet = UNet2DConditionModel(self.unet_cfg)
        self.vae = AutoencoderKL(self.vae_cfg)
        self.vocoder = SpeechT5HifiGan(self.vocoder_cfg)
        # NOTE: models/hifigan.py::with_adjoint_weights can thread precomputed
        # pallas adjoint kernels into the guidance backward, but it MEASURED
        # SLOWER than XLA's conv adjoint (62.3 vs 34.3 ms/grad at MusicLDM
        # scale, docs/PERF_NOTES.md) — so it is not attached by default.
        self.text_encoder = ClapTextModelWithProjection(self.text_cfg)
        self.vae_scale_factor = self.vae_cfg.scale_factor
        self._denoise_cache = {}

    # ------------------------------------------------------------------ text
    def encode_prompt(self, prompt, negative_prompt=None,
                      do_classifier_free_guidance=True):
        """CLAP pooled text features, normalized, CFG-stacked [uncond; cond].

        Reference pipeline_musicldm.py:119-250 (_encode_prompt with
        get_text_features).
        """
        if self.tokenizer is None:
            raise ValueError("No tokenizer configured; pass prompt_embeds instead")
        ids, mask = self.tokenizer([prompt or ""])
        emb = self.text_encoder.apply(self.text_params, jnp.asarray(ids),
                                      jnp.asarray(mask))
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        if not do_classifier_free_guidance:
            return emb
        nids, nmask = self.tokenizer([negative_prompt or ""])
        nemb = self.text_encoder.apply(self.text_params, jnp.asarray(nids),
                                       jnp.asarray(nmask))
        nemb = nemb / jnp.linalg.norm(nemb, axis=-1, keepdims=True)
        return jnp.concatenate([nemb, emb], axis=0)

    # -------------------------------------------------------------- ranking
    def score_waveforms(self, text: str, audio, num_waveforms_per_prompt=None):
        """Re-rank generated waveforms by CLAP text-audio similarity and keep
        the top num_waveforms_per_prompt (reference
        pipeline_musicldm.py:304-324: argsort of logits_per_text, descending,
        then select). Needs a CLAP audio tower (clap_audio_embed)."""
        if self.clap_audio_embed is None:
            raise ValueError(
                "score_waveforms requires a CLAP audio tower "
                "(clap_audio_embed); load one via from_pretrained")
        audio = jnp.asarray(audio)
        ids, mask = self.tokenizer([text or ""])
        tfeat = self.text_encoder.apply(self.text_params, jnp.asarray(ids),
                                        jnp.asarray(mask))
        tfeat = tfeat / jnp.linalg.norm(tfeat, axis=-1, keepdims=True)
        afeat = self.clap_audio_embed(audio)
        sim = (afeat @ tfeat.T)[:, 0]
        order = jnp.argsort(-sim)
        if num_waveforms_per_prompt is not None:
            order = order[:num_waveforms_per_prompt]
        import numpy as np
        return np.asarray(audio[order]), np.asarray(sim[order])

    # ----------------------------------------------------------------- params
    def _denoise_params(self):
        """The param trees the jitted denoise programs consume. Passed as jit
        ARGUMENTS, never closed over: closure constants get baked into the HLO
        as literals, which at full scale is ~1 GB of weights per program — it
        bloats compile requests (the remote-compile tunnel rejects them) and
        defeats executable caching across param updates."""
        return {"unet": self.unet_params, "vae": self.vae_params,
                "vocoder": self.vocoder_params}

    # ----------------------------------------------------------------- audio
    @staticmethod
    def _tree_dtype(tree):
        """Compute dtype of a param tree (bf16 checkpoints must not silently
        promote the whole model to fp32 when fed fp32 activations — flax
        layers promote, and lax.conv rejects mixed dtypes outright)."""
        for leaf in jax.tree.leaves(tree):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.floating):
                return leaf.dtype
        return jnp.float32

    def decode_mel(self, latents, vae_params=None):
        params = vae_params if vae_params is not None else self.vae_params
        scaled = (latents / self.vae_cfg.scaling_factor).astype(
            self._tree_dtype(params))
        return self.vae.apply(params, scaled, method=AutoencoderKL.decode)

    def mel_to_waveform(self, mel, vocoder_params=None):
        """(B, 1, T, n_mels) or (B, T, n_mels) -> (B, L) via HiFi-GAN."""
        if mel.ndim == 4:
            mel = mel[:, 0]
        params = vocoder_params if vocoder_params is not None \
            else self.vocoder_params
        return self.vocoder.apply(params, mel.astype(self._tree_dtype(params)))

    def _vocoder_fn(self, vocoder_params=None):
        params = vocoder_params if vocoder_params is not None \
            else self.vocoder_params
        apply = self.vocoder.apply
        dt = self._tree_dtype(params)
        return lambda mel: apply(params, mel.astype(dt))

    def make_loss_fn(self, measurement, original_waveform_length: int,
                     supervised_space: str = "mel_spectrogram", params=None):
        """rec_loss(pred_x0_latent) = || y_space - A_space(decode(x0)) ||_F.

        The guidance chain of scheduling_dps.py:195-211: VAE decode -> vocoder ->
        crop -> operator.forward -> (optional mel transform) -> Frobenius norm.

        Batch semantics: the norm is PER CLIP, summed over the batch. At the
        reference's batch size (always 1, run.py:249) this is identical to the
        joint Frobenius norm; for batch > 1 (num_waveforms_per_prompt, or clips
        dp-sharded over a mesh) it keeps each clip's guidance gradient
        grad_b = r_b / ||r_b|| independent of the other clips — a joint norm
        would rescale every clip's gradient by ||r_b||/||r_joint||, diluting
        guidance for clips that are already consistent. This makes a dp-batched
        DPS run exactly equal to independent single-clip runs
        (tools/dryrun_dp_batch.py proves it on a virtual mesh).
        """
        op = self.operator
        vae_params = params["vae"] if params is not None else None
        vocoder = self._vocoder_fn(params["vocoder"] if params is not None
                                   else None)
        if supervised_space == "mel_spectrogram":
            target = op.transform(measurement)
        elif supervised_space == "wav_form":
            target = measurement
        else:
            raise ValueError(
                "supervised_space should be either 'wav_form' or 'mel_spectrogram'")

        def loss_fn(x0_latent):
            mel = self.decode_mel(x0_latent, vae_params)
            audio = op.inverse_transform(mel, vocoder)
            # fp32 loss head regardless of compute dtype (bf16 weights):
            # the guidance gradient magnitude drives the sampler updates
            audio = audio[:, :original_waveform_length].astype(jnp.float32)
            pred = op.forward(audio)
            if supervised_space == "mel_spectrogram":
                diff = target - op.transform(pred)
            else:
                diff = target - pred
            per_clip = jnp.sqrt(jnp.sum(
                jnp.square(diff.reshape(diff.shape[0], -1)), axis=1))
            return jnp.sum(per_clip)

        return loss_fn

    # --------------------------------------------------------------- denoise
    def _apply_unet(self, prompt_embeds, x_in, t, unet_params=None):
        """UNet conditioning signature; MusicLDM feeds CLAP embeds as class
        labels (reference pipeline_musicldm.py:696-703)."""
        params = unet_params if unet_params is not None else self.unet_params
        dt = self._tree_dtype(params)
        eps = self.unet.apply(params, x_in.astype(dt), t,
                              class_labels=prompt_embeds.astype(dt))
        return eps.astype(x_in.dtype)

    def _eps_fn(self, prompt_embeds, x, t, guidance_scale: float,
                unet_params=None):
        """CFG-combined noise prediction as a function of the prompt embeds."""
        if guidance_scale > 1.0:
            x_in = jnp.concatenate([x, x], axis=0)
            eps = self._apply_unet(prompt_embeds, x_in, t, unet_params)
            uncond, text = jnp.split(eps, 2, axis=0)
            return uncond + guidance_scale * (text - uncond)
        return self._apply_unet(prompt_embeds, x, t, unet_params)

    def _make_model_fn(self, prompt_embeds, guidance_scale: float,
                       unet_params=None):
        return lambda x, t: self._eps_fn(prompt_embeds, x, t, guidance_scale,
                                         unet_params)

    # ------------------------------------------------- degenerate-CFG skip
    @staticmethod
    def _cfg_is_degenerate(prompt_embeds) -> bool:
        """True when the CFG-stacked conditioning's uncond and cond halves are
        IDENTICAL — e.g. empty prompt with empty negative prompt (the
        reference CLI's default for every inverse-problem task, run.py:82-84).
        Then uncond + s*(text - uncond) == text for any s, so the batch
        doubling computes the same UNet row twice; skipping it is exact."""
        def halves_equal(a):
            a = np.asarray(a)
            if a.ndim < 1 or a.shape[0] % 2 or a.shape[0] == 0:
                return False
            h = a.shape[0] // 2
            return bool(np.array_equal(a[:h], a[h:]))
        if isinstance(prompt_embeds, tuple):
            return all(halves_equal(c) for c in prompt_embeds)
        return halves_equal(prompt_embeds)

    @staticmethod
    def _cfg_cond_half(prompt_embeds):
        if isinstance(prompt_embeds, tuple):
            return tuple(c[c.shape[0] // 2:] for c in prompt_embeds)
        return prompt_embeds[prompt_embeds.shape[0] // 2:]

    def _optim_prompt_split(self, prompt_embeds):
        """(differentiable part, rebuild fn) for prompt-embedding optimization."""
        return prompt_embeds, lambda d: d

    def _fire_callback(self, i, t, lat):
        """Stable trampoline target for the per-step user callback
        (reference pipeline_musicldm.py:760-766): reads the current user
        function/cadence so cached compiled scans remain valid."""
        cb = getattr(self, "_user_callback", None)
        if cb is not None and i % max(1, getattr(self, "_callback_steps", 1)) == 0:
            cb(i, t, lat)

    def __call__(self,
                 prompt: Optional[str] = None,
                 audio_length_in_s: Optional[float] = None,
                 num_inference_steps: int = 200,
                 guidance_scale: float = 2.0,
                 negative_prompt: Optional[str] = None,
                 num_waveforms_per_prompt: int = 1,
                 eta: float = 0.0,
                 key: Optional[jax.Array] = None,
                 latents: Optional[jax.Array] = None,
                 prompt_embeds: Optional[jax.Array] = None,
                 measurement: Optional[jax.Array] = None,
                 ip_guidance_rate: float = 1.0,
                 optim_outer_loop: int = 1,
                 supervised_space: str = "mel_spectrogram",
                 output_type: str = "np",
                 return_losses: bool = False,
                 optim_prompt: bool = False,
                 optim_prompt_learning_rate: float = 1e-4,
                 show_progress: bool = False,
                 callback=None,
                 callback_steps: int = 1,
                 **_ignored):
        key = key if key is not None else jax.random.key(0)
        sr = self.vocoder_cfg.sampling_rate
        hop = self.vocoder_cfg.hop_length
        height, owl = compute_geometry(
            audio_length_in_s if audio_length_in_s is not None else 5.0,
            sr, hop, self.vae_scale_factor)

        # conditioning
        do_cfg = guidance_scale > 1.0
        if prompt_embeds is None:
            prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        if not isinstance(prompt_embeds, tuple):  # AudioLDM2 passes a stream tuple
            prompt_embeds = jnp.asarray(prompt_embeds, self.dtype)

        # degenerate-CFG skip (EXACT): when uncond == cond conditioning (the
        # reference CLI default: empty prompt, empty negative prompt), the CFG
        # combine is the identity — run the UNet single-stream and halve the
        # dominant per-step cost. Output is unchanged by construction.
        if do_cfg and self._cfg_is_degenerate(prompt_embeds):
            prompt_embeds = self._cfg_cond_half(prompt_embeds)
            guidance_scale = 1.0
            do_cfg = False

        # latents: width axis is the mel-bin axis (model_in_dim)
        batch = num_waveforms_per_prompt
        key, lat_key, scan_key = jax.random.split(key, 3)
        if latents is None:
            latents = prepare_latents(lat_key, batch, self.unet_cfg.in_channels,
                                      height, self.vocoder_cfg.model_in_dim,
                                      self.vae_scale_factor, self.dtype)
        batch = latents.shape[0]

        # tile the conditioning across the waveform batch (reference
        # pipeline_musicldm.py:195-196 repeats prompt_embeds per waveform);
        # jnp.repeat keeps the CFG halves ordered [uncond*B, cond*B] to match
        # the concat([x, x]) layout in _eps_fn
        if batch > 1:
            def _tile(e):
                return jnp.repeat(e, batch, axis=0) if hasattr(e, "shape") \
                    and e.ndim >= 1 else e
            prompt_embeds = jax.tree.map(_tile, prompt_embeds) \
                if isinstance(prompt_embeds, tuple) else _tile(prompt_embeds)

        if self.mesh is not None:
            # dp-shard the waveform batch over ICI; params/conditioning stay
            # replicated and GSPMD inserts the collectives (SURVEY.md section 2
            # TPU-native equivalents; no reference counterpart — it is
            # single-GPU, run.py:217)
            from ..parallel.mesh import shard_batch_dp
            latents = jax.device_put(
                latents, shard_batch_dp(self.mesh, latents.ndim))

        timesteps = jnp.asarray(self.schedule.timesteps(num_inference_steps))
        cfg = SamplerConfig(name=self.scheduler_name, eta=eta,
                            ip_guidance_rate=ip_guidance_rate,
                            num_inference_steps=num_inference_steps)

        needs_guidance = self.scheduler_name not in ("ddim",)
        if needs_guidance and measurement is None:
            raise ValueError(
                f"scheduler '{self.scheduler_name}' requires a measurement")
        if measurement is not None:
            measurement = jnp.asarray(measurement)

        # per-step user callback (reference pipeline_musicldm.py:760-766): the
        # jitted scan closes over the stable _fire_callback trampoline; the
        # user's function and cadence are read at fire time, so the compiled
        # program stays cacheable across calls with different callbacks
        self._user_callback = callback
        self._callback_steps = callback_steps

        # one jitted program per static config; measurement and prompt embeds are
        # traced arguments, so looping over dataset files (run.py:264) reuses the
        # same compiled scan instead of recompiling per file
        static_key = (self.scheduler_name, num_inference_steps, eta,
                      ip_guidance_rate, guidance_scale, supervised_space, owl,
                      needs_guidance, self.scheduler_name == "ditto",
                      optim_prompt, optim_prompt_learning_rate, show_progress,
                      callback is not None)

        mparams = self._denoise_params()
        if self.scheduler_name == "ditto":
            if static_key not in self._denoise_cache:
                def loss_of_init(mp, init_lat, k, meas, pembeds):
                    model_fn = self._make_model_fn(pembeds, guidance_scale,
                                                   mp["unet"])
                    loss_fn = self.make_loss_fn(meas, owl, supervised_space, mp)
                    # The reference evaluates the decode-chain loss every inner
                    # step but only BACKPROPS the final step's
                    # (scheduling_ditto.py:205-208 fires at timestep == 1; the
                    # others feed tqdm). Keeping the decode chain out of the
                    # scan body halves the compiled program with an IDENTICAL
                    # gradient: plain DDIM inner scan, loss evaluated once on
                    # the final latents (== losses[-1] of the old form exactly,
                    # samplers/steps.py ditto step).
                    step_fn = make_step_fn(self.schedule, cfg, None)
                    final, _ = run_denoise_scan(step_fn, model_fn, init_lat,
                                                timesteps, k, remat=True)
                    return loss_fn(final), final

                self._denoise_cache[static_key] = jax.jit(
                    jax.value_and_grad(loss_of_init, argnums=1, has_aux=True))
            grad_fn = self._denoise_cache[static_key]
            # see base._commit_latents: uncommitted/host first input = the
            # SAME program compiled twice per process (PERF_NOTES)
            from .base import _commit_latents
            lat = _commit_latents(latents)
            outer_losses = []
            for _ in range(optim_outer_loop):
                (loss, final), grad = grad_fn(mparams, lat, scan_key,
                                              measurement, prompt_embeds)
                outer_losses.append(loss)
                lat = lat - ip_guidance_rate * grad
            # per-outer-iteration trajectory (reference tracks the same loss in
            # its tqdm bar, scheduling_ditto.py:187-208)
            losses = jnp.asarray(outer_losses)
        else:
            if static_key not in self._denoise_cache:
                if needs_guidance and optim_prompt:
                    # working version of the reference's scheduler.optim_prompt
                    # (scheduling_dps.py:63-135, invoked at t % 30 == 1,
                    # plpeline_audioldm2.py:1162-1177). NOTE: the reference's
                    # implementation is a silent no-op — it discards the
                    # re-requires_grad'd clone and its loss graph never touches
                    # the embeddings; here the SGD step uses the true gradient
                    # d rec_loss / d prompt_embeds through the UNet forward.
                    lr = optim_prompt_learning_rate

                    def run(mp, lat, k, meas, pembeds):
                        loss_fn = self.make_loss_fn(meas, owl, supervised_space,
                                                    mp)
                        step_fn = make_step_fn(self.schedule, cfg, loss_fn)
                        diff0, rebuild = self._optim_prompt_split(pembeds)

                        def body(carry, tk):
                            x, diff, kk = carry
                            kk, sub = jax.random.split(kk)

                            def embeds_loss(d):
                                eps = self._eps_fn(rebuild(d), x, tk,
                                                   guidance_scale, mp["unet"])
                                x0 = self.schedule.pred_original(eps, tk, x)
                                return loss_fn(x0)

                            diff = jax.lax.cond(
                                tk % 30 == 1,
                                lambda d: jax.tree.map(
                                    lambda p, g: p - lr * g, d,
                                    jax.grad(embeds_loss)(d)),
                                lambda d: d, diff)
                            eps = self._eps_fn(rebuild(diff), x, tk,
                                               guidance_scale, mp["unet"])
                            prev, _x0, loss = step_fn(eps, tk, x, sub)
                            return (prev, diff, kk), loss

                        (final, _, _), losses = jax.lax.scan(
                            body, (lat, diff0, k), timesteps)
                        return final, losses
                elif needs_guidance:
                    def run(mp, lat, k, meas, pembeds):
                        model_fn = self._make_model_fn(pembeds, guidance_scale,
                                                       mp["unet"])
                        loss_fn = self.make_loss_fn(meas, owl, supervised_space,
                                                    mp)
                        step_fn = make_step_fn(self.schedule, cfg, loss_fn)
                        return run_denoise_scan(
                            step_fn, model_fn, lat, timesteps, k,
                            progress=show_progress,
                            callback=self._fire_callback if callback is not None
                            else None)
                else:
                    def run(mp, lat, k, meas, pembeds):
                        model_fn = self._make_model_fn(pembeds, guidance_scale,
                                                       mp["unet"])
                        step_fn = make_step_fn(self.schedule, cfg, None)
                        return run_denoise_scan(
                            step_fn, model_fn, lat, timesteps, k,
                            progress=show_progress,
                            callback=self._fire_callback if callback is not None
                            else None)
                self._denoise_cache[static_key] = jax.jit(run)
            run_jit = self._denoise_cache[static_key]
            final, losses = denoise_with_nan_retry(
                lambda lat, k: run_jit(mparams, lat, k, measurement,
                                       prompt_embeds),
                latents, scan_key)

        if output_type == "latent":
            return AudioPipelineOutput(audios=np.asarray(final))

        if "decode" not in self._denoise_cache:
            def decode(mp, lat):
                mel = self.decode_mel(lat, mp["vae"])
                return mel, self.mel_to_waveform(mel, mp["vocoder"])
            self._denoise_cache["decode"] = jax.jit(decode)
        mel, audio = self._denoise_cache["decode"](mparams, final)
        audio = np.asarray(audio[:, :owl], np.float32)

        from ..inverse_problem import PhaseRetrievalOperator
        # the projection forces |STFT(output)| == measurement verbatim, so a
        # noisy measurement would be baked into the output audio; gate it on a
        # (near-)noiseless noiser by default. DIFFMUSIC_TPU_PHASE_AWARE=1/0
        # forces it on/off (scores with it on are an intentional improvement
        # over upstream, whose phase-aware helper is dormant — noted in
        # PARITY.md when comparing eval results).
        phase_env = os.environ.get("DIFFMUSIC_TPU_PHASE_AWARE", "")
        phase_aware = (phase_env == "1" or (
            phase_env != "0"
            and getattr(getattr(self.operator, "noiser", None),
                        "sigma", 1.0) <= 1e-6))
        if measurement is not None and phase_aware and isinstance(
                self.operator, PhaseRetrievalOperator):
            # phase-aware recon for phase_retrieval (the task the reference's
            # dormant mel_spectrogram_to_waveform_with_phase was built for,
            # pipeline_musicldm.py:263-301): the measurement IS the true
            # linear |STFT| magnitude, so rebuild the waveform from it with
            # the phase ESTIMATED from the sampled vocoder audio — one
            # projection onto the magnitude-consistent set, which strictly
            # tightens |STFT(recon)| vs the plain vocoder output
            # (tests/test_pipeline_musicldm.py::test_phase_retrieval_
            # phase_aware_output).
            from ..ops.stft import magphase_spectrogram
            from .base import mel_spectrogram_to_waveform_with_phase
            op = self.operator
            wav = jnp.asarray(audio)
            for _ in range(4):  # Griffin-Lim-style alternating projections
                _, phase = magphase_spectrogram(
                    wav, n_fft=op.n_fft, hop_length=op.hop_length,
                    win_length=op.win_length)
                wav = mel_spectrogram_to_waveform_with_phase(
                    mel, phase, n_fft=op.n_fft, hop_length=op.hop_length,
                    win_length=op.win_length, sample_rate=op.sample_rate,
                    original_waveform_length=owl,
                    linear_magnitude=measurement)
            audio = np.asarray(wav, np.float32)

        out = AudioPipelineOutput(audios=audio)
        if return_losses:
            return out, np.asarray(losses)
        return out

    # ------------------------------------------------------------- factories
    @classmethod
    def from_pretrained(cls, checkpoint_dir, scheduler_name: str = "ddim",
                        operator=None, schedule=None):
        """Load from a local HF-snapshot-layout directory (no hub egress here;
        reference equivalent: run.py:218 from_pretrained(repo_id))."""
        from ..models.checkpoint import load_musicldm
        return load_musicldm(checkpoint_dir, scheduler_name=scheduler_name,
                             operator=operator, schedule=schedule)

    @classmethod
    def tiny(cls, scheduler_name: str = "ddim", operator=None, seed: int = 0):
        """Random tiny-weight pipeline with the real model *structure* — the fake
        backend for CPU tests (SURVEY.md section 4 plan item b)."""
        unet_cfg = tiny_unet_config()
        vae_cfg = tiny_vae_config()
        voc_cfg = tiny_hifigan_config()
        txt_cfg = tiny_clap_text_config()

        k = jax.random.key(seed)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        unet = UNet2DConditionModel(unet_cfg)
        vae = AutoencoderKL(vae_cfg)
        voc = SpeechT5HifiGan(voc_cfg)
        txt = ClapTextModelWithProjection(txt_cfg)

        height = 40  # tiny latent time axis for 5 s would be 500; keep tests fast
        lat = jnp.zeros((1, unet_cfg.in_channels, height // vae_cfg.scale_factor,
                         voc_cfg.model_in_dim // vae_cfg.scale_factor))
        unet_params = unet.init(
            k1, lat, jnp.asarray([0]),
            class_labels=jnp.zeros((1, unet_cfg.projection_class_embeddings_input_dim)))
        mel = jnp.zeros((1, 1, height, voc_cfg.model_in_dim))
        vae_params = vae.init(k2, mel)
        voc_params = voc.init(k3, jnp.zeros((1, height, voc_cfg.model_in_dim)))
        txt_params = txt.init(k4, jnp.zeros((1, 8), jnp.int32))

        def byte_tokenizer(texts, maxlen=16):
            ids = np.ones((len(texts), maxlen), np.int32)  # pad id 1
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
                   text_params=txt_params,
                   scheduler_name=scheduler_name,
                   operator=operator if operator is not None else IdentityOperator(),
                   tokenizer=byte_tokenizer,
                   clap_audio_embed=clap_audio_embed,
                   clap_frame_embed=clap_frame_embed)
