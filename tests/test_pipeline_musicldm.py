"""End-to-end MusicLDM pipeline tests on the tiny fake backend (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmusic_tpu.inverse_problem import MusicInpaintingOperator
from diffmusic_tpu.pipelines import MusicLDMPipeline

pytestmark = pytest.mark.slow  # scan-compiling / multi-minute: excluded from the fast tier


@pytest.fixture(scope="module")
def inpaint_op():
    return MusicInpaintingOperator(audio_length_in_s=0.4, sample_rate=16000,
                                   mask_type="box", start_inpainting_s=0.15,
                                   end_inpainting_s=0.25)


@pytest.fixture(scope="module")
def measurement(inpaint_op):
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((1, 6400)).astype(np.float32) * 0.1)
    return inpaint_op.forward(wav)


class TestMusicLDMTiny:
    def test_ddim_generation(self):
        pipe = MusicLDMPipeline.tiny("ddim")
        out = pipe(prompt="techno", audio_length_in_s=0.4, num_inference_steps=4,
                   guidance_scale=2.0, key=jax.random.key(0))
        assert out.audios.shape == (1, 6400)
        assert np.isfinite(out.audios).all()

    def test_ddim_latent_output(self):
        pipe = MusicLDMPipeline.tiny("ddim")
        out = pipe(prompt="", audio_length_in_s=0.4, num_inference_steps=2,
                   output_type="latent", key=jax.random.key(0))
        assert out.audios.shape == (1, 8, 20, 32)

    def test_ddim_deterministic_given_key(self):
        pipe = MusicLDMPipeline.tiny("ddim")
        a = pipe(prompt="x", audio_length_in_s=0.4, num_inference_steps=2,
                 key=jax.random.key(7)).audios
        b = pipe(prompt="x", audio_length_in_s=0.4, num_inference_steps=2,
                 key=jax.random.key(7)).audios
        np.testing.assert_array_equal(a, b)

    def test_injected_latents_respected(self):
        pipe = MusicLDMPipeline.tiny("ddim")
        lat = jnp.zeros((1, 8, 20, 32))
        out = pipe(prompt="", audio_length_in_s=0.4, num_inference_steps=2,
                   latents=lat, key=jax.random.key(0))
        out2 = pipe(prompt="", audio_length_in_s=0.4, num_inference_steps=2,
                    latents=lat, key=jax.random.key(1))
        np.testing.assert_array_equal(out.audios, out2.audios)

    @pytest.mark.parametrize("name,eta,rate", [
        ("dps", 0.0, 0.0005), ("mpgd", 0.0, 0.005),
        ("dsg", 1.0, 0.08), ("diffmusic", 1.0, 0.08),
    ])
    def test_guided_inpainting(self, inpaint_op, measurement, name, eta, rate):
        pipe = MusicLDMPipeline.tiny(name, operator=inpaint_op)
        out, losses = pipe(prompt="", audio_length_in_s=0.4,
                           num_inference_steps=4, eta=eta,
                           ip_guidance_rate=rate, measurement=measurement,
                           return_losses=True, key=jax.random.key(1))
        assert out.audios.shape == (1, 6400)
        assert np.isfinite(out.audios).all()
        assert np.isfinite(losses).all()

    def test_guided_requires_measurement(self, inpaint_op):
        pipe = MusicLDMPipeline.tiny("dps", operator=inpaint_op)
        with pytest.raises(ValueError, match="measurement"):
            pipe(prompt="", audio_length_in_s=0.4, num_inference_steps=2)

    def test_ditto_runs_finite(self, inpaint_op, measurement):
        pipe = MusicLDMPipeline.tiny("ditto", operator=inpaint_op)
        out = pipe(prompt="", audio_length_in_s=0.4, num_inference_steps=2,
                   eta=1.0, ip_guidance_rate=0.5, optim_outer_loop=2,
                   measurement=measurement, key=jax.random.key(3))
        assert np.isfinite(out.audios).all()

    def test_wav_form_supervision(self, inpaint_op, measurement):
        pipe = MusicLDMPipeline.tiny("diffmusic", operator=inpaint_op)
        out = pipe(prompt="", audio_length_in_s=0.4, num_inference_steps=2,
                   eta=1.0, ip_guidance_rate=0.08, measurement=measurement,
                   supervised_space="wav_form", key=jax.random.key(4))
        assert np.isfinite(out.audios).all()

    def test_optim_prompt_runs(self, inpaint_op, measurement):
        """Working prompt-embedding optimization (the reference's optim_prompt is
        a silent no-op — see pipelines/musicldm.py)."""
        pipe = MusicLDMPipeline.tiny("dps", operator=inpaint_op)
        out, losses = pipe(prompt="", audio_length_in_s=0.4,
                           num_inference_steps=2, eta=0.0,
                           ip_guidance_rate=5e-4, measurement=measurement,
                           optim_prompt=True, optim_prompt_learning_rate=1e-3,
                           return_losses=True, key=jax.random.key(5))
        assert np.isfinite(out.audios).all()
        assert np.isfinite(losses).all()

    def test_callback_fires_with_cadence(self):
        """Per-step callback(step, t, latents) every callback_steps
        (reference pipeline_musicldm.py:760-766)."""
        pipe = MusicLDMPipeline.tiny("ddim")
        seen = []
        pipe(prompt="", audio_length_in_s=0.4, num_inference_steps=6,
             key=jax.random.key(0),
             callback=lambda i, t, lat: seen.append((i, int(t), lat.shape)),
             callback_steps=2)
        jax.effects_barrier()
        assert [s[0] for s in seen] == [0, 2, 4]
        assert all(s[2] == (1, 8, 20, 32) for s in seen)

    def test_callback_absent_by_default_and_cache_safe(self):
        """Calling again without a callback must not fire the stale one."""
        pipe = MusicLDMPipeline.tiny("ddim")
        seen = []
        pipe(prompt="", audio_length_in_s=0.4, num_inference_steps=3,
             key=jax.random.key(0), callback=lambda *a: seen.append(a))
        jax.effects_barrier()
        n = len(seen)
        assert n == 3
        pipe(prompt="", audio_length_in_s=0.4, num_inference_steps=3,
             key=jax.random.key(1))
        jax.effects_barrier()
        assert len(seen) == n

    def test_bf16_weights_guided_run(self, inpaint_op, measurement):
        """bf16 checkpoints through the PRODUCTION pipeline path must not
        dtype-clash (lax.conv rejects mixed dtypes) or silently promote the
        model to fp32 — the pipeline casts activations to the param dtype
        and keeps the guidance loss head fp32."""
        pipe = MusicLDMPipeline.tiny("diffmusic", operator=inpaint_op)
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)
        pipe.unet_params = cast(pipe.unet_params)
        pipe.vae_params = cast(pipe.vae_params)
        pipe.vocoder_params = cast(pipe.vocoder_params)
        out, losses = pipe(prompt="", audio_length_in_s=0.4,
                           num_inference_steps=3, eta=1.0,
                           ip_guidance_rate=0.1, measurement=measurement,
                           return_losses=True, key=jax.random.key(2))
        assert np.isfinite(out.audios).all()
        assert np.asarray(losses).dtype == np.float32
        assert np.isfinite(np.asarray(losses, np.float64)).all()

    def test_degenerate_cfg_skip_is_exact(self, inpaint_op, measurement):
        """Empty prompt == empty negative prompt makes the CFG combine the
        identity; the single-stream fast path must produce the same audio as
        the explicit CFG-doubled program (uncond + s*(text-uncond) == text
        when text == uncond)."""
        pipe = MusicLDMPipeline.tiny("diffmusic", operator=inpaint_op)
        fast = pipe(prompt="", audio_length_in_s=0.4, num_inference_steps=3,
                    eta=1.0, ip_guidance_rate=0.1, guidance_scale=2.0,
                    measurement=measurement, key=jax.random.key(6)).audios

        pipe2 = MusicLDMPipeline.tiny("diffmusic", operator=inpaint_op)
        pipe2._cfg_is_degenerate = lambda pe: False  # force the doubled path
        slow = pipe2(prompt="", audio_length_in_s=0.4, num_inference_steps=3,
                     eta=1.0, ip_guidance_rate=0.1, guidance_scale=2.0,
                     measurement=measurement, key=jax.random.key(6)).audios
        np.testing.assert_allclose(fast, slow, atol=2e-5)

    def test_distinct_prompts_keep_cfg(self, inpaint_op, measurement):
        """A real prompt vs empty negative must still run CFG-doubled (the
        skip only fires on identical halves)."""
        pipe = MusicLDMPipeline.tiny("ddim")
        emb = pipe.encode_prompt("techno", None, True)
        assert not pipe._cfg_is_degenerate(emb)
        assert pipe._cfg_is_degenerate(pipe.encode_prompt("", None, True))

    def test_bad_supervised_space(self, inpaint_op, measurement):
        pipe = MusicLDMPipeline.tiny("diffmusic", operator=inpaint_op)
        with pytest.raises(ValueError, match="supervised_space"):
            pipe(prompt="", audio_length_in_s=0.4, num_inference_steps=2,
                 measurement=measurement, supervised_space="latent")


class TestPhaseRetrievalOutput:
    def test_phase_aware_output_beats_plain_vocoder(self):
        """phase_retrieval recon path (musicldm.py __call__ epilogue): the
        output is rebuilt from the measurement's exact |STFT| magnitude with
        the phase estimated from the sampled vocoder audio, via
        mel_spectrogram_to_waveform_with_phase(linear_magnitude=...). Its
        magnitude-consistency error must beat the plain vocoder output
        (the measurement magnitude is exact; only iSTFT overlap-consistency
        error remains)."""
        from diffmusic_tpu.inverse_problem import PhaseRetrievalOperator
        from diffmusic_tpu.ops.stft import spectrogram

        op = PhaseRetrievalOperator(n_fft=256, hop_length=64, win_length=256)
        pipe = MusicLDMPipeline.tiny("dps", operator=op)
        sr, owl = 16000, 6400
        t = np.arange(owl) / sr
        gt = jnp.asarray((0.4 * np.sin(2 * np.pi * 440 * t)
                          + 0.2 * np.sin(2 * np.pi * 880 * t)
                          ).astype(np.float32))[None]
        meas = op.forward(gt)

        kwargs = dict(prompt="", audio_length_in_s=0.4, num_inference_steps=3,
                      ip_guidance_rate=1e-3, measurement=meas,
                      key=jax.random.key(5))
        recon = pipe(**kwargs).audios
        assert recon.shape[-1] == owl and np.isfinite(recon).all()

        # plain vocoder output from the SAME sampled latents
        latents = jnp.asarray(pipe(**kwargs, output_type="latent").audios)
        plain = np.asarray(pipe.mel_to_waveform(
            pipe.decode_mel(latents))[:, :owl], np.float32)

        def mag_err(wav):
            mag = spectrogram(jnp.asarray(wav), op.n_fft, op.hop_length,
                              op.win_length, power=1.0, use_hann=False)
            return float(jnp.linalg.norm(mag - meas))

        assert mag_err(recon) < 0.5 * mag_err(plain), \
            (mag_err(recon), mag_err(plain))

    def test_phase_aware_path_not_triggered_for_other_operators(self):
        """Inpainting recon must stay on the plain vocoder path."""
        op = MusicInpaintingOperator(audio_length_in_s=0.4, sample_rate=16000,
                                     mask_type="box", start_inpainting_s=0.15,
                                     end_inpainting_s=0.25)
        pipe = MusicLDMPipeline.tiny("dps", operator=op)
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.standard_normal((1, 6400)).astype(np.float32)
                          * 0.1)
        meas = op.forward(wav)
        kwargs = dict(prompt="", audio_length_in_s=0.4, num_inference_steps=2,
                      ip_guidance_rate=1e-3, measurement=meas,
                      key=jax.random.key(5))
        recon = pipe(**kwargs).audios
        latents = jnp.asarray(pipe(**kwargs, output_type="latent").audios)
        plain = np.asarray(pipe.mel_to_waveform(
            pipe.decode_mel(latents))[:, :6400], np.float32)
        np.testing.assert_allclose(recon, plain, atol=1e-6)
