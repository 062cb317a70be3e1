"""AudioLDM2 pipeline tests on the tiny fake backend (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmusic_tpu.inverse_problem import MusicInpaintingOperator
from diffmusic_tpu.pipelines import get_pipeline

pytestmark = pytest.mark.slow  # scan-compiling / multi-minute: excluded from the fast tier

AudioLDM2Pipeline = get_pipeline("audioldm2")


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


class TestAudioLDM2Tiny:
    def test_ddim_generation(self):
        pipe = AudioLDM2Pipeline.tiny("ddim")
        out = pipe(prompt="piano", audio_length_in_s=0.4, num_inference_steps=3,
                   guidance_scale=3.5, key=jax.random.key(0))
        assert out.audios.shape == (1, 6400)
        assert np.isfinite(out.audios).all()

    def test_prompt_changes_output(self):
        pipe = AudioLDM2Pipeline.tiny("ddim")
        a = pipe(prompt="piano", audio_length_in_s=0.4, num_inference_steps=2,
                 key=jax.random.key(0)).audios
        b = pipe(prompt="violin solo", audio_length_in_s=0.4,
                 num_inference_steps=2, key=jax.random.key(0)).audios
        assert np.abs(a - b).max() > 1e-8

    def test_dps_guided(self, inpaint_op, measurement):
        pipe = AudioLDM2Pipeline.tiny("dps", operator=inpaint_op)
        out, losses = pipe(prompt="x", audio_length_in_s=0.4,
                           num_inference_steps=3, eta=0.0,
                           ip_guidance_rate=5e-4, measurement=measurement,
                           return_losses=True, key=jax.random.key(1))
        assert out.audios.shape == (1, 6400)
        assert np.isfinite(losses).all()

    def test_degenerate_cfg_skip_is_exact_dual_stream(self):
        """The degenerate-CFG skip must hold for AudioLDM2's TUPLE conditioning
        (GPT-2 + T5 streams + mask): empty prompt & empty negative produce
        identical CFG halves in EVERY stream, so single-stream equals the
        doubled program exactly."""
        pipe = AudioLDM2Pipeline.tiny("ddim")
        emb = pipe.encode_prompt("", None, True)
        assert isinstance(emb, tuple)
        assert pipe._cfg_is_degenerate(emb)
        assert not pipe._cfg_is_degenerate(pipe.encode_prompt("piano", None,
                                                              True))
        out_skip = pipe(prompt="", audio_length_in_s=0.4,
                        num_inference_steps=3, guidance_scale=3.5,
                        key=jax.random.key(5)).audios
        pipe2 = AudioLDM2Pipeline.tiny("ddim")
        pipe2._cfg_is_degenerate = lambda pe: False  # force the doubled path
        out_full = pipe2(prompt="", audio_length_in_s=0.4,
                         num_inference_steps=3, guidance_scale=3.5,
                         key=jax.random.key(5)).audios
        np.testing.assert_allclose(out_skip, out_full, atol=2e-5)

    def test_clap_prompt_type_requires_audio_tower(self, measurement):
        pipe = AudioLDM2Pipeline.tiny("ddim")
        pipe.clap_audio_embed = None  # tiny now ships a tower; drop it
        with pytest.raises(ValueError, match="clap"):
            pipe(prompt="x", audio_length_in_s=0.4, num_inference_steps=2,
                 prompt_type="clap", measurement=measurement)

    def test_clap_prompt_type_runs_with_tiny_tower(self, measurement):
        """prompt_type='clap': CLAP AUDIO features of the measurement replace
        the text features (reference plpeline_audioldm2.py:469-481); the tiny
        pipeline ships a tiny HTSAT tower, so the path runs end-to-end."""
        pipe = AudioLDM2Pipeline.tiny("ddim")
        out = pipe(prompt="x", audio_length_in_s=0.4, num_inference_steps=2,
                   prompt_type="clap", measurement=measurement,
                   key=jax.random.key(0))
        assert np.isfinite(out.audios).all()

    def test_score_waveforms_ranks_by_clap_similarity(self):
        """CLAP text-audio re-ranking (reference plpeline_audioldm2.py:721-738;
        its call site :1240 is commented out there — wired here)."""
        pipe = AudioLDM2Pipeline.tiny("ddim")
        # stub audio tower: embedding = normalized mean/std signature, so the
        # ranking is deterministic and text-feature-dependent
        ids, mask = pipe.tokenizer(["target"])
        tfeat = pipe.text_encoder.apply(pipe.text_params, jnp.asarray(ids),
                                        jnp.asarray(mask))
        tfeat = tfeat / jnp.linalg.norm(tfeat, axis=-1, keepdims=True)

        def stub_embed(wavs):
            # first waveform maps exactly onto the text feature (sim 1), the
            # second onto its negation (sim -1)
            signs = jnp.sign(jnp.sum(wavs, axis=-1, keepdims=True))
            return signs * tfeat
        pipe.clap_audio_embed = stub_embed

        good = jnp.ones((1, 100))
        bad = -jnp.ones((1, 100))
        audio = jnp.concatenate([bad, good], axis=0)
        ranked, sims = pipe.score_waveforms("target", audio)
        assert sims[0] > sims[1]
        np.testing.assert_allclose(ranked[0], np.asarray(good[0]))

    def test_score_waveforms_requires_audio_tower(self):
        pipe = AudioLDM2Pipeline.tiny("ddim")
        pipe.clap_audio_embed = None  # tiny now ships a tower; drop it
        with pytest.raises(ValueError, match="clap_audio_embed"):
            pipe.score_waveforms("x", jnp.zeros((2, 100)))
