"""StableAudio stack: Oobleck waveform VAE, DiT, EDM DPM-Solver++, pipeline.

The reference ships this pipeline dormant (its factory never returns it,
reference pipelines/__init__.py:11-13); here it is wired and tested end-to-end
on tiny random weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmusic_tpu.models.configs import (tiny_oobleck_config,
                                          tiny_stable_audio_dit_config)
from diffmusic_tpu.models.oobleck import AutoencoderOobleck
from diffmusic_tpu.models.stable_audio_dit import StableAudioDiTModel
from diffmusic_tpu.samplers.edm import (EDMDPMSolverMultistepSchedule,
                                        make_edm_sampler)

pytestmark = pytest.mark.slow  # scan-compiling / multi-minute: excluded from the fast tier


class TestOobleck:
    def setup_method(self):
        self.cfg = tiny_oobleck_config()
        self.vae = AutoencoderOobleck(self.cfg)
        wav = jnp.zeros((1, self.cfg.audio_channels, self.cfg.hop_length * 8))
        self.params = self.vae.init(jax.random.key(0), wav)  # __call__ inits both

    def test_encode_decode_shapes(self):
        hop = self.cfg.hop_length
        wav = jax.random.normal(jax.random.key(1),
                                (2, self.cfg.audio_channels, hop * 8))
        mean, std = self.vae.apply(self.params, wav,
                                   method=AutoencoderOobleck.encode)
        assert mean.shape == (2, self.cfg.decoder_input_channels, 8)
        assert std.shape == mean.shape
        assert np.all(np.asarray(std) > 0)  # softplus + 1e-4

        out = self.vae.apply(self.params, mean,
                             method=AutoencoderOobleck.decode)
        assert out.shape == (2, self.cfg.audio_channels, hop * 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_decode_differentiable(self):
        """The decoder sits inside guidance-gradient chains; grads must exist
        and be finite (snake activation is fp32 internally)."""
        z = jax.random.normal(jax.random.key(2),
                              (1, self.cfg.decoder_input_channels, 4))

        def loss(z):
            out = self.vae.apply(self.params, z,
                                 method=AutoencoderOobleck.decode)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(z)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestDiT:
    def test_forward_shape_and_finite(self):
        cfg = tiny_stable_audio_dit_config()
        m = StableAudioDiTModel(cfg)
        x = jax.random.normal(jax.random.key(0), (2, cfg.in_channels, 16))
        ctx = jax.random.normal(jax.random.key(1),
                                (2, 5, cfg.cross_attention_input_dim))
        glob = jax.random.normal(jax.random.key(2),
                                 (2, cfg.global_states_input_dim))
        t = jnp.asarray([0.5, 1.0])
        params = m.init(jax.random.key(3), x, t, ctx, glob)
        y = m.apply(params, x, t, ctx, glob)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()

    def test_gqa_kv_heads_differ(self):
        cfg = tiny_stable_audio_dit_config()
        assert cfg.num_key_value_attention_heads < cfg.num_attention_heads
        # param shapes reflect GQA: kv projections are kv_heads*head_dim wide
        m = StableAudioDiTModel(cfg)
        x = jnp.zeros((1, cfg.in_channels, 8))
        params = m.init(jax.random.key(0), x, jnp.zeros((1,)),
                        jnp.zeros((1, 3, cfg.cross_attention_input_dim)),
                        jnp.zeros((1, cfg.global_states_input_dim)))
        kshape = params["params"]["block_0"]["attn1"]["to_k"]["kernel"].shape
        assert kshape[-1] == cfg.num_key_value_attention_heads * cfg.attention_head_dim


class TestEDMSchedule:
    def test_sigma_table(self):
        sched = EDMDPMSolverMultistepSchedule()
        s = sched.sigmas(50)
        assert s.shape == (51,)
        assert s[0] == pytest.approx(500.0)
        assert s[-2] == pytest.approx(0.3)
        assert s[-1] == 0.0
        assert np.all(np.diff(s) < 0)

    def test_preconditioning_identities(self):
        """c_skip + preconditioning must reconstruct x0 exactly when the model
        is the ideal EDM denoiser of a known x0 (v-prediction form)."""
        sched = EDMDPMSolverMultistepSchedule(prediction_type="v_prediction")
        x0 = jnp.asarray([1.5, -2.0, 0.25])
        eps = jnp.asarray([0.3, -0.7, 1.1])
        sigma = jnp.float32(5.0)
        x = x0 + sigma * eps
        sd = sched.sigma_data
        # ideal raw output F* satisfies x0 = c_skip x + c_out F*
        c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
        c_out = -sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
        f_star = (x0 - c_skip * x) / c_out
        rec = sched.precondition_outputs(x, f_star, sigma)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-5)

    def test_sampler_recovers_fixed_x0(self):
        """With a model that always denoises to a fixed x0, DPM-Solver++ must
        converge to exactly that x0 (the ODE's terminal value)."""
        sched = EDMDPMSolverMultistepSchedule()
        x0 = jnp.full((1, 2, 8), 0.7)
        sd = sched.sigma_data

        def model_fn(x_scaled, c_noise):
            sigma = jnp.exp(4.0 * c_noise)
            x = x_scaled * jnp.sqrt(sigma ** 2 + sd ** 2)
            c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
            c_out = -sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
            return (x0 - c_skip * x) / c_out

        sampler = make_edm_sampler(sched, 30, model_fn)
        noise = jax.random.normal(jax.random.key(0), x0.shape)
        final = sampler(noise)
        np.testing.assert_allclose(np.asarray(final), np.asarray(x0),
                                   atol=2e-2)


class TestStableAudioPipeline:
    def test_tiny_generation(self):
        from diffmusic_tpu.pipelines import get_pipeline
        cls = get_pipeline("stable_audio")
        pipe = cls.tiny()
        sr = pipe.vae_cfg.sampling_rate
        hop = pipe.vae_cfg.hop_length
        audio_end = 16 * hop / sr
        out = pipe(prompt="warm analog synth", audio_end_in_s=audio_end,
                   num_inference_steps=6, guidance_scale=3.0,
                   key=jax.random.key(7))
        assert out.audios.shape == (1, pipe.vae_cfg.audio_channels, 16 * hop)
        assert np.isfinite(out.audios).all()
        assert float(np.abs(out.audios).max()) > 0

    def test_bf16_weights_generation(self):
        """bf16 checkpoints through the StableAudio path: the fp32 Fourier
        time token must not promote the DiT stream (mixed-dtype concat), the
        EDM solver carry must stay fp32, and attention q/k/v must agree —
        regression for the dtype bugs found by the full-scale TPU check."""
        from diffmusic_tpu.pipelines import get_pipeline
        cls = get_pipeline("stable_audio")
        pipe = cls.tiny()
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)
        pipe.dit_params = cast(pipe.dit_params)
        pipe.vae_params = cast(pipe.vae_params)
        pipe.proj_params = cast(pipe.proj_params)
        hop = pipe.vae_cfg.hop_length
        audio_end = 16 * hop / pipe.vae_cfg.sampling_rate
        out = pipe(prompt="x", audio_end_in_s=audio_end,
                   num_inference_steps=4, guidance_scale=3.0,
                   key=jax.random.key(8))
        assert np.isfinite(out.audios).all()


class TestStableAudioConversion:
    def test_dit_tree_matches_init(self, rng):
        from diffmusic_tpu.models.convert import convert_stable_audio_dit
        cfg = tiny_stable_audio_dit_config()
        inner = cfg.inner_dim
        kv_inner = cfg.num_key_value_attention_heads * cfg.attention_head_dim
        sd = {}

        def lin(name, o, i, bias=True):
            sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
            if bias:
                sd[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

        sd["time_proj.weight"] = rng.standard_normal(
            (cfg.time_proj_dim // 2,)).astype(np.float32)
        lin("timestep_proj.0", inner, cfg.time_proj_dim)
        lin("timestep_proj.2", inner, inner)
        lin("global_proj.0", inner, cfg.global_states_input_dim, bias=False)
        lin("global_proj.2", inner, inner, bias=False)
        lin("cross_attention_proj.0", cfg.cross_attention_dim,
            cfg.cross_attention_input_dim, bias=False)
        lin("cross_attention_proj.2", cfg.cross_attention_dim,
            cfg.cross_attention_dim, bias=False)
        sd["preprocess_conv.weight"] = rng.standard_normal(
            (cfg.in_channels, cfg.in_channels, 1)).astype(np.float32)
        lin("proj_in", inner, cfg.in_channels, bias=False)
        lin("proj_out", cfg.out_channels, inner, bias=False)
        sd["postprocess_conv.weight"] = rng.standard_normal(
            (cfg.out_channels, cfg.out_channels, 1)).astype(np.float32)
        for i in range(cfg.num_layers):
            b = f"transformer_blocks.{i}"
            for nm in ("norm1", "norm2", "norm3"):
                lin(f"{b}.{nm}", inner, 1)
                sd[f"{b}.{nm}.weight"] = rng.standard_normal(
                    (inner,)).astype(np.float32)
            for attn, ctx in (("attn1", inner), ("attn2", cfg.cross_attention_dim)):
                lin(f"{b}.{attn}.to_q", inner, inner, bias=False)
                lin(f"{b}.{attn}.to_k", kv_inner, ctx, bias=False)
                lin(f"{b}.{attn}.to_v", kv_inner, ctx, bias=False)
                lin(f"{b}.{attn}.to_out.0", inner, inner, bias=False)
            lin(f"{b}.ff.net.0.proj", inner * 8, inner)
            lin(f"{b}.ff.net.2", inner, inner * 4)

        params = convert_stable_audio_dit(sd, cfg)

        m = StableAudioDiTModel(cfg)
        x = jnp.zeros((1, cfg.in_channels, 8))
        want = m.init(jax.random.key(0), x, jnp.zeros((1,)),
                      jnp.zeros((1, 3, cfg.cross_attention_input_dim)),
                      jnp.zeros((1, cfg.global_states_input_dim)))

        def shapes(tree):
            return {jax.tree_util.keystr(k): np.asarray(v).shape
                    for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

        assert shapes(params) == shapes(want)
        y = m.apply(params, x + 0.1, jnp.asarray([0.5]),
                    jnp.ones((1, 3, cfg.cross_attention_input_dim)),
                    jnp.ones((1, cfg.global_states_input_dim)))
        assert np.isfinite(np.asarray(y)).all()

    def test_oobleck_tree_matches_init(self, rng):
        from diffmusic_tpu.models.convert import convert_oobleck
        cfg = tiny_oobleck_config()
        sd = {}

        def conv(name, o, i, k, bias=True):
            sd[f"{name}.weight"] = rng.standard_normal((o, i, k)).astype(np.float32)
            if bias:
                sd[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

        def convt(name, i, o, k):
            sd[f"{name}.weight"] = rng.standard_normal((i, o, k)).astype(np.float32)
            sd[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

        def snake(name, c):
            sd[f"{name}.alpha"] = rng.standard_normal((1, c, 1)).astype(np.float32)
            sd[f"{name}.beta"] = rng.standard_normal((1, c, 1)).astype(np.float32)

        def res_unit(p, c):
            snake(f"{p}.snake1", c)
            conv(f"{p}.conv1", c, c, 7)
            snake(f"{p}.snake2", c)
            conv(f"{p}.conv2", c, c, 1)

        hs = cfg.encoder_hidden_size
        mults = (1,) + tuple(cfg.channel_multiples)
        conv("encoder.conv1", hs, cfg.audio_channels, 7)
        for i, stride in enumerate(cfg.downsampling_ratios):
            cin, cout = hs * mults[i], hs * mults[i + 1]
            for r in (1, 2, 3):
                res_unit(f"encoder.block.{i}.res_unit{r}", cin)
            snake(f"encoder.block.{i}.snake1", cin)
            conv(f"encoder.block.{i}.conv1", cout, cin, 2 * stride)
        snake("encoder.snake1", hs * mults[-1])
        conv("encoder.conv2", 2 * cfg.decoder_input_channels, hs * mults[-1], 3)

        dc = cfg.decoder_channels
        conv("decoder.conv1", dc * mults[-1], cfg.decoder_input_channels, 7)
        ratios = tuple(reversed(cfg.downsampling_ratios))
        n = len(ratios)
        for i, stride in enumerate(ratios):
            cin, cout = dc * mults[n - i], dc * mults[n - i - 1]
            snake(f"decoder.block.{i}.snake1", cin)
            convt(f"decoder.block.{i}.conv_t1", cin, cout, 2 * stride)
            for r in (1, 2, 3):
                res_unit(f"decoder.block.{i}.res_unit{r}", cout)
        snake("decoder.snake1", dc)
        conv("decoder.conv2", cfg.audio_channels, dc, 7, bias=False)

        params = convert_oobleck(sd, cfg)
        vae = AutoencoderOobleck(cfg)
        wav = jnp.zeros((1, cfg.audio_channels, cfg.hop_length * 4))
        want = vae.init(jax.random.key(0), wav)  # __call__ inits enc + dec

        def shapes(tree):
            return {jax.tree_util.keystr(k): np.asarray(v).shape
                    for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

        assert shapes(params) == shapes(want)
        mean, std = vae.apply(params, wav + 0.1,
                              method=AutoencoderOobleck.encode)
        assert np.isfinite(np.asarray(mean)).all()
