"""End-to-end from_pretrained smoke test: synthesize a tiny stable-audio-open
HF snapshot on disk (config.json + safetensors per module) and run a 2-step
generation through the loaded pipeline — guards the loader glue
(checkpoint.load_stable_audio: config parsing, file discovery, conversion)."""

import json

import jax
import numpy as np
import pytest

from diffmusic_tpu.models.configs import (tiny_oobleck_config,
                                          tiny_stable_audio_dit_config)

pytest.importorskip("safetensors")


def _save(d, name, sd, cfg_json):
    from safetensors.numpy import save_file
    mod = d / name
    mod.mkdir(parents=True)
    save_file({k: np.asarray(v, np.float32) for k, v in sd.items()},
              str(mod / "diffusion_pytorch_model.safetensors"))
    (mod / "config.json").write_text(json.dumps(cfg_json))


def _synth_t5_sd(rng, vocab, d_model, d_kv, d_ff, layers, heads):
    sd = {"shared.weight": rng.standard_normal((vocab, d_model)),
          "encoder.final_layer_norm.weight": rng.standard_normal((d_model,))}
    for i in range(layers):
        b = f"encoder.block.{i}"
        inner = heads * d_kv
        for nm in "qkv":
            sd[f"{b}.layer.0.SelfAttention.{nm}.weight"] = \
                rng.standard_normal((inner, d_model))
        sd[f"{b}.layer.0.SelfAttention.o.weight"] = \
            rng.standard_normal((d_model, inner))
        if i == 0:
            sd[f"{b}.layer.0.SelfAttention.relative_attention_bias.weight"] = \
                rng.standard_normal((32, heads))
        sd[f"{b}.layer.0.layer_norm.weight"] = rng.standard_normal((d_model,))
        sd[f"{b}.layer.1.layer_norm.weight"] = rng.standard_normal((d_model,))
        sd[f"{b}.layer.1.DenseReluDense.wi_0.weight"] = \
            rng.standard_normal((d_ff, d_model))
        sd[f"{b}.layer.1.DenseReluDense.wi_1.weight"] = \
            rng.standard_normal((d_ff, d_model))
        sd[f"{b}.layer.1.DenseReluDense.wo.weight"] = \
            rng.standard_normal((d_model, d_ff))
    return sd


class TestStableAudioLoader:
    def test_from_pretrained_and_generate(self, tmp_path, rng):
        dit_cfg = tiny_stable_audio_dit_config()
        vae_cfg = tiny_oobleck_config()
        dit_sd = {}
        oob_sd = {}

        # --- DiT state dict (diffusers key grammar) ---
        inner = dit_cfg.inner_dim
        kv_inner = dit_cfg.num_key_value_attention_heads * dit_cfg.attention_head_dim

        def lin(sd, name, o, i, bias=True):
            sd[f"{name}.weight"] = rng.standard_normal((o, i))
            if bias:
                sd[f"{name}.bias"] = rng.standard_normal((o,))

        dit_sd["time_proj.weight"] = rng.standard_normal(
            (dit_cfg.time_proj_dim // 2,))
        lin(dit_sd, "timestep_proj.0", inner, dit_cfg.time_proj_dim)
        lin(dit_sd, "timestep_proj.2", inner, inner)
        lin(dit_sd, "global_proj.0", inner, dit_cfg.global_states_input_dim,
            bias=False)
        lin(dit_sd, "global_proj.2", inner, inner, bias=False)
        lin(dit_sd, "cross_attention_proj.0", dit_cfg.cross_attention_dim,
            dit_cfg.cross_attention_input_dim, bias=False)
        lin(dit_sd, "cross_attention_proj.2", dit_cfg.cross_attention_dim,
            dit_cfg.cross_attention_dim, bias=False)
        dit_sd["preprocess_conv.weight"] = rng.standard_normal(
            (dit_cfg.in_channels, dit_cfg.in_channels, 1))
        lin(dit_sd, "proj_in", inner, dit_cfg.in_channels, bias=False)
        lin(dit_sd, "proj_out", dit_cfg.out_channels, inner, bias=False)
        dit_sd["postprocess_conv.weight"] = rng.standard_normal(
            (dit_cfg.out_channels, dit_cfg.out_channels, 1))
        for i in range(dit_cfg.num_layers):
            b = f"transformer_blocks.{i}"
            for nm in ("norm1", "norm2", "norm3"):
                dit_sd[f"{b}.{nm}.weight"] = rng.standard_normal((inner,))
                dit_sd[f"{b}.{nm}.bias"] = rng.standard_normal((inner,))
            for attn, ctx in (("attn1", inner),
                              ("attn2", dit_cfg.cross_attention_dim)):
                lin(dit_sd, f"{b}.{attn}.to_q", inner, inner, bias=False)
                lin(dit_sd, f"{b}.{attn}.to_k", kv_inner, ctx, bias=False)
                lin(dit_sd, f"{b}.{attn}.to_v", kv_inner, ctx, bias=False)
                lin(dit_sd, f"{b}.{attn}.to_out.0", inner, inner, bias=False)
            lin(dit_sd, f"{b}.ff.net.0.proj", inner * 8, inner)
            lin(dit_sd, f"{b}.ff.net.2", inner, inner * 4)

        # --- Oobleck state dict ---
        def conv(sd, name, o, i, k, bias=True):
            sd[f"{name}.weight"] = rng.standard_normal((o, i, k)) * 0.1
            if bias:
                sd[f"{name}.bias"] = rng.standard_normal((o,)) * 0.1

        def snake(sd, name, c):
            sd[f"{name}.alpha"] = rng.standard_normal((1, c, 1)) * 0.1
            sd[f"{name}.beta"] = rng.standard_normal((1, c, 1)) * 0.1

        def res_unit(sd, p, c):
            snake(sd, f"{p}.snake1", c)
            conv(sd, f"{p}.conv1", c, c, 7)
            snake(sd, f"{p}.snake2", c)
            conv(sd, f"{p}.conv2", c, c, 1)

        hs, mults = vae_cfg.encoder_hidden_size, (1,) + tuple(
            vae_cfg.channel_multiples)
        conv(oob_sd, "encoder.conv1", hs, vae_cfg.audio_channels, 7)
        for i, stride in enumerate(vae_cfg.downsampling_ratios):
            cin, cout = hs * mults[i], hs * mults[i + 1]
            for r in (1, 2, 3):
                res_unit(oob_sd, f"encoder.block.{i}.res_unit{r}", cin)
            snake(oob_sd, f"encoder.block.{i}.snake1", cin)
            conv(oob_sd, f"encoder.block.{i}.conv1", cout, cin, 2 * stride)
        snake(oob_sd, "encoder.snake1", hs * mults[-1])
        conv(oob_sd, "encoder.conv2", 2 * vae_cfg.decoder_input_channels,
             hs * mults[-1], 3)
        dc = vae_cfg.decoder_channels
        conv(oob_sd, "decoder.conv1", dc * mults[-1],
             vae_cfg.decoder_input_channels, 7)
        ratios = tuple(reversed(vae_cfg.downsampling_ratios))
        n = len(ratios)
        for i, stride in enumerate(ratios):
            cin, cout = dc * mults[n - i], dc * mults[n - i - 1]
            snake(oob_sd, f"decoder.block.{i}.snake1", cin)
            oob_sd[f"decoder.block.{i}.conv_t1.weight"] = \
                rng.standard_normal((cin, cout, 2 * stride)) * 0.1
            oob_sd[f"decoder.block.{i}.conv_t1.bias"] = \
                rng.standard_normal((cout,)) * 0.1
            for r in (1, 2, 3):
                res_unit(oob_sd, f"decoder.block.{i}.res_unit{r}", cout)
        snake(oob_sd, "decoder.snake1", dc)
        conv(oob_sd, "decoder.conv2", vae_cfg.audio_channels, dc, 7, bias=False)

        # --- projection state dict ---
        proj_sd = {
            "text_projection.weight": rng.standard_normal((16, 32)),
            "text_projection.bias": rng.standard_normal((16,)),
        }
        for nm in ("start_number_conditioner", "end_number_conditioner"):
            proj_sd[f"{nm}.time_positional_embedding.0.weights"] = \
                rng.standard_normal((8,))
            proj_sd[f"{nm}.time_positional_embedding.1.weight"] = \
                rng.standard_normal((16, 17))
            proj_sd[f"{nm}.time_positional_embedding.1.bias"] = \
                rng.standard_normal((16,))

        t5_sd = _synth_t5_sd(rng, vocab=64, d_model=32, d_kv=8, d_ff=64,
                             layers=2, heads=4)

        d = tmp_path / "snapshot"
        _save(d, "transformer", dit_sd, {
            "sample_size": dit_cfg.sample_size, "in_channels": dit_cfg.in_channels,
            "num_layers": dit_cfg.num_layers,
            "attention_head_dim": dit_cfg.attention_head_dim,
            "num_attention_heads": dit_cfg.num_attention_heads,
            "num_key_value_attention_heads": dit_cfg.num_key_value_attention_heads,
            "out_channels": dit_cfg.out_channels,
            "cross_attention_dim": dit_cfg.cross_attention_dim,
            "time_proj_dim": dit_cfg.time_proj_dim,
            "global_states_input_dim": dit_cfg.global_states_input_dim,
            "cross_attention_input_dim": dit_cfg.cross_attention_input_dim})
        _save(d, "vae", oob_sd, {
            "encoder_hidden_size": vae_cfg.encoder_hidden_size,
            "downsampling_ratios": list(vae_cfg.downsampling_ratios),
            "channel_multiples": list(vae_cfg.channel_multiples),
            "decoder_channels": vae_cfg.decoder_channels,
            "decoder_input_channels": vae_cfg.decoder_input_channels,
            "audio_channels": vae_cfg.audio_channels,
            "sampling_rate": vae_cfg.sampling_rate})
        _save(d, "text_encoder", t5_sd, {
            "vocab_size": 64, "d_model": 32, "d_kv": 8, "d_ff": 64,
            "num_layers": 2, "num_heads": 4,
            "feed_forward_proj": "gated-gelu"})
        _save(d, "projection_model", proj_sd, {
            "text_encoder_dim": 32, "conditioning_dim": 16,
            "min_value": 0, "max_value": 64})

        from diffmusic_tpu.pipelines import get_pipeline
        pipe = get_pipeline("stable_audio").from_pretrained(str(d))

        def tok(texts, maxlen=8):
            ids = np.zeros((len(texts), maxlen), np.int32)
            mask = np.zeros((len(texts), maxlen), np.int32)
            for i, t in enumerate(texts):
                b = [2 + (c % 60) for c in t.encode()][:maxlen]
                ids[i, :len(b)] = b
                mask[i, :len(b)] = 1
            return ids, mask

        pipe.tokenizer = tok
        hop, sr = pipe.vae_cfg.hop_length, pipe.vae_cfg.sampling_rate
        out = pipe(prompt="test", audio_end_in_s=8 * hop / sr,
                   num_inference_steps=2, guidance_scale=2.0,
                   key=jax.random.key(0))
        assert out.audios.shape[0] == 1
        assert np.isfinite(out.audios).all()
