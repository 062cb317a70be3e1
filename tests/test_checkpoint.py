"""Checkpoint conversion: diffusers-named state dicts -> flax param trees.

diffusers is not installed here, so the test synthesizes a state dict with the
exact diffusers UNet/VAE key naming and verifies the converted tree matches the
flax init tree key-for-key and shape-for-shape (layout transposition included).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmusic_tpu.models.checkpoint import (convert_unet, convert_vae,
                                             unet_config_from_json,
                                             vae_config_from_json,
                                             hifigan_config_from_json)
from diffmusic_tpu.models.configs import tiny_unet_config, tiny_vae_config
from diffmusic_tpu.models.unet import UNet2DConditionModel
from diffmusic_tpu.models.vae import AutoencoderKL

pytestmark = pytest.mark.slow  # measured >45 s/module on the CPU mesh (r5)


def _tree_shapes(tree):
    return {jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _synth_diffusers_unet_sd(cfg, rng):
    """Build a diffusers-named random state dict for the given UNetConfig."""
    sd = {}

    def conv(name, o, i, k=3):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def lin(name, o, i, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = rng.standard_normal((c,)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal((c,)).astype(np.float32)

    def resnet(p, cin, cout, temb):
        norm(f"{p}.norm1", cin)
        conv(f"{p}.conv1", cout, cin)
        lin(f"{p}.time_emb_proj", cout, temb)
        norm(f"{p}.norm2", cout)
        conv(f"{p}.conv2", cout, cout)
        if cin != cout:
            conv(f"{p}.conv_shortcut", cout, cin, k=1)

    def attn_mod(p, dim, ctx=None):
        sd[f"{p}.to_q.weight"] = rng.standard_normal((dim, dim)).astype(np.float32)
        c = ctx if ctx is not None else dim
        sd[f"{p}.to_k.weight"] = rng.standard_normal((dim, c)).astype(np.float32)
        sd[f"{p}.to_v.weight"] = rng.standard_normal((dim, c)).astype(np.float32)
        lin(f"{p}.to_out.0", dim, dim)

    def transformer(p, c):
        inner = c  # heads * head_dim == channels in these configs
        norm(f"{p}.norm", c)
        conv(f"{p}.proj_in", inner, c, k=1)
        conv(f"{p}.proj_out", c, inner, k=1)
        b = f"{p}.transformer_blocks.0"
        norm(f"{b}.norm1", inner)
        attn_mod(f"{b}.attn1", inner)
        for i, cd in enumerate(cfg.cross_attention_dims):
            sfx = "" if i == 0 else f"_{i}"
            norm(f"{b}.norm2{sfx}", inner)
            attn_mod(f"{b}.attn2{sfx}", inner, ctx=cd)
        norm(f"{b}.norm3", inner)
        lin(f"{b}.ff.net.0.proj", inner * 8, inner)
        lin(f"{b}.ff.net.2", inner, inner * 4)

    blocks = cfg.block_out_channels
    temb = cfg.time_embed_dim
    temb_eff = temb * 2 if cfg.class_embeddings_concat else temb

    conv("conv_in", blocks[0], cfg.in_channels)
    lin("time_embedding.linear_1", temb, blocks[0])
    lin("time_embedding.linear_2", temb, temb)
    if cfg.class_embed_type == "simple_projection":
        lin("class_embedding", temb,
            cfg.projection_class_embeddings_input_dim)

    ch = blocks[0]
    for i, cout in enumerate(blocks):
        for j in range(cfg.layers_per_block):
            resnet(f"down_blocks.{i}.resnets.{j}", ch if j == 0 else cout, cout,
                   temb_eff)
            if cfg.has_attention[i]:
                transformer(f"down_blocks.{i}.attentions.{j}", cout)
        if i != len(blocks) - 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv", cout, cout)
        ch = cout

    resnet("mid_block.resnets.0", blocks[-1], blocks[-1], temb_eff)
    transformer("mid_block.attentions.0", blocks[-1])
    resnet("mid_block.resnets.1", blocks[-1], blocks[-1], temb_eff)

    # up path skip-channel bookkeeping mirrors the model: skips stack holds
    # conv_in output + every down-block output
    skips = [blocks[0]]
    for i, cout in enumerate(blocks):
        skips += [cout] * cfg.layers_per_block
        if i != len(blocks) - 1:
            skips.append(cout)
    x_ch = blocks[-1]
    for i, cout in enumerate(reversed(blocks)):
        rev_i = len(blocks) - 1 - i
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            resnet(f"up_blocks.{i}.resnets.{j}", x_ch + skip, cout, temb_eff)
            x_ch = cout
            if cfg.has_attention[rev_i]:
                transformer(f"up_blocks.{i}.attentions.{j}", cout)
        if i != len(blocks) - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv", cout, cout)

    norm("conv_norm_out", blocks[0])
    conv("conv_out", cfg.out_channels, blocks[0])
    return sd


class TestUNetConversion:
    @pytest.mark.parametrize("cross", [(), (24, 40)])
    def test_tree_matches_init(self, rng, cross):
        cfg = tiny_unet_config(cross_attention_dims=cross)
        sd = _synth_diffusers_unet_sd(cfg, rng)
        params = convert_unet(sd, cfg)

        m = UNet2DConditionModel(cfg)
        x = jnp.zeros((1, 8, 16, 16))
        kwargs = ({"class_labels": jnp.zeros((1, 32))} if not cross else
                  {"encoder_hidden_states": jnp.zeros((1, 8, 24)),
                   "encoder_hidden_states_1": jnp.zeros((1, 5, 40))})
        want = m.init(jax.random.key(0), x, jnp.asarray([0]), **kwargs)
        assert _tree_shapes(params) == _tree_shapes(want)

        # converted params must actually run
        y = m.apply(params, x + 0.1, jnp.asarray([10]), **kwargs)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()


class TestConfigParsing:
    def test_unet_config_from_json_musicldm_style(self):
        c = {"sample_size": 128, "in_channels": 8, "out_channels": 8,
             "block_out_channels": [128, 256, 384, 640], "layers_per_block": 2,
             "attention_head_dim": 8, "cross_attention_dim": None,
             "class_embed_type": "simple_projection",
             "projection_class_embeddings_input_dim": 512,
             "class_embeddings_concat": True,
             "down_block_types": ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"]}
        cfg = unet_config_from_json(c)
        assert cfg.cross_attention_dims == ()
        assert cfg.has_attention == (True, True, True, False)
        assert cfg.class_embeddings_concat

    def test_unet_config_from_json_audioldm2_style(self):
        c = {"block_out_channels": [128, 256], "cross_attention_dim": [768, 1024],
             "attention_head_dim": [8, 8]}
        cfg = unet_config_from_json(c)
        assert cfg.cross_attention_dims == (768, 1024)

    def test_vae_and_vocoder_config_parsing(self):
        v = vae_config_from_json({"block_out_channels": [128, 256, 512],
                                  "latent_channels": 8,
                                  "scaling_factor": 0.9227})
        assert v.scale_factor == 4 and v.scaling_factor == 0.9227
        h = hifigan_config_from_json({"upsample_rates": [5, 4, 2, 2, 2],
                                      "model_in_dim": 64})
        assert h.hop_length == 160
