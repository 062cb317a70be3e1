"""Conditional 2-D UNet for latent audio diffusion (flax).

Covers both model families the reference drives (SURVEY.md section 2):
- MusicLDM: self-attention-only transformer blocks; CLAP 512-d pooled text
  embedding enters as a *class embedding* concatenated with the time embedding
  (reference pipeline_musicldm.py:696-703 passes class_labels, not cross-attn).
- AudioLDM2: dual cross-attention streams — GPT-2 generated hidden states and
  T5/projection sequence (reference plpeline_audioldm2.py:1147-1154).

TPU design: NHWC layout, static shapes, `jax.nn.dot_product_attention` for fused
attention; the caller jits the whole denoise scan so XLA fuses resnets/attention
into large MXU-bound programs.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import UNetConfig
from .layers import (
    Attention, BasicTransformerBlock, Conv2DSame, Downsample2D, ResnetBlock2D,
    TimestepEmbedding, Transformer2DModel, Upsample2D, timestep_embedding,
)


class DownBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    attention: bool
    add_downsample: bool

    @nn.compact
    def __call__(self, x, temb, contexts, context_masks):
        skips = []
        for i in range(self.cfg.layers_per_block):
            x = ResnetBlock2D(self.out_channels, groups=self.cfg.norm_num_groups,
                              name=f"resnet_{i}")(x, temb)
            if self.attention:
                heads = self.out_channels // self.cfg.attention_head_dim
                x = Transformer2DModel(
                    heads=heads, head_dim=self.cfg.attention_head_dim,
                    cross_dims=self.cfg.cross_attention_dims,
                    groups=self.cfg.norm_num_groups,
                    name=f"attn_{i}")(x, contexts, context_masks)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsample")(x)
            skips.append(x)
        return x, skips


class UpBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    attention: bool
    add_upsample: bool
    num_layers: int

    @nn.compact
    def __call__(self, x, skips, temb, contexts, context_masks):
        for i in range(self.num_layers):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock2D(self.out_channels, groups=self.cfg.norm_num_groups,
                              name=f"resnet_{i}")(x, temb)
            if self.attention:
                heads = self.out_channels // self.cfg.attention_head_dim
                x = Transformer2DModel(
                    heads=heads, head_dim=self.cfg.attention_head_dim,
                    cross_dims=self.cfg.cross_attention_dims,
                    groups=self.cfg.norm_num_groups,
                    name=f"attn_{i}")(x, contexts, context_masks)
        if self.add_upsample:
            # match the next skip's spatial size (odd sizes ceil-divide on the
            # way down, so a plain 2x would overshoot)
            out_hw = skips[-1].shape[1:3] if skips else None
            x = Upsample2D(self.out_channels, name="upsample")(x, out_hw)
        return x


class MidBlock(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, temb, contexts, context_masks):
        ch = x.shape[-1]
        x = ResnetBlock2D(ch, groups=self.cfg.norm_num_groups,
                          name="resnet_0")(x, temb)
        heads = ch // self.cfg.attention_head_dim
        x = Transformer2DModel(heads=heads, head_dim=self.cfg.attention_head_dim,
                               cross_dims=self.cfg.cross_attention_dims,
                               groups=self.cfg.norm_num_groups,
                               name="attn")(x, contexts, context_masks)
        x = ResnetBlock2D(ch, groups=self.cfg.norm_num_groups,
                          name="resnet_1")(x, temb)
        return x


class UNet2DConditionModel(nn.Module):
    """NCHW in/out at the API boundary (parity with the torch reference); NHWC inside."""
    cfg: UNetConfig

    @nn.compact
    def __call__(self, sample: jax.Array, timesteps: jax.Array,
                 encoder_hidden_states: Optional[jax.Array] = None,
                 encoder_hidden_states_1: Optional[jax.Array] = None,
                 encoder_attention_mask: Optional[jax.Array] = None,
                 encoder_attention_mask_1: Optional[jax.Array] = None,
                 class_labels: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.cfg
        x = jnp.transpose(sample, (0, 2, 3, 1))  # NCHW -> NHWC

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))

        # --- time + class embedding ---
        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        emb = TimestepEmbedding(cfg.time_embed_dim, name="time_embedding")(
            t_emb.astype(x.dtype))
        if cfg.class_embed_type == "simple_projection" and class_labels is not None:
            class_emb = nn.Dense(cfg.time_embed_dim, name="class_embedding")(
                class_labels.astype(x.dtype))
            if cfg.class_embeddings_concat:
                emb = jnp.concatenate([emb, class_emb], axis=-1)
            else:
                emb = emb + class_emb

        contexts = []
        if len(cfg.cross_attention_dims) >= 1:
            contexts.append(encoder_hidden_states)
        if len(cfg.cross_attention_dims) >= 2:
            contexts.append(encoder_hidden_states_1)
        context_masks = (encoder_attention_mask, encoder_attention_mask_1)

        # --- down path ---
        x = Conv2DSame(cfg.block_out_channels[0], name="conv_in")(x)
        skips = [x]
        for i, ch in enumerate(cfg.block_out_channels):
            is_last = i == len(cfg.block_out_channels) - 1
            x, s = DownBlock(cfg, ch, attention=cfg.has_attention[i],
                             add_downsample=not is_last,
                             name=f"down_{i}")(x, emb, contexts, context_masks)
            skips.extend(s)

        # --- mid ---
        x = MidBlock(cfg, name="mid")(x, emb, contexts, context_masks)

        # --- up path ---
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            rev_i = len(cfg.block_out_channels) - 1 - i
            is_last = i == len(cfg.block_out_channels) - 1
            x = UpBlock(cfg, ch, attention=cfg.has_attention[rev_i],
                        add_upsample=not is_last,
                        num_layers=cfg.layers_per_block + 1,
                        name=f"up_{i}")(x, skips, emb, contexts, context_masks)

        assert not skips
        from .layers import FusedGroupNorm
        x = FusedGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                           use_silu=True, name="conv_norm_out")(x)
        x = Conv2DSame(cfg.out_channels, name="conv_out")(x)
        return jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW
