"""AutoencoderKL (mel-spectrogram VAE) in flax.

Structure follows the diffusers AutoencoderKL the reference loads from the hub
(SURVEY.md L0; decode path is in every guidance step, scheduling_dps.py:195-197).
The decoder is the part on the guidance gradient path, so it is kept lean: NHWC,
grouped norms, no attention mid-block variants beyond the standard single
self-attention.
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import VAEConfig
from .layers import (Attention, Conv2DSame, Downsample2D, FusedGroupNorm,
                     ResnetBlock2D, Upsample2D)


class VAEAttentionBlock(nn.Module):
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        import os
        b, h, w, c = x.shape
        y = FusedGroupNorm(num_groups=self.groups, epsilon=1e-6,
                           name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        # default "xla": the mid-block is a single tiny (one per decode)
        # attention, and the round-4 copies-mode trace attributed the two
        # slowest tail ops — VAE GroupNorm convert_reduce fusions at
        # 0.78 ms/step each, ~15 GB/s — to serialization against the adjacent
        # flash-attention custom call. Routing just this block to plain XLA
        # removes the custom-call adjacency (A/B: DIFFMUSIC_TPU_VAE_MID_ATTN
        # =flash restores the kernel; measurement in docs/PERF_NOTES.md r5).
        kernel = os.environ.get("DIFFMUSIC_TPU_VAE_MID_ATTN", "xla")
        y = Attention(heads=1, head_dim=c, name="attention",
                      kernel="xla" if kernel == "xla" else "auto")(y)
        return x + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups,
                                  name=f"down_{i}_resnet_{j}")(x, None)
            if i != len(cfg.block_out_channels) - 1:
                x = Downsample2D(ch, name=f"down_{i}_downsample")(x)
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, name="mid_resnet_0")(x, None)
        x = VAEAttentionBlock(groups=cfg.norm_num_groups, name="mid_attn")(x)
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, name="mid_resnet_1")(x, None)
        x = FusedGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                           use_silu=True, name="conv_norm_out")(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, name="conv_out")(x)
        x = nn.Conv(2 * cfg.latent_channels, (1, 1), name="quant_conv")(x)
        return x  # (B, H/s, W/s, 2*latent): mean || logvar


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        z = nn.Conv(cfg.latent_channels, (1, 1), name="post_quant_conv")(z)
        x = Conv2DSame(cfg.block_out_channels[-1], name="conv_in")(z)
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, name="mid_resnet_0")(x, None)
        x = VAEAttentionBlock(groups=cfg.norm_num_groups, name="mid_attn")(x)
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, name="mid_resnet_1")(x, None)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups,
                                  name=f"up_{i}_resnet_{j}")(x, None)
            if i != len(cfg.block_out_channels) - 1:
                x = Upsample2D(ch, name=f"up_{i}_upsample")(x)
        x = FusedGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                           use_silu=True, name="conv_norm_out")(x)
        x = Conv2DSame(cfg.out_channels, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    """API boundary is NCHW like the torch reference; NHWC internally."""
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")

    def encode(self, x: jax.Array, key=None) -> jax.Array:
        """(B, C, H, W) mel -> latent sample or mean (B, latent, H/s, W/s)."""
        h = self.encoder(jnp.transpose(x, (0, 2, 3, 1)))
        mean, logvar = jnp.split(h, 2, axis=-1)
        if key is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, mean.dtype)
        return jnp.transpose(mean, (0, 3, 1, 2))

    def decode(self, z: jax.Array) -> jax.Array:
        """(B, latent, h, w) -> (B, C, H, W) mel.

        On TPU the decoder runs in the spatially swapped (B, W, H, C)
        orientation: every decoder conv geometry measures as fast or faster
        transposed (layers.spatial_swap) and the entry/exit NCHW transposes
        simply use a different permutation — no extra copies anywhere."""
        from .layers import spatial_swap, vae_swap_on
        from ..pallas.attention_kernel import _on_tpu
        if vae_swap_on() and _on_tpu():
            with spatial_swap(True):
                x = self.decoder(jnp.transpose(z, (0, 3, 2, 1)))
            return jnp.transpose(x, (0, 3, 2, 1))
        x = self.decoder(jnp.transpose(z, (0, 2, 3, 1)))
        return jnp.transpose(x, (0, 3, 1, 2))

    def __call__(self, x, key=None):
        return self.decode(self.encode(x, key))
