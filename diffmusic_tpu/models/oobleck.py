"""AutoencoderOobleck: the stable-audio-open waveform VAE, in flax.

Structural equivalent of the diffusers `AutoencoderOobleck` the reference's
dormant StableAudio pipeline loads (reference pipeline_stable_audio.py:25-27,
110-129). TPU re-design notes: all 1-D convs run channels-last (B, T, C) so XLA
maps them onto the MXU as implicit GEMMs; the snake activation is expressed in
fp32 for stability (sin^2 underflows in bf16 for small alpha); there is no
data-dependent control flow, so encode/decode jit and differentiate cleanly —
the decoder sits inside guidance-gradient chains just like the mel VAE decoder
(SURVEY.md section 3.3).

Layout convention: public encode/decode take/return (B, C, T) like diffusers so
weight-converted checkpoints keep their semantics; internally everything is
(B, T, C).
"""

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import OobleckConfig


class Snake1d(nn.Module):
    """Snake activation x + (1/beta) sin^2(alpha x) with learned log-scale
    per-channel alpha/beta (diffusers Snake1d, logscale=True)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.zeros, (1, 1, self.hidden_dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.hidden_dim))
        a = jnp.exp(alpha.astype(jnp.float32))
        b = jnp.exp(beta.astype(jnp.float32))
        xf = x.astype(jnp.float32)
        y = xf + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(a * xf))
        return y.astype(x.dtype)


class OobleckResidualUnit(nn.Module):
    """snake -> dilated conv(k=7) -> snake -> conv(k=1), residual."""

    dimension: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = ((7 - 1) * self.dilation) // 2
        h = Snake1d(self.dimension, name="snake1")(x)
        h = nn.Conv(self.dimension, (7,), kernel_dilation=(self.dilation,),
                    padding=pad, name="conv1")(h)
        h = Snake1d(self.dimension, name="snake2")(h)
        h = nn.Conv(self.dimension, (1,), name="conv2")(h)
        return x + h


class OobleckEncoderBlock(nn.Module):
    """3 residual units (dilations 1/3/9) then a strided downsampling conv."""

    input_dim: int
    output_dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = OobleckResidualUnit(self.input_dim, 1, name="res_unit1")(x)
        x = OobleckResidualUnit(self.input_dim, 3, name="res_unit2")(x)
        x = OobleckResidualUnit(self.input_dim, 9, name="res_unit3")(x)
        x = Snake1d(self.input_dim, name="snake1")(x)
        pad = math.ceil(self.stride / 2)
        return nn.Conv(self.output_dim, (2 * self.stride,),
                       strides=(self.stride,), padding=pad, name="conv1")(x)


class OobleckDecoderBlock(nn.Module):
    """Transposed-conv upsample then 3 residual units (dilations 1/3/9)."""

    input_dim: int
    output_dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = Snake1d(self.input_dim, name="snake1")(x)
        # torch ConvTranspose1d(k=2s, stride=s, padding=P=ceil(s/2)); flax
        # explicit (lo, hi) padding needs lo = hi = k - 1 - P (see hifigan.py)
        k = 2 * self.stride
        pad = k - 1 - math.ceil(self.stride / 2)
        y = nn.ConvTranspose(self.output_dim, (k,), strides=(self.stride,),
                             padding=[(pad, pad)], transpose_kernel=True,
                             name="conv_t1")(x)
        y = OobleckResidualUnit(self.output_dim, 1, name="res_unit1")(y)
        y = OobleckResidualUnit(self.output_dim, 3, name="res_unit2")(y)
        y = OobleckResidualUnit(self.output_dim, 9, name="res_unit3")(y)
        return y


class OobleckEncoder(nn.Module):
    cfg: OobleckConfig

    @nn.compact
    def __call__(self, x):  # (B, T, audio_channels) -> (B, T/hop, 2*latent)
        cfg = self.cfg
        mults = (1,) + tuple(cfg.channel_multiples)
        h = nn.Conv(cfg.encoder_hidden_size, (7,), padding=3, name="conv1")(x)
        for i, stride in enumerate(cfg.downsampling_ratios):
            h = OobleckEncoderBlock(
                input_dim=cfg.encoder_hidden_size * mults[i],
                output_dim=cfg.encoder_hidden_size * mults[i + 1],
                stride=stride, name=f"block_{i}")(h)
        h = Snake1d(cfg.encoder_hidden_size * mults[-1], name="snake1")(h)
        return nn.Conv(2 * cfg.decoder_input_channels, (3,), padding=1,
                       name="conv2")(h)


class OobleckDecoder(nn.Module):
    cfg: OobleckConfig

    @nn.compact
    def __call__(self, z):  # (B, T/hop, latent) -> (B, T, audio_channels)
        cfg = self.cfg
        mults = (1,) + tuple(cfg.channel_multiples)
        h = nn.Conv(cfg.decoder_channels * mults[-1], (7,), padding=3,
                    name="conv1")(z)
        ratios = tuple(reversed(cfg.downsampling_ratios))
        n = len(ratios)
        for i, stride in enumerate(ratios):
            h = OobleckDecoderBlock(
                input_dim=cfg.decoder_channels * mults[n - i],
                output_dim=cfg.decoder_channels * mults[n - i - 1],
                stride=stride, name=f"block_{i}")(h)
        h = Snake1d(cfg.decoder_channels, name="snake1")(h)
        return nn.Conv(cfg.audio_channels, (7,), padding=3, use_bias=False,
                       name="conv2")(h)


class AutoencoderOobleck(nn.Module):
    """encode: waveform -> (mean, std) of the diagonal-Gaussian latent
    (std = softplus(scale) + 1e-4, diffusers OobleckDiagonalGaussianDistribution);
    decode: latent -> waveform. Public layout (B, C, T)."""

    cfg: OobleckConfig

    def setup(self):
        self.encoder = OobleckEncoder(self.cfg)
        self.decoder = OobleckDecoder(self.cfg)

    def encode(self, waveform) -> Tuple[jax.Array, jax.Array]:
        h = self.encoder(jnp.swapaxes(waveform, 1, 2))
        mean, scale = jnp.split(h, 2, axis=-1)
        std = jax.nn.softplus(scale) + 1e-4
        return jnp.swapaxes(mean, 1, 2), jnp.swapaxes(std, 1, 2)

    def decode(self, latents) -> jax.Array:
        audio = self.decoder(jnp.swapaxes(latents, 1, 2))
        return jnp.swapaxes(audio, 1, 2)

    def __call__(self, waveform, key=None):
        mean, std = self.encode(waveform)
        z = mean if key is None else mean + std * jax.random.normal(
            key, mean.shape, mean.dtype)
        return self.decode(z), mean, std
