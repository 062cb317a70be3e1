"""COMPOSED end-to-end torch parity (VERDICT r4 item 4).

Per-module parity (test_torch_parity_unet_vae.py) pins each block; this pins
the one remaining seam — the composition: timestep indexing, CFG concat order,
scaling-factor placement, and guidance algebra — by running an entire tiny
denoise LOOP + VAE decode + vocoder through

  (a) a torch loop built from tests/torch_ref_diffusers.py + transformers'
      SpeechT5HifiGan, with the DDIM/DPS algebra written directly from the
      reference formulas (scheduling_ddim.py:58-104, scheduling_dps.py:137-219,
      plpeline_audioldm2.py:1141-1218), and
  (b) the PRODUCTION MusicLDMPipeline.__call__ (scan-compiled, same injected
      initial latents, eta=0 so no sampling noise enters).

and asserting the decoded mel spectrograms agree within the BASELINE.md
north-star bar of 1e-2 (and waveforms likewise).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffmusic_tpu.inverse_problem import MusicInpaintingOperator
from diffmusic_tpu.models import checkpoint as ckpt
from diffmusic_tpu.models.configs import (tiny_clap_text_config,
                                          tiny_hifigan_config,
                                          tiny_unet_config, tiny_vae_config)
from diffmusic_tpu.models.clap import ClapTextModelWithProjection
from diffmusic_tpu.pipelines import MusicLDMPipeline

import torch_ref_diffusers as tr

pytestmark = pytest.mark.slow  # scan-compiling / multi-minute: excluded from the fast tier

AUDIO_S = 0.4
N_STEPS = 5
GUIDANCE = 2.0


@pytest.fixture(scope="module")
def stack():
    """Matched torch/flax model stacks through the PRODUCTION converters."""
    torch.manual_seed(0)
    unet_cfg = tiny_unet_config()
    vae_cfg = tiny_vae_config()
    voc_cfg = tiny_hifigan_config()

    tunet = tr.TorchUNet(unet_cfg).eval()
    tvae = tr.TorchVAE(vae_cfg).eval()
    from transformers import SpeechT5HifiGan as TorchHifi, SpeechT5HifiGanConfig
    thifi = TorchHifi(SpeechT5HifiGanConfig(
        model_in_dim=voc_cfg.model_in_dim, sampling_rate=voc_cfg.sampling_rate,
        upsample_initial_channel=voc_cfg.upsample_initial_channel,
        upsample_rates=list(voc_cfg.upsample_rates),
        upsample_kernel_sizes=list(voc_cfg.upsample_kernel_sizes),
        resblock_kernel_sizes=list(voc_cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in
                                 voc_cfg.resblock_dilation_sizes],
        normalize_before=False)).eval()

    from diffmusic_tpu.models import convert
    unet_params = ckpt.convert_unet(tr.flat_state_dict(tunet), unet_cfg)
    vae_params = ckpt.convert_vae(tr.flat_state_dict(tvae), vae_cfg)
    voc_params = convert.convert_hifigan(thifi.state_dict(), voc_cfg)

    txt_cfg = tiny_clap_text_config()
    txt_params = ClapTextModelWithProjection(txt_cfg).init(
        jax.random.key(9), jnp.zeros((1, 8), jnp.int32))

    def make_pipe(scheduler_name, operator=None):
        return MusicLDMPipeline(
            unet_cfg=unet_cfg, vae_cfg=vae_cfg, vocoder_cfg=voc_cfg,
            text_cfg=txt_cfg, unet_params=unet_params, vae_params=vae_params,
            vocoder_params=voc_params, text_params=txt_params,
            scheduler_name=scheduler_name, operator=operator)

    rng = np.random.default_rng(0)
    cls_dim = unet_cfg.projection_class_embeddings_input_dim
    # DISTINCT uncond/cond halves so the degenerate-CFG skip does NOT fire —
    # this test exercises the doubled-batch CFG composition
    pe = rng.standard_normal((2, cls_dim)).astype(np.float32)
    lat0 = rng.standard_normal(
        (1, unet_cfg.in_channels, 40 // vae_cfg.scale_factor,
         voc_cfg.model_in_dim // vae_cfg.scale_factor)).astype(np.float32)
    return dict(unet_cfg=unet_cfg, vae_cfg=vae_cfg, voc_cfg=voc_cfg,
                tunet=tunet, tvae=tvae, thifi=thifi, make_pipe=make_pipe,
                pe=pe, lat0=lat0)


def _torch_eps(stack, x_np, t):
    """CFG-combined eps exactly as the pipeline composes it
    (pipelines/musicldm.py::_eps_fn: concat [x, x], halves [uncond, cond])."""
    pe = torch.from_numpy(stack["pe"])
    x = torch.from_numpy(np.concatenate([x_np, x_np], axis=0))
    ts = torch.tensor([t, t], dtype=torch.int64)
    eps = stack["tunet"](x, ts, class_labels=pe)
    uncond, cond = eps[:1], eps[1:]
    return uncond + GUIDANCE * (cond - uncond)


def _ddim_prev(schedule, t, sample, eps, x0):
    """prev = sqrt(a_prev) x0 + sqrt(1-a_prev) eps_rec (eta=0), numpy, from
    the reference algebra (scheduling_ddim.py:58-104)."""
    ac = schedule.alphas_cumprod
    a_t = float(ac[t])
    tp = t - schedule.num_train_timesteps // N_STEPS
    a_prev = float(ac[tp]) if tp >= 0 else schedule.final_alpha_cumprod
    eps_rec = (sample - a_t ** 0.5 * x0) / (1.0 - a_t) ** 0.5
    return a_prev ** 0.5 * x0 + (1.0 - a_prev) ** 0.5 * eps_rec


def _decode_chain_torch(stack, lat_np):
    """latents -> mel -> waveform through the torch stack, mirroring
    decode_mel + mel_to_waveform (pipelines/musicldm.py:134-146)."""
    scaling = stack["vae_cfg"].scaling_factor
    z = torch.from_numpy(np.asarray(lat_np, np.float32)) / scaling
    mel = stack["tvae"].decode(z)
    wav = stack["thifi"](mel[:, 0])
    if wav.ndim == 1:
        wav = wav[None]
    return mel, wav


class TestComposedDDIM:
    def test_full_loop_vae_vocoder_mel_1e2(self, stack):
        pipe = stack["make_pipe"]("ddim")
        schedule = pipe.schedule
        ts = schedule.timesteps(N_STEPS)

        # torch loop
        x = stack["lat0"].copy()
        with torch.no_grad():
            for t in ts:
                eps = _torch_eps(stack, x, int(t)).numpy()
                ac = schedule.alphas_cumprod
                a_t = float(ac[int(t)])
                x0 = (x - (1.0 - a_t) ** 0.5 * eps) / a_t ** 0.5
                x = _ddim_prev(schedule, int(t), x, eps, x0)
            want_mel, want_wav = _decode_chain_torch(stack, x)
        owl = int(AUDIO_S * stack["voc_cfg"].sampling_rate)
        want_wav = want_wav.numpy()[:, :owl]

        # production pipeline, same injected latents
        got_lat = pipe(prompt_embeds=jnp.asarray(stack["pe"]),
                       audio_length_in_s=AUDIO_S,
                       num_inference_steps=N_STEPS, guidance_scale=GUIDANCE,
                       eta=0.0, latents=jnp.asarray(stack["lat0"]),
                       output_type="latent", key=jax.random.key(1)).audios
        np.testing.assert_allclose(np.asarray(got_lat), x, atol=1e-2,
                                   rtol=1e-2)

        got = pipe(prompt_embeds=jnp.asarray(stack["pe"]),
                   audio_length_in_s=AUDIO_S, num_inference_steps=N_STEPS,
                   guidance_scale=GUIDANCE, eta=0.0,
                   latents=jnp.asarray(stack["lat0"]),
                   key=jax.random.key(1)).audios

        got_mel = np.asarray(pipe.decode_mel(got_lat))
        # THE BASELINE.md bar: composed spectrograms within 1e-2 of torch
        np.testing.assert_allclose(got_mel, want_mel.numpy(), atol=1e-2,
                                   rtol=1e-2)
        np.testing.assert_allclose(np.asarray(got), want_wav, atol=1e-2)


class TestComposedDPS:
    def test_guided_loop_matches_torch_autograd(self, stack):
        """DPS guidance algebra composed end-to-end: torch.autograd through
        UNet-pred -> VAE decode -> vocoder -> mask operator (wav_form
        supervision) vs the production jax.value_and_grad path
        (scheduling_dps.py:137-219)."""
        rate = 0.05
        sr = stack["voc_cfg"].sampling_rate
        owl = int(AUDIO_S * sr)
        op = MusicInpaintingOperator(
            audio_length_in_s=AUDIO_S, sample_rate=sr, mask_type="box",
            start_inpainting_s=AUDIO_S * 0.4, end_inpainting_s=AUDIO_S * 0.6)
        mask = np.asarray(op.mask, np.float32)[:owl]
        rng = np.random.default_rng(7)
        meas = (rng.standard_normal((1, owl)).astype(np.float32) * 0.1) * mask

        pipe = stack["make_pipe"]("dps", operator=op)
        schedule = pipe.schedule
        ts = schedule.timesteps(N_STEPS)
        scaling = stack["vae_cfg"].scaling_factor
        t_meas = torch.from_numpy(meas)
        t_mask = torch.from_numpy(mask)

        x = stack["lat0"].copy()
        for t in ts:
            with torch.no_grad():
                eps = _torch_eps(stack, x, int(t))
            sample = torch.from_numpy(x).requires_grad_(True)
            ac = schedule.alphas_cumprod
            a_t = float(ac[int(t)])
            x0 = (sample - (1.0 - a_t) ** 0.5 * eps) / a_t ** 0.5
            mel = stack["tvae"].decode(x0 / scaling)
            wav = stack["thifi"](mel[:, 0])
            if wav.ndim == 1:
                wav = wav[None]
            pred = wav[:, :owl] * t_mask
            loss = torch.linalg.norm(t_meas - pred)
            (grad,) = torch.autograd.grad(loss, sample)
            with torch.no_grad():
                prev = _ddim_prev(schedule, int(t), x, eps.numpy(),
                                  x0.detach().numpy())
                x = prev - rate * grad.numpy()

        got_lat = pipe(prompt_embeds=jnp.asarray(stack["pe"]),
                       audio_length_in_s=AUDIO_S,
                       num_inference_steps=N_STEPS, guidance_scale=GUIDANCE,
                       eta=0.0, ip_guidance_rate=rate,
                       measurement=jnp.asarray(meas),
                       supervised_space="wav_form",
                       latents=jnp.asarray(stack["lat0"]),
                       output_type="latent", key=jax.random.key(1)).audios
        np.testing.assert_allclose(np.asarray(got_lat), x, atol=1e-2,
                                   rtol=1e-2)
        got_mel = np.asarray(pipe.decode_mel(got_lat))
        with torch.no_grad():
            want_mel, _ = _decode_chain_torch(stack, x)
        np.testing.assert_allclose(got_mel, want_mel.numpy(), atol=1e-2,
                                   rtol=1e-2)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
