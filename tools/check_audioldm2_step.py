"""Full-scale AudioLDM2 guided-step compile/run check on the real TPU.

MusicLDM is the benched flagship; this de-risks the second model family at
scale: dual cross-attention UNet (GPT-2 stream + T5 stream,
plpeline_audioldm2.py:1147-1154) + DPS guidance through VAE/vocoder. Random
weights (no egress), real AudioLDM2-music dims, 20-step scan.

Usage: python tools/check_audioldm2_step.py [steps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main(steps: int = 20):
    sys.path.insert(0, ".")
    from diffmusic_tpu.inverse_problem import MusicInpaintingOperator
    from diffmusic_tpu.models.configs import (HiFiGANConfig, UNetConfig,
                                              VAEConfig)
    from diffmusic_tpu.models.hifigan import SpeechT5HifiGan
    from diffmusic_tpu.models.unet import UNet2DConditionModel
    from diffmusic_tpu.models.vae import AutoencoderKL
    from diffmusic_tpu.samplers import (DiffusionSchedule, SamplerConfig,
                                        make_step_fn)

    audio_s = 10.0
    # cvssp/audioldm2-music UNet: dual streams (GPT-2 768-d, T5 1024-d),
    # cross-attn conditioned (no class embedding)
    unet_cfg = UNetConfig(cross_attention_dims=(768, 1024),
                          class_embed_type=None,
                          projection_class_embeddings_input_dim=None,
                          class_embeddings_concat=False)
    vae_cfg = VAEConfig()
    voc_cfg = HiFiGANConfig()

    sr, hop = 16000, voc_cfg.hop_length
    height = int(np.ceil(audio_s * sr / hop / vae_cfg.scale_factor)
                 ) * vae_cfg.scale_factor
    owl = int(audio_s * sr)
    lat_shape = (1, unet_cfg.in_channels, height // vae_cfg.scale_factor,
                 voc_cfg.model_in_dim // vae_cfg.scale_factor)

    unet = UNet2DConditionModel(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    voc = SpeechT5HifiGan(voc_cfg)

    # mirror the product's exact degenerate-CFG skip (pipelines/musicldm.py
    # __call__, inherited by AudioLDM2): the reference CLI's inverse-problem
    # default is an empty prompt AND empty negative prompt, so the GPT-2 and
    # T5 conditioning halves are identical and the CFG combine is the
    # identity. DIFFMUSIC_TPU_CFG2=1 benches the doubled program.
    cfg_doubled = os.environ.get("DIFFMUSIC_TPU_CFG2") == "1"
    nstream = 2 if cfg_doubled else 1
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        ks = jax.random.split(jax.random.key(0), 3)
        gen = jnp.zeros((nstream, 8, 768))      # GPT-2 generated stream
        t5_seq = jnp.zeros((nstream, 12, 1024))  # T5 stream
        t5_mask = jnp.ones((nstream, 12), jnp.int32)
        unet_p = unet.init(ks[0], jnp.zeros(lat_shape), jnp.asarray([0]),
                           encoder_hidden_states=gen[:1],
                           encoder_hidden_states_1=t5_seq[:1],
                           encoder_attention_mask_1=t5_mask[:1])
        vae_p = vae.init(ks[1], jnp.zeros((1, 1, height, voc_cfg.model_in_dim)))
        voc_p = voc.init(ks[2], jnp.zeros((1, height, voc_cfg.model_in_dim)))
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a, t)
    unet_p, vae_p, voc_p = cast(unet_p), cast(vae_p), cast(voc_p)
    gen = gen.astype(jnp.bfloat16)
    t5_seq = t5_seq.astype(jnp.bfloat16)

    op = MusicInpaintingOperator(audio_length_in_s=audio_s, sample_rate=sr,
                                 mask_type="box", start_inpainting_s=4.0,
                                 end_inpainting_s=6.0)
    measurement = op.forward(jnp.zeros((1, owl)))
    target_mel = op.transform(measurement)
    schedule = DiffusionSchedule()
    cfg = SamplerConfig(name="dps", eta=0.0, ip_guidance_rate=5e-4,
                        num_inference_steps=steps)
    scaling = vae_cfg.scaling_factor
    timesteps = jnp.asarray(schedule.timesteps(steps))

    @jax.jit
    def sample(params, latents, key):
        unet_pp, vae_pp, voc_pp = params

        def model_fn(x, t):
            if not cfg_doubled:
                eps = unet.apply(unet_pp, x.astype(jnp.bfloat16), t,
                                 encoder_hidden_states=gen,
                                 encoder_hidden_states_1=t5_seq,
                                 encoder_attention_mask_1=t5_mask)
                return eps.astype(jnp.float32)
            x_in = jnp.concatenate([x, x], axis=0).astype(jnp.bfloat16)
            eps = unet.apply(unet_pp, x_in, t,
                             encoder_hidden_states=gen,
                             encoder_hidden_states_1=t5_seq,
                             encoder_attention_mask_1=t5_mask)
            uncond, text = jnp.split(eps.astype(jnp.float32), 2, axis=0)
            return uncond + 3.5 * (text - uncond)

        def loss_fn(x0):
            mel = vae.apply(vae_pp, (x0 / scaling).astype(jnp.bfloat16),
                            method=AutoencoderKL.decode)
            audio = op.inverse_transform(
                mel, lambda m: voc.apply(voc_pp, m))
            pred = op.forward(audio[:, :owl].astype(jnp.float32))
            return jnp.linalg.norm(target_mel - op.transform(pred))

        step_fn = make_step_fn(schedule, cfg, loss_fn)

        def body(carry, t):
            x, k = carry
            k, sub = jax.random.split(k)
            eps = model_fn(x, t)
            prev, _x0, loss = step_fn(eps, t, x, sub)
            return (prev, k), loss

        (final, _), losses = jax.lax.scan(body, (latents, key), timesteps)
        return final, losses

    latents = jax.random.normal(jax.random.key(1), lat_shape)
    t0 = time.time()
    final, losses = sample((unet_p, vae_p, voc_p), latents, jax.random.key(2))
    jax.block_until_ready(final)
    _ = float(jnp.sum(final))
    compile_s = time.time() - t0
    t0 = time.time()
    final, losses = sample((unet_p, vae_p, voc_p), latents, jax.random.key(3))
    _ = float(jnp.sum(final))
    wall = time.time() - t0
    assert np.isfinite(np.asarray(losses)).all(), "NaN loss"
    print(f"audioldm2 {steps}-step guided scan OK  "
          f"compile+1st={compile_s:.1f}s  per-step={wall / steps * 1e3:.1f} ms",
          flush=True)
    return {"steps": steps, "compile_and_first_s": round(compile_s, 1),
            "ms_per_step": round(wall / steps * 1e3, 1)}


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
