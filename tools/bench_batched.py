"""Batched-clip throughput: B clips denoised together on ONE chip.

The headline bench (bench.py) is the reference workload: batch-1, 200-step DPS
inpainting of a 10-s clip (reference hard-codes batch 1: run.py:249). The
hypothesis was that the memory-bound batch-1 UNet (~10% MXU) would amortize
weight traffic over B clips and raise seconds-of-audio/sec/chip.

MEASURED RESULT (v5e, 2026-08-18): batching LOSES on this program —
  batch 1: 48.9 ms/step, 1.022 s-audio/s/chip
  batch 4: 235.8 ms/step, 0.848 s-audio/s/chip  (4.8x cost for 4x work)
The dominant per-step costs (attention VPU work ~ b*T^2, vocoder-backward and
VAE elementwise bandwidth ~ b) all scale with batch; weight traffic is too
small a fraction to amortize, and the extra ~20% superlinearity points at
worse scheduling/layout choices at the larger shapes. Serve clips one-at-a-time
per chip and scale across chips with dp (parallel/mesh.py) instead.

Usage: python tools/bench_batched.py [BATCH ...]   (default: 1 4)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/diffmusic_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

NUM_STEPS = 200
AUDIO_S = 10.0


def run_batch(batch: int, compute_dtype=jnp.bfloat16):
    import __graft_entry__
    from diffmusic_tpu.samplers import SamplerConfig, make_step_fn
    from diffmusic_tpu.models.vae import AutoencoderKL

    pipe, op, lat_shape, owl, audio_s = __graft_entry__._flagship(
        tiny=False, batch=batch)

    cast = lambda tree: jax.tree.map(
        lambda x: x.astype(compute_dtype)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, tree)
    params = (cast(pipe.unet_params), cast(pipe.vae_params),
              cast(pipe.vocoder_params))

    sr = pipe.vocoder_cfg.sampling_rate
    tt = np.arange(owl) / sr
    gt = sum(0.25 / (i + 1) * np.sin(2 * np.pi * 220 * (i + 1) * tt)
             for i in range(4))
    gt_wave = jnp.tile(jnp.asarray(gt, jnp.float32)[None], (batch, 1))
    target_mel = op.transform(op.forward(gt_wave))

    cfg = SamplerConfig(name="dps", eta=0.0, ip_guidance_rate=5e-4,
                        num_inference_steps=NUM_STEPS)
    cls_dim = pipe.unet_cfg.projection_class_embeddings_input_dim
    prompt_embeds = jnp.zeros((2 * batch, cls_dim), compute_dtype)
    guidance_scale = 2.0
    scaling = pipe.vae_cfg.scaling_factor
    timesteps = jnp.asarray(pipe.schedule.timesteps(NUM_STEPS))

    @jax.jit
    def sample(params, target_mel, latents, key):
        unet_p, vae_p, voc_p = params

        def model_fn(x, t):
            x_in = jnp.concatenate([x, x], axis=0).astype(compute_dtype)
            eps = pipe.unet.apply(unet_p, x_in, t, class_labels=prompt_embeds)
            uncond, text = jnp.split(eps.astype(jnp.float32), 2, axis=0)
            return uncond + guidance_scale * (text - uncond)

        def loss_fn(x0_latent):
            mel = pipe.vae.apply(vae_p,
                                 (x0_latent / scaling).astype(compute_dtype),
                                 method=AutoencoderKL.decode)
            audio = op.inverse_transform(
                mel, lambda m: pipe.vocoder.apply(voc_p, m))
            pred = op.forward(audio[:, :owl].astype(jnp.float32))
            return jnp.linalg.norm(target_mel - op.transform(pred))

        step_fn = make_step_fn(pipe.schedule, cfg, loss_fn)

        def body(carry, t):
            x, k = carry
            k, sub = jax.random.split(k)
            eps = model_fn(x, t)
            prev, _x0, loss = step_fn(eps, t, x, sub)
            return (prev, k), loss

        (final, _), losses = jax.lax.scan(body, (latents, key), timesteps)
        return final, losses

    latents = jax.random.normal(jax.random.key(0), lat_shape)

    t0 = time.time()
    final, losses = sample(params, target_mel, latents, jax.random.key(1))
    final.block_until_ready()
    compile_s = time.time() - t0

    walls = []
    for i in range(3):
        t0 = time.time()
        final, losses = sample(params, target_mel, latents,
                               jax.random.key(2 + i))
        final.block_until_ready()
        walls.append(time.time() - t0)
    wall = sorted(walls)[1]
    assert np.isfinite(np.asarray(losses)).all()

    return {
        "batch": batch,
        "wall_s": round(wall, 3),
        "per_step_ms": round(wall / NUM_STEPS * 1e3, 2),
        "audio_s_per_s_per_chip": round(batch * AUDIO_S / wall, 3),
        "compile_and_first_run_s": round(compile_s, 1),
        "timed_runs_s": [round(w, 3) for w in walls],
    }


if __name__ == "__main__":
    batches = [int(a) for a in sys.argv[1:]] or [1, 4]
    out = [run_batch(b) for b in batches]
    print(json.dumps(out, indent=1))
