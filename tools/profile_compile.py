"""Incremental TPU compile/runtime probe: measure each hot component separately
before attempting the full 200-step guided scan. Usage:
  python tools/profile_compile.py [stage]
stages: unet, vae, vocoder, loss, step, scan20
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    t_run = time.time() - t0
    print(f"{name:24s} compile+1st={t_compile:8.1f}s  run={t_run * 1e3:9.1f}ms",
          flush=True)
    return out


def main(stage="all"):
    sys.path.insert(0, ".")
    import __graft_entry__
    from diffmusic_tpu.samplers import SamplerConfig, make_step_fn
    from diffmusic_tpu.models.vae import AutoencoderKL

    pipe, op, lat_shape, owl, audio_s = __graft_entry__._flagship(tiny=False)
    print("flagship ready:", lat_shape, flush=True)

    lat = jax.random.normal(jax.random.key(0), lat_shape)
    cls_dim = pipe.unet_cfg.projection_class_embeddings_input_dim
    pembeds = jnp.zeros((2, cls_dim))
    scaling = pipe.vae_cfg.scaling_factor

    if stage in ("all", "unet"):
        unet_fwd = jax.jit(lambda x, t: pipe._eps_fn(pembeds, x, t, 2.0))
        timed("unet CFG fwd", unet_fwd, lat, jnp.int32(981))

    if stage in ("all", "vae"):
        vae_dec = jax.jit(lambda z: pipe.vae.apply(
            pipe.vae_params, z / scaling, method=AutoencoderKL.decode))
        mel = timed("vae decode", vae_dec, lat)

    if stage in ("all", "vocoder"):
        mel = pipe.vae.apply(pipe.vae_params, lat / scaling,
                             method=AutoencoderKL.decode)
        voc = jax.jit(lambda m: pipe.vocoder.apply(pipe.vocoder_params, m[:, 0]))
        timed("vocoder fwd", voc, mel)

    measurement = op.forward(jnp.zeros((1, owl)))
    loss_fn = pipe.make_loss_fn(measurement, owl, "mel_spectrogram")

    if stage in ("all", "loss"):
        timed("loss fwd", jax.jit(loss_fn), lat)
        timed("loss grad", jax.jit(jax.grad(loss_fn)), lat)

    if stage in ("all", "step"):
        cfg = SamplerConfig(name="dps", eta=0.0, ip_guidance_rate=5e-4,
                            num_inference_steps=200)
        step_fn = make_step_fn(pipe.schedule, cfg, loss_fn)

        @jax.jit
        def one_step(x, t, key):
            eps = pipe._eps_fn(pembeds, x, t, 2.0)
            return step_fn(eps, t, x, key)[0]

        timed("full guided step", one_step, lat, jnp.int32(981),
              jax.random.key(1))

    if stage in ("all", "scan20"):
        cfg = SamplerConfig(name="dps", eta=0.0, ip_guidance_rate=5e-4,
                            num_inference_steps=20)
        step_fn = make_step_fn(pipe.schedule, cfg, loss_fn)
        ts = jnp.asarray(pipe.schedule.timesteps(20))

        @jax.jit
        def scan20(x, key):
            def body(carry, t):
                xx, k = carry
                k, sub = jax.random.split(k)
                eps = pipe._eps_fn(pembeds, xx, t, 2.0)
                prev, _, loss = step_fn(eps, t, xx, sub)
                return (prev, k), loss
            (final, _), losses = jax.lax.scan(body, (x, key), ts)
            return final, losses

        timed("scan 20 guided steps", scan20, lat, jax.random.key(2))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
