"""Incremental TPU compile/runtime probe: measure each hot component separately
before attempting the full 200-step guided scan. Usage:
  python tools/profile_compile.py [stage]
stages: unet, vae, vocoder, loss, step, scan20, table

`table` (VERDICT r2 item 9) attributes the bench's cold-start compile
program-by-program: it compiles the 200-step scan in cumulative variants
(unet-only DDIM -> +VAE-decode guidance -> full VAE+vocoder guidance) plus the
small side programs. Setup rides the persistent cache (a fully cache-off
process stalls >22 min in the many-small-program flagship setup before the
first row); only the timed lowered.compile() calls run cache-off, so each row
is a true cold compile. Prints a JSON table of (program, compile_s, delta_s).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# all stages ride the persistent cache for SETUP (the non-table stages
# previously configured none and paid the same many-small-program tunnel
# cold-compile stall this file's table stage was fixed for); same default +
# env override as bench.py
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/diffmusic_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


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


def compile_table():
    """Cold-compile attribution of the headline bench program (scan of 200
    guided steps at MusicLDM 10-s scale, bf16 weights, degenerate-CFG
    single-stream — the exact bench.py geometry)."""
    sys.path.insert(0, ".")
    import __graft_entry__
    from diffmusic_tpu.samplers import SamplerConfig, make_step_fn
    from diffmusic_tpu.models.vae import AutoencoderKL

    pipe, op, lat_shape, owl, audio_s = __graft_entry__._flagship(tiny=False)
    compute_dtype = jnp.bfloat16
    cast = lambda tree: jax.tree.map(
        lambda x: x.astype(compute_dtype)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, tree)
    params = (cast(pipe.unet_params), cast(pipe.vae_params),
              cast(pipe.vocoder_params))
    cls_dim = pipe.unet_cfg.projection_class_embeddings_input_dim
    prompt_embeds = jnp.zeros((1, cls_dim), compute_dtype)
    scaling = pipe.vae_cfg.scaling_factor
    timesteps = jnp.asarray(pipe.schedule.timesteps(200))
    measurement = op.forward(jnp.zeros((1, owl)))
    target_mel = op.transform(measurement)
    latents = jax.random.normal(jax.random.key(0), lat_shape)

    def make_scan(loss_kind: str):
        name = "ddim" if loss_kind == "none" else "dps"
        cfg = SamplerConfig(name=name, eta=0.0, ip_guidance_rate=5e-4,
                            num_inference_steps=200)

        def scan(params, target_mel, lat, key):
            unet_p, vae_p, voc_p = params

            def model_fn(x, t):
                eps = pipe.unet.apply(unet_p, x.astype(compute_dtype), t,
                                      class_labels=prompt_embeds)
                return eps.astype(jnp.float32)

            def loss_fn(x0_latent):
                mel = pipe.vae.apply(
                    vae_p, (x0_latent / scaling).astype(compute_dtype),
                    method=AutoencoderKL.decode)
                if loss_kind == "vae_only":
                    # guidance grad stops at the VAE decode; the target is
                    # irrelevant for COMPILE cost — only the differentiated
                    # graph matters
                    return jnp.linalg.norm(mel.astype(jnp.float32))
                audio = op.inverse_transform(
                    mel, lambda m: pipe.vocoder.apply(voc_p, m))
                pred = op.forward(audio[:, :owl].astype(jnp.float32))
                return jnp.linalg.norm(target_mel - op.transform(pred))

            step_fn = make_step_fn(pipe.schedule, cfg,
                                   None if loss_kind == "none" else loss_fn)

            def body(carry, t):
                x, k = carry
                k, sub = jax.random.split(k)
                eps = model_fn(x, t)
                prev, _x0, loss = step_fn(eps, t, x, sub)
                return (prev, k), loss

            (final, _), losses = jax.lax.scan(body, (latents, key), timesteps)
            return final, losses
        return scan

    # setup (above) rode the persistent cache; the timed compiles must not
    jax.config.update("jax_enable_compilation_cache", False)
    rows = []
    prev_s = 0.0
    for name, kind in [("scan200_unet_ddim", "none"),
                       ("scan200_dps_vae_guidance", "vae_only"),
                       ("scan200_dps_full_guidance", "full")]:
        fn = jax.jit(make_scan(kind))
        t0 = time.time()
        lowered = fn.lower(params, target_mel, latents, jax.random.key(1))
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        rows.append({"program": name, "lower_s": round(t_lower, 1),
                     "compile_s": round(t_compile, 1),
                     "delta_vs_prev_s": round(t_compile - prev_s, 1)})
        prev_s = t_compile
        print(json.dumps(rows[-1]), flush=True)

    # side programs the bench/product also compiles
    vae_dec = jax.jit(lambda p, z: pipe.vae.apply(
        p, (z / scaling).astype(compute_dtype), method=AutoencoderKL.decode))
    voc = jax.jit(lambda p, m: pipe.vocoder.apply(p, m[:, 0]))
    for name, fn, args in [
            ("vae_decode_fwd", vae_dec, (params[1], latents)),
            ("vocoder_fwd", voc,
             (params[2], jnp.zeros((1, 1, lat_shape[2] * 4, 64),
                                   compute_dtype)))]:
        t0 = time.time()
        fn.lower(*args).compile()
        rows.append({"program": name,
                     "compile_s": round(time.time() - t0, 1)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"table": rows}))
    return rows


def main(stage="all"):
    if stage == "table":
        # True cold numbers for the MEASURED programs only. Disabling the
        # cache for the whole process was measured to stall: flagship SETUP
        # alone (dozens of small param-init/setup jits, each a 10-40 s
        # remote-compile round trip through the tunnel) exceeded 22 minutes
        # with zero table rows emitted. compile_table() therefore runs setup
        # with the persistent cache ON (module-level config above) and flips
        # it OFF right before the lowered.compile() calls it is timing.
        return compile_table()
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
