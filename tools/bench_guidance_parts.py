"""Guidance-gradient component breakdown (real TPU, scanned loops, bf16).

The DPS guidance chain (pipelines.make_loss_fn) is
  VAE.decode -> HiFi-GAN vocoder -> crop -> operator.forward -> mel -> norm
differentiated w.r.t. the pred-x0 latent. This measures the grad of each
prefix of the chain so the per-component fwd+bwd cost is attributable.

Usage: python tools/bench_guidance_parts.py [iters] [stage]
stages: vae, vae_voc, full (default: all)
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def scan_grad(label, loss_of, x, iters):
    @jax.jit
    def run(x0):
        def body(carry, _):
            g = jax.grad(loss_of)(carry)
            return carry + 1e-6 * g, jnp.sum(g)
        final, sums = jax.lax.scan(body, x0, None, length=iters)
        return final, sums

    t0 = time.time()
    out = run(x)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out[0]))
    compile_s = time.time() - t0
    t0 = time.time()
    out = run(x)
    _ = float(jnp.sum(out[0]))
    wall = time.time() - t0
    print(f"{label:26s} compile+1st={compile_s:7.1f}s  "
          f"per-iter={wall / iters * 1e3:7.2f} ms", flush=True)


def main(iters: int = 100, stage: str = "all"):
    sys.path.insert(0, ".")
    import __graft_entry__
    from diffmusic_tpu.models.vae import AutoencoderKL

    pipe, op, lat_shape, owl, audio_s = __graft_entry__._flagship(tiny=False)
    cast = lambda tree: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, tree)
    vae_p = cast(pipe.vae_params)
    voc_p = cast(pipe.vocoder_params)
    scaling = pipe.vae_cfg.scaling_factor
    lat = jax.random.normal(jax.random.key(0), lat_shape)
    measurement = op.forward(jnp.zeros((1, owl)))
    target_mel = op.transform(measurement)

    def decode(x0):
        return pipe.vae.apply(vae_p, (x0 / scaling).astype(jnp.bfloat16),
                              method=AutoencoderKL.decode)

    if stage in ("all", "vae"):
        scan_grad("vae decode grad", lambda x0: jnp.sum(
            decode(x0).astype(jnp.float32)), lat, iters)

    if stage in ("all", "vae_voc"):
        def vae_voc(x0):
            mel = decode(x0)
            audio = op.inverse_transform(
                mel, lambda m: pipe.vocoder.apply(voc_p, m))
            return jnp.sum(audio.astype(jnp.float32))
        scan_grad("vae+vocoder grad", vae_voc, lat, iters)

    if stage in ("all", "voc_fwd"):
        # forward-only (no grad): pins the vocoder fwd/bwd split
        @jax.jit
        def fwd_only(x0):
            def body(carry, _):
                mel = decode(carry)
                audio = op.inverse_transform(
                    mel, lambda m: pipe.vocoder.apply(voc_p, m))
                s = jnp.sum(audio.astype(jnp.float32))
                return carry + 1e-9 * s, s
            final, _ = jax.lax.scan(body, x0, None, length=iters)
            return final

        t0 = time.time()
        out = fwd_only(lat)
        jax.block_until_ready(out)
        _ = float(jnp.sum(out))
        compile_s = time.time() - t0
        t0 = time.time()
        out = fwd_only(lat)
        _ = float(jnp.sum(out))
        wall = time.time() - t0
        print(f"{'vae+vocoder FWD only':26s} compile+1st={compile_s:7.1f}s  "
              f"per-iter={wall / iters * 1e3:7.2f} ms", flush=True)

    if stage in ("all", "full"):
        def full(x0):
            mel = decode(x0)
            audio = op.inverse_transform(
                mel, lambda m: pipe.vocoder.apply(voc_p, m))
            pred = op.forward(audio[:, :owl].astype(jnp.float32))
            return jnp.linalg.norm(target_mel - op.transform(pred))
        scan_grad("full guidance grad", full, lat, iters)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100,
         sys.argv[2] if len(sys.argv) > 2 else "all")
