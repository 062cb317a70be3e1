"""Full-scale DITTO check on the real TPU.

DITTO differentiates the ENTIRE 20-step denoise chain w.r.t. the initial
latent (reference scheduling_ditto.py:205-208, configs/ditto.yaml) — the most
memory-hungry mode; here the inner scan is rematerialized (jax.checkpoint).
Runs the production pipeline path (MusicLDMPipeline.__call__, scheduler
'ditto') at full MusicLDM 10-s scale, bf16 weights, 2 outer iterations.

Usage: python tools/check_ditto_step.py [outer]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main(outer: int = 2):
    sys.path.insert(0, ".")
    import __graft_entry__

    pipe, op, lat_shape, owl, audio_s = __graft_entry__._flagship(tiny=False)
    cast = lambda tree: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, tree)
    pipe.unet_params = cast(pipe.unet_params)
    pipe.vae_params = cast(pipe.vae_params)
    pipe.vocoder_params = cast(pipe.vocoder_params)
    pipe.scheduler_name = "ditto"

    measurement = op.forward(jnp.zeros((1, owl)))
    cls_dim = pipe.unet_cfg.projection_class_embeddings_input_dim
    prompt_embeds = jnp.zeros((2, cls_dim), jnp.bfloat16)

    # two timed calls in ONE process: the first carries the compile (the
    # DITTO program misses the persistent cache through the tunnel), the
    # second is guaranteed warm — its wall / outer is the steady-state cost
    walls = []
    for rep in range(2):
        t0 = time.time()
        out, losses = pipe(prompt_embeds=prompt_embeds,
                           audio_length_in_s=audio_s,
                           num_inference_steps=20, guidance_scale=2.0,
                           measurement=measurement, ip_guidance_rate=0.5,
                           eta=1.0, optim_outer_loop=outer,
                           return_losses=True, key=jax.random.key(rep))
        walls.append(time.time() - t0)
        assert np.isfinite(out.audios).all()
        assert np.isfinite(np.asarray(losses, np.float64)).all()
    print(f"ditto {outer}x20-step full-scale OK  "
          f"cold={walls[0]:.1f}s warm={walls[1]:.1f}s "
          f"({walls[1] / outer:.2f} s/outer steady)  "
          f"loss={float(np.asarray(losses).ravel()[-1]):.1f}", flush=True)
    return {"outer": outer, "inner_steps": 20,
            "cold_s": round(walls[0], 1),
            "s_per_outer_steady": round(walls[1] / outer, 2)}


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
