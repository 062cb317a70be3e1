"""UNet forward micro-benchmark (real TPU, scanned loop, bf16 weights).

Per the tunnel measurement protocol (docs/PERF_NOTES.md): scanned loop with a
forced fetch. Default benches the SINGLE-STREAM forward (the product's
degenerate-CFG path); DIFFMUSIC_TPU_CFG2=1 benches the doubled one.
Usage: python tools/bench_unet.py [iters]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main(iters: int = 100):
    sys.path.insert(0, ".")
    import __graft_entry__

    pipe, op, lat_shape, owl, audio_s = __graft_entry__._flagship(tiny=False)
    cast = lambda tree: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, tree)
    unet_p = cast(pipe.unet_params)
    cls_dim = pipe.unet_cfg.projection_class_embeddings_input_dim
    cfg_doubled = os.environ.get("DIFFMUSIC_TPU_CFG2") == "1"
    pembeds = jnp.zeros((2 if cfg_doubled else 1, cls_dim), jnp.bfloat16)
    lat = jax.random.normal(jax.random.key(0), lat_shape)

    @jax.jit
    def run(p, x):
        def body(carry, t):
            if not cfg_doubled:
                e = pipe.unet.apply(p, carry.astype(jnp.bfloat16), t,
                                    class_labels=pembeds).astype(jnp.float32)
                return carry + 1e-6 * e, jnp.sum(e)
            x_in = jnp.concatenate([carry, carry], axis=0).astype(jnp.bfloat16)
            eps = pipe.unet.apply(p, x_in, t, class_labels=pembeds)
            uncond, text = jnp.split(eps.astype(jnp.float32), 2, axis=0)
            e = uncond + 2.0 * (text - uncond)
            return carry + 1e-6 * e, jnp.sum(e)
        final, sums = jax.lax.scan(body, x, jnp.arange(iters, dtype=jnp.int32))
        return final, sums

    t0 = time.time()
    out = run(unet_p, lat)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out[0]))
    compile_s = time.time() - t0
    t0 = time.time()
    out = run(unet_p, lat)
    _ = float(jnp.sum(out[0]))
    wall = time.time() - t0
    mode = "CFGx2" if cfg_doubled else "single-stream"
    print(f"unet {mode} fwd (bf16)  compile+1st={compile_s:7.1f}s  "
          f"per-iter={wall / iters * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
