"""Vocoder guidance-backward micro-benchmark (real TPU, scanned loop).

Measures d sum(vocoder(mel)) / d mel at MusicLDM scale, bf16 weights, with and
without the precomputed 'adjoint' weight collection (models/hifigan.py::
with_adjoint_weights). Per the tunnel measurement protocol (docs/PERF_NOTES.md)
only scanned loops with a forced fetch are trusted.

Usage: python tools/bench_vocoder_bwd.py [iters] [variant]
variant: xla | pallas | both (default both; separate processes avoid
same-process ordering confounds)
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main(iters: int = 100, variant: str = "both"):
    sys.path.insert(0, ".")
    import __graft_entry__
    from diffmusic_tpu.models.hifigan import with_adjoint_weights

    pipe, op, lat_shape, owl, audio_s = __graft_entry__._flagship(tiny=False)
    cast = lambda tree: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, tree)

    base = {"params": cast(pipe.vocoder_params)["params"]}

    t_mel = lat_shape[2] * pipe.vae_cfg.scale_factor
    mel = jax.random.normal(jax.random.key(0),
                            (1, t_mel, pipe.vocoder_cfg.model_in_dim))

    def bench(params, label):
        @jax.jit
        def run(p, m):
            def body(carry, _):
                g = jax.grad(lambda mm: jnp.sum(
                    pipe.vocoder.apply(p, mm.astype(jnp.bfloat16))
                    .astype(jnp.float32)))(carry)
                return carry + 1e-6 * g, jnp.sum(g)
            final, sums = jax.lax.scan(body, m, None, length=iters)
            return final, sums

        t0 = time.time()
        out = run(params, mel)
        jax.block_until_ready(out)
        _ = float(jnp.sum(out[0]))
        compile_s = time.time() - t0
        t0 = time.time()
        out = run(params, mel)
        _ = float(jnp.sum(out[0]))
        wall = time.time() - t0
        print(f"{label:28s} compile+1st={compile_s:7.1f}s  "
              f"per-iter={wall / iters * 1e3:7.2f} ms", flush=True)

    if variant.startswith("pallas_stage"):
        # stage i owns resblocks_{3i..3i+2} (models/hifigan.py loop order)
        stage = int(variant.removeprefix("pallas_stage"))
        names = {f"resblocks_{3 * stage + j}" for j in range(3)}
        only_adj = with_adjoint_weights(base, only=lambda n: n in names)
        bench(only_adj, f"pallas adjoints, stage {stage} only")
        return
    if variant in ("both", "xla"):
        bench(base, "xla adjoint (old)")
    if variant in ("both", "pallas"):
        bench(with_adjoint_weights(base), "pallas pre-transposed (new)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100,
         sys.argv[2] if len(sys.argv) > 2 else "both")
