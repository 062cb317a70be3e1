"""Fused transformer block per-call cost at the real UNet shapes.

MusicLDM 10-s CFG fwd runs 5 level-0 blocks (2, 4000, 128, 16 heads) and
5 level-1 blocks (2, 1000, 256, 32 heads) through the megakernel; this
measures each shape's per-call cost to attribute the 14.3 ms UNet total.

Usage: python tools/bench_transformer_block.py [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

SHAPES = [  # (B, T, C, heads); B=1 rows are the degenerate-CFG single-stream
    (1, 4000, 128, 16),
    (1, 1000, 256, 32),
    (2, 4000, 128, 16),
    (2, 1000, 256, 32),
    (2, 252, 384, 48),   # level-2: below the current fused-block gate (512)
]


def main(iters: int = 100, impl: str = "pallas"):
    sys.path.insert(0, ".")
    from diffmusic_tpu.pallas import transformer_kernel as tk
    if impl == "xla":
        fused_transformer_block = lambda x, p, h, d: tk._reference_block(
            x, p, h, d)
    else:
        fused_transformer_block = tk.fused_transformer_block

    for (b, t, c, heads) in SHAPES:
        head_dim = c // heads
        key = jax.random.key(0)
        x = jax.random.normal(key, (b, t, c), jnp.bfloat16) * 0.3
        ks = jax.random.split(jax.random.key(1), 13)
        p = {
            "ln1_scale": jnp.ones((c,)), "ln1_bias": jnp.zeros((c,)),
            "wq": jax.random.normal(ks[0], (c, c), jnp.bfloat16) * 0.05,
            "wk": jax.random.normal(ks[1], (c, c), jnp.bfloat16) * 0.05,
            "wv": jax.random.normal(ks[2], (c, c), jnp.bfloat16) * 0.05,
            "wo": jax.random.normal(ks[3], (c, c), jnp.bfloat16) * 0.05,
            "bo": jnp.zeros((c,), jnp.bfloat16),
            "ln3_scale": jnp.ones((c,)), "ln3_bias": jnp.zeros((c,)),
            "wi": jax.random.normal(ks[4], (c, 8 * c), jnp.bfloat16) * 0.05,
            "bi": jnp.zeros((8 * c,), jnp.bfloat16),
            "wo2": jax.random.normal(ks[5], (4 * c, c), jnp.bfloat16) * 0.05,
            "bo2": jnp.zeros((c,), jnp.bfloat16),
        }

        @jax.jit
        def run(pp, x0):
            def body(carry, _):
                y = fused_transformer_block(carry, pp, heads, head_dim)
                return 0.5 * carry + 0.5 * y, jnp.sum(y[..., :1])
            final, _ = jax.lax.scan(body, x0, None, length=iters)
            return final

        t0 = time.time()
        out = run(p, x)
        jax.block_until_ready(out)
        _ = float(jnp.sum(out))
        compile_s = time.time() - t0
        t0 = time.time()
        out = run(p, x)
        _ = float(jnp.sum(out))
        wall = time.time() - t0
        print(f"block B={b} T={t} C={c} h={heads}  compile={compile_s:6.1f}s  "
              f"per-call={wall / iters * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100,
         sys.argv[2] if len(sys.argv) > 2 else "pallas")
