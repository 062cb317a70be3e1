"""Standalone conv1d kernel probe: forward vs pre-transposed adjoint, per shape.

Distinguishes 'the adjoint kernel is slow' from 'the adjoint is slow only
inside the full backward program' (docs/PERF_NOTES.md lost-experiments list).
Scanned loops, forced fetch. Usage: python tools/bench_conv_shapes.py [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

# (T, Cin, Cout, k, dilation) — HiFi-GAN resblock stages at 10-s MusicLDM scale
SHAPES = [
    (1000, 512, 512, 3, 1),
    (5000, 256, 256, 7, 3),
    (20000, 128, 128, 11, 5),
]


def bench(label, fn, x, iters):
    @jax.jit
    def run(x0):
        def body(carry, _):
            y = fn(carry)
            return carry + 1e-6 * y, jnp.sum(y[..., :1])
        final, _ = jax.lax.scan(body, x, None, length=iters)
        return final

    t0 = time.time()
    out = run(x)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out))
    compile_s = time.time() - t0
    t0 = time.time()
    out = run(x)
    _ = float(jnp.sum(out))
    wall = time.time() - t0
    print(f"{label:34s} compile={compile_s:6.1f}s  "
          f"per-iter={wall / iters * 1e3:7.3f} ms", flush=True)


def main(iters: int = 200):
    sys.path.insert(0, ".")
    from diffmusic_tpu.pallas.conv1d_kernel import _conv1d_pallas

    for (t, cin, cout, k, d) in SHAPES:
        key = jax.random.key(0)
        x = jax.random.normal(key, (1, t, cin), jnp.bfloat16)
        w = jax.random.normal(key, (k, cin, cout), jnp.bfloat16) * 0.05
        b = jnp.zeros((cout,), jnp.bfloat16)
        w_adj = jnp.flip(w, 0).swapaxes(1, 2)
        b_adj = jnp.zeros((cin,), jnp.bfloat16)

        bench(f"fwd   T={t} C={cin} k={k} d={d}",
              lambda xx, w=w, b=b, d=d: _conv1d_pallas(xx, w, b, d, 0.1, None),
              x, iters)
        g = jax.random.normal(key, (1, t, cout), jnp.bfloat16)
        bench(f"adj   T={t} C={cin} k={k} d={d}",
              lambda gg, w_adj=w_adj, b_adj=b_adj, d=d:
              _conv1d_pallas(gg, w_adj, b_adj, d, None, None),
              g, iters)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
