"""Chained conv-adjoint probe: reproduce the vocoder-backward context.

The standalone adjoint kernel matches the forward (bench_conv_shapes.py), yet
the full vocoder backward with pallas adjoints measured +28 ms vs XLA's
adjoint. This chains N (adjoint conv -> leaky-mask) stages like the real
backward graph to find where the blowup comes from.

Usage: python tools/bench_conv_chain.py [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

T, C, K, DIL = 5000, 256, 7, 3
N_STAGES = 6


def bench(label, fn, x, iters):
    @jax.jit
    def run(x0):
        def body(carry, _):
            y = fn(carry)
            return 0.999 * y, jnp.sum(y[..., :1])
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
    from diffmusic_tpu.pallas.conv1d_kernel import (_conv1d_pallas,
                                                    _conv1d_reference)

    key = jax.random.key(0)
    g = jax.random.normal(key, (1, T, C), jnp.bfloat16)
    xsaved = [jax.random.normal(jax.random.fold_in(key, i), (1, T, C),
                                jnp.bfloat16) for i in range(N_STAGES)]
    w_adjs = [jax.random.normal(jax.random.fold_in(key, 100 + i),
                                (K, C, C), jnp.bfloat16) * 0.05
              for i in range(N_STAGES)]
    zb = jnp.zeros((C,), jnp.bfloat16)

    def chain_pallas(gg):
        for i in range(N_STAGES):
            gg = _conv1d_pallas(gg, w_adjs[i], zb, DIL, None, None)
            gg = jnp.where(xsaved[i] >= 0, gg, 0.1 * gg)
        return gg

    def chain_xla(gg):
        for i in range(N_STAGES):
            gg = _conv1d_reference(gg, w_adjs[i], zb, DIL, None, None)
            gg = jnp.where(xsaved[i] >= 0, gg, 0.1 * gg)
        return gg

    def chain_pallas_nomask(gg):
        for i in range(N_STAGES):
            gg = _conv1d_pallas(gg, w_adjs[i], zb, DIL, None, None)
        return gg

    bench(f"chain x{N_STAGES} pallas+mask", chain_pallas, g, iters)
    bench(f"chain x{N_STAGES} xla+mask", chain_xla, g, iters)
    bench(f"chain x{N_STAGES} pallas no-mask", chain_pallas_nomask, g, iters)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
