"""Real ResidualBlock gradient: XLA adjoint vs pre-transposed pallas adjoint.

Bisects the +28 ms full-vocoder-backward gap (bench_vocoder_bwd.py) that the
kernel-level probes (bench_conv_shapes.py, bench_conv_chain.py) cannot
reproduce. One HiFi-GAN ResidualBlock at the ch-256 stage, grad w.r.t. input.

Usage: python tools/bench_resblock_grad.py [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

T, C = 5000, 256


def bench(label, params, blk, x, iters):
    @jax.jit
    def run(p, x0):
        def body(carry, _):
            g = jax.grad(lambda xx: jnp.sum(
                blk.apply(p, xx).astype(jnp.float32)))(carry)
            return carry + 1e-6 * g, jnp.sum(g)
        final, _ = jax.lax.scan(body, x0, None, length=iters)
        return final

    t0 = time.time()
    out = run(params, x)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out))
    compile_s = time.time() - t0
    t0 = time.time()
    out = run(params, x)
    _ = float(jnp.sum(out))
    wall = time.time() - t0
    print(f"{label:34s} compile={compile_s:6.1f}s  "
          f"per-iter={wall / iters * 1e3:7.3f} ms", flush=True)


def main(iters: int = 100):
    sys.path.insert(0, ".")
    from diffmusic_tpu.models.hifigan import ResidualBlock, with_adjoint_weights

    blk = ResidualBlock(channels=C, kernel_size=7, dilations=(1, 3, 5),
                        slope=0.1)
    x = jax.random.normal(jax.random.key(0), (1, T, C), jnp.bfloat16)
    params = blk.init(jax.random.key(1), x)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    with_adj = with_adjoint_weights(params)

    bench("resblock grad, XLA adjoint", params, blk, x, iters)
    bench("resblock grad, pallas w_adj", with_adj, blk, x, iters)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
