"""One full HiFi-GAN upsample stage gradient: XLA vs pallas-w_adj adjoints.

Stage = leaky -> ConvTranspose(512->256, rate 4, k 16) -> 3 ResidualBlocks
(k 3/7/11, dilations 1/3/5) averaged — the real ch-256 stage at 10-s MusicLDM
scale (T 5000 -> 20000). Next bisection level after tools/bench_resblock_grad.py.

Usage: python tools/bench_stage_grad.py [iters]
"""

import sys
import time

import flax.linen as nn
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

T_IN, C_IN, C_OUT, RATE, K_UP = 5000, 512, 256, 4, 16


class Stage(nn.Module):
    @nn.compact
    def __call__(self, x):
        from diffmusic_tpu.models.hifigan import ResidualBlock
        x = nn.leaky_relu(x, negative_slope=0.1)
        pad = K_UP - 1 - (K_UP - RATE) // 2
        x = nn.ConvTranspose(C_OUT, (K_UP,), strides=(RATE,),
                             padding=[(pad, pad)], transpose_kernel=True,
                             name="up")(x)
        res = None
        for j, rk in enumerate((3, 7, 11)):
            out = ResidualBlock(C_OUT, rk, (1, 3, 5), 0.1,
                                name=f"rb_{j}")(x)
            res = out if res is None else res + out
        return res / 3.0


def bench(label, params, mod, x, iters):
    @jax.jit
    def run(p, x0):
        def body(carry, _):
            g = jax.grad(lambda xx: jnp.sum(
                mod.apply(p, xx).astype(jnp.float32)))(carry)
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
    from diffmusic_tpu.models.hifigan import with_adjoint_weights

    mod = Stage()
    x = jax.random.normal(jax.random.key(0), (1, T_IN, C_IN), jnp.bfloat16)
    params = mod.init(jax.random.key(1), x)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    with_adj = with_adjoint_weights(params)

    bench("stage grad, XLA adjoint", params, mod, x, iters)
    bench("stage grad, pallas w_adj", with_adj, mod, x, iters)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
