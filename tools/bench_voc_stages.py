"""Per-stage HiFi-GAN cost sweep at full MusicLDM 10-s scale (fwd and fwd+bwd).

Pinpoints where the vocoder's ~34 ms/step fwd+bwd (bench_vocoder_bwd.py) goes:
each upsample stage (leaky -> ConvTranspose -> 3 averaged ResidualBlocks) is
measured in isolation with the production routing (pair/fused pallas where
eligible, XLA convs for misaligned ch64/ch32). Informs the space-to-depth
decision (docs/PERF_NOTES.md round-2 roadmap item 2).

Usage: python tools/bench_voc_stages.py [iters] [stage|all|pre_post]
"""

import sys
import time

import flax.linen as nn
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

# (T_in, C_in, C_out, rate, k_up) per stage, 10-s clip (mel T=1000, ch 1024)
STAGES = [
    (1000, 1024, 512, 5, 16),
    (5000, 512, 256, 4, 16),
    (20000, 256, 128, 2, 8),
    (40000, 128, 64, 2, 4),
    (80000, 64, 32, 2, 4),
]


class Stage(nn.Module):
    c_out: int
    rate: int
    k_up: int
    packed_r: int = 1   # space-to-depth factor (ops/packing.py); 1 = off

    @nn.compact
    def __call__(self, x):
        from diffmusic_tpu.models.hifigan import ResidualBlock
        if self.packed_r > 1:
            from diffmusic_tpu.ops.packing import (packed_convtranspose,
                                                   unpack_time)
            w = self.param("up_w", nn.initializers.lecun_normal(),
                           (self.k_up, x.shape[-1], self.c_out))
            b = self.param("up_b", nn.initializers.zeros, (self.c_out,))
            x = packed_convtranspose(x, w, b, self.rate, 1, self.packed_r,
                                     slope=0.1)
            res = None
            for j, rk in enumerate((3, 7, 11)):
                out = ResidualBlock(self.c_out, rk, (1, 3, 5), 0.1,
                                    name=f"rb_{j}")(x, packed_r=self.packed_r)
                res = out if res is None else res + out
            return unpack_time(res / 3.0, self.packed_r)
        x = nn.leaky_relu(x, negative_slope=0.1)
        pad = self.k_up - 1 - (self.k_up - self.rate) // 2
        x = nn.ConvTranspose(self.c_out, (self.k_up,), strides=(self.rate,),
                             padding=[(pad, pad)], transpose_kernel=True,
                             name="up")(x)
        res = None
        for j, rk in enumerate((3, 7, 11)):
            out = ResidualBlock(self.c_out, rk, (1, 3, 5), 0.1,
                                name=f"rb_{j}")(x)
            res = out if res is None else res + out
        return res / 3.0


def bench(label, params, mod, x, iters, grad: bool):
    @jax.jit
    def run(p, x0):
        def body(carry, _):
            if grad:
                g = jax.grad(lambda xx: jnp.sum(
                    mod.apply(p, xx).astype(jnp.float32)))(carry)
                return carry + 1e-6 * g, jnp.sum(g)
            y = mod.apply(p, carry)
            # carry MUST depend on y or XLA hoists the whole stage out of
            # the loop (first run of this tool measured 0.33 ms for every
            # stage forward — loop overhead only)
            dep = (1e-9 * jnp.tanh(jnp.sum(y.astype(jnp.float32)))) \
                .astype(carry.dtype)
            return carry + dep, jnp.sum(y)
        final, sums = jax.lax.scan(body, x0, None, length=iters)
        return final, sums

    t0 = time.time()
    out = run(params, x)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out[1]))
    compile_s = time.time() - t0
    t0 = time.time()
    out = run(params, x)
    _ = float(jnp.sum(out[1]))
    wall = time.time() - t0
    print(f"{label:30s} compile={compile_s:6.1f}s  "
          f"per-iter={wall / iters * 1e3:7.3f} ms", flush=True)


def main(iters: int = 100, which: str = "all"):
    sys.path.insert(0, ".")
    for i, (t_in, c_in, c_out, rate, k_up) in enumerate(STAGES):
        if which not in ("all", str(i)):
            continue
        mod = Stage(c_out, rate, k_up)
        x = jax.random.normal(jax.random.key(0), (1, t_in, c_in), jnp.bfloat16)
        # params from eval_shape (abstract init): a REAL fp32 init traces the
        # fp32 pallas conv, whose ch512 k=11 VMEM footprint doesn't compile
        shapes = jax.eval_shape(mod.init, jax.random.key(1), x[:, :160, :])
        params = jax.tree.map(
            lambda s: (jax.random.normal(jax.random.key(2), s.shape,
                                         jnp.bfloat16) * 0.05), shapes)
        bench(f"stage{i} ch{c_out} T{t_in * rate} fwd", params, mod, x,
              iters, False)
        bench(f"stage{i} ch{c_out} T{t_in * rate} grad", params, mod, x,
              iters, True)
        if c_out < 128 and 128 % c_out == 0:
            r = 128 // c_out
            pmod = Stage(c_out, rate, k_up, packed_r=r)
            pshapes = jax.eval_shape(pmod.init, jax.random.key(1),
                                     x[:, :160, :])
            pparams = jax.tree.map(
                lambda s: (jax.random.normal(jax.random.key(2), s.shape,
                                             jnp.bfloat16) * 0.05), pshapes)
            bench(f"stage{i} packed r{r} fwd", pparams, pmod, x, iters, False)
            bench(f"stage{i} packed r{r} grad", pparams, pmod, x, iters, True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100,
         sys.argv[2] if len(sys.argv) > 2 else "all")
