"""Per-geometry cost of the VAE decoder's 3x3 convs: XLA emitter vs FLOPs floor.

The round-2 device trace (docs/PERF_NOTES.md) showed XLA's conv emitter
running up to 4x its own cost estimate on the skinny-W VAE geometries
(e.g. mid 3x3 at (250,16,512): 0.73 ms vs 0.19 est). This tool measures each
decoder conv geometry in a scanned loop — forward, and forward+input-adjoint
(the guidance gradient differentiates activations only) — to quantify the
headroom a Pallas conv2d forward could claim.

Usage: python tools/bench_vae_convs.py [iters] [variant]
variant: xla (conv2d emitter, default) | rows (ops/conv2d_rows.py — kw
dilated conv1ds over flattened rows, pure XLA, no custom-call boundary) |
swap (H<->W transposed orientation: a 3x3 'same' conv commutes with the
spatial transpose, so if the emitter tiles (16, 250) better than (250, 16)
the whole decoder could run transposed with one transpose at each end)
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

# (H, W, Cin, Cout, count_in_decode_fwd)
GEOMETRIES = [
    (250, 16, 512, 512, 8),    # conv_in + mid resnets + up0 resnets
    (500, 32, 512, 512, 1),    # up0 upsampler conv (post 2x nearest)
    (500, 32, 512, 256, 1),    # up1 first resnet conv1
    (500, 32, 256, 256, 5),    # up1 resnets
    (1000, 64, 256, 256, 1),   # up1 upsampler conv
    (1000, 64, 256, 128, 1),   # up2 first resnet conv1
    (1000, 64, 128, 128, 5),   # up2 resnets
]

PEAK_BF16_TFLOPS = 197.0  # v5e


def conv(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=dn)


def timed_scan(fn, x, rest, iters):
    """fn(x, *rest) scanned with x as the carry (defeats XLA licm)."""
    @jax.jit
    def run(x, rest):
        def body(c, _):
            y = fn(c, *rest)
            # rescale back to the input shape/scale so the carry is stable
            return c + 1e-6 * jnp.mean(y) * jnp.ones_like(c), 0.0
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))
    float(run(x, rest))  # compile + warm
    t0 = time.time()
    float(run(x, rest))  # fetch forces real completion through the tunnel
    return (time.time() - t0) / iters * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    variant = sys.argv[2] if len(sys.argv) > 2 else "xla"
    global conv
    if variant == "rows":
        import os
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from diffmusic_tpu.ops.conv2d_rows import conv2d_same_rows
        conv = lambda x, w: conv2d_same_rows(x, w)
    print(f"variant: {variant}")
    global GEOMETRIES
    if variant == "swap":
        GEOMETRIES = [(w_, h, ci, co, n) for (h, w_, ci, co, n) in GEOMETRIES]
    key = jax.random.key(0)
    print(f"{'geometry':>28} {'GF':>6} {'floor':>6} {'fwd ms':>7} {'util':>5} "
          f"{'f+b ms':>7} {'util':>5}")
    tot_fwd = tot_fb = tot_floor = 0.0
    for (h, w_, cin, cout, n) in GEOMETRIES:
        x = jax.random.normal(key, (1, h, w_, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.02

        gf = 2 * 9 * h * w_ * cin * cout / 1e9
        floor_ms = gf / PEAK_BF16_TFLOPS  # 1 TF at peak = 1 GF/ms

        fwd_ms = timed_scan(conv, x, (w,), iters)

        def fb(x, w):
            y, vjp = jax.vjp(lambda x: conv(x, w), x)
            (dx,) = vjp(y)
            return dx
        fb_ms = timed_scan(fb, x, (w,), iters)

        print(f"{str((h, w_, cin, cout)):>28} {gf:6.1f} {floor_ms:6.3f} "
              f"{fwd_ms:7.3f} {gf / PEAK_BF16_TFLOPS / fwd_ms * 100:4.0f}% "
              f"{fb_ms:7.3f} {2 * gf / PEAK_BF16_TFLOPS / fb_ms * 100:4.0f}%")
        tot_fwd += n * fwd_ms
        tot_fb += n * fb_ms
        tot_floor += n * floor_ms
    print(f"\ndecode totals (weighted): fwd {tot_fwd:.2f} ms  fwd+bwd "
          f"{tot_fb:.2f} ms  floor {tot_floor:.2f}/{2 * tot_floor:.2f} ms")


if __name__ == "__main__":
    main()
