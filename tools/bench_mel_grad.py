"""Mel-spectrogram gradient: gather-framing + manual bwd vs strided-conv STFT.

The guidance loss differentiates op.transform (MelSpectrogram) every step —
measured ~11.5 ms/step including the operator and norm
(bench_guidance_parts.py). The current path frames via a (frames, n_fft)
gather and uses the manual scatter-free backward; the conv formulation gives
XLA the strided windowing natively and autodiff emits its conv adjoint
(overlap-add) directly.

Usage: python tools/bench_mel_grad.py [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/diffmusic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

L = 160000  # 10 s at 16 kHz
N_FFT, HOP, N_MELS, SR = 1024, 160, 64, 16000


def bench(label, loss_of, x, iters):
    @jax.jit
    def run(x0):
        def body(carry, _):
            g = jax.grad(loss_of)(carry)
            return carry + 1e-6 * g, jnp.sum(g)
        final, _ = jax.lax.scan(body, x0, None, length=iters)
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
    print(f"{label:30s} compile={compile_s:6.1f}s  "
          f"per-iter={wall / iters * 1e3:7.3f} ms", flush=True)


def main(iters: int = 100, variant: str = "both"):
    sys.path.insert(0, ".")
    from diffmusic_tpu.ops.mel import MelSpectrogram
    from diffmusic_tpu.pallas.mel_kernel import _bases

    x = jax.random.normal(jax.random.key(0), (1, L)) * 0.1
    mel = MelSpectrogram(SR, N_FFT, HOP, N_FFT, N_MELS)

    basis, fb = _bases(N_FFT, N_FFT, N_MELS, SR, 0.0, None, True, N_MELS)
    basis = jnp.asarray(basis)          # (n_fft, 2*n_freqs), window folded in
    fb = jnp.asarray(fb)                # (n_freqs, n_mels)
    n_freqs = N_FFT // 2 + 1

    def mel_conv(xx):
        xb = jnp.pad(xx, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
        spec2 = jax.lax.conv_general_dilated(
            xb[..., None], basis[:, None, :], window_strides=(HOP,),
            padding=[(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"))
        re, im = spec2[..., :n_freqs], spec2[..., n_freqs:]
        mag = re * re + im * im                       # (B, frames, n_freqs)
        return jnp.matmul(mag, fb)                    # (B, frames, n_mels)

    if variant in ("both", "gather"):
        bench("gather-frames + manual bwd",
              lambda xx: jnp.sum(mel(xx)), x, iters)
    if variant in ("both", "conv"):
        bench("strided-conv STFT, autodiff",
              lambda xx: jnp.sum(mel_conv(xx)), x, iters)

    # numerical agreement (mel returns (B, n_mels, T); conv returns (B, T, M))
    a = jnp.swapaxes(mel(x), -1, -2)
    b = mel_conv(x)[:, : a.shape[1]]
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"max rel err fwd: {err:.2e}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100,
         sys.argv[2] if len(sys.argv) > 2 else "both")
