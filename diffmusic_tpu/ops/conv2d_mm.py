"""Tap-GEMM 2-D convolution: k x k 'same' conv as k^2 MXU-standard matmuls.

The VAE decoder's 3x3 convs run on skinny spatial geometry — (250, 16),
(500, 32), (1000, 64) with 128-512 channels. XLA's conv emitter
("EmitAllBatchInSublanes") measures up to 4x slower than its own cost
estimate there (device trace, docs/PERF_NOTES.md round-2 profile): the VAE is
13.4 of 51.4 ms/step while its pure-matmul floor is ~8 ms. This formulation
contracts each kernel tap as one (H*W, Cin) @ (Cin, Cout) dot — every matmul
is MXU-standard with channels on lanes, and XLA fuses the shifted slices into
the operand loads. The adjoint (input gradient) autodiffs to the mirrored
tap-GEMMs plus dense pad-adjoint adds — no conv emitter in either direction.

The 1-D analogue LOST for the HiFi-GAN vocoder (k dense dots vs lax.conv:
52 vs 22.7 ms, docs/PERF_NOTES.md) — large-T 1-D convs are exactly what the
conv emitter is good at. The 2-D skinny-W geometry is the opposite regime;
route per call site, measured.

Reference semantics: torch Conv2d(k, padding=k//2) as used by diffusers
ResnetBlock2D / Upsample2D (reference pipeline models, SURVEY.md L0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv2d_same_mm(x: jax.Array, w: jax.Array, b: jax.Array | None):
    """'same' odd-k 2-D conv via tap matmuls.

    x: (B, H, W, C_in); w: (kh, kw, C_in, C_out) (nn.Conv layout); b: (C_out,)
    or None. Returns (B, H, W, C_out) in x.dtype, fp32 accumulation.
    """
    bsz, h, wdt, cin = x.shape
    kh, kw, _, cout = w.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            tap = jax.lax.slice(
                xp, (0, dy, dx, 0), (bsz, dy + h, dx + wdt, cin))
            t = jax.lax.dot_general(
                tap.reshape(bsz * h * wdt, cin), w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    return acc.reshape(bsz, h, wdt, cout).astype(x.dtype)
