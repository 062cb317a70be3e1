"""Fused 'same' conv2d Pallas kernel for the VAE/UNet skinny-W geometries.

The round-2 device trace (docs/PERF_NOTES.md) showed XLA's conv emitter
running up to 4x its own cost estimate on the VAE decoder's narrow-W NHWC
shapes (e.g. 3x3 at (250,16,512): 0.73 ms measured vs 0.19 est) — the W<=64
spatial minor dim tiles poorly. This kernel flattens (H, W) into one row axis
(a free reshape: NHWC rows are already contiguous) so a kh x kw 'same' conv
becomes kh*kw accumulated (RB, Cin) @ (Cin, Cout) MXU dots at row offsets
dh*W + dw, exactly the formulation that made the conv1d vocoder kernel 1.8x
XLA in-program. W-boundary wrap-around (output row r reading row r+dw across
an image row edge) is cancelled by periodic masks on the shifted operand:
row r is valid for tap dw iff 0 <= (r mod W) + dw < W. Requiring W | ROW_BLOCK
makes the mask identical for every grid block, so it is two iota compares.

Backward: the guidance gradient differentiates ACTIVATIONS only (weights are
frozen, SURVEY.md section 3.3), so the custom VJP returns symbolic-zero
weight/bias cotangents and computes dx with XLA's adjoint conv — the measured
best full-program routing for conv backwards (pallas adjoints lose to a
scheduling penalty at full-model scale; docs/PERF_NOTES.md round-1 bisection).
DIFFMUSIC_TPU_CONV2D_BWD=pallas A/Bs the pallas adjoint (flipped taps through
this same kernel).
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 512

# test hook: run the Pallas kernel in interpreter mode on CPU
_INTERPRET = False


def _conv2d_kernel(x_hbm, w_ref, b_ref, out_ref, xs_ref, sem, *,
                   kh: int, kw: int, wdim: int, halo: int, window: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)

    # double-buffered x window DMA (grid steps run sequentially on the core;
    # prefetching block i+1 hides HBM->VMEM behind block i's MXU dots)
    lin = b * nb + i
    total = pl.num_programs(0) * nb

    def dma_for(lin_idx):
        bb = lin_idx // nb
        ii = lin_idx % nb
        slot = jax.lax.rem(lin_idx, 2)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * ROW_BLOCK, window), :], xs_ref.at[slot],
            sem.at[slot])

    @pl.when(lin == 0)
    def _():
        dma_for(lin).start()

    @pl.when(lin + 1 < total)
    def _():
        dma_for(lin + 1).start()

    dma_for(lin).wait()
    xs = xs_ref[jax.lax.rem(lin, 2)]

    # periodic W-boundary masks, one per dw (W | ROW_BLOCK makes them
    # block-invariant); int compares then cast — Mosaic has no bf16 compare
    rm = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, 1), 0) % wdim
    masks = {}
    for dw in range(-(kw // 2), kw // 2 + 1):
        if dw != 0:
            masks[dw] = ((rm >= -dw) & (rm < wdim - dw)).astype(xs.dtype)

    acc = None
    for ti in range(kh * kw):
        dh = ti // kw - kh // 2
        dw = ti % kw - kw // 2
        s = halo + dh * wdim + dw
        tap_x = xs[s:s + ROW_BLOCK, :]
        if dw != 0:
            tap_x = tap_x * masks[dw]
        # bf16 x bf16 -> fp32 accumulate rides the MXU at native rate
        tap = jax.lax.dot_general(
            tap_x, w_ref[ti], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = tap if acc is None else acc + tap
    acc = acc + b_ref[:, :].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _conv2d_pallas(x, w, b):
    """x: (B, H, W, C) NHWC; w: (kh, kw, Cin, Cout); 'same' pad, stride 1."""
    bsz, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    rows = h * wd
    halo = (kh // 2) * wd + kw // 2
    blocks = math.ceil(rows / ROW_BLOCK)
    window = ROW_BLOCK + 2 * halo
    # round the DMA window to a sublane multiple
    mult = 16 if x.dtype == jnp.bfloat16 else 8
    window = ((window + mult - 1) // mult) * mult

    xr = x.reshape(bsz, rows, cin)
    right = blocks * ROW_BLOCK + window - ROW_BLOCK - (rows + halo)
    xp = jnp.pad(xr, ((0, 0), (halo, right), (0, 0)))
    wt = w.reshape(kh * kw, cin, cout)

    kernel = functools.partial(_conv2d_kernel, kh=kh, kw=kw, wdim=wd,
                               halo=halo, window=window)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, blocks * ROW_BLOCK, cout),
                                       x.dtype),
        grid=(bsz, blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # x stays in HBM
            pl.BlockSpec(wt.shape, lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),           # weights resident
            pl.BlockSpec((1, cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROW_BLOCK, cout), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, window, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * blocks * ROW_BLOCK * kh * kw * cin * cout,
            bytes_accessed=x.dtype.itemsize * bsz * blocks * window * cin,
            transcendentals=0),
        interpret=_INTERPRET,
    )(xp, wt, b.reshape(1, cout))
    return out[:, :rows, :].reshape(bsz, h, wd, cout)


def _conv2d_reference(x, w, b):
    kh, kw = w.shape[:2]
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=dn)
    return out + b.astype(out.dtype)


def _eligible(x, w) -> bool:
    kh, kw, cin, cout = w.shape
    wd = x.shape[2]
    return (kh % 2 == 1 and kw % 2 == 1
            and cin % 128 == 0 and cout % 128 == 0
            and ROW_BLOCK % wd == 0
            and x.shape[1] * wd >= ROW_BLOCK)


@jax.custom_vjp
def _conv2d_vjp(x, w, b):
    if _force_xla() or (not _INTERPRET
                        and (not _on_tpu() or not _eligible(x, w))):
        return _conv2d_reference(x, w, b)
    return _conv2d_pallas(x, w, b)


def conv2d_same_fused(x, w, b):
    """y = conv2d(x, w, 'same', stride 1) + b on NHWC, odd kh/kw.

    Weight/bias cotangents are symbolic zeros (frozen-weight inference
    framework — the guidance grad differentiates activations only, matching
    conv1d_fused's contract)."""
    return _conv2d_vjp(x, w, b)


def _conv2d_fwd(x, w, b):
    return _conv2d_vjp(x, w, b), (x, w)


def _conv2d_bwd(res, g):
    x, w = res
    # run the adjoint conv in the WEIGHT dtype: the guidance chain is bf16
    # throughout and fp32 matmuls run at a fraction of the MXU bf16 rate
    g16 = g.astype(w.dtype)
    w_adj = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)  # (kh, kw, Cout, Cin)
    zero_b = jnp.zeros((w.shape[2],), w.dtype)
    if _bwd_impl() == "pallas" and (_INTERPRET
                                    or (_on_tpu() and _eligible(g16, w_adj))):
        dx = _conv2d_pallas(g16, w_adj, zero_b)
    else:
        dx = _conv2d_reference(g16, w_adj, zero_b)
    return (dx.astype(x.dtype), jnp.zeros_like(w),
            jnp.zeros((w.shape[3],), x.dtype))


_conv2d_vjp.defvjp(_conv2d_fwd, _conv2d_bwd)


def _on_tpu() -> bool:
    from .attention_kernel import _on_tpu as f
    return f()


def _force_xla() -> bool:
    return os.environ.get("DIFFMUSIC_TPU_CONV2D", "") == "xla"


def _bwd_impl() -> str:
    return os.environ.get("DIFFMUSIC_TPU_CONV2D_BWD", "xla")
