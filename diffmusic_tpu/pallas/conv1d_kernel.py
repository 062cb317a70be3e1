"""Fused dilated conv1d Pallas kernel for the HiFi-GAN guidance hot path.

XLA's conv lowering moves 10.45 GB of HBM per vocoder forward (cost analysis;
~1.0 TFLOP) — it materializes im2col patches and re-reads activations, so the
measured 22.7 ms forward is ~60% memory-bound. This kernel computes
'same'-padded dilated conv1d as k accumulated (TB, Cin) @ (Cin, Cout) MXU dots
over a VMEM-resident signal window, with the input leaky-relu, bias, and
residual add fused — each conv then reads x and w once and writes y once.

The guidance gradient differentiates ACTIVATIONS only (weights are frozen,
SURVEY.md section 3.3), so the custom VJP returns symbolic-zero weight
cotangents (DCE'd) and computes dx as the same kernel applied to the cotangent
with the flipped-transposed kernel — exact for odd k with symmetric padding —
times the leaky-relu derivative mask recomputed from the saved input.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TIME_BLOCK = 512  # 1024 measured neutral (34.45 vs 34.31 ms vocoder grad)

# test hook: run the Pallas kernel in interpreter mode on CPU
_INTERPRET = False


def _sublane_round(n: int, dtype) -> int:
    mult = 16 if dtype == jnp.bfloat16 else 8
    return ((n + mult - 1) // mult) * mult


def _conv_kernel(x_hbm, w_ref, b_ref, r_ref, out_ref, xs_ref, sem, *,
                 k: int, dilation: int, halo: int, slope: float,
                 has_residual: bool, adjoint: bool = False):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    tbh = TIME_BLOCK + halo

    # double-buffered x window: grid steps run sequentially on the core, so
    # starting the NEXT block's DMA before waiting on the current one hides
    # the HBM->VMEM transfer behind this block's k MXU dots
    lin = b * nb + i
    total = pl.num_programs(0) * nb

    def dma_for(lin_idx):
        bb = lin_idx // nb
        ii = lin_idx % nb
        slot = jax.lax.rem(lin_idx, 2)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * TIME_BLOCK, tbh), :], xs_ref.at[slot],
            sem.at[slot])

    @pl.when(lin == 0)
    def _():
        dma_for(lin).start()

    @pl.when(lin + 1 < total)
    def _():
        dma_for(lin + 1).start()

    dma_for(lin).wait()
    xs = xs_ref[jax.lax.rem(lin, 2)]
    if slope is not None:
        # Mosaic has no bf16 compare on this target: do the leaky in fp32,
        # then return to the input dtype so the dots stay bf16 on the MXU
        xf = xs.astype(jnp.float32)
        xs = jnp.where(xf >= 0, xf, slope * xf).astype(xs.dtype)

    acc = None
    for j in range(k):
        # bf16 x bf16 -> fp32 accumulate rides the MXU at native rate.
        # adjoint mode contracts the OUTPUT-channel dim of the flipped tap,
        # so the backward never materializes a transposed weight tensor
        w_tap = w_ref[k - 1 - j] if adjoint else w_ref[j]
        dims = (((1,), (1,)), ((), ())) if adjoint else (((1,), (0,)), ((), ()))
        tap = jax.lax.dot_general(
            xs[j * dilation:j * dilation + TIME_BLOCK, :], w_tap, dims,
            preferred_element_type=jnp.float32)
        acc = tap if acc is None else acc + tap
    acc = acc + b_ref[:, :].astype(jnp.float32)
    if has_residual:
        acc = acc + r_ref[0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _conv1d_pallas(x, w, b, dilation: int, slope, residual,
                   adjoint: bool = False):
    """x: (B, T, Cin); w: (k, Cin, Cout); 'same' padding, odd k.

    adjoint=True computes the cotangent conv (flip taps, contract Cout);
    then x is the output-space cotangent and the result has Cin channels."""
    bsz, t, cin = x.shape
    k = w.shape[0]
    cout = w.shape[1] if adjoint else w.shape[2]
    pad = (k - 1) * dilation // 2
    halo = _sublane_round((k - 1) * dilation, x.dtype)
    blocks = math.ceil(t / TIME_BLOCK)

    # left 'same' pad + right pad so every aligned block window is in range
    right = blocks * TIME_BLOCK + halo - (t + pad)
    xp = jnp.pad(x, ((0, 0), (pad, right), (0, 0)))

    has_residual = residual is not None
    if has_residual:
        rp = jnp.pad(residual, ((0, 0),
                                (0, blocks * TIME_BLOCK - residual.shape[1]),
                                (0, 0)))
        r_index = lambda b_, i: (b_, i, 0)
    else:
        # placeholder operand the kernel never reads: ONE constant block with a
        # constant index_map, so the pipeline fetches it once and never again
        # (a full-size zeros tensor here costs a full HBM write + stream per
        # call — measurable across the vocoder's 27 residual-free convs)
        rp = jnp.zeros((bsz, TIME_BLOCK, cout), x.dtype)
        r_index = lambda b_, i: (b_, 0, 0)

    kernel = functools.partial(_conv_kernel, k=k, dilation=dilation, halo=halo,
                               slope=slope, has_residual=has_residual,
                               adjoint=adjoint)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, blocks * TIME_BLOCK, cout),
                                       x.dtype),
        grid=(bsz, blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # x stays in HBM
            pl.BlockSpec(w.shape, lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),           # weights resident
            pl.BlockSpec((1, cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TIME_BLOCK, cout), r_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TIME_BLOCK, cout), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TIME_BLOCK + halo, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * blocks * TIME_BLOCK * k * cin * cout,
            bytes_accessed=x.dtype.itemsize * bsz * blocks
            * (TIME_BLOCK + halo) * cin,
            transcendentals=0),
        interpret=_INTERPRET,
    )(xp, w, b.reshape(1, cout), rp)
    return out[:, :t, :]


def _conv1d_reference(x, w, b, dilation, slope, residual):
    """Plain-XLA path with identical semantics (CPU fallback + grad checks)."""
    k = w.shape[0]
    h = jnp.where(x >= 0, x, slope * x) if slope is not None else x
    pad = (k - 1) * dilation // 2
    out = jax.lax.conv_general_dilated(
        h, w, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    out = out + b[None, None, :]
    if residual is not None:
        out = out + residual
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _conv1d_vjp(x, w, b, residual, w_adj, dilation: int, slope,
                has_residual: bool):
    # Mosaic DMA slices need 128-aligned lane dims: small-channel convs (the
    # last HiFi-GAN stages, ~10% of FLOPs) stay on the XLA path
    aligned = x.shape[-1] % 128 == 0 and w.shape[-1] % 128 == 0
    if not _INTERPRET and (not _on_tpu() or not aligned):
        return _conv1d_reference(x, w, b, dilation, slope,
                                 residual if has_residual else None)
    return _conv1d_pallas(x, w, b, dilation, slope,
                          residual if has_residual else None)


def conv1d_fused(x, w, b, residual, dilation: int = 1, slope=None,
                 has_residual: bool = False, w_adj=None):
    """y = conv1d(leaky(x), w, dil) + b [+ residual]; 'same' padding, odd k.

    Pass residual=None and has_residual=False for a plain conv. Weight/bias
    cotangents are symbolic zeros (frozen-weight inference framework).

    w_adj: optional pre-flipped/transposed kernel `flip(w, 0).swapaxes(1, 2)`
    of shape (k, Cout, Cin). When given, the activation backward runs the SAME
    MXU-standard Pallas kernel on the cotangent instead of an in-kernel
    swapped-contraction adjoint (which forces per-tap transposes — measured
    slower, see docs/PERF_NOTES.md). Precompute it ONCE outside the denoise
    scan (models/hifigan.py::with_adjoint_weights) so no per-step transposes
    appear in the compiled loop body.
    """
    return _conv1d_vjp(x, w, b, residual, w_adj, dilation, slope, has_residual)


def _conv1d_fwd(x, w, b, residual, w_adj, dilation, slope, has_residual):
    out = _conv1d_vjp(x, w, b, residual, w_adj, dilation, slope, has_residual)
    return out, (x, w, w_adj)


# backward formulation: "pallas" (adjoint conv through this kernel) or "xla"
# (lax.conv adjoint) — measured on v5e, see module docstring perf notes
_BWD_IMPL = "xla"


def _conv1d_bwd(dilation, slope, has_residual, res, g):
    x, w, w_adj = res
    # the cotangent arrives in the loss dtype (fp32); run the adjoint conv in
    # the WEIGHT dtype (bf16 in production) — fp32 matmuls run at a fraction
    # of the MXU's bf16 rate and the guidance chain is bf16 throughout anyway
    g16 = g.astype(w.dtype)
    # adjoint of 'same' odd-k dilated conv = same conv with flipped-transposed
    # kernel; then the leaky-relu derivative mask
    zero_b = jnp.zeros((w.shape[1],), w.dtype)  # adjoint out-channels = Cin
    aligned = g.shape[-1] % 128 == 0 and w.shape[1] % 128 == 0
    if w_adj is not None and (_INTERPRET or (_on_tpu() and aligned)):
        # pre-transposed (k, Cout, Cin) kernel -> the backward is the forward
        # kernel verbatim: both dots MXU-standard, zero per-step transposes
        dx = _conv1d_pallas(g16, w_adj.astype(w.dtype), zero_b, dilation,
                            None, None)
    elif _BWD_IMPL == "pallas" and (aligned or _INTERPRET):
        dx = _conv1d_pallas(g16, w, zero_b, dilation, None, None, adjoint=True)
    else:
        w_adj_local = jnp.flip(w, axis=0).swapaxes(1, 2)  # (k, Cout, Cin)
        dx = _conv1d_reference(g16, w_adj_local, zero_b, dilation, None, None)
    if slope is not None:
        dx = jnp.where(x >= 0, dx, slope * dx)
    dres = g if has_residual else None
    dw_adj = None if w_adj is None else jnp.zeros_like(w_adj)
    return (dx.astype(x.dtype), jnp.zeros_like(w),
            jnp.zeros((w.shape[2],), x.dtype), dres, dw_adj)


def _on_tpu() -> bool:
    from .attention_kernel import _on_tpu as f
    return f()


_conv1d_vjp.defvjp(_conv1d_fwd, _conv1d_bwd)
