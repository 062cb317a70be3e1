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
    if _force_xla() or (not _INTERPRET and (not _on_tpu() or not aligned)):
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
        # leaky-relu gradient mask: pallas elementwise kernel when eligible
        # (XLA's standalone broadcast_multiply fusions run at 200-550 GB/s on
        # the vocoder shapes — docs/PERF_NOTES.md round-2 trace)
        from .mask_kernel import leaky_mask, mask_ok
        if mask_ok(x) and (_INTERPRET or _on_tpu()):
            dx = leaky_mask(x, dx, slope)
        else:
            dx = jnp.where(x >= 0, dx, slope * dx)
    dres = g if has_residual else None
    dw_adj = None if w_adj is None else jnp.zeros_like(w_adj)
    return (dx.astype(x.dtype), jnp.zeros_like(w),
            jnp.zeros((w.shape[2],), x.dtype), dres, dw_adj)


def _on_tpu() -> bool:
    from .attention_kernel import _on_tpu as f
    return f()


def _force_xla() -> bool:
    """DIFFMUSIC_TPU_CONV1D=xla routes every fused conv to the plain XLA
    composition (A/B hook: measures the pallas custom-call penalty inside the
    full guidance backward at the current geometry)."""
    import os
    return os.environ.get("DIFFMUSIC_TPU_CONV1D", "") == "xla"


_conv1d_vjp.defvjp(_conv1d_fwd, _conv1d_bwd)


# ---------------------------------------------------------------------------
# Canvas (margin-carrying) I/O contract
#
# The per-call jnp.pad / output-slice copies above cost a full activation
# read+write per conv per direction — measured as the dominant residual
# vocoder overhead and the full-program penalty that killed the pallas
# adjoint (docs/PERF_NOTES.md "pad-free margin-carrying kernel I/O").
#
# Contract: activations live on a CANVAS of shape (B, (blocks+2)*TB, C) with
# the signal occupying [TB, TB+t) and ZEROS everywhere outside it ("zero
# margins"). Each canvas conv reads aligned windows straight from the canvas
# (no pad), writes its output in the same layout, and re-establishes the
# invariant itself: two extra grid programs write the margin blocks as zeros
# and the last compute block masks the signal tail. A chain of convs +
# residual adds (the HiFi-GAN ResidualBlock stages) then pads ONCE at entry
# (to_canvas) and slices ONCE at exit (from_canvas), in both the forward and
# the custom-VJP backward.
# ---------------------------------------------------------------------------


def canvas_blocks(t: int) -> int:
    return math.ceil(t / TIME_BLOCK)


def to_canvas(x):
    """(B, t, C) -> (B, (blocks+2)*TB, C); signal at [TB, TB+t), zero margins."""
    t = x.shape[1]
    blocks = canvas_blocks(t)
    return jnp.pad(x, ((0, 0), (TIME_BLOCK, (blocks + 1) * TIME_BLOCK - t),
                       (0, 0)))


def from_canvas(xc, t: int):
    """Inverse of to_canvas for a signal of (static) length t."""
    return xc[:, TIME_BLOCK:TIME_BLOCK + t, :]


def canvas_mode() -> str:
    """'off' | 'pallas_bwd' | 'xbwd' (DIFFMUSIC_TPU_CANVAS=0|1|xbwd).

    pallas_bwd is the round-2 contract (canvas kernels in BOTH directions) —
    measured LOST (60.4 vs 34.3 ms/iter vocoder fwd+bwd: the per-custom-call
    penalty in the transposed program region, not boundary copies, was the
    cost). xbwd is the round-4 quadrant that round 2 never measured: canvas
    forwards (zero pad/slice copies between chained convs) with the
    measured-best XLA conv-adjoint backward run canvas-wide. Interpret-mode
    tests default to xbwd so the new path has CPU coverage."""
    import os
    v = os.environ.get("DIFFMUSIC_TPU_CANVAS", "")
    if v == "1":
        return "pallas_bwd"
    if v == "xbwd":
        return "xbwd"
    if v == "" and _INTERPRET:
        # interpret-mode default keeps CPU coverage on the xbwd path; an
        # EXPLICIT "0" forces the canvas off even here so the A/B hook
        # behaves like every other routing env var
        return "xbwd"
    return "off"


def canvas_ok(cin: int, cout: int) -> bool:
    """Mosaic DMA lane dims must be 128-aligned; off-TPU (non-interpret) the
    plain XLA path wins, so canvas routing is TPU + aligned channels only
    (mode selection: canvas_mode)."""
    return (_INTERPRET or (canvas_mode() != "off" and _on_tpu())) \
        and cin % 128 == 0 and cout % 128 == 0


def _canvas_kernel(x_hbm, w_ref, b_ref, r_ref, out_ref, xs_ref, sem, *,
                   k: int, dilation: int, margin: int, tail: int,
                   slope, has_residual: bool, adjoint: bool):
    bsz_i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)           # blocks + 2
    blocks = nj - 2
    pad = (k - 1) * dilation // 2
    win = TIME_BLOCK + 2 * margin
    total = pl.num_programs(0) * blocks

    def dma_for(lin_idx):
        bb = lin_idx // blocks
        jj = jax.lax.rem(lin_idx, blocks) + 1
        slot = jax.lax.rem(lin_idx, 2)
        # margin is a sublane multiple and TIME_BLOCK is a lane multiple, so
        # the window start is tile-aligned — assert it for Mosaic's
        # divisibility analysis (it can't prove it through the subtraction)
        start = pl.multiple_of(jj * TIME_BLOCK - margin, margin)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(start, win), :],
            xs_ref.at[slot], sem.at[slot])

    is_zero = jnp.logical_or(j == 0, j == nj - 1)
    lin = bsz_i * blocks + (j - 1)

    @pl.when(jnp.logical_and(bsz_i == 0, j == 0))
    def _():
        dma_for(0).start()

    @pl.when(is_zero)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when(jnp.logical_not(is_zero))
    def _():
        # double-buffered prefetch of the NEXT compute window (grid steps run
        # sequentially; the copy hides behind this block's k MXU dots)
        @pl.when(lin + 1 < total)
        def _():
            dma_for(lin + 1).start()

        dma_for(lin).wait()
        xs = xs_ref[jax.lax.rem(lin, 2)]
        if slope is not None:
            xf = xs.astype(jnp.float32)   # no bf16 compare on this target
            xs = jnp.where(xf >= 0, xf, slope * xf).astype(xs.dtype)

        acc = None
        base = margin - pad
        for tap in range(k):
            w_tap = w_ref[k - 1 - tap] if adjoint else w_ref[tap]
            dims = (((1,), (1,)), ((), ())) if adjoint \
                else (((1,), (0,)), ((), ()))
            off = base + tap * dilation
            d = jax.lax.dot_general(xs[off:off + TIME_BLOCK, :], w_tap, dims,
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        acc = acc + b_ref[:, :].astype(jnp.float32)
        if has_residual:
            acc = acc + r_ref[0].astype(jnp.float32)
        if tail < TIME_BLOCK:
            # zero the positions past the signal end so the consumer's zero-
            # margin invariant holds without any host-side masking
            row = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
            acc = jnp.where(jnp.logical_and(j == blocks, row >= tail),
                            jnp.float32(0), acc)
        out_ref[0] = acc.astype(out_ref.dtype)


def _conv1d_canvas_pallas(xc, w, b, t: int, dilation: int, slope,
                          residual, adjoint: bool = False):
    """Canvas-contract conv: xc, residual, and the result are canvas-shaped."""
    bsz, tc, cin = xc.shape
    k = w.shape[0]
    cout = w.shape[1] if adjoint else w.shape[2]
    blocks = canvas_blocks(t)
    assert tc == (blocks + 2) * TIME_BLOCK, (tc, t)
    pad = (k - 1) * dilation // 2
    margin = _sublane_round(max(pad, 1), xc.dtype)
    tail = t - (blocks - 1) * TIME_BLOCK

    has_residual = residual is not None
    if has_residual:
        rp = residual
        r_index = lambda b_, j: (b_, j, 0)
    else:
        rp = jnp.zeros((bsz, TIME_BLOCK, cout), xc.dtype)
        r_index = lambda b_, j: (b_, 0, 0)

    kernel = functools.partial(_canvas_kernel, k=k, dilation=dilation,
                               margin=margin, tail=tail, slope=slope,
                               has_residual=has_residual, adjoint=adjoint)
    win = TIME_BLOCK + 2 * margin
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, (blocks + 2) * TIME_BLOCK, cout),
                                       xc.dtype),
        grid=(bsz, blocks + 2),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # canvas in HBM
            pl.BlockSpec(w.shape, lambda b_, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TIME_BLOCK, cout), r_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TIME_BLOCK, cout), lambda b_, j: (b_, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, win, cin), xc.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * blocks * TIME_BLOCK * k * cin * cout,
            bytes_accessed=xc.dtype.itemsize * bsz * blocks * win * cin,
            transcendentals=0),
        interpret=_INTERPRET,
    )(xc, w, b.reshape(1, cout), rp)


def _canvas_reference(xc, w, b, t, dilation, slope, residual):
    """Identical canvas semantics on the plain XLA path (grad checks / CPU)."""
    x = from_canvas(xc, t)
    r = from_canvas(residual, t) if residual is not None else None
    return to_canvas(_conv1d_reference(x, w, b, dilation, slope, r))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _canvas_vjp(xc, w, b, residual, w_adj, t: int, dilation: int, slope,
                has_residual: bool):
    r = residual if has_residual else None
    if not _INTERPRET and not _on_tpu():
        return _canvas_reference(xc, w, b, t, dilation, slope, r)
    return _conv1d_canvas_pallas(xc, w, b, t, dilation, slope, r)


def conv1d_fused_canvas(xc, w, b, residual, t: int, dilation: int = 1,
                        slope=None, has_residual: bool = False, w_adj=None):
    """Canvas-contract version of conv1d_fused (see module banner above).

    xc and residual are canvas tensors (to_canvas layout, zero margins); the
    result is a canvas tensor with the invariant re-established. Only call
    when canvas_ok(cin, cout) — channels must be 128-aligned for the DMA.
    The backward runs the SAME kernel on the (canvas-shaped, zero-margin)
    cotangent with the pre-transposed w_adj — no boundary copies anywhere in
    the differentiated chain.
    """
    return _canvas_vjp(xc, w, b, residual, w_adj, t, dilation, slope,
                       has_residual)


def _canvas_fwd(xc, w, b, residual, w_adj, t, dilation, slope, has_residual):
    out = _canvas_vjp(xc, w, b, residual, w_adj, t, dilation, slope,
                      has_residual)
    return out, (xc, w, w_adj)


def _canvas_bwd(t, dilation, slope, has_residual, res, g):
    xc, w, w_adj = res
    g16 = g.astype(w.dtype)
    zero_b = jnp.zeros((w.shape[1],), w.dtype)
    if not _INTERPRET and not _on_tpu():
        w_adj_local = jnp.flip(w, axis=0).swapaxes(1, 2)
        dx = _canvas_reference(g16, w_adj_local, zero_b, t, dilation, None,
                               None)
    elif w_adj is not None:
        dx = _conv1d_canvas_pallas(g16, w_adj.astype(w.dtype), zero_b, t,
                                   dilation, None, None)
    else:
        dx = _conv1d_canvas_pallas(g16, w, zero_b, t, dilation, None, None,
                                   adjoint=True)
    if slope is not None:
        dx = jnp.where(xc >= 0, dx, slope * dx)
    dres = g if has_residual else None
    dw_adj = None if w_adj is None else jnp.zeros_like(w_adj)
    return (dx.astype(xc.dtype), jnp.zeros_like(w),
            jnp.zeros((w.shape[2],), xc.dtype), dres, dw_adj)


_canvas_vjp.defvjp(_canvas_fwd, _canvas_bwd)


# ---------------------------------------------------------------------------
# Fused conv PAIR: one kernel call computes a whole HiFi-GAN ResidualBlock
# iteration  y = conv2(leaky(conv1(leaky(x)) + b1)) + b2 + x  (conv1 dilated,
# conv2 dilation-1, same odd k), emitting the intermediate h = conv1(leaky(x))
# + b1 as a second output for the backward's leaky-derivative mask.
#
# Versus two fused calls, the forward's HBM traffic drops from 3 activation
# reads + 2 writes to 1 read + 2 writes (h never round-trips as an input),
# and the pallas call count halves. The backward stays the measured-best XLA
# conv adjoint (see _conv1d_bwd notes) — two adjoint convs + masks.
# ---------------------------------------------------------------------------


def _conv_pair_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, h_ref,
                      xs_ref, sem, *, k: int, dilation: int, h1r: int,
                      h2r: int, pad1: int, pad2: int, slope, t_valid: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    win = TIME_BLOCK + 2 * (h1r + h2r)
    lin = b * nb + i
    total = pl.num_programs(0) * nb

    def dma_for(lin_idx):
        bb = lin_idx // nb
        ii = lin_idx % nb
        slot = jax.lax.rem(lin_idx, 2)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * TIME_BLOCK, win), :], xs_ref.at[slot],
            sem.at[slot])

    @pl.when(lin == 0)
    def _():
        dma_for(lin).start()

    @pl.when(lin + 1 < total)
    def _():
        dma_for(lin + 1).start()

    dma_for(lin).wait()
    raw = xs_ref[jax.lax.rem(lin, 2)]            # (win, C) input dtype
    rawf = raw.astype(jnp.float32)
    xs = jnp.where(rawf >= 0, rawf, slope * rawf).astype(raw.dtype)

    # conv1 over the extended range [-h2r, TB + h2r) so conv2 has its halo
    nh = TIME_BLOCK + 2 * h2r
    r0 = h1r - pad1
    acc1 = None
    for j in range(k):
        d = jax.lax.dot_general(xs[r0 + j * dilation:r0 + j * dilation + nh, :],
                                w1_ref[j], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc1 = d if acc1 is None else acc1 + d
    h = acc1 + b1_ref[:, :].astype(jnp.float32)  # (nh, C) fp32
    # conv2 consumes h ZERO-padded outside [0, t): rows beyond the signal
    # carry the conv1 bias otherwise (the separate-call reference pads the
    # materialized h with zeros)
    row = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0) \
        + i * TIME_BLOCK - h2r
    h = jnp.where(jnp.logical_and(row >= 0, row < t_valid), h,
                  jnp.float32(0))
    h_ref[0] = h[h2r:h2r + TIME_BLOCK].astype(h_ref.dtype)

    hs = jnp.where(h >= 0, h, slope * h).astype(raw.dtype)
    c0 = h2r - pad2
    acc2 = None
    for j in range(k):
        d = jax.lax.dot_general(hs[c0 + j:c0 + j + TIME_BLOCK, :], w2_ref[j],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc2 = d if acc2 is None else acc2 + d
    y = acc2 + b2_ref[:, :].astype(jnp.float32) \
        + rawf[h1r + h2r:h1r + h2r + TIME_BLOCK]
    y_ref[0] = y.astype(y_ref.dtype)


def _conv1d_pair_pallas(x, w1, b1, w2, b2, dilation: int, slope):
    bsz, t, cin = x.shape
    k = w1.shape[0]
    cout = w1.shape[2]
    pad1 = (k - 1) * dilation // 2
    pad2 = (k - 1) // 2
    h1r = _sublane_round(max(pad1, 1), x.dtype)
    h2r = _sublane_round(max(pad2, 1), x.dtype)
    blocks = math.ceil(t / TIME_BLOCK)
    ht = h1r + h2r
    right = blocks * TIME_BLOCK + ht - t
    xp = jnp.pad(x, ((0, 0), (ht, right), (0, 0)))

    kernel = functools.partial(_conv_pair_kernel, k=k, dilation=dilation,
                               h1r=h1r, h2r=h2r, pad1=pad1, pad2=pad2,
                               slope=slope, t_valid=t)
    win = TIME_BLOCK + 2 * ht
    y, h = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((bsz, blocks * TIME_BLOCK, cout),
                                        x.dtype),
                   jax.ShapeDtypeStruct((bsz, blocks * TIME_BLOCK, cout),
                                        x.dtype)),
        grid=(bsz, blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # x stays in HBM
            pl.BlockSpec(w1.shape, lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TIME_BLOCK, cout),
                                lambda b_, i: (b_, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TIME_BLOCK, cout),
                                lambda b_, i: (b_, i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, win, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * blocks * TIME_BLOCK * k * cin * cout,
            bytes_accessed=x.dtype.itemsize * bsz * blocks * win * cin * 3,
            transcendentals=0),
        interpret=_INTERPRET,
    )(xp, w1, b1.reshape(1, cout), w2, b2.reshape(1, cout))
    return y[:, :t, :], h[:, :t, :]


def _pair_reference(x, w1, b1, w2, b2, dilation, slope):
    h = _conv1d_reference(x, w1, b1, dilation, slope, None)
    return _conv1d_reference(h, w2, b2, 1, slope, x), h


def pair_ok(k: int, cin: int, cout: int, dtype) -> bool:
    """Pair routing: TPU/interpret, 128-aligned channels, and both weight
    tensors resident in VMEM with room for the window/h buffers (the k=11
    C=512 stage-0 resblock at 11.5 MB of weights is over budget)."""
    itemsize = jnp.dtype(dtype).itemsize
    weights_mb = 2 * k * cin * cout * itemsize / 2 ** 20
    return not _force_xla() and (_INTERPRET or _on_tpu()) and cin % 128 == 0 \
        and cout % 128 == 0 and weights_mb <= 9.0


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def conv1d_fused_pair(x, w1, b1, w2, b2, dilation: int, slope):
    """y = conv2(leaky(conv1(leaky(x)) + b1)) + b2 + x — one ResidualBlock
    iteration (models/hifigan.py::ResidualBlock) in a single fused kernel.
    Only call when pair_ok(...). Weight/bias cotangents are symbolic zeros
    (frozen-weight inference framework, like conv1d_fused)."""
    if not _INTERPRET and not _on_tpu():
        return _pair_reference(x, w1, b1, w2, b2, dilation, slope)[0]
    return _conv1d_pair_pallas(x, w1, b1, w2, b2, dilation, slope)[0]


def _pair_fwd(x, w1, b1, w2, b2, dilation, slope):
    if not _INTERPRET and not _on_tpu():
        y, h = _pair_reference(x, w1, b1, w2, b2, dilation, slope)
    else:
        y, h = _conv1d_pair_pallas(x, w1, b1, w2, b2, dilation, slope)
    return y, (x, h, w1, w2)


def _pair_bwd(dilation, slope, res, g):
    x, h, w1, w2 = res
    g16 = g.astype(w1.dtype)
    zero_b = jnp.zeros((w1.shape[1],), w1.dtype)
    # adjoint of 'same' odd-k conv = same conv with flipped-transposed kernel
    # (XLA path — the measured-best backward, see _conv1d_bwd)
    from .mask_kernel import leaky_mask, leaky_mask_add, mask_ok
    use_pallas_mask = mask_ok(x) and (_INTERPRET or _on_tpu())
    w2_adj = jnp.flip(w2, axis=0).swapaxes(1, 2)
    dhs = _conv1d_reference(g16, w2_adj, zero_b, 1, None, None)
    # leaky-relu gradient masks: pallas elementwise kernels when eligible
    # (XLA's standalone broadcast_multiply fusions run at 200-550 GB/s on
    # the vocoder shapes — docs/PERF_NOTES.md round-2 trace)
    if use_pallas_mask:
        dh = leaky_mask(h, dhs, slope)
    else:
        dh = jnp.where(h >= 0, dhs, slope * dhs)
    w1_adj = jnp.flip(w1, axis=0).swapaxes(1, 2)
    dxs = _conv1d_reference(dh.astype(w1.dtype), w1_adj, zero_b, dilation,
                            None, None)
    if use_pallas_mask:
        dx = leaky_mask_add(x, dxs, g, slope)
    else:
        dx = jnp.where(x >= 0, dxs, slope * dxs) + g
    return (dx.astype(x.dtype), jnp.zeros_like(w1),
            jnp.zeros((w1.shape[2],), x.dtype), jnp.zeros_like(w2),
            jnp.zeros((w2.shape[2],), x.dtype))


conv1d_fused_pair.defvjp(_pair_fwd, _pair_bwd)


# ---------------------------------------------------------------------------
# Canvas-contract fused PAIR + XLA adjoint backward (round 4)
#
# The round-2 canvas experiment only ever measured canvas forwards combined
# with PALLAS backwards (pre-transposed w_adj or in-kernel adjoint) — the
# configuration whose per-custom-call penalty in the transposed program
# region was later isolated by the mask-kernel experiment (docs/PERF_NOTES.md
# round-2). This section supplies the untested quadrant: canvas-contract
# forward kernels (zero pad/slice copies between the chained resblock convs —
# the round-3 trace attributes 7.9 ms/step to the pallas-boundary copy/layout
# tail) with the measured-best XLA conv-adjoint backward operating directly
# on canvas-shaped tensors (margins re-zeroed by fused iota masks, so no
# boundary copies appear in the backward either).
# ---------------------------------------------------------------------------


def _pair_canvas_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, h_ref,
                        xs_ref, sem, *, k: int, dilation: int, h1r: int,
                        h2r: int, pad1: int, pad2: int, slope,
                        t_valid: int):
    bsz_i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)          # blocks + 2
    blocks = nj - 2
    ht = h1r + h2r
    win = TIME_BLOCK + 2 * ht
    total = pl.num_programs(0) * blocks

    def dma_for(lin_idx):
        bb = lin_idx // blocks
        jj = jax.lax.rem(lin_idx, blocks) + 1
        slot = jax.lax.rem(lin_idx, 2)
        start = pl.multiple_of(jj * TIME_BLOCK - ht,
                               math.gcd(TIME_BLOCK, ht))
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(start, win), :], xs_ref.at[slot], sem.at[slot])

    is_zero = jnp.logical_or(j == 0, j == nj - 1)
    lin = bsz_i * blocks + (j - 1)

    @pl.when(jnp.logical_and(bsz_i == 0, j == 0))
    def _():
        dma_for(0).start()

    @pl.when(is_zero)
    def _():
        y_ref[0] = jnp.zeros_like(y_ref[0])
        h_ref[0] = jnp.zeros_like(h_ref[0])

    @pl.when(jnp.logical_not(is_zero))
    def _():
        @pl.when(lin + 1 < total)
        def _():
            dma_for(lin + 1).start()

        dma_for(lin).wait()
        raw = xs_ref[jax.lax.rem(lin, 2)]
        rawf = raw.astype(jnp.float32)
        xs = jnp.where(rawf >= 0, rawf, slope * rawf).astype(raw.dtype)

        # conv1 over the extended range so conv2 has its halo in VMEM
        nh = TIME_BLOCK + 2 * h2r
        r0 = h1r - pad1
        acc1 = None
        for tap in range(k):
            d = jax.lax.dot_general(
                xs[r0 + tap * dilation:r0 + tap * dilation + nh, :],
                w1_ref[tap], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc1 = d if acc1 is None else acc1 + d
        h = acc1 + b1_ref[:, :].astype(jnp.float32)
        # zero h outside the signal: bias rows would otherwise leak into
        # conv2 and break the zero-margin invariant of the h output
        row = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0) \
            + (j - 1) * TIME_BLOCK - h2r
        h = jnp.where(jnp.logical_and(row >= 0, row < t_valid), h,
                      jnp.float32(0))
        h_ref[0] = h[h2r:h2r + TIME_BLOCK].astype(h_ref.dtype)

        hs = jnp.where(h >= 0, h, slope * h).astype(raw.dtype)
        c0 = h2r - pad2
        acc2 = None
        for tap in range(k):
            d = jax.lax.dot_general(hs[c0 + tap:c0 + tap + TIME_BLOCK, :],
                                    w2_ref[tap], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc2 = d if acc2 is None else acc2 + d
        y = acc2 + b2_ref[:, :].astype(jnp.float32) \
            + rawf[ht:ht + TIME_BLOCK]
        yrow = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) \
            + (j - 1) * TIME_BLOCK
        y = jnp.where(yrow < t_valid, y, jnp.float32(0))
        y_ref[0] = y.astype(y_ref.dtype)


def _pair_canvas_pallas(xc, w1, b1, w2, b2, t: int, dilation: int, slope):
    bsz, tc, cin = xc.shape
    k = w1.shape[0]
    cout = w1.shape[2]
    blocks = canvas_blocks(t)
    assert tc == (blocks + 2) * TIME_BLOCK, (tc, t)
    pad1 = (k - 1) * dilation // 2
    pad2 = (k - 1) // 2
    h1r = _sublane_round(max(pad1, 1), xc.dtype)
    h2r = _sublane_round(max(pad2, 1), xc.dtype)
    ht = h1r + h2r
    win = TIME_BLOCK + 2 * ht

    kernel = functools.partial(_pair_canvas_kernel, k=k, dilation=dilation,
                               h1r=h1r, h2r=h2r, pad1=pad1, pad2=pad2,
                               slope=slope, t_valid=t)
    y, h = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((bsz, tc, cout), xc.dtype),
                   jax.ShapeDtypeStruct((bsz, tc, cout), xc.dtype)),
        grid=(bsz, blocks + 2),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # canvas in HBM
            pl.BlockSpec(w1.shape, lambda b_, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda b_, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TIME_BLOCK, cout),
                                lambda b_, j: (b_, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TIME_BLOCK, cout),
                                lambda b_, j: (b_, j, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, win, cin), xc.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * blocks * TIME_BLOCK * k * cin * cout,
            bytes_accessed=xc.dtype.itemsize * bsz * blocks * win * cin * 3,
            transcendentals=0),
        interpret=_INTERPRET,
    )(xc, w1, b1.reshape(1, cout), w2, b2.reshape(1, cout))
    return y, h


def _pair_canvas_reference(xc, w1, b1, w2, b2, t, dilation, slope):
    y, h = _pair_reference(from_canvas(xc, t), w1, b1, w2, b2, dilation, slope)
    return to_canvas(y), to_canvas(h)


def _canvas_row_mask(tc: int, t: int, dtype=jnp.float32):
    """(1, tc, 1) 1/0 mask of the signal region [TB, TB+t) on the canvas."""
    r = jnp.arange(tc)
    return ((r >= TIME_BLOCK) & (r < TIME_BLOCK + t)).astype(dtype)[None, :,
                                                                   None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def conv1d_pair_canvas(xc, w1, b1, w2, b2, t: int, dilation: int, slope):
    """Canvas-contract ResidualBlock iteration
    y = conv2(leaky(conv1(leaky(x)) + b1)) + b2 + x, both I/O canvas-shaped
    with zero margins re-established in-kernel (no pad/slice copies between
    chained pairs). Backward = the measured-best XLA conv adjoints run
    canvas-wide, margins re-zeroed by fused iota masks. Only call when
    pair_ok(...)."""
    if not _INTERPRET and not _on_tpu():
        return _pair_canvas_reference(xc, w1, b1, w2, b2, t, dilation,
                                      slope)[0]
    return _pair_canvas_pallas(xc, w1, b1, w2, b2, t, dilation, slope)[0]


def _pair_canvas_fwd(xc, w1, b1, w2, b2, t, dilation, slope):
    if not _INTERPRET and not _on_tpu():
        y, h = _pair_canvas_reference(xc, w1, b1, w2, b2, t, dilation, slope)
    else:
        y, h = _pair_canvas_pallas(xc, w1, b1, w2, b2, t, dilation, slope)
    return y, (xc, h, w1, w2)


def _pair_canvas_bwd(t, dilation, slope, res, g):
    xc, h, w1, w2 = res
    rv = _canvas_row_mask(xc.shape[1], t)
    g = g * rv.astype(g.dtype)
    g16 = g.astype(w1.dtype)
    zero_b = jnp.zeros((w1.shape[1],), w1.dtype)
    w2_adj = jnp.flip(w2, axis=0).swapaxes(1, 2)
    dhs = _conv1d_reference(g16, w2_adj, zero_b, 1, None, None)
    dh = jnp.where(h >= 0, dhs, slope * dhs) * rv.astype(dhs.dtype)
    w1_adj = jnp.flip(w1, axis=0).swapaxes(1, 2)
    dxs = _conv1d_reference(dh.astype(w1.dtype), w1_adj, zero_b, dilation,
                            None, None)
    dx = (jnp.where(xc >= 0, dxs, slope * dxs) + g) * rv.astype(dxs.dtype)
    return (dx.astype(xc.dtype), jnp.zeros_like(w1),
            jnp.zeros((w1.shape[2],), xc.dtype), jnp.zeros_like(w2),
            jnp.zeros((w2.shape[2],), xc.dtype))


conv1d_pair_canvas.defvjp(_pair_canvas_fwd, _pair_canvas_bwd)


# Canvas single conv with the XLA adjoint backward (the k=11 ch512 resblock
# convs that pair_ok excludes for VMEM budget): forward = the existing canvas
# kernel, backward = canvas-wide XLA adjoint with fused margin masks.
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def conv1d_canvas_xbwd(xc, w, b, residual, t: int, dilation: int,
                       slope, has_residual: bool):
    r = residual if has_residual else None
    if not _INTERPRET and not _on_tpu():
        return _canvas_reference(xc, w, b, t, dilation, slope, r)
    return _conv1d_canvas_pallas(xc, w, b, t, dilation, slope, r)


def _canvas_xbwd_fwd(xc, w, b, residual, t, dilation, slope, has_residual):
    out = conv1d_canvas_xbwd(xc, w, b, residual, t, dilation, slope,
                             has_residual)
    return out, (xc, w)


def _canvas_xbwd_bwd(t, dilation, slope, has_residual, res, g):
    xc, w = res
    rv = _canvas_row_mask(xc.shape[1], t)
    g = g * rv.astype(g.dtype)
    g16 = g.astype(w.dtype)
    zero_b = jnp.zeros((w.shape[1],), w.dtype)
    w_adj = jnp.flip(w, axis=0).swapaxes(1, 2)
    dxs = _conv1d_reference(g16, w_adj, zero_b, dilation, None, None)
    if slope is not None:
        dxs = jnp.where(xc >= 0, dxs, slope * dxs)
    dx = dxs * rv.astype(dxs.dtype)
    dres = g if has_residual else None
    return (dx.astype(xc.dtype), jnp.zeros_like(w),
            jnp.zeros((w.shape[2],), xc.dtype), dres)


conv1d_canvas_xbwd.defvjp(_canvas_xbwd_fwd, _canvas_xbwd_bwd)
