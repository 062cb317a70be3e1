"""Phase-GEMM ConvTranspose1d Pallas kernel (HiFi-GAN upsampler forwards).

XLA lowers the upsampler ConvTranspose1d stages as lhs-dilated convs whose MXU
work includes the interleaved zeros — the round-2 device trace measured the
three unpacked stages at 0.47/0.93/0.44 ms/step (~25% useful MXU, ~21 GB/s).
Two pure-XLA reformulations (ops/packing.py dense_convtranspose, and its
hybrid with a native-transpose backward) LOST to boundary copies: the packed
output needs an unpack reshape + ragged slices that XLA materializes.

This kernel removes those copies by construction. With t = stride*tp + rho and
p_ct = (k - stride)//2, torch ConvTranspose semantics give

    y[stride*tp + rho] = sum_d  x[tp + d] @ W[rho + p_ct - stride*d]

over the d making the tap index valid — i.e. per output-row block exactly k
MXU dots (TB, Cin) @ (Cin, Cout), the same shape as the forward conv kernel
(conv1d_kernel.py), each accumulated into its phase's lane slice of a
(1, TB, stride, Cout) output block. The (B, R, stride, Cout) result reshapes
to (B, R*stride, Cout) for FREE (row-major), and the ragged torch geometry
(odd k - stride, e.g. the 1000 -> 5001 first MusicLDM stage) costs one slice.
Useful FLOPs only, no packing einsums, no unpack copies.

Backward (guidance differentiates activations only): custom_vjp whose dx is
the linear transpose of the NATIVE formulation — a plain strided conv that
XLA already runs fast (0.42 ms/step across all three stages, PERF_NOTES) —
with symbolic-zero weight/bias cotangents (frozen-weight framework, same
contract as conv1d_kernel.py). Pallas stays out of the transposed region.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# test hook: run in interpreter mode on CPU
_INTERPRET = False

ROW_BLOCK = 256
# scoped-VMEM budget for all double-buffered blocks (w, outputs) + the x
# scratch; the hardware limit is 16 MB and the fp32 accumulator needs slack
VMEM_BUDGET = 12 * 2 ** 20


def _sublane_round(n: int, dtype) -> int:
    mult = 16 if dtype == jnp.bfloat16 else 8
    return ((n + mult - 1) // mult) * mult


@functools.lru_cache(maxsize=None)
def _tap_table(k: int, stride: int):
    """Per-phase (d, j) taps: y[s*tp + rho] += x[tp + d] @ W[j].

    j = rho + p_ct - stride*d must land in [0, k); every j is used exactly
    once across all (rho, d). Returns ({rho: [(d, j), ...]}, d_lo, d_hi)."""
    p_ct = (k - stride) // 2
    taps = {rho: [] for rho in range(stride)}
    ds = []
    for j in range(k):
        rho = (j - p_ct) % stride
        d = (rho + p_ct - j) // stride
        taps[rho].append((d, j))
        ds.append(d)
    return taps, min(ds), max(ds)


def _ct_kernel(x_hbm, w_ref, b_ref, *refs, k: int, stride: int, qb: int,
               win_h: int, d_lo: int):
    # refs = stride output refs (one (1, QB, Cb) block per phase — clean 2-D
    # tiles; a (QB, stride, C) block would put the tiny stride dim on
    # sublanes and turn every phase store into a strided scatter) + scratch
    out_refs, xs_ref, sem = refs[:stride], refs[stride], refs[stride + 1]
    taps, _, _ = _tap_table(k, stride)
    bb = pl.program_id(0)
    c = pl.program_id(1)
    i = pl.program_id(2)
    nb_c = pl.num_programs(1)
    nb_i = pl.num_programs(2)

    # double-buffered x window (rows [i*qb + d_lo, i*qb + d_lo + win_h) of the
    # padded input): start the next grid step's DMA before waiting on ours
    lin = (bb * nb_c + c) * nb_i + i
    total = pl.num_programs(0) * nb_c * nb_i

    def dma_for(lin_idx):
        ii = lin_idx % nb_i
        bb_ = lin_idx // (nb_c * nb_i)
        slot = jax.lax.rem(lin_idx, 2)
        return pltpu.make_async_copy(
            x_hbm.at[bb_, pl.ds(ii * qb, win_h), :], xs_ref.at[slot],
            sem.at[slot])

    @pl.when(lin == 0)
    def _():
        dma_for(lin).start()

    @pl.when(lin + 1 < total)
    def _():
        dma_for(lin + 1).start()

    dma_for(lin).wait()
    xs = xs_ref[jax.lax.rem(lin, 2)]

    for rho in range(stride):
        acc = None
        for d, j in taps[rho]:
            tap = jax.lax.dot_general(
                xs[d - d_lo:d - d_lo + qb, :], w_ref[j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = tap if acc is None else acc + tap
        acc = acc + b_ref[:, :].astype(jnp.float32)
        out_refs[rho][0] = acc.astype(out_refs[rho].dtype)


def _phase_ct_pallas(x, w, b, stride: int, k: int, t_out: int):
    """x: (B, T, Cin); w math layout (k, Cin, Cout) -> (B, t_out, Cout)."""
    bsz, t_in, cin = x.shape
    cout = w.shape[2]
    _, d_lo, d_hi = _tap_table(k, stride)

    rows = -(-t_out // stride)                       # output rows (tp range)
    row_blocks = math.ceil(rows / ROW_BLOCK)
    win_h = _sublane_round(ROW_BLOCK + (d_hi - d_lo), x.dtype)
    # pad so every window [i*QB, i*QB + win_h) of xp is in range, with the
    # d_lo rows of left context folded into the front pad
    front = -d_lo
    need = (row_blocks - 1) * ROW_BLOCK + win_h
    xp = jnp.pad(x, ((0, 0), (front, max(0, need - t_in - front)), (0, 0)))

    isz = x.dtype.itemsize

    def scoped_bytes(cb_):
        return (2 * k * cin * cb_ * isz            # w block, double-buffered
                + 2 * win_h * cin * isz            # x window scratch
                + stride * 2 * ROW_BLOCK * cb_ * isz)  # phase output blocks

    cb = cout
    while cb > 128 and scoped_bytes(cb) > VMEM_BUDGET:
        cb //= 2
    c_blocks = cout // cb

    kernel = functools.partial(_ct_kernel, k=k, stride=stride, qb=ROW_BLOCK,
                               win_h=win_h, d_lo=d_lo)
    r_pad = row_blocks * ROW_BLOCK
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((bsz, r_pad, cout), x.dtype)
                   for _ in range(stride)],
        grid=(bsz, c_blocks, row_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # x stays in HBM
            pl.BlockSpec((k, cin, cb), lambda b_, c, i: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda b_, c, i: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, ROW_BLOCK, cb),
                                lambda b_, c, i: (b_, i, c),
                                memory_space=pltpu.VMEM)
                   for _ in range(stride)],
        scratch_shapes=[
            pltpu.VMEM((2, win_h, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * row_blocks * ROW_BLOCK * k * cin * cout,
            bytes_accessed=x.dtype.itemsize * bsz
            * (row_blocks * win_h * cin
               + row_blocks * ROW_BLOCK * stride * cout),
            transcendentals=0),
        interpret=_INTERPRET,
    )(xp, w, b.reshape(1, cout))
    # interleave phases: row tp contributes outputs [s*tp, s*tp + s); the
    # stack+reshape is one XLA loop fusion that fuses into the consumer's
    # existing pad/pack copy (to_canvas / pack_time)
    out = jnp.stack(outs, axis=2).reshape(bsz, r_pad * stride, cout)
    return out[:, :t_out]


def _native_ct(x, w, b, stride: int, k: int):
    from ..ops.packing import _native_convtranspose
    return _native_convtranspose(x, w, stride, k) + b[None, None, :]


def phase_ct_ok(cin: int, cout: int) -> bool:
    from .attention_kernel import _on_tpu
    # cout must be 128 * 2^n so the VMEM-budget halving loop lands on a
    # 128-aligned block; cin feeds MXU contractions and DMA lane slices
    n = cout // 128
    aligned = cin % 128 == 0 and cout % 128 == 0 and (n & (n - 1)) == 0
    return aligned and (_INTERPRET or _on_tpu())


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _phase_ct(x, w, b, stride: int, k: int, t_out: int):
    if not phase_ct_ok(w.shape[1], w.shape[2]):
        return _native_ct(x, w, b, stride, k)
    return _phase_ct_pallas(x, w, b, stride, k, t_out)


def _phase_ct_fwd(x, w, b, stride, k, t_out):
    # x saved for shape/dtype only (the op is linear in x); XLA DCEs the buffer
    return _phase_ct(x, w, b, stride, k, t_out), (x, w)


def _phase_ct_bwd(stride, k, t_out, res, g):
    x, w = res
    # adjoint of ConvTranspose = a plain strided conv; XLA's lowering of that
    # direction is already fast (0.42 ms/step over all three stages) — run it
    # in the weight dtype (bf16 in production), keeping pallas out of the
    # transposed region (the measured per-custom-call backward penalty)
    g16 = g.astype(w.dtype)
    f = lambda x_: _native_convtranspose_shaped(x_, w, stride, k)
    (dx,) = jax.linear_transpose(
        f, jax.ShapeDtypeStruct(x.shape, w.dtype))(g16)
    return dx.astype(x.dtype), jnp.zeros_like(w), \
        jnp.zeros((w.shape[2],), x.dtype)


def _native_convtranspose_shaped(x, w, stride, k):
    from ..ops.packing import _native_convtranspose
    return _native_convtranspose(x, w, stride, k)


_phase_ct.defvjp(_phase_ct_fwd, _phase_ct_bwd)


def phase_convtranspose(x, w_math, b, stride: int, k: int, t_out: int,
                        slope=None):
    """leaky(x) -> ConvTranspose1d(stride, torch padding (k-stride)//2) + b.

    w_math: (k, Cin, Cout) math layout (nn.ConvTranspose(transpose_kernel=True)
    kernels arrive (k, Cout, Cin) — callers pass w.swapaxes(1, 2), the same
    contract as ops/packing.py::dense_convtranspose). The leaky-relu stays
    outside the linear custom_vjp so its gradient mask is XLA's business."""
    if slope is not None:
        x = jnp.where(x >= 0, x, slope * x)
    return _phase_ct(x, w_math, b, stride, k, t_out)
