"""Per-stage fused vocoder BACKWARD megakernel (round-4, VERDICT r3 item 3a).

Every pallas-in-backward formulation measured so far (per-conv adjoints,
canvas adjoints, elementwise leaky masks) lost to a ~0.8 ms PER-CUSTOM-CALL
penalty in the transposed program region, independent of kernel content
(docs/PERF_NOTES.md rounds 1-3). The untested prediction of that model is
that bounding the CALL COUNT wins: one custom call per resblock stage that
computes the ENTIRE stage input-cotangent — 3 branches x 3 pairs x
(2 adjoint convs + 2 leaky masks + skip add) = 18 adjoint convs fused — pays
the penalty once instead of never being attempted.

Contract (composes with the round-4 canvas-pair forward):
  - Forward runs the canvas-pair kernels, saving each pair's canvas-shaped
    input x_i and intermediate h_i (zero margins by the canvas invariant).
  - Backward is ONE kernel over canvas time blocks: per block it DMAs a
    haloed window of the stage-output cotangent g and of all 18 saved
    tensors (always in-bounds thanks to the TIME_BLOCK canvas margins), and
    chains the adjoints per branch with statically-shrinking valid ranges:
      dcur = g/3
      for pair in reversed(pairs):   # y = conv2(leaky(conv1(leaky(x))+b1))+b2+x
          dh    = leaky'(h_i) * sameconv(dcur, flip(w2)^T, 1)
          dcur  = leaky'(x_i) * sameconv(dh,  flip(w1)^T, d) + dcur
      dx += dcur
    Margin blocks emit zeros; the signal-tail rows are re-zeroed so the
    canvas invariant holds on dx (exactness: tests/test_stage_bwd.py).
  - Weight cotangents are symbolic zeros (frozen-weight inference framework,
    same contract as conv1d_fused); flipped-transposed kernels are built
    OUTSIDE the kernel (hoisted out of the scan by XLA licm).

Eligibility: unpacked stage, all pairs pair_ok, and the whole stage's
flipped weight set + 19 haloed windows resident in VMEM — ch128 stages fit
(~4.1 MB weights + ~3 MB windows); ch256 is ~16.5 MB of weights alone and
would need weight streaming (not built). Gate: DIFFMUSIC_TPU_STAGE_BWD
(default per measurement — see docs/PERF_NOTES.md round-4).
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv1d_kernel import (TIME_BLOCK, _INTERPRET, _on_tpu, _pair_reference,
                            canvas_blocks, from_canvas, to_canvas)

HALO = 64  # >= the largest branch's total adjoint-chain padding (k=11: 60)


def stage_bwd_on() -> bool:
    v = os.environ.get("DIFFMUSIC_TPU_STAGE_BWD", "0")
    return v == "1" or (_INTERPRET and v != "0")


def stage_ok(channels: int, kernel_sizes, dilation_sizes, dtype) -> bool:
    """One lane tile, all-branch weights resident, chain halo within HALO."""
    if channels != 128:
        return False
    total_pad = max(sum((k - 1) * d // 2 + (k - 1) // 2 for d in dils)
                    for k, dils in zip(kernel_sizes, dilation_sizes))
    if total_pad > HALO:
        return False
    wbytes = sum(2 * k * channels * channels * jnp.dtype(dtype).itemsize
                 * len(dils)
                 for k, dils in zip(kernel_sizes, dilation_sizes))
    return wbytes <= 6 * 2 ** 20


def _stage_bwd_kernel(g_hbm, *refs, kernel_sizes, dilation_sizes, slope,
                      t_valid: int, n_pairs: int):
    """refs = [x_hbm x n_pairs, h_hbm x n_pairs, w1adj_ref x n_pairs,
    w2adj_ref x n_pairs, out_ref, gs, xs(n), hs(n), sems]."""
    x_hbm = refs[:n_pairs]
    h_hbm = refs[n_pairs:2 * n_pairs]
    w1a = refs[2 * n_pairs:3 * n_pairs]
    w2a = refs[3 * n_pairs:4 * n_pairs]
    out_ref = refs[4 * n_pairs]
    gs_ref = refs[4 * n_pairs + 1]
    xs_refs = refs[4 * n_pairs + 2:4 * n_pairs + 2 + n_pairs]
    hs_refs = refs[4 * n_pairs + 2 + n_pairs:4 * n_pairs + 2 + 2 * n_pairs]
    sem = refs[-1]

    bsz_i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    blocks = nj - 2
    win = TIME_BLOCK + 2 * HALO
    is_zero = jnp.logical_or(j == 0, j == nj - 1)

    @pl.when(is_zero)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when(jnp.logical_not(is_zero))
    def _():
        start = pl.multiple_of(j * TIME_BLOCK - HALO,
                               math.gcd(TIME_BLOCK, HALO))
        copies = []
        copies.append(pltpu.make_async_copy(
            g_hbm.at[bsz_i, pl.ds(start, win), :], gs_ref, sem.at[0]))
        for i in range(n_pairs):
            copies.append(pltpu.make_async_copy(
                x_hbm[i].at[bsz_i, pl.ds(start, win), :], xs_refs[i],
                sem.at[1 + i]))
            copies.append(pltpu.make_async_copy(
                h_hbm[i].at[bsz_i, pl.ds(start, win), :], hs_refs[i],
                sem.at[1 + n_pairs + i]))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        g = gs_ref[:, :].astype(jnp.float32)
        n_branches = len(kernel_sizes)
        inv = jnp.float32(1.0 / n_branches)
        # window-frame signal-validity mask: the forward pairs re-establish
        # zero margins/tails at every pair, so the exact VJP re-zeroes every
        # intermediate cotangent outside [0, t) as well
        grow = jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0) \
            + (j - 1) * TIME_BLOCK - HALO
        rv = jnp.logical_and(grow >= 0, grow < t_valid)

        def sameconv(x, w_ref, k, dilation, lo):
            """'same' conv of window-frame array x (valid rows [lo, win-lo))
            with the (k, C, C) VMEM-resident kernel; result valid over
            [lo + pad, win - lo - pad). x stays full window shape."""
            pad = (k - 1) * dilation // 2
            nlo = lo + pad
            nrows = win - 2 * nlo
            acc = None
            for tap in range(k):
                off = nlo + tap * dilation - pad
                d = jax.lax.dot_general(
                    x[off:off + nrows, :].astype(w_ref.dtype), w_ref[tap],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            # re-embed at full window shape so all intermediates share frames
            return jnp.pad(acc, ((nlo, nlo), (0, 0))), nlo

        def masked(saved_ref, grad, lo, nrows):
            sv = saved_ref[lo:lo + nrows, :].astype(jnp.float32)
            gr = grad[lo:lo + nrows, :]
            return jnp.where(sv >= 0, gr, slope * gr) \
                * rv[lo:lo + nrows].astype(jnp.float32)

        pair_idx = 0
        pair_of_branch = []
        for b, k in enumerate(kernel_sizes):
            pair_of_branch.append(list(range(pair_idx,
                                             pair_idx + len(dilation_sizes[b]))))
            pair_idx += len(dilation_sizes[b])

        dx = None
        for b, k in enumerate(kernel_sizes):
            dcur = g * inv
            lo = 0
            for pi in reversed(range(len(dilation_sizes[b]))):
                i = pair_of_branch[b][pi]
                d = dilation_sizes[b][pi]
                conv_out, lo2 = sameconv(dcur, w2a[i], k, 1, lo)
                nrows2 = win - 2 * lo2
                dh = jnp.pad(masked(hs_refs[i], conv_out, lo2, nrows2),
                             ((lo2, lo2), (0, 0)))
                conv_out, lo3 = sameconv(dh, w1a[i], k, d, lo2)
                nrows3 = win - 2 * lo3
                dstep = masked(xs_refs[i], conv_out, lo3, nrows3) \
                    + dcur[lo3:lo3 + nrows3, :]
                dcur = jnp.pad(dstep, ((lo3, lo3), (0, 0)))
                lo = lo3
            dx = dcur if dx is None else dx + dcur

        out = dx[HALO:HALO + TIME_BLOCK, :]
        # re-establish the zero-margin invariant on the signal tail
        row = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0) \
            + (j - 1) * TIME_BLOCK
        out = jnp.where(row < t_valid, out, jnp.float32(0))
        out_ref[0] = out.astype(out_ref.dtype)


def _stage_bwd_pallas(g, xs, hs, w1adjs, w2adjs, t, kernel_sizes,
                      dilation_sizes, slope):
    bsz, tc, c = g.shape
    blocks = canvas_blocks(t)
    assert tc == (blocks + 2) * TIME_BLOCK, (tc, t)
    n_pairs = len(xs)
    win = TIME_BLOCK + 2 * HALO

    kernel = functools.partial(_stage_bwd_kernel, kernel_sizes=kernel_sizes,
                               dilation_sizes=dilation_sizes, slope=slope,
                               t_valid=t, n_pairs=n_pairs)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    w_specs = [pl.BlockSpec(w.shape, lambda b_, j: (0, 0, 0),
                            memory_space=pltpu.VMEM)
               for w in (*w1adjs, *w2adjs)]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, tc, c), g.dtype),
        grid=(bsz, blocks + 2),
        in_specs=[any_spec] * (1 + 2 * n_pairs) + w_specs,
        out_specs=pl.BlockSpec((1, TIME_BLOCK, c), lambda b_, j: (b_, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win, c), g.dtype),                    # g window
            *([pltpu.VMEM((win, c), g.dtype)] * (2 * n_pairs)),  # x/h windows
            pltpu.SemaphoreType.DMA((1 + 2 * n_pairs,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * blocks * TIME_BLOCK * c * c
            * sum(k * len(d) for k, d in zip(kernel_sizes, dilation_sizes)),
            bytes_accessed=g.dtype.itemsize * bsz * blocks * win * c
            * (1 + 2 * n_pairs),
            transcendentals=0),
        interpret=_INTERPRET,
    )(g, *xs, *hs, *w1adjs, *w2adjs)


# --------------------------------------------------------------------- stage


def _stage_fwd_collect(xc, params, t, kernel_sizes, dilation_sizes, slope):
    """Canvas forward through all branches, collecting per-pair (x, h)."""
    from .conv1d_kernel import _pair_canvas_pallas, _pair_canvas_reference
    on_kernel = _INTERPRET or _on_tpu()
    saved_x, saved_h = [], []
    total = None
    pi = 0
    for b, k in enumerate(kernel_sizes):
        xb = xc
        for d in dilation_sizes[b]:
            w1, b1, w2, b2 = params[pi]
            pi += 1
            saved_x.append(xb)
            if on_kernel:
                y, h = _pair_canvas_pallas(xb, w1, b1, w2, b2, t, d, slope)
            else:
                y, h = _pair_canvas_reference(xb, w1, b1, w2, b2, t, d, slope)
            saved_h.append(h)
            xb = y
        total = xb if total is None else total + xb
    return total / len(kernel_sizes), saved_x, saved_h


def _stage_ref(x, params, kernel_sizes, dilation_sizes, slope):
    """Plain (non-canvas) reference: mean over branch pair chains."""
    total = None
    pi = 0
    for b, _k in enumerate(kernel_sizes):
        xb = x
        for d in dilation_sizes[b]:
            w1, b1, w2, b2 = params[pi]
            pi += 1
            xb, _h = _pair_reference(xb, w1, b1, w2, b2, d, slope)
        total = xb if total is None else total + xb
    return total / len(kernel_sizes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def stage_resblocks_canvas(xc, params, t: int, kernel_sizes, dilation_sizes,
                           slope):
    """Whole resblock stage on the canvas: mean over branches of chained
    fused pairs; backward = ONE megakernel call (see module docstring).
    params: flat tuple over (branch-major, pair-minor) of (w1, b1, w2, b2)."""
    out, _x, _h = _stage_fwd_collect(xc, params, t, kernel_sizes,
                                     dilation_sizes, slope)
    return out


def _stage_vjp_fwd(xc, params, t, kernel_sizes, dilation_sizes, slope):
    out, saved_x, saved_h = _stage_fwd_collect(xc, params, t, kernel_sizes,
                                               dilation_sizes, slope)
    return out, (tuple(saved_x), tuple(saved_h), params)


def _stage_vjp_bwd(t, kernel_sizes, dilation_sizes, slope, res, g):
    saved_x, saved_h, params = res
    w1adjs = tuple(jnp.flip(p[0], axis=0).swapaxes(1, 2) for p in params)
    w2adjs = tuple(jnp.flip(p[2], axis=0).swapaxes(1, 2) for p in params)
    if _INTERPRET or _on_tpu():
        dx = _stage_bwd_pallas(g.astype(saved_x[0].dtype), saved_x, saved_h,
                               w1adjs, w2adjs, t, kernel_sizes,
                               dilation_sizes, slope)
    else:
        # XLA composition with identical semantics (CPU path)
        from .conv1d_kernel import _canvas_row_mask, _conv1d_reference
        rv = _canvas_row_mask(g.shape[1], t)
        gm = (g * rv.astype(g.dtype)).astype(jnp.float32)
        n_branches = len(kernel_sizes)
        dx = None
        pi0 = 0
        for b, k in enumerate(kernel_sizes):
            dils = dilation_sizes[b]
            dcur = gm / n_branches
            for pj in reversed(range(len(dils))):
                i = pi0 + pj
                zb = jnp.zeros((w2adjs[i].shape[1],), jnp.float32)
                dhs = _conv1d_reference(dcur, w2adjs[i].astype(jnp.float32),
                                        zb, 1, None, None)
                dh = jnp.where(saved_h[i] >= 0, dhs, slope * dhs) \
                    * rv.astype(dhs.dtype)
                dxs = _conv1d_reference(dh, w1adjs[i].astype(jnp.float32),
                                        zb, dils[pj], None, None)
                dcur = jnp.where(saved_x[i] >= 0, dxs, slope * dxs) \
                    * rv.astype(dxs.dtype) + dcur
            pi0 += len(dils)
            dx = dcur if dx is None else dx + dcur
        dx = (dx * rv.astype(dx.dtype)).astype(g.dtype)
    dparams = tuple(tuple(jnp.zeros_like(a) for a in p) for p in params)
    return dx.astype(g.dtype), dparams


stage_resblocks_canvas.defvjp(_stage_vjp_fwd, _stage_vjp_bwd)
