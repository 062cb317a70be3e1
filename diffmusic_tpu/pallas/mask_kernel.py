"""Elementwise leaky-ReLU backward-mask Pallas kernels (vocoder adjoints).

The round-2 device trace (docs/PERF_NOTES.md) shows the leaky-ReLU gradient
masks in the vocoder backward — `where(h >= 0, g, slope*g)` between the XLA
adjoint convs of _pair_bwd / _conv1d_bwd — costing 3.93 ms/step across 48
broadcast_multiply fusions running at only 200-550 GB/s (memory floor ~1.8
ms/step at 819 GB/s). XLA does not fuse them into the neighbouring convs
(TPU conv emitters read operands from HBM directly), and its chosen layouts
run the standalone fusions at a fraction of peak.

These kernels stream (block, C) tiles through VMEM with nothing but a
compare+select+multiply(+add) per element — the minimal HBM traffic form.
They are also the isolation experiment for the round-1 "pallas boundary
inside the large backward program" penalty — and the result is DECISIVE:
vocoder fwd+bwd measured **62.38 ms/iter with pallas masks vs 23.79 XLA**
(tools/bench_vocoder_bwd.py 100 xla, DIFFMUSIC_TPU_MASK={pallas,xla},
separate processes). ~48 trivial elementwise custom calls cost ~+38 ms —
~0.8 ms per boundary, the same magnitude as every conv-adjoint experiment.
The penalty is per-custom-call-boundary in the transposed (backward) region
of the scan body, REGARDLESS of kernel content; no pallas formulation can
win there until the underlying scheduling changes. Default xla.

Used only inside custom-VJP backwards (conv1d_kernel._pair_bwd/_conv1d_bwd);
no VJP of their own. Gated by DIFFMUSIC_TPU_MASK (xla default until the A/B
lands; see docs/PERF_NOTES.md).
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 2048  # at C=256; scaled by channels so VMEM stays bounded


def _row_block(c: int) -> int:
    # fp32 intermediates inside the kernel put ~5 live (rows, C) buffers on
    # the VMEM stack; 2**19 total rows*channels keeps the worst case < 16 MB
    return max(512, 2 ** 19 // c)

# test hook: run in interpreter mode on CPU
_INTERPRET = False


def _mask_kernel(h_ref, g_ref, o_ref, *, slope):
    # Mosaic has no bf16 compare — compare in fp32
    h = h_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    o_ref[0] = jnp.where(h >= 0, g, slope * g).astype(o_ref.dtype)


def _mask_add_kernel(h_ref, g_ref, r_ref, o_ref, *, slope):
    h = h_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    r = r_ref[0].astype(jnp.float32)
    o_ref[0] = (jnp.where(h >= 0, g, slope * g) + r).astype(o_ref.dtype)


def _call(kernel, args, slope):
    x = args[0]
    bsz, t, c = x.shape
    rb = _row_block(c)
    blocks = math.ceil(t / rb)
    spec = pl.BlockSpec((1, rb, c), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, slope=slope),
        out_shape=jax.ShapeDtypeStruct(x.shape, args[1].dtype),
        grid=(bsz, blocks),
        in_specs=[spec] * len(args),
        out_specs=spec,
        interpret=_INTERPRET,
    )(*args)


def leaky_mask(h, g, slope):
    """where(h >= 0, g, slope*g) — the VJP of leaky_relu at pre-activation h
    applied to cotangent g. Shapes (B, T, C), any T (ragged last block is
    masked by Mosaic)."""
    if _route_xla() or (not _INTERPRET and not _on_tpu()):
        return jnp.where(h >= 0, g, slope * g)
    return _call(_mask_kernel, (h, g), slope)


def leaky_mask_add(h, g, r, slope):
    """where(h >= 0, g, slope*g) + r — the mask fused with the residual-path
    cotangent add (the dx epilogue of _pair_bwd)."""
    if _route_xla() or (not _INTERPRET and not _on_tpu()):
        return jnp.where(h >= 0, g, slope * g) + r
    return _call(_mask_add_kernel, (h, g, r), slope)


def _route_xla() -> bool:
    return os.environ.get("DIFFMUSIC_TPU_MASK", "xla") != "pallas"


def mask_ok(h) -> bool:
    """Lane-aligned channels and a worthwhile row count (tiny tensors are
    cheaper inside XLA fusions than across a custom-call boundary)."""
    return h.shape[-1] % 128 == 0 and h.shape[1] >= _row_block(h.shape[-1])


def _on_tpu() -> bool:
    from .attention_kernel import _on_tpu as f
    return f()
