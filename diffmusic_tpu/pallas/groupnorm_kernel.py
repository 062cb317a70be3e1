"""Fused GroupNorm(+SiLU) Pallas kernel (UNet forward path).

Motivation (device trace at the 9.8 s bench state, tools/profile_trace.py):
the UNet's GroupNorm stat reductions lower as standalone
convert_reduce_fusions — ~53 per step at 30-45 us each (~1.6 ms/step), ~18x
the memory floor for a 2 MB activation — and the VAE shows the same pattern
scaled up. Each UNet GroupNorm tensor fits VMEM whole (max (4000, 128) at
MusicLDM 10-s scale), so one kernel invocation per batch row computes the
group statistics, the normalize/scale/shift, and the following SiLU in a
single HBM read + write.

Group reductions avoid lane->sublane reshapes (a (C,) -> (G, C//G) reshape
shuffles lanes; Mosaic lowers it poorly): per-channel sums are MXU-projected
onto groups with a constant 0/1 (C, G) map and broadcast back with its
transpose — the same constant-map trick as ops/packing.py.

Routing: TPU + 4-D NHWC + C % 128 == 0 + rows*C <= 2**20 (single-block VMEM;
excludes every VAE decoder geometry, which is differentiated every guided
step — pallas custom calls in the transposed program region pay a measured
~0.8 ms/boundary penalty, docs/PERF_NOTES.md). The UNet is forward-only under
the DPS family; DITTO/optim_prompt gradients flow through an XLA-recompute
custom_vjp (the same contract as pallas/transformer_kernel.py).

Reference semantics: flax nn.GroupNorm (fp32 stats, channel grouping
C -> (G, C//G)) followed by nn.silu, matching diffusers ResnetBlock2D
(SURVEY.md L0; resnet norm1/norm2 in UNet2DConditionModel).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# test hook: run in interpreter mode on CPU
_INTERPRET = False

_ROW_LIMIT_ELEMS = 2 ** 20  # rows * C per batch row; max UNet block is 512K


def _gn_on() -> bool:
    # Measured LOST/neutral (tools/bench_unet.py 100-iter scan, separate
    # processes): UNet CFG fwd 13.84 ms/iter fused vs 13.75 XLA. The saved
    # standalone stat-reduce pass is offset by losing XLA's fusion of the
    # normalize+SiLU into the following conv's operand load — materializing
    # the normalized activation re-adds the write+read the stats saved.
    # Default xla; DIFFMUSIC_TPU_GN=fused keeps the A/B alive for emitter
    # regressions.
    return os.environ.get("DIFFMUSIC_TPU_GN", "xla") == "fused"


def _group_maps(c: int, groups: int):
    """Constant 0/1 projection map (C, G) and its transpose (G, C)."""
    m = np.zeros((c, groups), np.float32)
    gs = c // groups
    for g in range(groups):
        m[g * gs:(g + 1) * gs, g] = 1.0
    return jnp.asarray(m), jnp.asarray(m.T)


def _gn_kernel(x_ref, sb_ref, m_ref, mt_ref, out_ref, *, groups: int,
               eps: float, n_valid: int, use_silu: bool):
    x = x_ref[0]                                   # (N_pad, C) input dtype
    xf = x.astype(jnp.float32)
    n_pad, c = xf.shape
    if n_valid != n_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, c), 0)
        xf = jnp.where(row < n_valid, xf, 0.0)

    s_c = jnp.sum(xf, axis=0, keepdims=True)       # (1, C)
    ss_c = jnp.sum(xf * xf, axis=0, keepdims=True)
    m = m_ref[:, :]                                # (C, G)
    mt = mt_ref[:, :]                              # (G, C)
    count = float(n_valid * (c // groups))
    s_g = jnp.dot(s_c, m, preferred_element_type=jnp.float32)      # (1, G)
    ss_g = jnp.dot(ss_c, m, preferred_element_type=jnp.float32)
    mu_g = s_g / count
    var_g = ss_g / count - mu_g * mu_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mu_c = jnp.dot(mu_g, mt, preferred_element_type=jnp.float32)   # (1, C)
    inv_c = jnp.dot(inv_g, mt, preferred_element_type=jnp.float32)

    scale = sb_ref[0, :].astype(jnp.float32)
    bias = sb_ref[1, :].astype(jnp.float32)
    y = (xf - mu_c) * (inv_c * scale) + bias
    if use_silu:
        y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.astype(out_ref.dtype)


def _reference_gn(x, scale, bias, groups: int, eps: float, use_silu: bool):
    """Plain-XLA composition with identical semantics (CPU path + backward)."""
    xf = x.astype(jnp.float32)
    b = x.shape[0]
    c = x.shape[-1]
    xg = xf.reshape(b, -1, groups, c // groups)
    mu = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg), axis=(1, 3), keepdims=True) - mu * mu
    y = (xg - mu) * jax.lax.rsqrt(var + eps)
    y = y.reshape(xf.shape) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    if use_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _eligible(x) -> bool:
    if x.ndim != 4:
        return False
    b, h, w, c = x.shape
    return c % 128 == 0 and h * w * c <= _ROW_LIMIT_ELEMS


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm(x, scale, bias, groups: int, eps: float,
                     use_silu: bool = False):
    """GroupNorm over the trailing channel axis of NHWC x, optionally fused
    with SiLU. scale/bias: (C,). Stats in fp32, output in x.dtype."""
    from .attention_kernel import _on_tpu
    if not _INTERPRET and not (_on_tpu() and _gn_on() and _eligible(x)):
        return _reference_gn(x, scale, bias, groups, eps, use_silu)

    b, h, w, c = x.shape
    n = h * w
    n_pad = ((n + 7) // 8) * 8
    x2 = x.reshape(b, n, c)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, 0), (0, n_pad - n), (0, 0)))
    sb = jnp.stack([scale, bias]).astype(jnp.float32)
    m, mt = _group_maps(c, groups)

    kernel = functools.partial(_gn_kernel, groups=groups, eps=eps,
                               n_valid=n, use_silu=use_silu)
    full = lambda shape: pl.BlockSpec(shape, lambda bb: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, c), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            full((2, c)),
            full((c, groups)),
            full((groups, c)),
        ],
        out_specs=pl.BlockSpec((1, n_pad, c), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n_pad * c,
            bytes_accessed=2 * x.dtype.itemsize * b * n_pad * c,
            transcendentals=b * n_pad * c if use_silu else 0),
        interpret=_INTERPRET,
    )(x2, sb, m, mt)
    if n_pad != n:
        out = out[:, :n]
    return out.reshape(b, h, w, c)


def _fgn_fwd(x, scale, bias, groups, eps, use_silu):
    return fused_group_norm(x, scale, bias, groups, eps, use_silu), \
        (x, scale, bias)


def _fgn_bwd(groups, eps, use_silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _reference_gn(x_, s_, b_, groups, eps, use_silu),
        x, scale, bias)
    return vjp(g.astype(x.dtype))


fused_group_norm.defvjp(_fgn_fwd, _fgn_bwd)
