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


def _gn_mode() -> str:
    # Three routings, A/B'd via DIFFMUSIC_TPU_GN:
    #   "xla"   — flax composition.
    #   "fused" — whole-GN(+SiLU) kernel: measured LOST/neutral on the UNet
    #             (13.84 vs 13.75 ms/iter CFG fwd, tools/bench_unet.py) — the
    #             saved stat-reduce pass is offset by losing XLA's fusion of
    #             the normalize+SiLU into the following conv's operand load.
    #   "stats" — pallas statistics only (channel_moments below), XLA
    #             normalize keeps the conv fusion.
    return os.environ.get("DIFFMUSIC_TPU_GN", "xla")


def _gn_on() -> bool:
    return _gn_mode() == "fused"


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


# ---------------------------------------------------------------------------
# Stats-only formulation: replace ONLY the GroupNorm statistics pass with a
# full-bandwidth pallas reduction and leave the normalize(+SiLU) in XLA so it
# keeps fusing into the following conv's operand load — the fusion whose loss
# made the fully-fused kernel neutral on the UNet (see _gn_on). The stat
# reductions are the measured hot spot: 4.4 ms/step across VAE decoder levels
# + 1.6 ms/step in the UNet at the 9.8 s bench state (device trace), ~17x the
# ~0.3 ms memory floor for the activation bytes.
# ---------------------------------------------------------------------------

_MOMENT_BLOCK_ELEMS = 2 ** 19   # fp32 row block budget per grid step


def _moments_block_rows(n: int, c: int) -> int:
    """Largest row block <= the VMEM budget; prefer an exact divisor of n so
    no pad copy or mask is needed (every VAE/UNet level at MusicLDM 10-s
    scale divides exactly)."""
    limit = max(8, min(n, _MOMENT_BLOCK_ELEMS // c) // 8 * 8)
    for cand in range(limit, 7, -8):
        if n % cand == 0:
            return cand
    return limit


def _moments_kernel(x_ref, out_ref, *, rb: int, n: int):
    j = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)              # (RB, C)
    if n % rb != 0:
        row = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 0) + j * rb
        xf = jnp.where(row < n, xf, 0.0)
    s = jnp.sum(xf, axis=0, keepdims=True)         # (1, C)
    ss = jnp.sum(xf * xf, axis=0, keepdims=True)
    out_ref[0, 0] = jnp.concatenate([s, ss], axis=0)


def _moments_reference(x2):
    xf = x2.astype(jnp.float32)
    return jnp.stack([jnp.sum(xf, axis=1), jnp.sum(xf * xf, axis=1)], axis=1)


def _moments_eligible(x2) -> bool:
    b, n, c = x2.shape
    return c % 128 == 0 and c <= 1024 and n >= 8


def _moments_impl(x2):
    from .attention_kernel import _on_tpu
    if not _INTERPRET and not (_on_tpu() and _moments_eligible(x2)):
        return _moments_reference(x2)
    b, n, c = x2.shape
    rb = _moments_block_rows(n, c)
    n_pad = ((n + rb - 1) // rb) * rb
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, 0), (0, n_pad - n), (0, 0)))
    nblocks = n_pad // rb
    kernel = functools.partial(_moments_kernel, rb=rb, n=n)
    parts = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nblocks, 2, c), jnp.float32),
        grid=(b, nblocks),
        in_specs=[pl.BlockSpec((1, rb, c), lambda bb, j: (bb, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 2, c), lambda bb, j: (bb, j, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * n_pad * c,
            bytes_accessed=x2.dtype.itemsize * b * n_pad * c,
            transcendentals=0),
        interpret=_INTERPRET,
    )(x2)
    return jnp.sum(parts, axis=1)                   # (B, 2, C) fp32


@jax.custom_vjp
def channel_moments(x2):
    """Per-channel sum and sum-of-squares of (B, N, C) x in fp32: (B, 2, C).

    One full-bandwidth read of x; the group combine / mean / rsqrt happen on
    the tiny (B, 2, C) result in XLA. custom_vjp so the pallas call never
    lands in the transposed program region (measured ~0.8 ms/boundary
    penalty there, docs/PERF_NOTES.md): the true VJP is elementwise,
    dx = ds + 2x*dss."""
    return _moments_impl(x2)


def _moments_fwd(x2):
    return _moments_impl(x2), x2


def _moments_bwd(x2, g):
    ds = g[:, 0][:, None, :]
    dss = g[:, 1][:, None, :]
    dx = ds + 2.0 * x2.astype(jnp.float32) * dss
    return (dx.astype(x2.dtype),)


channel_moments.defvjp(_moments_fwd, _moments_bwd)


def stats_group_norm(x, scale, bias, groups: int, eps: float,
                     use_silu: bool = False):
    """GroupNorm(+SiLU) over NHWC x with pallas-accelerated statistics and a
    plain-XLA normalize (kept fusable into the following conv's operand
    load). Semantics identical to flax nn.GroupNorm (fp32 stats)."""
    b, h, w, c = x.shape
    n = h * w
    m = channel_moments(x.reshape(b, n, c))         # (B, 2, C) fp32
    gsz = c // groups
    s_g = jnp.sum(m[:, 0].reshape(b, groups, gsz), axis=-1)
    ss_g = jnp.sum(m[:, 1].reshape(b, groups, gsz), axis=-1)
    count = float(n * gsz)
    mu_g = s_g / count
    var_g = ss_g / count - mu_g * mu_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mu_c = jnp.repeat(mu_g, gsz, axis=1)            # (B, C)
    inv_c = jnp.repeat(inv_g, gsz, axis=1)
    w_c = inv_c * scale.astype(jnp.float32)
    b_c = bias.astype(jnp.float32) - mu_c * w_c
    y = x.astype(jnp.float32) * w_c[:, None, None, :] + b_c[:, None, None, :]
    if use_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)
