"""Fused self-attention transformer block Pallas kernel (MusicLDM UNet path).

The UNet is memory-bound: 297 GF but 5.83 GB of HBM traffic per CFG forward
(cost analysis) — every LN / projection / FF round-trips activations through
HBM. This kernel computes one BasicTransformerBlock
(LN1 -> attention -> +res -> LN3 -> GEGLU FF -> +res) per (batch, q-block)
with K/V and all block weights VMEM-resident: x is read once and the result
written once per block.

K and V for the full sequence are computed outside (two large XLA GEMMs over
LN1(x)); the kernel recomputes LN1 per q-block (cheap, keeps x the only
activation input).

head_dim is 8 for every UNet level, so naive per-head (QB, 8) @ (8, T) logits
dots waste 15/16 of the MXU's K dimension (and the (QB, T) @ (T, 8) PV dots
the same in N). Instead ALL heads run as ONE full-K dot via block-diagonal
row stacking: BD (heads*QB, C) holds head h's q slice in row block h /
column block h and zeros elsewhere, so BD @ K^T (C, TK) yields every head's
logits in one (heads*QB, TK) matmul with zero K padding; P @ V (TK, C) is
the mirror image, with the per-head output extracted by the same mask. T is
processed in TK chunks with a running online softmax so the stacked logits
stay inside VMEM (this also restores the roadmap's larger q-footprint:
heads*QB rows per program instead of QB).

Backward (optim_prompt / DITTO only; DPS-family guidance never differentiates
the UNet): XLA recompute via the reference composition.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_ROWS = 2048  # stacked (heads * QB) rows per program; QB = M_ROWS // heads
TK = 512       # K/V chunk length for the online softmax (VMEM: s fp32 4 MB)

# test hook: run in interpreter mode on CPU
_INTERPRET = False


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7): Mosaic has no
    erf/erfc lowering, and exact GELU (diffusers GEGLU) needs one."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    xf = x.astype(jnp.float32)
    return 0.5 * xf * (1.0 + _erf(xf / jnp.sqrt(2.0).astype(jnp.float32)))


def _layer_norm(x, scale, bias, eps=1e-6):  # flax nn.LayerNorm default eps
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)


def _block_kernel(x_ref, kt_ref, v_ref, ln1_ref, wq_ref, wo_ref, bo_ref,
                  ln3_ref, wi_ref, bi_ref, wo2_ref, bo2_ref, out_ref, *,
                  heads: int, head_dim: int, t_valid: int, scale: float):
    x = x_ref[0]                                # (QB, C) input dtype
    kt = kt_ref[0]                              # (C, T_pad) input dtype
    v = v_ref[0, :, :]                          # (T_pad, C) value
    qb, c = x.shape
    t_pad = v.shape[0]
    m_rows = heads * qb

    h1 = _layer_norm(x, ln1_ref[0, :], ln1_ref[1, :])     # (QB, C) fp32
    q = jnp.dot(h1.astype(x.dtype), wq_ref[:, :],
                preferred_element_type=jnp.float32)        # (QB, C)

    # block-diagonal row stacking (module banner): row block h carries head
    # h's q slice only, so ONE (M, C) @ (C, TK) dot computes every head's
    # logits with the MXU's K dimension fully used
    row_head = jax.lax.broadcasted_iota(jnp.int32, (m_rows, c), 0) // qb
    col_head = jax.lax.broadcasted_iota(jnp.int32, (m_rows, c), 1) // head_dim
    bd_mask = row_head == col_head
    q_tiled = jnp.broadcast_to(q[None], (heads, qb, c)).reshape(m_rows, c)
    bd_q = jnp.where(bd_mask, q_tiled, 0.0).astype(x.dtype)

    # online softmax over TK-length K/V chunks (exp via exp2; the softmax
    # scale folds into the exponent multiplier — identical math)
    log2e_scale = scale * 1.4426950408889634
    m_run = jnp.full((m_rows, 1), -1e30, jnp.float32)
    denom = jnp.zeros((m_rows, 1), jnp.float32)
    acc = jnp.zeros((m_rows, c), jnp.float32)
    for ci in range(t_pad // TK):
        s = jax.lax.dot_general(bd_q, kt[:, ci * TK:(ci + 1) * TK],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if t_valid != t_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ci * TK
            s = jnp.where(col < t_valid, s, -1e30)
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp2((m_run - m_new) * log2e_scale)
        p = jnp.exp2((s - m_new) * log2e_scale)
        pv = jnp.dot(p.astype(x.dtype), v[ci * TK:(ci + 1) * TK, :],
                     preferred_element_type=jnp.float32)
        acc = acc * corr + pv
        denom = denom * corr + jnp.sum(p, axis=-1, keepdims=True)
        m_run = m_new
    o_stacked = acc / denom                                # (M, C) fp32
    # row block h's columns [h*D, (h+1)*D) hold head h's output — the same
    # block-diagonal mask extracts them; summing over the head axis re-packs
    # the (QB, C) concatenated-heads layout
    attn = jnp.sum(jnp.where(bd_mask, o_stacked, 0.0)
                   .reshape(heads, qb, c), axis=0)         # (QB, C)

    attn = jnp.dot(attn.astype(x.dtype), wo_ref[:, :],
                   preferred_element_type=jnp.float32) + bo_ref[0, :]
    res1 = x.astype(jnp.float32) + attn                    # residual 1

    h2 = _layer_norm(res1, ln3_ref[0, :], ln3_ref[1, :])
    ff = jnp.dot(h2.astype(x.dtype), wi_ref[:, :],
                 preferred_element_type=jnp.float32) + bi_ref[0, :]
    a, g = jnp.split(ff, 2, axis=-1)
    gg = a * _gelu_exact(g)
    y = jnp.dot(gg.astype(x.dtype), wo2_ref[:, :],
                preferred_element_type=jnp.float32) + bo2_ref[0, :]
    out_ref[0] = (res1 + y).astype(out_ref.dtype)


def _reference_block(x, p, heads, head_dim):
    """Plain-XLA composition with identical semantics (CPU path + backward)."""
    scale = 1.0 / math.sqrt(head_dim)
    h1 = _layer_norm(x, p["ln1_scale"], p["ln1_bias"]).astype(x.dtype)
    q = h1 @ p["wq"]
    k = h1 @ p["wk"]
    v = h1 @ p["wv"]
    b, t, c = x.shape
    qh = q.reshape(b, t, heads, head_dim)
    kh = k.reshape(b, t, heads, head_dim)
    vh = v.reshape(b, t, heads, head_dim)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32),
                   kh.astype(jnp.float32)) * scale
    pr = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", pr, vh.astype(jnp.float32))
    o = o.reshape(b, t, c).astype(x.dtype)
    res1 = x + (o @ p["wo"] + p["bo"]).astype(x.dtype)
    h2 = _layer_norm(res1, p["ln3_scale"], p["ln3_bias"]).astype(x.dtype)
    ff = h2 @ p["wi"] + p["bi"]
    a, g = jnp.split(ff, 2, axis=-1)
    gg = a * jax.nn.gelu(g, approximate=False)
    return res1 + (gg @ p["wo2"] + p["bo2"]).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_transformer_block(x, p, heads: int, head_dim: int):
    """x: (B, T, C); p: dict of block params (ln1_*, wq/wk/wv/wo/bo, ln3_*,
    wi/bi, wo2/bo2). Self-attention-only BasicTransformerBlock."""
    from .attention_kernel import _on_tpu
    if not _INTERPRET and not _on_tpu():
        return _reference_block(x, p, heads, head_dim)

    b, t, c = x.shape
    # QB = stacked-rows budget per program split across heads; heads*QB rows
    # feed the block-diagonal full-K dots. Both UNet levels give QB in
    # {64, 128}, a power of two dividing TK, so one TK-multiple pad covers
    # the q grid and the online-softmax chunking.
    qb = max(8, M_ROWS // heads)
    t_pad = ((t + TK - 1) // TK) * TK
    scale = 1.0 / math.sqrt(head_dim)

    h1 = _layer_norm(x, p["ln1_scale"], p["ln1_bias"]).astype(x.dtype)
    k = jnp.einsum("btc,cd->btd", h1, p["wk"])
    v = jnp.einsum("btc,cd->btd", h1, p["wv"])
    if t_pad != t:
        xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, t_pad - t), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, t_pad - t), (0, 0)))
    else:
        xp = x
    kt = jnp.swapaxes(k, 1, 2)  # (B, C, T_pad), bf16 like the flash kernel

    stack2 = lambda s_, b_: jnp.stack([p[s_], p[b_]]).astype(x.dtype)
    kernel = functools.partial(_block_kernel, heads=heads, head_dim=head_dim,
                               t_valid=t, scale=scale)
    full = lambda shape: pl.BlockSpec(shape, lambda bb, i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
        grid=(b, t_pad // qb),
        in_specs=[
            pl.BlockSpec((1, qb, c), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, t_pad), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, c), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            full((2, c)),                      # ln1 scale/bias
            full((c, c)),                      # wq
            full((c, c)),                      # wo
            full((1, c)),                      # bo
            full((2, c)),                      # ln3
            full((c, p["wi"].shape[1])),       # wi
            full((1, p["wi"].shape[1])),       # bi
            full((p["wo2"].shape[0], c)),      # wo2
            full((1, c)),                      # bo2
        ],
        out_specs=pl.BlockSpec((1, qb, c), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_pad * (t_pad * c * 2 + c * c * 2
                                   + c * p["wi"].shape[1] * 3),
            bytes_accessed=x.dtype.itemsize * b * t_pad * c * 8,
            transcendentals=b * t_pad * t_pad),
        interpret=_INTERPRET,
    )(xp, kt, v, stack2("ln1_scale", "ln1_bias"), p["wq"].astype(x.dtype),
      p["wo"].astype(x.dtype), p["bo"].astype(x.dtype)[None],
      stack2("ln3_scale", "ln3_bias"), p["wi"].astype(x.dtype),
      p["bi"].astype(x.dtype)[None], p["wo2"].astype(x.dtype),
      p["bo2"].astype(x.dtype)[None])
    return out[:, :t]


def _ftb_fwd(x, p, heads, head_dim):
    return fused_transformer_block(x, p, heads, head_dim), (x, p)


def _ftb_bwd(heads, head_dim, res, g):
    x, p = res
    _, vjp = jax.vjp(lambda x_, p_: _reference_block(x_, p_, heads, head_dim),
                     x, p)
    return vjp(g.astype(x.dtype))


fused_transformer_block.defvjp(_ftb_fwd, _ftb_bwd)
