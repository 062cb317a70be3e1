"""Flash self-attention Pallas kernel for small head dims.

The latent-audio UNets use attention_head_dim=8 with up to 4000 tokens
(level-0 spatial 250x16). XLA materializes the (B, heads, T, T) logits in HBM —
512 MB in bf16 per level-0 attention, ~10 of them per UNet pass — making the
UNet HBM-bound (measured 42 ms/step at MusicLDM scale). This kernel computes
attention per (batch*head, q-block) with K/V fully VMEM-resident (T x 8 floats
per head is tiny), so logits never touch HBM. Softmax runs in fp32 on the VPU;
the two matmuls ride the MXU.

Backward: guidance grads in DPS/MPGD/DSG/DiffMusic do NOT flow through the UNet
(the loss differentiates the DDIM algebra around a constant eps — SURVEY.md
section 3.3), so the hot path only needs forward. optim_prompt/DITTO do
differentiate through the UNet: the custom VJP recomputes with the plain XLA
path, trading peak-memory for correctness on those cold paths.
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_BLOCK = int(os.environ.get("DIFFMUSIC_TPU_FLASH_QB", "256"))

# test hook: run the Pallas kernel in interpreter mode on CPU
_INTERPRET = False


def _attn_kernel(q_ref, kt_ref, v_ref, out_ref, *, scale: float, t_valid: int):
    """K arrives pre-transposed as (D, T_pad): both matmuls are then standard
    (M, K) @ (K, N) orientations — contracting the LANE dim of k in-kernel made
    Mosaic insert per-block transposes (measured ~0.86 ms per level-0
    attention; this layout is ~3x faster)."""
    q = q_ref[0]                               # (QB, D)
    kt = kt_ref[0]                             # (D, T_pad)
    v = v_ref[0]                               # (T_pad, D)

    s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if t_valid != v.shape[0]:  # mask the zero-padded kv tail
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < t_valid, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    # exp2 lowering: identical softmax, measured slightly faster than exp
    # (tools/bench_transformer_block.py)
    p = jnp.exp2((s - m) * 1.4426950408889634)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p.astype(v.dtype), v,
                  preferred_element_type=jnp.float32) / denom
    out_ref[0] = out.astype(out_ref.dtype)


def _reference_attention(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)).astype(q.dtype)


def _on_tpu() -> bool:
    """True when lowering targets a TPU device (respects jax.default_device
    contexts, e.g. the CPU-side param init in __graft_entry__._flagship)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", None) == "tpu"
    return jax.default_backend() in ("tpu", "axon")


@jax.custom_vjp
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Self-attention over (B, T, H, D) tensors (jax.nn.dot_product_attention
    layout, no mask). Pallas on TPU; plain XLA elsewhere."""
    if not _INTERPRET and not _on_tpu():
        return _reference_attention(q, k, v, 1.0 / math.sqrt(q.shape[-1]))

    b, t, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    tile = max(Q_BLOCK, 128)
    t_pad = ((t + tile - 1) // tile) * tile

    def fold(x):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, t, d)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    qf, vf = fold(q), fold(v)
    ktf = jnp.swapaxes(fold(k), 1, 2)  # (BH, D, T_pad): MXU-standard layout
    kernel = functools.partial(_attn_kernel, scale=scale, t_valid=t)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qf.shape, qf.dtype),
        grid=(b * h, t_pad // Q_BLOCK),
        in_specs=[
            pl.BlockSpec((1, Q_BLOCK, d), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, t_pad), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q_BLOCK, d), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_pad * t_pad * d,
            bytes_accessed=qf.dtype.itemsize * b * h * t_pad * d * 4,
            transcendentals=b * h * t_pad * t_pad),
        interpret=_INTERPRET,
    )(qf, ktf, vf)
    out = out[:, :t].reshape(b, h, t, d)
    return jnp.swapaxes(out, 1, 2)


def _flash_fwd(q, k, v):
    return flash_attention(q, k, v), (q, k, v)


def _bwd_attention_bf16(q, k, v, g, scale):
    """Manual attention VJP with input-dtype (bf16) matmul operands and fp32
    accumulation/softmax — the fp32-einsum recompute materialized the (T, T)
    logits in fp32 at half the MXU rate. On the guidance path this runs every
    step: the VAE decoder's mid attention (T=4000, D=512) is differentiated
    through (reference scheduling_dps.py:195-197)."""
    f32 = jnp.float32
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=f32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(q.dtype)                       # (B, H, Tq, Tk)
    # dv = p^T g ; dp = g v^T
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g, preferred_element_type=f32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g, v, preferred_element_type=f32)
    o_dot_g = jnp.sum(
        jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=f32) * g,
        axis=-1)                                          # (B, Tq, H)
    ds = (p.astype(f32) * (dp - jnp.swapaxes(o_dot_g, 1, 2)[..., None])
          * scale).astype(q.dtype)
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k, preferred_element_type=f32)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q, preferred_element_type=f32)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# backward recompute path: "bf16" (manual VJP, input-dtype operands) or
# "f32" (jax.vjp through the fp32 reference einsums). Measured NEUTRAL in the
# VAE decode grad (12.69 vs 12.58 ms/iter, tools/bench_guidance_parts.py vae)
# — the fp32 (T, T) materialization is only ~64 MB of the program's traffic —
# so the numerically-stronger f32 recompute stays the default.
_BWD_IMPL = os.environ.get("DIFFMUSIC_TPU_FLASH_BWD", "f32")


def _flash_bwd(res, g):
    """Backward via recompute. Guidance differentiates this on the VAE path
    every step; optim_prompt/DITTO also differentiate the UNet instances."""
    q, k, v = res
    scale = 1.0 / math.sqrt(q.shape[-1])
    if _BWD_IMPL == "bf16":
        return _bwd_attention_bf16(q, k, v, g.astype(q.dtype), scale)
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference_attention(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g.astype(q.dtype))


flash_attention.defvjp(_flash_fwd, _flash_bwd)
