"""Query-chunked exact attention for the CPU path.

On TPU the long self-attentions ride the Pallas flash/fused kernels; off-TPU
(the 8-virtual-device test mesh, the bench reconstruction-evidence child) the
XLA fallback materializes the full (T, T) logits — at the tiny pipelines' 5-s
geometry that is a [heads, 8000, 8000] fp32 tensor (512 MB) copied several
times per attention, which made a 20-step tiny scan cost ~11 s/step on one
CPU core (round-5 CPU trace: copy_bitcast_fusion 128 s + reduce-window 54 s
of a 208 s run).

Chunking over the QUERY axis is mathematically exact: each query row's
softmax sees the full key set; only the grouping of rows changes, so per-row
results are bit-identical to the unchunked computation up to fusion order.
Peak intermediate: (q_block, T) instead of (T, T).
"""

import math

import jax
import jax.numpy as jnp


def chunked_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      scale: float | None = None,
                      q_block: int = 512) -> jax.Array:
    """Unmasked attention over (B, T, H, D) tensors, fp32 logits/softmax,
    output in q.dtype — the same semantics as the XLA fallback it replaces,
    computed q_block query rows at a time via lax.map (sequential, so peak
    memory is (B, H, q_block, Tk) instead of (B, H, Tq, Tk))."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    n_pad = (-tq) % q_block
    qp = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0), (0, 0))) if n_pad else q
    nb = (tq + n_pad) // q_block
    # (nb, B, q_block, H, D): lax.map over the leading block axis
    qb = jnp.moveaxis(qp.reshape(b, nb, q_block, h, d), 1, 0)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    def one_block(qi):
        s = jnp.einsum("bqhd,bkhd->bhqk", qi.astype(jnp.float32), kf) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, vf)

    ob = jax.lax.map(one_block, qb)                      # (nb, B, qb, H, D)
    out = jnp.moveaxis(ob, 0, 1).reshape(b, nb * q_block, h, d)
    return out[:, :tq].astype(q.dtype)
