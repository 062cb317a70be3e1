"""Fused self-attention transformer block Pallas kernel (MusicLDM UNet path).

The UNet is memory-bound: 297 GF but 5.83 GB of HBM traffic per CFG forward
(cost analysis) — every LN / projection / FF round-trips activations through
HBM. This kernel computes one BasicTransformerBlock
(LN1 -> attention -> +res -> LN3 -> GEGLU FF -> +res) per (batch, q-block)
with K/V and all block weights VMEM-resident: x is read once and the result
written once per block.

K and V for the full sequence are computed outside (two large XLA GEMMs over
LN1(x)); the kernel recomputes LN1 per q-block (cheap, keeps x the only
activation input). Per-head logits use the kT (C, T) layout so the 8-row head
slices are sublane-aligned; q/k/v operands are bf16 with fp32 accumulation.

NOTE (round-2 negative result, measured): a block-diagonal stacked-heads
formulation — all heads' logits as ONE full-K (heads*QB, C) @ (C, TK) dot
with an online-softmax chunk loop — measured 2.849 ms/call vs 2.25 for this
per-head loop at (2, 4000, 128, 16). The MXU tile work is identical in both
(K=8 padding wastes 15/16 either way), so the extra VPU masking/extraction
and fori_loop carries only added overhead. Useful-FLOP waste at head_dim=8
is structural; do not revisit without changing the head geometry.

Backward (optim_prompt / DITTO only; DPS-family guidance never differentiates
the UNet): XLA recompute via the reference composition.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os


def _block_geometry(t: int):
    """(q_block, p_bf16) per sequence length, measured on v5e
    (tools/bench_transformer_block.py, 100-iter scans):

      pad-free QB=200 when it divides T exactly (both UNet levels at 10-s
      MusicLDM scale: T=4000 and T=1000): no x/k/v pad or out-slice copies
      and no in-kernel key mask. level-0 2.183 ms (vs 2.203 at QB=128/fp32;
      fp32-p at 200 rows would need ~19 MB VMEM -> bf16-p), level-1 0.564
      (vs 0.566 at QB=256+bf16-p). QB=80/fp32 measured worse (2.238/0.720);
      QB=400+bf16-p OOMs scoped VMEM (17.28 MB).
      padded fallback: QB=128/fp32 for long T (QB=256 fp32 scores need
      24.45 MB VMEM), QB=256+bf16-p for T <= 1024.

    Env overrides (A/B): DIFFMUSIC_TPU_QB, DIFFMUSIC_TPU_P_BF16."""
    qb_env = os.environ.get("DIFFMUSIC_TPU_QB")
    pb_env = os.environ.get("DIFFMUSIC_TPU_P_BF16")
    if qb_env:
        qb = int(qb_env)
        default_pb = qb >= 200
    elif t % 200 == 0:
        qb, default_pb = 200, True
    elif t <= 1024:
        qb, default_pb = 256, True
    else:
        qb, default_pb = 128, False
    p_bf16 = (pb_env == "1") if pb_env is not None else default_pb
    return qb, p_bf16

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


def _block_kernel(x_ref, kt_ref, v_ref, *refs,
                  heads: int, head_dim: int, t_valid: int, scale: float,
                  p_bf16: bool, mxu_denom: bool, fold_scale: bool,
                  aug_w: int, bsoft: bool, n_cross: int):
    # the kmax operand exists ONLY in bsoft mode, and the cross-stream
    # operands only for n_cross > 0, so the default (MusicLDM) program's
    # HLO (and its persistent-cache entry) is unchanged when both are off
    refs = list(refs)
    kmax_ref = refs.pop(0) if bsoft else None
    cross_refs = []                    # per stream: kt, v, bias, ln2, wq, wo, bo
    for _ in range(n_cross):
        cross_refs.append(tuple(refs[:7]))
        refs = refs[7:]
    (ln1_ref, wq_ref, wo_ref, bo_ref, ln3_ref, wi_ref, bi_ref,
     wo2_ref, bo2_ref, out_ref) = refs
    x = x_ref[0]                                # (QB, C) input dtype
    kt = kt_ref[0]                              # (C, T_pad) input dtype
    v = v_ref[0, :, :]                          # (T_pad, C) or (T_pad, H*aug_w)

    h1 = _layer_norm(x, ln1_ref[0, :], ln1_ref[1, :])     # (QB, C) fp32
    q = jnp.dot(h1.astype(x.dtype), wq_ref[:, :],
                preferred_element_type=jnp.float32)        # (QB, C)

    # additive key-padding mask, hoisted out of the head loop (the per-head
    # iota+where recomputed it heads times over the full (QB, T) tile)
    neg = None
    if t_valid != v.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], v.shape[0]), 1)
        neg = jnp.where(col < t_valid, 0.0, -1e30)

    outs = []
    for h in range(heads):
        lo = h * head_dim
        # bf16 q/k operands (fp32 accumulate): fp32xfp32 MXU dots run at a
        # fraction of the bf16 rate; same operand precision as the flash
        # kernel and XLA's dot_product_attention on bf16 inputs
        qh = q[:, lo:lo + head_dim].astype(x.dtype)        # (QB, D)
        kth = kt[lo:lo + head_dim, :]                      # (D, T) sublane slice
        if bsoft:
            # bounded softmax: softmax(s) is invariant to any per-row shift,
            # and the shift only exists to keep exp2 finite — so the full
            # (QB, T) row-max VPU reduce is replaced by the Cauchy-Schwarz
            # bound ||q_r||*max_k||k_k|| >= max_k s_rk (kmax precomputed per
            # head outside the kernel; qnorm is a (QB, D) reduce, 500x
            # smaller; both norms are of the exact bf16 operands the MXU
            # dots, so the bound is true for the computed logits). The slack
            # Delta = bound - rowmax uniformly scales p by 2^-Delta, which
            # fp32/bf16 absorb until underflow at ~2^-126/-133; attention
            # logits and norms are O(10), leaving >100 log2-units of margin
            # (guarded denominator below). Computed BEFORE the logit dot so
            # the (QB, T) score tile's live range stays minimal.
            qh32 = qh.astype(jnp.float32)
            qn = jnp.sqrt(jnp.sum(qh32 * qh32, axis=-1, keepdims=True))
            bound = qn * kmax_ref[0, 0, h]
            if not fold_scale:
                bound = bound * (scale * 1.4426950408889634)
        s = jax.lax.dot_general(qh, kth, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if not fold_scale:
            # softmax rides exp2 — mathematically identical once log2(e) is
            # folded into the logit scale (ONE multiply pass, not two); with
            # fold_scale the caller pre-multiplies wq so s arrives in log2
            # units and there is no scaling pass at all
            s = s * (scale * 1.4426950408889634)
        if neg is not None:
            s = s + neg
        if bsoft:
            p = jnp.exp2(s - bound)
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
        if p_bf16 and mxu_denom:
            # bf16 probability storage; the softmax denominator rides the PV
            # matmul as a ones-column pre-baked into the aug_w-strided V
            # layout built by the caller (v_aug[:, h*aug_w+head_dim] == 1) —
            # replacing the (QB, T) VPU sum per head with fp32 MXU
            # accumulation, with NO per-head concat copy in the kernel.
            p = p.astype(x.dtype)
            vh1 = v[:, h * aug_w:h * aug_w + aug_w]        # (T, aug_w)
            oh9 = jnp.dot(p, vh1, preferred_element_type=jnp.float32)
            den = oh9[:, head_dim:head_dim + 1]
            if bsoft:
                den = jnp.maximum(den, 1e-37)
            oh = oh9[:, :head_dim] / den
        elif p_bf16:
            p = p.astype(x.dtype)
            denom = jnp.sum(p, axis=-1, keepdims=True,
                            dtype=jnp.float32)
            if bsoft:
                denom = jnp.maximum(denom, 1e-37)
            vh = v[:, lo:lo + head_dim].astype(x.dtype)    # (T, D)
            oh = jnp.dot(p, vh,
                         preferred_element_type=jnp.float32) / denom
        else:
            denom = jnp.sum(p, axis=-1, keepdims=True)
            if bsoft:
                denom = jnp.maximum(denom, 1e-37)
            vh = v[:, lo:lo + head_dim].astype(x.dtype)    # (T, D)
            oh = jnp.dot(p.astype(x.dtype), vh,
                         preferred_element_type=jnp.float32) / denom
        outs.append(oh)
    attn = jnp.concatenate(outs, axis=-1)                  # (QB, C) fp32

    attn = jnp.dot(attn.astype(x.dtype), wo_ref[:, :],
                   preferred_element_type=jnp.float32) + bo_ref[0, :]
    res1 = x.astype(jnp.float32) + attn                    # residual 1

    # cross-attention streams (AudioLDM2 dual conditioning): kv is tiny
    # (8/12 tokens padded to one 128 lane tile), so each stream costs two
    # small MXU projections and a (QB, 128)-tile softmax — the win is keeping
    # LN2_i / projections / residuals VMEM-resident instead of separate ops
    for ckt_ref, cv_ref, cbias_ref, cln_ref, cwq_ref, cwo_ref, cbo_ref \
            in cross_refs:
        hc = _layer_norm(res1, cln_ref[0, :], cln_ref[1, :])
        qc = jnp.dot(hc.astype(x.dtype), cwq_ref[:, :],
                     preferred_element_type=jnp.float32)   # (QB, C)
        # additive bias (key padding + attention mask), natural log units
        cbias = cbias_ref[0] * 1.4426950408889634          # (1, Tk) log2
        ckt = ckt_ref[0]                                   # (C, Tk)
        cv = cv_ref[0]                                     # (Tk, C)
        couts = []
        for h in range(heads):
            lo = h * head_dim
            qh = qc[:, lo:lo + head_dim].astype(x.dtype)
            s = jax.lax.dot_general(qh, ckt[lo:lo + head_dim, :],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * (scale * 1.4426950408889634) + cbias
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            den = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(x.dtype), cv[:, lo:lo + head_dim],
                        preferred_element_type=jnp.float32) / den
            couts.append(o)
        cattn = jnp.concatenate(couts, axis=-1)            # (QB, C)
        res1 = res1 + jnp.dot(cattn.astype(x.dtype), cwo_ref[:, :],
                              preferred_element_type=jnp.float32) \
            + cbo_ref[0, :]

    h2 = _layer_norm(res1, ln3_ref[0, :], ln3_ref[1, :])
    ff = jnp.dot(h2.astype(x.dtype), wi_ref[:, :],
                 preferred_element_type=jnp.float32) + bi_ref[0, :]
    a, g = jnp.split(ff, 2, axis=-1)
    gg = a * _gelu_exact(g)
    y = jnp.dot(gg.astype(x.dtype), wo2_ref[:, :],
                preferred_element_type=jnp.float32) + bo2_ref[0, :]
    out_ref[0] = (res1 + y).astype(out_ref.dtype)


def _reference_block(x, p, heads, head_dim, contexts=(), cross_biases=()):
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
    if t >= 2048:
        # this fallback only runs off-TPU (the TPU path is the fused Pallas
        # kernel above); avoid materializing (T, T) logits on the CPU mesh —
        # exact query-chunked form, see ops/chunked_attention.py
        from ..ops.chunked_attention import chunked_attention
        o = chunked_attention(qh, kh, vh, scale).astype(jnp.float32)
    else:
        s = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32),
                       kh.astype(jnp.float32)) * scale
        pr = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", pr, vh.astype(jnp.float32))
    o = o.reshape(b, t, c).astype(x.dtype)
    res1 = x + (o @ p["wo"] + p["bo"]).astype(x.dtype)
    for i, ctx in enumerate(contexts):
        hc = _layer_norm(res1, p[f"ln2{i}_scale"],
                         p[f"ln2{i}_bias"]).astype(x.dtype)
        qc = (hc @ p[f"cwq{i}"]).reshape(b, t, heads, head_dim)
        ckv = ctx.astype(x.dtype)
        tk = ckv.shape[1]
        kc = (ckv @ p[f"cwk{i}"]).reshape(b, tk, heads, head_dim)
        vc = (ckv @ p[f"cwv{i}"]).reshape(b, tk, heads, head_dim)
        sc = jnp.einsum("bqhd,bkhd->bhqk", qc.astype(jnp.float32),
                        kc.astype(jnp.float32)) * scale
        sc = sc + cross_biases[i].astype(jnp.float32)[:, None]  # (B,1,Tk)
        pc = jax.nn.softmax(sc, axis=-1)
        oc = jnp.einsum("bhqk,bkhd->bqhd", pc, vc.astype(jnp.float32))
        oc = oc.reshape(b, t, c).astype(x.dtype)
        res1 = res1 + (oc @ p[f"cwo{i}"] + p[f"cbo{i}"]).astype(x.dtype)
    h2 = _layer_norm(res1, p["ln3_scale"], p["ln3_bias"]).astype(x.dtype)
    ff = h2 @ p["wi"] + p["bi"]
    a, g = jnp.split(ff, 2, axis=-1)
    gg = a * jax.nn.gelu(g, approximate=False)
    return res1 + (gg @ p["wo2"] + p["bo2"]).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_transformer_block(x, p, heads: int, head_dim: int,
                            contexts=(), cross_biases=()):
    """x: (B, T, C); p: dict of block params (ln1_*, wq/wk/wv/wo/bo, ln3_*,
    wi/bi, wo2/bo2 [+ per cross stream i: ln2{i}_*, cwq{i}/cwk{i}/cwv{i}/
    cwo{i}/cbo{i}]). BasicTransformerBlock: self-attention, then the given
    cross-attention streams (AudioLDM2 dual conditioning — GPT-2 + T5,
    reference plpeline_audioldm2.py:1147-1154), then GEGLU FF.

    contexts: per-stream (B, Tk_i, ctx_dim) conditioning sequences.
    cross_biases: per-stream (B, 1, Tk_i) float additive logit bias in
    natural log units (0 / -1e9 from the attention mask) — required when
    contexts are given (pass zeros when unmasked)."""
    from .attention_kernel import _on_tpu
    if not _INTERPRET and not _on_tpu():
        return _reference_block(x, p, heads, head_dim, contexts, cross_biases)

    b, t, c = x.shape
    qb, p_bf16 = _block_geometry(t)
    t_pad = ((t + qb - 1) // qb) * qb
    scale = 1.0 / math.sqrt(head_dim)

    # measured gates (tools/bench_transformer_block.py / bench_unet.py):
    #   MXUD_T: ride the softmax denominator on the PV matmul when
    #           t_pad <= threshold (pre-augmented V, no per-head concat).
    #           T=4000 measured neutral (2.047 vs 2.028 ms) — stays 1024.
    #   FOLDSCALE (default ON): pre-multiply wq by scale*log2e so the kernel
    #           has zero logit-scaling VPU passes over the (QB, T) tile.
    #           level-0 2.028 vs 2.241 ms/call; UNet CFG fwd 12.79 vs 13.71.
    #   BSOFT: bounded softmax — drop the per-head (QB, T) row-max pass in
    #           favor of the Cauchy-Schwarz logit bound (see _block_kernel).
    mxud_t = int(os.environ.get("DIFFMUSIC_TPU_MXUD_T", "1024"))
    fold_scale = os.environ.get("DIFFMUSIC_TPU_FOLDSCALE", "1") == "1"
    bsoft = os.environ.get("DIFFMUSIC_TPU_BSOFT", "0") == "1"
    use_mxud = p_bf16 and t_pad <= mxud_t
    aug_w = ((head_dim + 1 + 7) // 8) * 8 if use_mxud else 0

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

    if use_mxud:
        # per-head aug_w-wide V blocks: [v_h | 1 | 0...] — the ones column
        # carries the softmax denominator through the PV dot (fp32 accum)
        v4 = v.reshape(b, t_pad, heads, head_dim)
        ones = jnp.ones((b, t_pad, heads, 1), v.dtype)
        zer = jnp.zeros((b, t_pad, heads, aug_w - head_dim - 1), v.dtype)
        v_in = jnp.concatenate([v4, ones, zer], -1).reshape(
            b, t_pad, heads * aug_w)
    else:
        v_in = v

    wq_in = p["wq"].astype(x.dtype)
    if fold_scale:
        wq_in = (p["wq"].astype(jnp.float32)
                 * (scale * 1.4426950408889634)).astype(x.dtype)

    if bsoft:
        # per-(batch, head) max key norm, over the bf16 keys the kernel will
        # actually dot against (padded rows are zero -> norm 0, no effect)
        k4 = k.astype(jnp.float32).reshape(b, t_pad, heads, head_dim)
        kmax = jnp.sqrt(jnp.max(jnp.sum(k4 * k4, axis=-1), axis=1))
        kmax_ops = [kmax[:, None, :]]                      # (B, 1, heads)
        kmax_specs = [pl.BlockSpec((1, 1, heads), lambda bb, i: (bb, 0, 0),
                                   memory_space=pltpu.VMEM)]
    else:
        kmax_ops, kmax_specs = [], []

    # cross-stream K/V are projected outside (tiny GEMMs over Tk<=~128
    # tokens) and padded to one lane tile; the padded keys are masked off
    # through the additive bias
    cross_ops, cross_specs = [], []
    n_cross = len(contexts)
    for i, ctx in enumerate(contexts):
        ckv = ctx.astype(x.dtype)
        ck = jnp.einsum("btc,cd->btd", ckv, p[f"cwk{i}"].astype(x.dtype))
        cv = jnp.einsum("btc,cd->btd", ckv, p[f"cwv{i}"].astype(x.dtype))
        tk = ck.shape[1]
        tk_pad = ((tk + 127) // 128) * 128
        cbias = cross_biases[i].astype(jnp.float32)        # (B, 1, Tk)
        if tk_pad != tk:
            ck = jnp.pad(ck, ((0, 0), (0, tk_pad - tk), (0, 0)))
            cv = jnp.pad(cv, ((0, 0), (0, tk_pad - tk), (0, 0)))
            cbias = jnp.pad(cbias, ((0, 0), (0, 0), (0, tk_pad - tk)),
                            constant_values=-1e9)
        cross_ops += [
            jnp.swapaxes(ck, 1, 2), cv, cbias,
            jnp.stack([p[f"ln2{i}_scale"], p[f"ln2{i}_bias"]]).astype(x.dtype),
            p[f"cwq{i}"].astype(x.dtype), p[f"cwo{i}"].astype(x.dtype),
            p[f"cbo{i}"].astype(x.dtype)[None],
        ]
        whole = lambda shape: pl.BlockSpec(
            shape, lambda bb, i_, _s=len(shape): (0,) * _s,
            memory_space=pltpu.VMEM)
        cross_specs += [
            pl.BlockSpec((1, c, tk_pad), lambda bb, i_: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, c), lambda bb, i_: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_pad), lambda bb, i_: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            whole((2, c)),                     # ln2_i scale/bias
            whole((c, c)),                     # cwq_i
            whole((c, c)),                     # cwo_i
            whole((1, c)),                     # cbo_i
        ]

    stack2 = lambda s_, b_: jnp.stack([p[s_], p[b_]]).astype(x.dtype)
    kernel = functools.partial(_block_kernel, heads=heads, head_dim=head_dim,
                               t_valid=t, scale=scale, p_bf16=p_bf16,
                               mxu_denom=use_mxud, fold_scale=fold_scale,
                               aug_w=aug_w, bsoft=bsoft, n_cross=n_cross)
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
            pl.BlockSpec((1, t_pad, v_in.shape[-1]), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            *kmax_specs,                       # kmax (bsoft mode only)
            *cross_specs,                      # cross streams (AudioLDM2)
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
        # bsoft's qnorm/bound temporaries (and the cross-stream K/V/weight
        # blocks) tip the QB=200 level-0 geometry just over the default 16 MB
        # scoped-VMEM stack; raise the cap only for those modes (the default
        # MusicLDM program's layout/double-buffering stays untouched)
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=24 * 2**20)
                         if (bsoft or n_cross) else None),
        interpret=_INTERPRET,
    )(xp, kt, v_in, *kmax_ops, *cross_ops,
      stack2("ln1_scale", "ln1_bias"), wq_in,
      p["wo"].astype(x.dtype), p["bo"].astype(x.dtype)[None],
      stack2("ln3_scale", "ln3_bias"), p["wi"].astype(x.dtype),
      p["bi"].astype(x.dtype)[None], p["wo2"].astype(x.dtype),
      p["bo2"].astype(x.dtype)[None])
    return out[:, :t]


def _ftb_fwd(x, p, heads, head_dim, contexts=(), cross_biases=()):
    out = fused_transformer_block(x, p, heads, head_dim, contexts,
                                  cross_biases)
    return out, (x, p, contexts, cross_biases)


def _ftb_bwd(heads, head_dim, res, g):
    x, p, contexts, cross_biases = res
    _, vjp = jax.vjp(
        lambda x_, p_, c_: _reference_block(x_, p_, heads, head_dim, c_,
                                            cross_biases),
        x, p, contexts)
    dx, dp, dctx = vjp(g.astype(x.dtype))
    # the biases encode the (non-differentiable) attention mask
    return dx, dp, dctx, jax.tree.map(jnp.zeros_like, cross_biases)


fused_transformer_block.defvjp(_ftb_fwd, _ftb_bwd)
