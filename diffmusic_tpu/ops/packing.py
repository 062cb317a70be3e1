"""Space-to-depth (time→channel) packing for small-channel conv1d stages.

The last HiFi-GAN vocoder stages run at 64 and 32 channels over 80k/160k
samples (models/hifigan.py; reference vocoder = transformers SpeechT5HifiGan,
used on the guidance gradient path at scheduling_dps.py:195-212). TPU lanes
are 128-wide: a C=32 conv wastes 3/4 of every operand tile in BOTH the
forward and the adjoint conv. Packing r consecutive time steps into the
channel axis — (B, T, C) -> (B, T/r, r*C) — makes every matmul full-lane.

A 'same' dilated conv in the unpacked domain is EXACTLY a dense (dilation-1)
conv in the packed domain with a precomputed packed kernel: output phase rho
draws tap i from absolute offset o = rho + i*d - pad, i.e. packed row offset
q = o // r, input phase s = o % r, so

    W_p[q, s*C+ci, rho*C+co] = sum_i [o//r == q][o%r == s] * w[i, ci, co]

with asymmetric 'same' padding (pad_lo, pad_hi) = (-q_min, q_max). The
mapping is a constant 0/1 tensor, so kernel packing is ONE tiny einsum
(hoisted out of the denoise scan by XLA loop-invariant code motion).

MXU tile accounting at the real vocoder geometry (both small stages, all 18
convs each): ch64/r=2 needs 80 packed tap-tiles vs 126 unpacked (1.6x fewer),
ch32/r=4 needs 25.5 vs 126 (4.9x) — dilated taps pack less densely (k_p ~
(k-1)d/r + 1) but every surviving tile is full-width.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pack_time(x: jax.Array, r: int) -> jax.Array:
    """(B, T, C) -> (B, T//r, r*C); row tp holds times [r*tp, r*tp+r)."""
    b, t, c = x.shape
    assert t % r == 0, (t, r)
    return x.reshape(b, t // r, r * c)


def unpack_time(x: jax.Array, r: int) -> jax.Array:
    """Inverse of pack_time: (B, T/r, r*C) -> (B, T, C)."""
    b, tp, rc = x.shape
    assert rc % r == 0, (rc, r)
    return x.reshape(b, tp * r, rc // r)


@functools.lru_cache(maxsize=None)
def _packing_map(k: int, dilation: int, r: int):
    """Constant mapping tensor M[i, q, s, rho] and (pad_lo, pad_hi)."""
    pad = (k - 1) * dilation // 2
    offsets = [(rho, i, rho + i * dilation - pad)
               for rho in range(r) for i in range(k)]
    qmin = min(o // r for _, _, o in offsets)
    qmax = max(o // r for _, _, o in offsets)
    kp = qmax - qmin + 1
    m = np.zeros((k, kp, r, r), np.float32)
    for rho, i, o in offsets:
        m[i, o // r - qmin, o % r, rho] = 1.0
    return m, -qmin, qmax


def packed_kernel_size(k: int, dilation: int, r: int) -> int:
    return _packing_map(k, dilation, r)[0].shape[1]


def pack_conv1d_kernel(w: jax.Array, dilation: int, r: int):
    """(k, Cin, Cout) -> ((k_p, r*Cin, r*Cout), pad_lo, pad_hi).

    One einsum against a constant 0/1 map — cheap enough to run inline under
    jit (weights are loop-invariant, so XLA hoists it out of the scan body).
    """
    k, cin, cout = w.shape
    m, pad_lo, pad_hi = _packing_map(k, dilation, r)
    wp = jnp.einsum("iqsp,ico->qscpo", jnp.asarray(m, w.dtype), w)
    return wp.reshape(wp.shape[0], r * cin, r * cout), pad_lo, pad_hi


def packed_conv1d(xp: jax.Array, w: jax.Array, b: jax.Array, dilation: int,
                  r: int, slope=None, residual=None) -> jax.Array:
    """'same' dilated conv1d computed on a pack_time(x, r) tensor.

    Semantically identical to pallas/conv1d_kernel.py::conv1d_fused on the
    unpacked tensor: optional input leaky-relu, bias, optional residual add
    (residual given in PACKED layout). Returns the packed output.
    """
    h = jnp.where(xp >= 0, xp, slope * xp) if slope is not None else xp
    wp, pad_lo, pad_hi = pack_conv1d_kernel(w, dilation, r)
    out = jax.lax.conv_general_dilated(
        h, wp.astype(h.dtype), window_strides=(1,), padding=[(pad_lo, pad_hi)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    out = out + jnp.tile(b, r)[None, None, :].astype(out.dtype)
    if residual is not None:
        out = out + residual
    return out.astype(xp.dtype)


def can_pack_transpose(k: int, stride: int, r_in: int, r_out: int) -> bool:
    """Geometry under which packed_convtranspose is exact: packed output rows
    advance an integer number of packed input rows, and the torch 'same'-ish
    padding (k - stride) // 2 is exact."""
    return (r_out % stride == 0 and (r_out // stride) % r_in == 0
            and (k - stride) % 2 == 0)


def _native_convtranspose(x: jax.Array, w_math: jax.Array, stride: int,
                          k: int) -> jax.Array:
    """flax nn.ConvTranspose(strides=stride, torch padding, transpose_kernel)
    as the raw lax op; w_math is the (k, Cin, Cout) math layout."""
    pad = k - 1 - (k - stride) // 2
    return jax.lax.conv_transpose(
        x, jnp.swapaxes(w_math, 1, 2), (stride,), [(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"), transpose_kernel=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _dense_ct_linear(x, w, b, stride: int, k: int, t_out: int):
    """Linear ConvTranspose with a MEASURED hybrid routing (device trace,
    docs/PERF_NOTES.md): forward = the stride-packed dense conv (XLA lowers
    the native lhs-dilated forward ~rate x over its useful FLOPs — 1.88
    ms/step across the three unpacked HiFi-GAN upsamplers), backward = the
    transpose of the NATIVE formulation (a plain strided conv, 0.42 ms/step —
    the dense formulation's autodiffed adjoint is what lost the round-2
    dense-CT A/B). Weight/bias cotangents are symbolic zeros (frozen-weight
    inference framework, same contract as pallas/conv1d_kernel.py)."""
    rows = -(-t_out // stride)
    if rows > x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, rows - x.shape[1]), (0, 0)))
    y = packed_convtranspose(x, w, b, stride, 1, stride)
    y = unpack_time(y, stride)
    return y[:, :t_out] if y.shape[1] != t_out else y


def _dense_ct_fwd(x, w, b, stride, k, t_out):
    # x is saved only for its shape/dtype (the function is linear — the
    # transpose needs no primal values); XLA DCEs the unused buffer
    return _dense_ct_linear(x, w, b, stride, k, t_out), (x, w)


def _dense_ct_bwd(stride, k, t_out, res, g):
    x, w = res
    x_shape, x_dtype = x.shape, x.dtype
    # run the adjoint conv in the WEIGHT dtype (bf16 in production; fp32
    # matmuls run at a fraction of the MXU's bf16 rate) — same convention as
    # pallas/conv1d_kernel.py::_conv1d_bwd
    g16 = g.astype(w.dtype)
    f = lambda x_: _native_convtranspose(x_.astype(w.dtype), w, stride, k)
    (dx,) = jax.linear_transpose(
        f, jax.ShapeDtypeStruct(x_shape, w.dtype))(g16)
    return dx.astype(x_dtype), jnp.zeros_like(w), \
        jnp.zeros((w.shape[2],), x_dtype)


_dense_ct_linear.defvjp(_dense_ct_fwd, _dense_ct_bwd)


def dense_convtranspose(x: jax.Array, w: jax.Array, b: jax.Array,
                        stride: int, k: int, t_out: int,
                        slope=None) -> jax.Array:
    """ConvTranspose1d(stride, torch padding (k-stride)//2) as ONE dense
    stride-1 conv producing stride-packed output rows, then a free reshape.

    XLA lowers lax.conv_transpose/lhs-dilated convs with interleaved zeros —
    ~stride x wasted MACs on the MXU (models/hifigan.py upsamplers: 5x on the
    first stage). The packed-output formulation does exactly the useful FLOPs.
    Handles ragged torch geometry (odd k-stride gives t_out = T*stride + 1,
    e.g. the 1000 -> 5001 first MusicLDM stage) by padding one input row and
    slicing. x: (B, T, Cin); w: math layout (k, Cin, Cout); returns
    (B, t_out, Cout)."""
    if slope is not None:
        x = jnp.where(x >= 0, x, slope * x)
    return _dense_ct_linear(x, w, b, stride, k, t_out)


@functools.lru_cache(maxsize=None)
def _convtranspose_packing_map(k: int, stride: int, r_in: int, r_out: int,
                               c_ratio: int):
    """Mapping for a flax ConvTranspose(transpose_kernel=True, 'same'-style
    torch padding) consumed/produced in packed layouts.

    torch semantics (models/hifigan.py upsampler comment): with
    p_ct = (k - stride) // 2,  y[t] = sum_{u,j: stride*u + j - p_ct = t}
    x[u] @ W[j].  Packed: t = r_out*tp + rho, u = r_in*up + s.  Each (rho, j)
    with (r_out*0 + rho + p_ct - j) ≡ 0 (mod stride) contributes from
    u = (r_out*tp + rho + p_ct - j) // stride, i.e. packed input row
    up = u // r_in at offset q = up - tp*(r_out // (stride*r_in)) ... all
    collapsed here by direct enumeration over one output row period.

    Requires r_out % (stride * r_in) == 0 or exact row alignment; asserted.
    Returns M[j, q, s, rho] and (pad_lo, pad_hi) in packed-input rows.
    """
    p_ct = (k - stride) // 2
    # rows advance: output row tp covers times [r_out*tp, r_out*tp + r_out);
    # input time u = (t + p_ct - j)/stride advances r_out/stride per output
    # row — packed input rows advance (r_out/stride)/r_in per output row.
    assert r_out % stride == 0 and (r_out // stride) % r_in == 0, \
        (k, stride, r_in, r_out)
    entries = []  # (j, q, s, rho)
    qs = []
    for rho in range(r_out):
        for j in range(k):
            v = rho + p_ct - j
            if v % stride != 0:
                continue
            u_off = v // stride  # input time offset relative to (r_out/stride)*tp
            # absolute input time u = (r_out // stride) * tp + u_off
            # packed input row = u // r_in, phase = u % r_in, BUT u_off may be
            # negative: row offset q relative to ((r_out // stride) // r_in)*tp
            q = u_off // r_in
            s = u_off % r_in
            entries.append((j, q, s, rho))
            qs.append(q)
    qmin, qmax = min(qs), max(qs)
    kp = qmax - qmin + 1
    m = np.zeros((k, kp, r_in, r_out), np.float32)
    for j, q, s, rho in entries:
        m[j, q - qmin, s, rho] = 1.0
    rows_per_out = (r_out // stride) // r_in  # packed input rows per output row
    return m, -qmin, qmax, rows_per_out


def pack_convtranspose_kernel(w: jax.Array, stride: int, r_in: int,
                              r_out: int):
    """ConvTranspose kernel (k, Cout, Cin) [flax transpose_kernel=True layout
    is (k, Cin_spatial..., actually (k, C_out, C_in) per nn.ConvTranspose
    transpose_kernel docs — callers pass the (k, Cin, Cout) math layout] ->
    packed dense-conv kernel ((k_p, r_in*Cin, r_out*Cout), pad_lo, pad_hi,
    rows_per_out)."""
    k, cin, cout = w.shape
    m, pad_lo, pad_hi, rows_per_out = _convtranspose_packing_map(
        k, stride, r_in, r_out, cout)
    wp = jnp.einsum("jqsp,jco->qscpo", jnp.asarray(m, w.dtype), w)
    return (wp.reshape(wp.shape[0], r_in * cin, r_out * cout),
            pad_lo, pad_hi, rows_per_out)


def packed_convtranspose(xp: jax.Array, w: jax.Array, b: jax.Array,
                         stride: int, r_in: int, r_out: int,
                         slope=None) -> jax.Array:
    """flax ConvTranspose(strides=stride, torch-equivalent padding,
    transpose_kernel=True) with packed input (r_in) and packed output (r_out).

    w is the MATH layout (k, Cin, Cout) = the torch ConvTranspose1d weight
    (Cin, Cout, k) transposed — i.e. convert.py's stored layout. Output has
    T_out_packed = T_in_packed // rows_per_out rows of r_out*Cout channels.
    When rows advance 1:1 (rows_per_out == 1) this is a plain dense conv.
    """
    h = jnp.where(xp >= 0, xp, slope * xp) if slope is not None else xp
    wp, pad_lo, pad_hi, rows_per_out = pack_convtranspose_kernel(
        w, stride, r_in, r_out)
    out = jax.lax.conv_general_dilated(
        h, wp.astype(h.dtype), window_strides=(rows_per_out,),
        padding=[(pad_lo, pad_hi)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    cout = w.shape[2]
    out = out + jnp.tile(b, r_out)[None, None, :].astype(out.dtype)
    return out.astype(xp.dtype)
