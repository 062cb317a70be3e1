"""HiFi-GAN vocoder (SpeechT5HifiGan-compatible) in flax.

Mirrors transformers.SpeechT5HifiGan, which the reference uses as the mel->waveform
vocoder on the guidance gradient path (scheduling_dps.py:198, operator.py:38-42).
Implemented channels-last with `lax.conv_transpose` upsampling; weight layouts are
chosen so the torch state dict converts by pure transposition (convert.py).
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import HiFiGANConfig


def _leaky(x, slope):
    return nn.leaky_relu(x, negative_slope=slope)


class FusedConv1D(nn.Module):
    """'same' dilated conv1d with fused input leaky-relu (+ optional residual)
    via the Pallas kernel (pallas/conv1d_kernel.py). Param names/layout match
    nn.Conv, so converted checkpoints and existing inits are interchangeable;
    off-TPU it runs an identical-semantics lax.conv path.
    """
    features: int
    kernel_size: int
    dilation: int = 1
    slope: float | None = None

    @nn.compact
    def __call__(self, x, residual=None, signal_len: int | None = None):
        from ..pallas.conv1d_kernel import (canvas_mode, conv1d_canvas_xbwd,
                                            conv1d_fused, conv1d_fused_canvas)
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.kernel_size, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # optional pre-transposed kernel for the guidance backward, threaded
        # as an 'adjoint' variable collection (with_adjoint_weights) so it is
        # computed once at load time, never inside the denoise scan
        w_adj = (self.get_variable("adjoint", "kernel_adj")
                 if self.has_variable("adjoint", "kernel_adj") else None)
        if signal_len is not None:
            # canvas (margin-carrying) contract: x/residual/result are
            # to_canvas tensors; no pad/slice copies between chained convs
            if canvas_mode() == "xbwd":
                return conv1d_canvas_xbwd(x, kernel, bias, residual,
                                          signal_len, self.dilation,
                                          self.slope, residual is not None)
            return conv1d_fused_canvas(x, kernel, bias, residual, signal_len,
                                       self.dilation, self.slope,
                                       residual is not None, w_adj=w_adj)
        return conv1d_fused(x, kernel, bias, residual, self.dilation,
                            self.slope, residual is not None, w_adj=w_adj)


def with_adjoint_weights(variables, only=None):
    """Attach an 'adjoint' collection of pre-flipped/transposed FusedConv1D
    kernels to a vocoder variables dict.

    The guidance backward (scheduling_dps.py:195-212 in the reference) runs the
    adjoint conv once per denoising step; with the (k, Cout, Cin) layout
    materialized HERE — once, at parameter-load time — the backward reuses the
    MXU-standard forward Pallas kernel with zero per-step weight transposes
    (docs/PERF_NOTES.md: the in-kernel swapped-contraction adjoint lost).
    Returns `variables` unchanged if it contains no FusedConv1D kernels.
    `only`: optional predicate on the enclosing module name (e.g.
    `lambda name: name in {"resblocks_3"}`) to attach adjoints selectively
    (bisection experiments, docs/PERF_NOTES.md).
    """
    params = variables.get("params", variables)

    def walk(d, parent=""):
        out = {}
        for name, v in d.items():
            if not isinstance(v, dict):
                continue
            k = v.get("kernel")
            if name.startswith("convs") and k is not None and k.ndim == 3:
                if only is None or only(parent):
                    out[name] = {"kernel_adj": jnp.flip(k, axis=0).swapaxes(1, 2)}
            else:
                sub = walk(v, name)
                if sub:
                    out[name] = sub
        return out

    adj = walk(params)
    if not adj:
        return variables
    out = dict(variables)
    out["adjoint"] = adj
    return out


class _ConvParams(nn.Module):
    """Declares exactly FusedConv1D's param tree (kernel/bias), returning the
    raw arrays — lets ResidualBlock feed BOTH convs of an iteration to the
    fused pair kernel while staying checkpoint-compatible."""
    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.kernel_size, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _ConvTransposeParams(nn.Module):
    """nn.ConvTranspose(transpose_kernel=True)'s param tree — kernel laid out
    (k, Cout, Cin) (convert.py:25) — returned raw for the packed upsampler."""
    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.kernel_size, self.features, cin))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


# Space-to-depth routing for the small-channel stages (ch64/ch32 at 80k/160k
# samples: 2-4x MXU lane waste on the XLA convs in BOTH grad directions —
# ops/packing.py). TPU-only by default; tests force it on CPU via this hook.
_PACK_ON_CPU = False


def _dense_ct_on() -> bool:
    """Dense stride-packed ConvTranspose formulation for the unpacked
    upsampler stages (ops/packing.py::dense_convtranspose). Measured SLOWER
    than XLA's native transposed-conv lowering in the full vocoder fwd+bwd
    (24.68 vs 23.84 ms/iter, tools/bench_vocoder_bwd.py — XLA does not pay
    the naive interleaved-zero cost); default OFF, kept for A/B via
    DIFFMUSIC_TPU_DENSE_CT=1."""
    import os
    if os.environ.get("DIFFMUSIC_TPU_DENSE_CT", "0") != "1":
        return _PACK_ON_CPU  # CPU tests still exercise the path
    from ..pallas.conv1d_kernel import _on_tpu
    return _PACK_ON_CPU or _on_tpu()


def _phase_ct_routed() -> bool:
    """Pallas phase-GEMM upsampler forward (pallas/upsampler_kernel.py):
    useful-FLOPs-only MXU dots writing per-phase outputs, native-transpose
    backward. Gate: DIFFMUSIC_TPU_UPS=phase|xla. Measured on v5e
    (tools/bench_vocoder_bwd.py 100 pallas, separate processes, same day):
    vocoder fwd+bwd 31.21 ms/iter (phase) vs 32.82 (xla) — default ON;
    full-program confirmation in docs/PERF_NOTES.md."""
    import os
    return os.environ.get("DIFFMUSIC_TPU_UPS", "phase") == "phase"


def _pack_ratio(ch: int, t: int) -> int:
    """Packing factor for a stage of `ch` channels / `t` samples (1 = off)."""
    from ..pallas.conv1d_kernel import _on_tpu
    if not (_PACK_ON_CPU or _on_tpu()):
        return 1
    if ch >= 128 or 128 % ch or t % (128 // ch):
        return 1
    r = 128 // ch
    return r if r <= 4 else 1


class ResidualBlock(nn.Module):
    """HifiGanResidualBlock: (lrelu -> dilated conv -> lrelu -> conv) + skip, xN.

    On TPU with aligned channels, each (convs1_i, convs2_i) iteration runs as
    ONE fused pair kernel (conv1d_fused_pair): the intermediate h never
    round-trips through HBM as an input, and the pallas call count halves.
    Oversized weight pairs (k=11 at ch512) and misaligned channels fall back
    to per-conv fused calls; XLA's conv lowering (10.45 GB HBM per vocoder
    forward, im2col) is the off-TPU path inside conv1d_fused itself.
    """
    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    slope: float

    @nn.compact
    def __call__(self, x, signal_len: int | None = None, packed_r: int = 1,
                 collect_params: bool = False):
        from ..pallas.conv1d_kernel import conv1d_fused_pair, pair_ok
        if collect_params:
            # declare the identical param tree and hand the raw arrays to the
            # stage-level fused path (pallas/stage_bwd_kernel.py) — x is
            # returned untouched alongside the params
            out = []
            cin = x.shape[-1]
            for i, _d in enumerate(self.dilations):
                w1, b1 = _ConvParams(self.channels, self.kernel_size,
                                     name=f"convs1_{i}")(cin)
                w2, b2 = _ConvParams(self.channels, self.kernel_size,
                                     name=f"convs2_{i}")(self.channels)
                out.append((w1, b1, w2, b2))
            return out
        if packed_r > 1:
            # x is pack_time(x, r): dense full-lane convs with packed kernels
            from ..ops.packing import packed_conv1d
            for i, d in enumerate(self.dilations):
                w1, b1 = _ConvParams(self.channels, self.kernel_size,
                                     name=f"convs1_{i}")(self.channels)
                w2, b2 = _ConvParams(self.channels, self.kernel_size,
                                     name=f"convs2_{i}")(self.channels)
                h = packed_conv1d(x, w1, b1, d, packed_r, self.slope)
                x = packed_conv1d(h, w2, b2, 1, packed_r, self.slope,
                                  residual=x)
            return x
        from ..pallas.conv1d_kernel import canvas_mode, conv1d_pair_canvas
        for i, d in enumerate(self.dilations):
            cin = x.shape[-1]
            if signal_len is not None and canvas_mode() == "xbwd" \
                    and pair_ok(self.kernel_size, cin, self.channels,
                                x.dtype):
                # canvas-contract fused pair: margins re-established
                # in-kernel, XLA adjoint backward (round-4 quadrant)
                w1, b1 = _ConvParams(self.channels, self.kernel_size,
                                     name=f"convs1_{i}")(cin)
                w2, b2 = _ConvParams(self.channels, self.kernel_size,
                                     name=f"convs2_{i}")(self.channels)
                x = conv1d_pair_canvas(x, w1, b1, w2, b2, signal_len, d,
                                       self.slope)
                continue
            if signal_len is None and pair_ok(self.kernel_size, cin,
                                              self.channels, x.dtype):
                w1, b1 = _ConvParams(self.channels, self.kernel_size,
                                     name=f"convs1_{i}")(cin)
                w2, b2 = _ConvParams(self.channels, self.kernel_size,
                                     name=f"convs2_{i}")(self.channels)
                x = conv1d_fused_pair(x, w1, b1, w2, b2, d, self.slope)
                continue
            h = FusedConv1D(self.channels, self.kernel_size, dilation=d,
                            slope=self.slope, name=f"convs1_{i}")(
                                x, signal_len=signal_len)
            x = FusedConv1D(self.channels, self.kernel_size,
                            slope=self.slope, name=f"convs2_{i}")(
                                h, residual=x, signal_len=signal_len)
        return x


class SpeechT5HifiGan(nn.Module):
    cfg: HiFiGANConfig

    @nn.compact
    def __call__(self, spectrogram: jax.Array) -> jax.Array:
        """(B, T, model_in_dim) log-mel -> (B, T * hop_length) waveform.

        Same geometry as transformers SpeechT5HifiGan.forward (the reference's
        vocoder(mel) calls at operator.py:41).
        """
        cfg = self.cfg
        x = spectrogram
        if cfg.normalize_before:
            mean = self.param("mean", nn.initializers.zeros, (cfg.model_in_dim,))
            scale = self.param("scale", nn.initializers.ones, (cfg.model_in_dim,))
            x = (x - mean) / scale

        x = nn.Conv(cfg.upsample_initial_channel, (7,), padding=[(3, 3)],
                    name="conv_pre")(x)

        num_kernels = len(cfg.resblock_kernel_sizes)
        packed_r = 1  # current space-to-depth factor of x (ops/packing.py)
        for i, (rate, k) in enumerate(zip(cfg.upsample_rates,
                                          cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            cin = cfg.upsample_initial_channel // (2 ** i)
            t_out = x.shape[1] * packed_r * rate
            r_new = _pack_ratio(ch, t_out)
            from ..ops.packing import (can_pack_transpose, packed_convtranspose,
                                       pack_time, unpack_time)
            if r_new > 1 and can_pack_transpose(k, rate, packed_r, r_new):
                # upsample straight into the packed layout: a stride-2
                # ConvTranspose into r=2-packed output is a dense full-lane
                # stride-1 conv — no unpacked ch<128 tensor ever exists
                w, b = _ConvTransposeParams(ch, k, name=f"upsampler_{i}")(cin)
                x = packed_convtranspose(x, w.swapaxes(1, 2), b, rate,
                                         packed_r, r_new,
                                         slope=cfg.leaky_relu_slope)
                packed_r = r_new
            else:
                if packed_r > 1:
                    x = unpack_time(x, packed_r)
                    packed_r = 1
                # torch ConvTranspose1d(stride=rate, padding=P=(k-rate)//2):
                # out = (in-1)*rate + k - 2P; flax explicit padding (lo, hi):
                # out = (in-1)*rate + k - 2(k-1) + lo + hi, so lo = hi = k-1-P
                pad = k - 1 - (k - rate) // 2
                t_out = (x.shape[1] - 1) * rate + k - 2 * ((k - rate) // 2)
                from ..pallas.upsampler_kernel import (phase_convtranspose,
                                                       phase_ct_ok)
                if _phase_ct_routed() and phase_ct_ok(cin, ch):
                    w, b = _ConvTransposeParams(ch, k,
                                                name=f"upsampler_{i}")(cin)
                    x = phase_convtranspose(x, w.swapaxes(1, 2), b, rate, k,
                                            t_out,
                                            slope=cfg.leaky_relu_slope)
                elif _dense_ct_on():
                    # stride-packed dense formulation: XLA's lhs-dilated
                    # lowering wastes ~rate x MACs (ops/packing.py)
                    from ..ops.packing import dense_convtranspose
                    w, b = _ConvTransposeParams(ch, k,
                                                name=f"upsampler_{i}")(cin)
                    x = dense_convtranspose(x, w.swapaxes(1, 2), b, rate, k,
                                            t_out,
                                            slope=cfg.leaky_relu_slope)
                else:
                    x = _leaky(x, cfg.leaky_relu_slope)
                    x = nn.ConvTranspose(
                        ch, (k,), strides=(rate,), padding=[(pad, pad)],
                        transpose_kernel=True, name=f"upsampler_{i}")(x)
                if r_new > 1:
                    x = pack_time(x, r_new)
                    packed_r = r_new

            # canvas contract across the whole resblock stage: pad once, run
            # the 6*num_kernels fused convs + residual adds margin-carrying,
            # slice once (docs/PERF_NOTES.md round-2 roadmap item 1)
            from ..pallas.conv1d_kernel import (_on_tpu, canvas_ok,
                                                from_canvas, pair_ok,
                                                to_canvas, _INTERPRET)
            from ..pallas.stage_bwd_kernel import (stage_bwd_on, stage_ok,
                                                   stage_resblocks_canvas)
            t = x.shape[1]
            use_stage = (packed_r == 1 and stage_bwd_on()
                         and (_INTERPRET or _on_tpu())
                         and stage_ok(ch, cfg.resblock_kernel_sizes,
                                      cfg.resblock_dilation_sizes, x.dtype)
                         and all(pair_ok(k, ch, ch, x.dtype)
                                 for k in cfg.resblock_kernel_sizes))
            if use_stage:
                # per-stage fused BACKWARD megakernel: one pallas call
                # computes the whole stage's input cotangent
                # (pallas/stage_bwd_kernel.py)
                params = []
                for j, rk in enumerate(cfg.resblock_kernel_sizes):
                    params.extend(ResidualBlock(
                        ch, rk, cfg.resblock_dilation_sizes[j],
                        cfg.leaky_relu_slope,
                        name=f"resblocks_{i * num_kernels + j}")(
                            x, collect_params=True))
                x = from_canvas(stage_resblocks_canvas(
                    to_canvas(x), tuple(params), t,
                    tuple(cfg.resblock_kernel_sizes),
                    tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
                    cfg.leaky_relu_slope), t)
                continue
            use_canvas = packed_r == 1 and canvas_ok(ch, ch)
            if use_canvas:
                x = to_canvas(x)
            res = None
            for j, rk in enumerate(cfg.resblock_kernel_sizes):
                out = ResidualBlock(ch, rk, cfg.resblock_dilation_sizes[j],
                                    cfg.leaky_relu_slope,
                                    name=f"resblocks_{i * num_kernels + j}")(
                                        x, signal_len=t if use_canvas else None,
                                        packed_r=packed_r)
                res = out if res is None else res + out
            x = res / num_kernels
            if use_canvas:
                x = from_canvas(x, t)

        if packed_r > 1:
            from ..ops.packing import packed_conv1d, unpack_time
            w, b = _ConvParams(1, 7, name="conv_post")(x.shape[-1] // packed_r)
            x = packed_conv1d(x, w, b, 1, packed_r,
                              slope=cfg.leaky_relu_slope)
            x = unpack_time(jnp.tanh(x), packed_r)
            return x[..., 0]

        x = _leaky(x, cfg.leaky_relu_slope)
        x = nn.Conv(1, (7,), padding=[(3, 3)], name="conv_post")(x)
        x = jnp.tanh(x)
        return x[..., 0]  # (B, L)
