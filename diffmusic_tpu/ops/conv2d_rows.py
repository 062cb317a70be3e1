"""'Same' 3x3 (odd kxk) conv2d as kw dilated conv1ds over flattened rows.

The round-2 device trace (docs/PERF_NOTES.md) showed XLA's conv2d emitter
running up to 4x its own cost estimate on the VAE decoder's skinny-W NHWC
geometries — the W<=64 spatial minor dim tiles poorly. Flattening (H, W)
into one row axis is free on NHWC, and the kxk conv becomes, per kernel
column dw, a kernel-size-k conv1d over the row axis with rhs_dilation=W
(taps at dh*W) and asymmetric 'same' padding (W*(k//2)-dw, W*(k//2)+dw)
realizing the +dw shift. The W-boundary wrap (an input row contributing
across an image-row edge) is exact to cancel on the INPUT side: the
contribution of input row s through tap column dw is valid iff
col(s) in [dw, W+dw), i.e. a per-dw column mask independent of dh — one
elementwise multiply that XLA fuses into the conv operand.

Unlike the pallas kernel (pallas/conv2d_kernel.py) and the tap-GEMM form
(ops/conv2d_mm.py), this stays entirely inside XLA's fusion/scheduling
domain: no custom-call boundaries in the differentiated program, and the
adjoint is again kw dilated conv1ds (XLA derives it automatically).

Reference semantics: diffusers ResnetBlock2D 3x3 'same' convs
(diffusers/models/resnet.py), consumed via models/layers.py::Conv2DSame.
"""

import jax
import jax.numpy as jnp


def conv2d_same_rows(x, w, b=None):
    """y = conv2d(x, w, 'same', stride 1) + b. x: (B,H,W,C) NHWC;
    w: (kh, kw, Cin, Cout), odd kh/kw."""
    bsz, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    rows = h * wd
    xr = x.reshape(bsz, rows, cin)
    # column index of every flattened row, broadcast over channels
    col = jnp.arange(rows, dtype=jnp.int32) % wd
    dn = jax.lax.conv_dimension_numbers(
        (bsz, rows, cin), (kh, cin, cout), ("NWC", "WIO", "NWC"))
    out = None
    for dw in range(-(kw // 2), kw // 2 + 1):
        xi = xr
        if dw != 0:
            mask = ((col >= dw) & (col < wd + dw)).astype(x.dtype)
            xi = xr * mask[None, :, None]
        y = jax.lax.conv_general_dilated(
            xi, w[:, dw + kw // 2].astype(x.dtype), window_strides=(1,),
            padding=[(wd * (kh // 2) - dw, wd * (kh // 2) + dw)],
            rhs_dilation=(wd,), dimension_numbers=dn)
        out = y if out is None else out + y
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.reshape(bsz, h, wd, cout)
