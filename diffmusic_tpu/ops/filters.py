"""1-D convolution filters: reverb impulse response application.

Replaces torch.nn.functional.conv1d as used by the dereverberation operator
(diffmusic/inverse_problem/operator.py:238-250).
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def convolve1d(x: jax.Array, ir: jax.Array) -> jax.Array:
    """Cross-correlate (..., L) with ir (ir_len,), padding ir_len // 2 each side.

    Output length = L + 2*(ir_len//2) - ir_len + 1, matching torch.conv1d with
    padding=ir_len//2 (operator.py:247-249).
    """
    ir_len = ir.shape[-1]
    pad = ir_len // 2
    batch_shape = x.shape[:-1]
    xb = x.reshape(-1, 1, x.shape[-1])
    k = ir.reshape(1, 1, ir_len).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xb, k, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NCW", "OIW", "NCW"))
    return y.reshape(*batch_shape, y.shape[-1])


def generate_impulse_response(key: jax.Array, ir_length: int = 800,
                              decay_factor: float = 0.85) -> jax.Array:
    """Random cumsum impulse response, normalized to unit peak.

    Same construction as the reference (operator.py:238-242): white noise ->
    cumulative sum scaled by decay_factor -> peak-normalize.
    """
    ir = jax.random.normal(key, (ir_length,))
    ir = jnp.cumsum(ir) * decay_factor
    ir = ir / jnp.max(jnp.abs(ir))
    return ir
