"""T5 text encoder (flan-t5 style, encoder-only) in flax.

AudioLDM2's second text encoder (reference plpeline_audioldm2.py:491-508): produces
the (B, L, d_model) sequence that feeds both the projection model and the UNet's
second cross-attention stream. Gated-gelu FF, RMSNorm, relative position biases,
no attention scaling (T5 convention).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .configs import T5Config


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        return (scale * x).astype(scale.dtype)


def relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """T5 bidirectional relative position bucketing."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int32) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(np.int32)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


class T5SelfAttention(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, position_bias=None):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        q = nn.Dense(inner, use_bias=False, name="q")(x)
        k = nn.Dense(inner, use_bias=False, name="k")(x)
        v = nn.Dense(inner, use_bias=False, name="v")(x)
        b, t = x.shape[:2]
        q = q.reshape(b, t, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)

        if self.has_relative_bias:
            rel_emb = nn.Embed(cfg.relative_attention_num_buckets, cfg.num_heads,
                               name="relative_attention_bias")
            pos = np.arange(t)
            rel = pos[None, :] - pos[:, None]  # memory - query
            buckets = relative_position_bucket(
                rel, cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance)
            position_bias = rel_emb(jnp.asarray(buckets))  # (T, T, H)
            position_bias = jnp.transpose(position_bias, (2, 0, 1))[None]

        # T5 does NOT scale by sqrt(d_kv)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if position_bias is not None:
            scores = scores + position_bias
        scores = scores + jnp.where(mask[:, None, None, :], 0.0, -1e9)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        return nn.Dense(x.shape[-1], use_bias=False, name="o")(out), position_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, position_bias=None):
        cfg = self.cfg
        h = RMSNorm(cfg.layer_norm_epsilon, name="ln_attn")(x)
        attn_out, position_bias = T5SelfAttention(
            cfg, self.has_relative_bias, name="attn")(h, mask, position_bias)
        x = x + attn_out

        h = RMSNorm(cfg.layer_norm_epsilon, name="ln_ff")(x)
        if cfg.is_gated_act:
            g = nn.Dense(cfg.d_ff, use_bias=False, name="wi_0")(h)
            u = nn.Dense(cfg.d_ff, use_bias=False, name="wi_1")(h)
            h = nn.gelu(g, approximate=True) * u
        else:
            h = nn.relu(nn.Dense(cfg.d_ff, use_bias=False, name="wi")(h))
        x = x + nn.Dense(cfg.d_model, use_bias=False, name="wo")(h)
        return x, position_bias


class T5EncoderModel(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids, attention_mask: Optional[jax.Array] = None):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        mask = attention_mask.astype(bool)
        x = nn.Embed(cfg.vocab_size, cfg.d_model, name="shared")(input_ids)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(cfg, has_relative_bias=(i == 0),
                                       name=f"block_{i}")(x, mask, position_bias)
        x = RMSNorm(cfg.layer_norm_epsilon, name="final_layer_norm")(x)
        return x
