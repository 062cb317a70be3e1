"""StableAudioDiTModel: the stable-audio-open diffusion transformer, in flax.

Structural equivalent of diffusers' `StableAudioDiTModel` used by the reference's
dormant StableAudio pipeline (reference pipeline_stable_audio.py:25-27,696-703):
a 1-D DiT over Oobleck latents with partial rotary self-attention, grouped-query
KV heads, a T5 cross-attention stream, a prepended global conditioning token
(duration embeds + Fourier timestep embed), and SwiGLU feed-forwards.

TPU notes: tokens are (B, T, C) throughout (no NCT transposes inside the loop);
GQA is realized by repeating KV heads before `jax.nn.dot_product_attention` so
XLA still lowers to its fused attention path; rotary tables are closed-over
constants of the jitted sampler, not recomputed per step.
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .configs import StableAudioDiTConfig, StableAudioProjectionConfig


def rotary_tables(dim: int, length: int, theta: float = 10000.0):
    """1-D rotary cos/sin tables, shape (length, dim/2) each
    (diffusers get_1d_rotary_pos_embed, use_real=True)."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    angles = np.arange(length, dtype=np.float64)[:, None] * freqs[None, :]
    return (jnp.asarray(np.cos(angles), jnp.float32),
            jnp.asarray(np.sin(angles), jnp.float32))


def apply_partial_rotary(x, cos, sin, rotary_dim: int):
    """Rotate the first `rotary_dim` channels of each head; pass the rest through.

    x: (B, T, H, D); cos/sin: (T, rotary_dim/2).
    """
    rot, rest = x[..., :rotary_dim], x[..., rotary_dim:]
    r1, r2 = jnp.split(rot, 2, axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    rotated = jnp.concatenate([r1 * c - r2 * s, r2 * c + r1 * s], axis=-1)
    return jnp.concatenate([rotated.astype(x.dtype), rest], axis=-1)


class GaussianFourierProjection(nn.Module):
    """Random-Fourier timestep features -> (B, 2*embedding_size)
    (diffusers StableAudioGaussianFourierProjection: fixed gaussian weight,
    flip_sin_to_cos=True, log=False)."""

    embedding_size: int

    @nn.compact
    def __call__(self, t):
        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.embedding_size,))
        proj = 2.0 * jnp.pi * t.astype(jnp.float32)[:, None] * \
            jax.lax.stop_gradient(w)[None, :]
        return jnp.concatenate([jnp.cos(proj), jnp.sin(proj)], axis=-1)


class GQAAttention(nn.Module):
    """Attention with fewer KV heads than query heads (grouped-query) and
    optional partial rotary embedding on q/k (self-attention only)."""

    heads: int
    kv_heads: int
    head_dim: int
    rotary_dim: int = 0

    @nn.compact
    def __call__(self, x, context=None, rope: Optional[Tuple] = None):
        context = x if context is None else context
        q_inner = self.heads * self.head_dim
        kv_inner = self.kv_heads * self.head_dim
        q = nn.Dense(q_inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(kv_inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(kv_inner, use_bias=False, name="to_v")(context)

        b, tq, tk = x.shape[0], x.shape[1], context.shape[1]
        q = q.reshape(b, tq, self.heads, self.head_dim)
        k = k.reshape(b, tk, self.kv_heads, self.head_dim)
        v = v.reshape(b, tk, self.kv_heads, self.head_dim)

        if rope is not None and self.rotary_dim > 0:
            cos, sin = rope
            q = apply_partial_rotary(q, cos[:tq], sin[:tq], self.rotary_dim)
            k = apply_partial_rotary(k, cos[:tk], sin[:tk], self.rotary_dim)

        if self.kv_heads != self.heads:
            rep = self.heads // self.kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        # jax.nn.dot_product_attention requires one dtype; unify defensively
        # (cross-attention can see a different context dtype)
        k = k.astype(q.dtype)
        v = v.astype(q.dtype)
        attn = jax.nn.dot_product_attention(q, k, v)
        attn = attn.reshape(b, tq, q_inner)
        return nn.Dense(x.shape[-1], use_bias=False, name="to_out")(attn)


class SwiGLUFeedForward(nn.Module):
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * self.mult
        h = nn.Dense(inner * 2, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.silu(gate)
        return nn.Dense(dim, name="proj_out")(h)


class StableAudioDiTBlock(nn.Module):
    cfg: StableAudioDiTConfig

    @nn.compact
    def __call__(self, x, context, rope):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + GQAAttention(cfg.num_attention_heads,
                             cfg.num_key_value_attention_heads,
                             cfg.attention_head_dim, cfg.rotary_dim,
                             name="attn1")(h, rope=rope)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + GQAAttention(cfg.num_attention_heads,
                             cfg.num_key_value_attention_heads,
                             cfg.attention_head_dim,
                             name="attn2")(h, context=context)
        h = nn.LayerNorm(epsilon=1e-6, name="norm3")(x)
        x = x + SwiGLUFeedForward(name="ff")(h)
        return x


class StableAudioDiTModel(nn.Module):
    """forward(latents (B, C, T), timestep (B,), encoder_hidden_states
    (B, L, cross_attention_input_dim), global_states (B, global_states_input_dim))
    -> noise prediction (B, C, T)."""

    cfg: StableAudioDiTConfig

    @nn.compact
    def __call__(self, latents, timestep, encoder_hidden_states, global_states):
        cfg = self.cfg
        inner = cfg.inner_dim

        # conditioning projections
        ctx = nn.Dense(cfg.cross_attention_dim, use_bias=False,
                       name="cross_attention_proj_1")(encoder_hidden_states)
        ctx = nn.Dense(cfg.cross_attention_dim, use_bias=False,
                       name="cross_attention_proj_2")(nn.silu(ctx))

        glob = nn.Dense(inner, use_bias=False, name="global_proj_1")(global_states)
        glob = nn.Dense(inner, use_bias=False, name="global_proj_2")(nn.silu(glob))

        t_feat = GaussianFourierProjection(cfg.time_proj_dim // 2,
                                           name="time_proj")(timestep)
        t_emb = nn.Dense(inner, name="timestep_proj_1")(t_feat)
        t_emb = nn.Dense(inner, name="timestep_proj_2")(nn.silu(t_emb))
        glob = glob + t_emb  # (B, inner)

        # tokens: residual 1x1 preprocess conv, then project in
        x = jnp.swapaxes(latents, 1, 2)  # (B, T, C)
        x = x + nn.Dense(cfg.in_channels, use_bias=False,
                         name="preprocess_conv")(x)
        x = nn.Dense(inner, use_bias=False, name="proj_in")(x)
        # cast: the Fourier time features are fp32, and a mixed-dtype concat
        # would silently promote the whole 24-layer token stream to fp32
        # (and mismatch the bf16 cross-attention context)
        x = jnp.concatenate([glob[:, None, :].astype(x.dtype), x], axis=1)

        rope = rotary_tables(cfg.rotary_dim, x.shape[1])
        for i in range(cfg.num_layers):
            x = StableAudioDiTBlock(cfg, name=f"block_{i}")(x, ctx, rope)

        x = nn.Dense(cfg.out_channels, use_bias=False, name="proj_out")(x)
        x = x[:, 1:, :]  # drop the global token
        x = x + nn.Dense(cfg.out_channels, use_bias=False,
                         name="postprocess_conv")(x)
        return jnp.swapaxes(x, 1, 2)


class NumberConditioner(nn.Module):
    """Learned embedding of a scalar (seconds_start / seconds_total), diffusers
    StableAudioNumberConditioner: clamp -> normalize to [0,1] -> Fourier features
    -> linear."""

    dim: int
    min_value: float
    max_value: float

    @nn.compact
    def __call__(self, value):
        v = jnp.clip(jnp.asarray(value, jnp.float32), self.min_value,
                     self.max_value)
        v = (v - self.min_value) / (self.max_value - self.min_value)  # (B,)
        w = self.param("weight", nn.initializers.normal(1.0), (self.dim // 2,))
        ang = 2.0 * jnp.pi * v[:, None] * jax.lax.stop_gradient(w)[None, :]
        feats = jnp.concatenate([v[:, None], jnp.sin(ang), jnp.cos(ang)], axis=-1)
        return nn.Dense(self.dim, name="proj")(feats)


class StableAudioProjectionModel(nn.Module):
    """Text projection + duration conditioners -> (text_hidden_states,
    global_states) (diffusers StableAudioProjectionModel)."""

    cfg: StableAudioProjectionConfig

    @nn.compact
    def __call__(self, text_hidden_states, seconds_start, seconds_total):
        cfg = self.cfg
        text = nn.Dense(cfg.conditioning_dim, name="text_projection")(
            text_hidden_states)
        start = NumberConditioner(cfg.conditioning_dim, cfg.min_value,
                                  cfg.max_value,
                                  name="start_number_conditioner")(seconds_start)
        total = NumberConditioner(cfg.conditioning_dim, cfg.min_value,
                                  cfg.max_value,
                                  name="end_number_conditioner")(seconds_total)
        global_states = jnp.concatenate([start, total], axis=-1)
        return text, global_states
