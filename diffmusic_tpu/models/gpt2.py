"""GPT-2 hidden-state language model in flax.

AudioLDM2 drives GPT2Model in *embedding space*: the projected prompt sequence is
the input embedding, and at each of 8 steps the last hidden state is appended and
fed back (reference plpeline_audioldm2.py:280-320). `generate_hidden_states`
implements that loop at static shape (L0 + max_new_tokens) with a growing
attention mask, so it jit-compiles cleanly.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import GPT2Config


class GPT2Block(nn.Module):
    cfg: GPT2Config

    @nn.compact
    def __call__(self, x, attn_bias):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_1")(x)
        qkv = nn.Dense(3 * cfg.n_embd, name="c_attn")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, t = x.shape[:2]
        hd = cfg.n_embd // cfg.n_head
        q = q.reshape(b, t, cfg.n_head, hd)
        k = k.reshape(b, t, cfg.n_head, hd)
        v = v.reshape(b, t, cfg.n_head, hd)
        attn = jax.nn.dot_product_attention(q, k, v, bias=attn_bias)
        attn = attn.reshape(b, t, cfg.n_embd)
        x = x + nn.Dense(cfg.n_embd, name="attn_c_proj")(attn)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_2")(x)
        h = nn.Dense(4 * cfg.n_embd, name="c_fc")(h)
        h = nn.gelu(h, approximate=True)  # gelu_new
        x = x + nn.Dense(cfg.n_embd, name="mlp_c_proj")(h)
        return x


class GPT2Model(nn.Module):
    cfg: GPT2Config

    @nn.compact
    def __call__(self, inputs_embeds, attention_mask: Optional[jax.Array] = None):
        """(B, T, n_embd) input embeddings -> (B, T, n_embd) hidden states."""
        cfg = self.cfg
        b, t = inputs_embeds.shape[:2]
        wpe = nn.Embed(cfg.n_positions, cfg.n_embd, name="wpe")
        if attention_mask is None:
            attention_mask = jnp.ones((b, t), jnp.int32)
        # positions count only attended tokens (matters for left-padded CFG rows)
        positions = jnp.clip(jnp.cumsum(attention_mask, axis=1) - 1, 0, None)
        x = inputs_embeds + wpe(positions)

        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        keymask = attention_mask.astype(bool)[:, None, None, :]
        bias = jnp.where(causal & keymask, 0.0, -1e9).astype(x.dtype)

        for i in range(cfg.n_layer):
            x = GPT2Block(cfg, name=f"h_{i}")(x, bias)
        return nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_f")(x)


def generate_hidden_states(model: GPT2Model, params, inputs_embeds,
                           attention_mask=None, max_new_tokens: int = 8):
    """Embedding-space autoregression at static shape (L0 + max_new_tokens).

    Equivalent to the reference's generate_language_model loop
    (plpeline_audioldm2.py:284-320): each step runs the transformer over the
    current sequence and appends the final hidden state.
    """
    b, l0, d = inputs_embeds.shape
    total = l0 + max_new_tokens
    if attention_mask is None:
        attention_mask = jnp.ones((b, l0), jnp.int32)

    seq = jnp.concatenate(
        [inputs_embeds, jnp.zeros((b, max_new_tokens, d), inputs_embeds.dtype)],
        axis=1)
    mask = jnp.concatenate(
        [attention_mask, jnp.zeros((b, max_new_tokens), attention_mask.dtype)],
        axis=1)

    for i in range(max_new_tokens):
        hidden = model.apply(params, seq, mask)
        # hidden state at the last *attended* position
        last_idx = jnp.sum(mask, axis=1) - 1  # (B,)
        nxt = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)
        seq = jax.lax.dynamic_update_slice_in_dim(seq, nxt, l0 + i, axis=1)
        mask = mask.at[:, l0 + i].set(1)

    return seq[:, -max_new_tokens:, :]
