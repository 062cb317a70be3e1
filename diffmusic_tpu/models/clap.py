"""CLAP text tower (RoBERTa encoder + MLP projection) in flax.

The reference uses transformers ClapModel.get_text_features to produce the pooled
512-d embedding that conditions MusicLDM as class_labels
(pipeline_musicldm.py:119-250, 696-703). This is that path: RoBERTa-style encoder
-> pooler (tanh over CLS) -> 2-layer projection.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import ClapTextConfig


class TextEmbeddings(nn.Module):
    cfg: ClapTextConfig

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.cfg
        # RoBERTa position ids: pad_token_id + 1 + cumulative position of
        # non-pad tokens; for the dense prompts used here a simple offset works
        mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        position_ids = jnp.cumsum(mask, axis=-1) * mask + cfg.pad_token_id

        we = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings")
        pe = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                      name="position_embeddings")
        te = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                      name="token_type_embeddings")
        x = we(input_ids) + pe(position_ids) + te(jnp.zeros_like(input_ids))
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="LayerNorm")(x)


class EncoderLayer(nn.Module):
    cfg: ClapTextConfig

    @nn.compact
    def __call__(self, x, attention_mask):
        cfg = self.cfg
        h = cfg.hidden_size
        head_dim = h // cfg.num_attention_heads

        q = nn.Dense(h, name="q")(x)
        k = nn.Dense(h, name="k")(x)
        v = nn.Dense(h, name="v")(x)
        b, t = x.shape[:2]
        q = q.reshape(b, t, cfg.num_attention_heads, head_dim)
        k = k.reshape(b, t, cfg.num_attention_heads, head_dim)
        v = v.reshape(b, t, cfg.num_attention_heads, head_dim)
        bias = jnp.where(attention_mask[:, None, None, :], 0.0, -1e9).astype(x.dtype)
        attn = jax.nn.dot_product_attention(q, k, v, bias=bias)
        attn = attn.reshape(b, t, h)
        attn = nn.Dense(h, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_ln")(x + attn)

        ff = nn.Dense(cfg.intermediate_size, name="ff_in")(x)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(h, name="ff_out")(ff)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ff_ln")(x + ff)


class ClapTextModelWithProjection(nn.Module):
    cfg: ClapTextConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask: Optional[jax.Array] = None):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids, dtype=bool)
        else:
            attention_mask = attention_mask.astype(bool)

        x = TextEmbeddings(cfg, name="embeddings")(input_ids)
        for i in range(cfg.num_hidden_layers):
            x = EncoderLayer(cfg, name=f"layer_{i}")(x, attention_mask)

        # RoBERTa pooler: dense + tanh over the first token
        pooled = nn.Dense(cfg.hidden_size, name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)

        # ClapProjectionLayer: linear -> relu -> linear
        p = nn.Dense(cfg.projection_dim, name="projection_linear1")(pooled)
        p = nn.relu(p)
        p = nn.Dense(cfg.projection_dim, name="projection_linear2")(p)
        return p  # (B, projection_dim) text embeds


def get_text_features(model, params, input_ids, attention_mask=None):
    """F.normalize-d text features as ClapModel.get_text_features returns them."""
    emb = model.apply(params, input_ids, attention_mask)
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
