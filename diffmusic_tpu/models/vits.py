"""VITS text encoder (flax) — the TTS conditioning branch of AudioLDM2.

The reference's AudioLDM2 pipeline swaps its second text encoder for a VITS
text encoder when driving the TTS checkpoint (reference
plpeline_audioldm2.py:428-501, selected by the `--transcription` CLI flag,
run.py:99-101). This is the transformers `VitsModel.text_encoder` architecture:
token embeddings scaled by sqrt(hidden), windowed-relative-position
self-attention, and conv1d(k=3) feed-forwards. Only the encoder hidden states
are needed for conditioning (the flow/duration heads of full VITS are not part
of the AudioLDM2 path).
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VitsConfig:
    vocab_size: int = 38
    hidden_size: int = 192
    num_hidden_layers: int = 6
    num_attention_heads: int = 2
    ffn_dim: int = 768
    ffn_kernel_size: int = 3
    window_size: int = 4
    layer_norm_eps: float = 1e-5


def tiny_vits_config() -> VitsConfig:
    return VitsConfig(vocab_size=64, hidden_size=16, num_hidden_layers=2,
                      num_attention_heads=2, ffn_dim=32)


def _relative_to_absolute(x):
    """(B, H, T, 2T-1) relative logits -> (B, H, T, T) absolute (VITS trick)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, t * 2 * t)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t + 1, 2 * t - 1)
    return x[:, :, :t, t - 1:]


def _absolute_to_relative(x):
    """(B, H, T, T) attention -> (B, H, T, 2T-1) relative (VITS inverse trick)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t * (2 * t - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (t, 0)))
    return x.reshape(b, h, t, 2 * t)[:, :, :, 1:]


class VitsAttention(nn.Module):
    cfg: VitsConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        h, hd = cfg.num_attention_heads, cfg.hidden_size // cfg.num_attention_heads
        b, t, _ = x.shape
        q = nn.Dense(cfg.hidden_size, name="q_proj")(x)
        k = nn.Dense(cfg.hidden_size, name="k_proj")(x)
        v = nn.Dense(cfg.hidden_size, name="v_proj")(x)
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3) / jnp.sqrt(hd)
        k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)

        # windowed relative-position bias (transformers VitsAttention:
        # emb_rel_k (1, 2*window+1, head_dim), clipped relative distances)
        w = cfg.window_size
        rel_k = self.param("emb_rel_k", nn.initializers.normal(hd ** -0.5),
                           (1, 2 * w + 1, hd))
        # (2T-1, hd) table: zero outside the window (HF _get_relative_embeddings
        # zero-pads; clamping would wrongly reuse the edge embedding)
        pos = jnp.arange(2 * t - 1) - (t - 1)
        valid = ((pos >= -w) & (pos <= w))[:, None]
        idx = jnp.clip(pos, -w, w) + w
        rel = rel_k[0, idx] * valid  # (2T-1, hd)
        rel_logits = jnp.einsum("bhqd,rd->bhqr", q, rel)
        scores = scores + _relative_to_absolute(rel_logits)

        scores = scores + jnp.where(mask[:, None, None, :], 0.0, -1e9)
        attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)

        # relative-position values (transformers VitsAttention emb_rel_v)
        rel_v = self.param("emb_rel_v", nn.initializers.normal(hd ** -0.5),
                           (1, 2 * w + 1, hd))
        rel_vt = rel_v[0, idx] * valid  # (2T-1, hd)
        out = out + jnp.einsum("bhqr,rd->bhqd", _absolute_to_relative(attn),
                               rel_vt)

        out = out.transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, name="out_proj")(out)


class VitsFeedForward(nn.Module):
    cfg: VitsConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        m = mask[..., None].astype(x.dtype)
        pad = (cfg.ffn_kernel_size - 1) // 2
        h = nn.Conv(cfg.ffn_dim, (cfg.ffn_kernel_size,), padding=pad,
                    name="conv_1")(x * m)
        h = nn.relu(h)
        h = nn.Conv(cfg.hidden_size, (cfg.ffn_kernel_size,), padding=pad,
                    name="conv_2")(h * m)
        return h * m


class VitsTextEncoder(nn.Module):
    """(input_ids, attention_mask) -> (B, L, hidden) conditioning states."""

    cfg: VitsConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        mask = attention_mask.astype(bool)
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="embed_tokens")(
            input_ids) * jnp.sqrt(cfg.hidden_size).astype(jnp.float32)
        x = x * mask[..., None]
        for i in range(cfg.num_hidden_layers):
            h = VitsAttention(cfg, name=f"layers_{i}_attention")(x, mask)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name=f"layers_{i}_layer_norm")(x + h)
            h = VitsFeedForward(cfg, name=f"layers_{i}_feed_forward")(x, mask)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name=f"layers_{i}_final_layer_norm")(x + h)
        return x * mask[..., None]
