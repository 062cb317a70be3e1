"""AudioLDM2ProjectionModel: project CLAP + T5 streams into GPT-2 space and wrap
each with learned SOS/EOS embeddings (diffusers AudioLDM2ProjectionModel semantics;
used at reference plpeline_audioldm2.py:513-518)."""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import ProjectionConfig


def _add_special_tokens(hidden, mask, sos, eos):
    b = hidden.shape[0]
    sos = jnp.broadcast_to(sos[None, None, :], (b, 1, sos.shape[-1]))
    eos = jnp.broadcast_to(eos[None, None, :], (b, 1, eos.shape[-1]))
    hidden = jnp.concatenate([sos, hidden, eos], axis=1)
    if mask is not None:
        ones = jnp.ones((b, 1), mask.dtype)
        mask = jnp.concatenate([ones, mask, ones], axis=-1)
    return hidden, mask


class AudioLDM2ProjectionModel(nn.Module):
    cfg: ProjectionConfig

    @nn.compact
    def __call__(self, hidden_states, hidden_states_1,
                 attention_mask: Optional[jax.Array] = None,
                 attention_mask_1: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, Optional[jax.Array]]:
        cfg = self.cfg
        d = cfg.langauge_model_dim
        h0 = nn.Dense(d, name="projection")(hidden_states)
        sos = self.param("sos_embed", nn.initializers.normal(0.02), (d,))
        eos = self.param("eos_embed", nn.initializers.normal(0.02), (d,))
        h0, m0 = _add_special_tokens(h0, attention_mask, sos, eos)

        h1 = nn.Dense(d, name="projection_1")(hidden_states_1)
        sos1 = self.param("sos_embed_1", nn.initializers.normal(0.02), (d,))
        eos1 = self.param("eos_embed_1", nn.initializers.normal(0.02), (d,))
        h1, m1 = _add_special_tokens(h1, attention_mask_1, sos1, eos1)

        hidden = jnp.concatenate([h0, h1], axis=1)
        mask = None
        if m0 is not None and m1 is not None:
            mask = jnp.concatenate([m0, m1], axis=-1)
        return hidden, mask
