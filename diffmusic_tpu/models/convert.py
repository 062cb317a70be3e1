"""torch/HF state-dict -> flax params conversion.

The reference pulls all weights from the HF hub at runtime (run.py:218); here the
equivalent is a one-time conversion of local torch checkpoints into flax pytrees.
Layout rules:
  Conv1d  (O, I, K)    -> (K, I, O)
  Conv2d  (O, I, kh, kw) -> (kh, kw, I, O)
  ConvT1d (I, O, K)    -> (K, I, O)   (flax transpose_kernel=True keeps IO order)
  Linear  (O, I)       -> (I, O)
"""

from typing import Dict

import numpy as np


def conv1d(w):   # torch (O, I, K) -> flax (K, I, O)
    return np.transpose(np.asarray(w), (2, 1, 0))


def conv2d(w):   # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convtranspose1d(w):  # torch (I, O, K) -> flax transpose_kernel (K, O, I)
    return np.transpose(np.asarray(w), (2, 1, 0))


def linear(w):   # torch (O, I) -> flax (I, O)
    return np.transpose(np.asarray(w), (1, 0))


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_hifigan(state_dict: Dict, cfg) -> Dict:
    """transformers SpeechT5HifiGan state dict -> flax params for
    diffmusic_tpu.models.hifigan.SpeechT5HifiGan."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    p: Dict = {}
    p["conv_pre"] = {"kernel": conv1d(sd["conv_pre.weight"]),
                     "bias": sd["conv_pre.bias"]}
    for i in range(len(cfg.upsample_rates)):
        p[f"upsampler_{i}"] = {
            "kernel": convtranspose1d(sd[f"upsampler.{i}.weight"]),
            "bias": sd[f"upsampler.{i}.bias"],
        }
    n_res = len(cfg.upsample_rates) * len(cfg.resblock_kernel_sizes)
    for r in range(n_res):
        blk: Dict = {}
        dil = cfg.resblock_dilation_sizes[r % len(cfg.resblock_kernel_sizes)]
        for j in range(len(dil)):
            blk[f"convs1_{j}"] = {
                "kernel": conv1d(sd[f"resblocks.{r}.convs1.{j}.weight"]),
                "bias": sd[f"resblocks.{r}.convs1.{j}.bias"]}
            blk[f"convs2_{j}"] = {
                "kernel": conv1d(sd[f"resblocks.{r}.convs2.{j}.weight"]),
                "bias": sd[f"resblocks.{r}.convs2.{j}.bias"]}
        p[f"resblocks_{r}"] = blk
    p["conv_post"] = {"kernel": conv1d(sd["conv_post.weight"]),
                      "bias": sd["conv_post.bias"]}
    if cfg.normalize_before:
        p["mean"] = sd["mean"]
        p["scale"] = sd["scale"]
    return {"params": p}


def convert_clap_text(state_dict: Dict, cfg) -> Dict:
    """transformers ClapTextModelWithProjection (or the text_model/text_projection
    sub-tree of ClapModel) -> flax params for models.clap.ClapTextModelWithProjection."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    def pick(*names):
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(names[0])

    p: Dict = {
        "embeddings": {
            "word_embeddings": {"embedding": pick(
                "text_model.embeddings.word_embeddings.weight")},
            "position_embeddings": {"embedding": pick(
                "text_model.embeddings.position_embeddings.weight")},
            "token_type_embeddings": {"embedding": pick(
                "text_model.embeddings.token_type_embeddings.weight")},
            "LayerNorm": {"scale": pick("text_model.embeddings.LayerNorm.weight"),
                          "bias": pick("text_model.embeddings.LayerNorm.bias")},
        },
        "pooler": {"kernel": linear(pick("text_model.pooler.dense.weight")),
                   "bias": pick("text_model.pooler.dense.bias")},
        "projection_linear1": {"kernel": linear(pick("text_projection.linear1.weight")),
                               "bias": pick("text_projection.linear1.bias")},
        "projection_linear2": {"kernel": linear(pick("text_projection.linear2.weight")),
                               "bias": pick("text_projection.linear2.bias")},
    }
    for i in range(cfg.num_hidden_layers):
        b = f"text_model.encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "q": {"kernel": linear(sd[f"{b}.attention.self.query.weight"]),
                  "bias": sd[f"{b}.attention.self.query.bias"]},
            "k": {"kernel": linear(sd[f"{b}.attention.self.key.weight"]),
                  "bias": sd[f"{b}.attention.self.key.bias"]},
            "v": {"kernel": linear(sd[f"{b}.attention.self.value.weight"]),
                  "bias": sd[f"{b}.attention.self.value.bias"]},
            "attn_out": {"kernel": linear(sd[f"{b}.attention.output.dense.weight"]),
                         "bias": sd[f"{b}.attention.output.dense.bias"]},
            "attn_ln": {"scale": sd[f"{b}.attention.output.LayerNorm.weight"],
                        "bias": sd[f"{b}.attention.output.LayerNorm.bias"]},
            "ff_in": {"kernel": linear(sd[f"{b}.intermediate.dense.weight"]),
                      "bias": sd[f"{b}.intermediate.dense.bias"]},
            "ff_out": {"kernel": linear(sd[f"{b}.output.dense.weight"]),
                       "bias": sd[f"{b}.output.dense.bias"]},
            "ff_ln": {"scale": sd[f"{b}.output.LayerNorm.weight"],
                      "bias": sd[f"{b}.output.LayerNorm.bias"]},
        }
    return {"params": p}


def convert_t5_encoder(state_dict: Dict, cfg) -> Dict:
    """transformers T5EncoderModel state dict -> flax params for models.t5."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    p: Dict = {"shared": {"embedding": sd["shared.weight"]},
               "final_layer_norm": {"weight": sd["encoder.final_layer_norm.weight"]}}
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}"
        attn = {
            "q": {"kernel": linear(sd[f"{b}.layer.0.SelfAttention.q.weight"])},
            "k": {"kernel": linear(sd[f"{b}.layer.0.SelfAttention.k.weight"])},
            "v": {"kernel": linear(sd[f"{b}.layer.0.SelfAttention.v.weight"])},
            "o": {"kernel": linear(sd[f"{b}.layer.0.SelfAttention.o.weight"])},
        }
        if i == 0:
            attn["relative_attention_bias"] = {"embedding": sd[
                f"{b}.layer.0.SelfAttention.relative_attention_bias.weight"]}
        blk: Dict = {
            "attn": attn,
            "ln_attn": {"weight": sd[f"{b}.layer.0.layer_norm.weight"]},
            "ln_ff": {"weight": sd[f"{b}.layer.1.layer_norm.weight"]},
        }
        if cfg.is_gated_act:
            blk["wi_0"] = {"kernel": linear(sd[f"{b}.layer.1.DenseReluDense.wi_0.weight"])}
            blk["wi_1"] = {"kernel": linear(sd[f"{b}.layer.1.DenseReluDense.wi_1.weight"])}
        else:
            blk["wi"] = {"kernel": linear(sd[f"{b}.layer.1.DenseReluDense.wi.weight"])}
        blk["wo"] = {"kernel": linear(sd[f"{b}.layer.1.DenseReluDense.wo.weight"])}
        p[f"block_{i}"] = blk
    return {"params": p}


def convert_gpt2(state_dict: Dict, cfg) -> Dict:
    """transformers GPT2Model state dict -> flax params for models.gpt2.

    HF GPT2 uses Conv1D with weight shape (in, out) — already flax layout, no
    transpose needed.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    p: Dict = {
        "wpe": {"embedding": sd["wpe.weight"]},
        "ln_f": {"scale": sd["ln_f.weight"], "bias": sd["ln_f.bias"]},
    }
    for i in range(cfg.n_layer):
        b = f"h.{i}"
        p[f"h_{i}"] = {
            "ln_1": {"scale": sd[f"{b}.ln_1.weight"], "bias": sd[f"{b}.ln_1.bias"]},
            "c_attn": {"kernel": sd[f"{b}.attn.c_attn.weight"],
                       "bias": sd[f"{b}.attn.c_attn.bias"]},
            "attn_c_proj": {"kernel": sd[f"{b}.attn.c_proj.weight"],
                            "bias": sd[f"{b}.attn.c_proj.bias"]},
            "ln_2": {"scale": sd[f"{b}.ln_2.weight"], "bias": sd[f"{b}.ln_2.bias"]},
            "c_fc": {"kernel": sd[f"{b}.mlp.c_fc.weight"],
                     "bias": sd[f"{b}.mlp.c_fc.bias"]},
            "mlp_c_proj": {"kernel": sd[f"{b}.mlp.c_proj.weight"],
                           "bias": sd[f"{b}.mlp.c_proj.bias"]},
        }
    return {"params": p}


def convert_clap_audio(state_dict: Dict, cfg) -> Dict:
    """transformers ClapAudioModelWithProjection -> flax params for models.htsat.

    Accepts keys with or without the 'audio_model.' prefix.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    sd = {k[len("audio_model."):] if k.startswith("audio_model.") else k: v
          for k, v in sd.items()}
    enc = "audio_encoder"

    def ln(name):
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}

    p: Dict = {
        "patch_embed_proj": {"kernel": conv2d(sd[f"{enc}.patch_embed.proj.weight"]),
                             "bias": sd[f"{enc}.patch_embed.proj.bias"]},
        "patch_embed_norm": ln(f"{enc}.patch_embed.norm"),
        "norm": ln(f"{enc}.norm"),
        "bn_scale": sd[f"{enc}.batch_norm.weight"],
        "bn_bias": sd[f"{enc}.batch_norm.bias"],
        "projection_linear1": {"kernel": linear(sd["audio_projection.linear1.weight"]),
                               "bias": sd["audio_projection.linear1.bias"]},
        "projection_linear2": {"kernel": linear(sd["audio_projection.linear2.weight"]),
                               "bias": sd["audio_projection.linear2.bias"]},
    }
    for i, depth in enumerate(cfg.depths):
        for d in range(depth):
            b = f"{enc}.layers.{i}.blocks.{d}"
            p[f"stage_{i}_block_{d}"] = {
                "layernorm_before": ln(f"{b}.layernorm_before"),
                "layernorm_after": ln(f"{b}.layernorm_after"),
                "attention": {
                    "query": {"kernel": linear(sd[f"{b}.attention.self.query.weight"]),
                              "bias": sd[f"{b}.attention.self.query.bias"]},
                    "key": {"kernel": linear(sd[f"{b}.attention.self.key.weight"]),
                            "bias": sd[f"{b}.attention.self.key.bias"]},
                    "value": {"kernel": linear(sd[f"{b}.attention.self.value.weight"]),
                              "bias": sd[f"{b}.attention.self.value.bias"]},
                    "output_dense": {
                        "kernel": linear(sd[f"{b}.attention.output.dense.weight"]),
                        "bias": sd[f"{b}.attention.output.dense.bias"]},
                    "relative_position_bias_table": sd[
                        f"{b}.attention.self.relative_position_bias_table"],
                },
                "intermediate_dense": {
                    "kernel": linear(sd[f"{b}.intermediate.dense.weight"]),
                    "bias": sd[f"{b}.intermediate.dense.bias"]},
                "output_dense": {"kernel": linear(sd[f"{b}.output.dense.weight"]),
                                 "bias": sd[f"{b}.output.dense.bias"]},
            }
        if i < len(cfg.depths) - 1:
            p[f"stage_{i}_downsample"] = {
                "norm": ln(f"{enc}.layers.{i}.downsample.norm"),
                "reduction": {"kernel": linear(
                    sd[f"{enc}.layers.{i}.downsample.reduction.weight"])},
            }
    batch_stats = {
        "bn_mean": sd.get(f"{enc}.batch_norm.running_mean",
                          np.zeros(cfg.num_mel_bins, np.float32)),
        "bn_var": sd.get(f"{enc}.batch_norm.running_var",
                         np.ones(cfg.num_mel_bins, np.float32)),
    }
    return {"params": p, "batch_stats": batch_stats}


def convert_projection(state_dict: Dict) -> Dict:
    """diffusers AudioLDM2ProjectionModel state dict -> flax params."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    return {"params": {
        "projection": {"kernel": linear(sd["projection.weight"]),
                       "bias": sd["projection.bias"]},
        "projection_1": {"kernel": linear(sd["projection_1.weight"]),
                         "bias": sd["projection_1.bias"]},
        "sos_embed": sd["sos_embed"],
        "eos_embed": sd["eos_embed"],
        "sos_embed_1": sd["sos_embed_1"],
        "eos_embed_1": sd["eos_embed_1"],
    }}
