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


# ------------------------------------------------------------- StableAudio zoo

def _wn_weight(sd: Dict, prefix: str):
    """Resolve a (possibly weight-normed) conv weight: fused `weight`, legacy
    `weight_g`/`weight_v`, or torch>=2.1 `parametrizations.weight.original{0,1}`."""
    if f"{prefix}.weight" in sd:
        return _np(sd[f"{prefix}.weight"])
    if f"{prefix}.weight_g" in sd:
        g, v = _np(sd[f"{prefix}.weight_g"]), _np(sd[f"{prefix}.weight_v"])
    else:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _snake(sd: Dict, prefix: str) -> Dict:
    """diffusers Snake1d params (1, C, 1) -> flax (1, 1, C)."""
    return {"alpha": np.transpose(_np(sd[f"{prefix}.alpha"]), (0, 2, 1)),
            "beta": np.transpose(_np(sd[f"{prefix}.beta"]), (0, 2, 1))}


def _oobleck_res_unit(sd: Dict, p: str) -> Dict:
    return {
        "snake1": _snake(sd, f"{p}.snake1"),
        "conv1": {"kernel": conv1d(_wn_weight(sd, f"{p}.conv1")),
                  "bias": _np(sd[f"{p}.conv1.bias"])},
        "snake2": _snake(sd, f"{p}.snake2"),
        "conv2": {"kernel": conv1d(_wn_weight(sd, f"{p}.conv2")),
                  "bias": _np(sd[f"{p}.conv2.bias"])},
    }


def convert_oobleck(state_dict: Dict, cfg) -> Dict:
    """diffusers AutoencoderOobleck state dict -> flax params for
    diffmusic_tpu.models.oobleck.AutoencoderOobleck."""
    sd = state_dict
    enc: Dict = {
        "conv1": {"kernel": conv1d(_wn_weight(sd, "encoder.conv1")),
                  "bias": _np(sd["encoder.conv1.bias"])},
        "snake1": _snake(sd, "encoder.snake1"),
        "conv2": {"kernel": conv1d(_wn_weight(sd, "encoder.conv2")),
                  "bias": _np(sd["encoder.conv2.bias"])},
    }
    for i in range(len(cfg.downsampling_ratios)):
        b = f"encoder.block.{i}"
        enc[f"block_{i}"] = {
            "res_unit1": _oobleck_res_unit(sd, f"{b}.res_unit1"),
            "res_unit2": _oobleck_res_unit(sd, f"{b}.res_unit2"),
            "res_unit3": _oobleck_res_unit(sd, f"{b}.res_unit3"),
            "snake1": _snake(sd, f"{b}.snake1"),
            "conv1": {"kernel": conv1d(_wn_weight(sd, f"{b}.conv1")),
                      "bias": _np(sd[f"{b}.conv1.bias"])},
        }
    dec: Dict = {
        "conv1": {"kernel": conv1d(_wn_weight(sd, "decoder.conv1")),
                  "bias": _np(sd["decoder.conv1.bias"])},
        "snake1": _snake(sd, "decoder.snake1"),
        "conv2": {"kernel": conv1d(_wn_weight(sd, "decoder.conv2"))},
    }
    for i in range(len(cfg.downsampling_ratios)):
        b = f"decoder.block.{i}"
        dec[f"block_{i}"] = {
            "snake1": _snake(sd, f"{b}.snake1"),
            "conv_t1": {"kernel": convtranspose1d(_wn_weight(sd, f"{b}.conv_t1")),
                        "bias": _np(sd[f"{b}.conv_t1.bias"])},
            "res_unit1": _oobleck_res_unit(sd, f"{b}.res_unit1"),
            "res_unit2": _oobleck_res_unit(sd, f"{b}.res_unit2"),
            "res_unit3": _oobleck_res_unit(sd, f"{b}.res_unit3"),
        }
    return {"params": {"encoder": enc, "decoder": dec}}


def convert_stable_audio_dit(state_dict: Dict, cfg) -> Dict:
    """diffusers StableAudioDiTModel state dict -> flax params for
    diffmusic_tpu.models.stable_audio_dit.StableAudioDiTModel."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    def dense(key, bias=True):
        out = {"kernel": linear(sd[f"{key}.weight"])}
        if bias and f"{key}.bias" in sd:
            out["bias"] = sd[f"{key}.bias"]
        return out

    def conv1x1(key):  # Conv1d(k=1) used as a token-wise Dense
        w = sd[f"{key}.weight"]
        return {"kernel": linear(w[:, :, 0])}

    p: Dict = {
        "time_proj": {"weight": sd["time_proj.weight"]},
        "timestep_proj_1": dense("timestep_proj.0"),
        "timestep_proj_2": dense("timestep_proj.2"),
        "global_proj_1": dense("global_proj.0", bias=False),
        "global_proj_2": dense("global_proj.2", bias=False),
        "cross_attention_proj_1": dense("cross_attention_proj.0", bias=False),
        "cross_attention_proj_2": dense("cross_attention_proj.2", bias=False),
        "preprocess_conv": conv1x1("preprocess_conv"),
        "proj_in": dense("proj_in", bias=False),
        "proj_out": dense("proj_out", bias=False),
        "postprocess_conv": conv1x1("postprocess_conv"),
    }
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"

        def attn(name):
            return {
                "to_q": dense(f"{b}.{name}.to_q", bias=False),
                "to_k": dense(f"{b}.{name}.to_k", bias=False),
                "to_v": dense(f"{b}.{name}.to_v", bias=False),
                "to_out": dense(f"{b}.{name}.to_out.0", bias=False),
            }

        p[f"block_{i}"] = {
            "norm1": {"scale": sd[f"{b}.norm1.weight"],
                      "bias": sd[f"{b}.norm1.bias"]},
            "attn1": attn("attn1"),
            "norm2": {"scale": sd[f"{b}.norm2.weight"],
                      "bias": sd[f"{b}.norm2.bias"]},
            "attn2": attn("attn2"),
            "norm3": {"scale": sd[f"{b}.norm3.weight"],
                      "bias": sd[f"{b}.norm3.bias"]},
            "ff": {"proj_in": dense(f"{b}.ff.net.0.proj"),
                   "proj_out": dense(f"{b}.ff.net.2")},
        }
    return {"params": p}


def convert_stable_audio_projection(state_dict: Dict) -> Dict:
    """diffusers StableAudioProjectionModel state dict -> flax params."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    def number_conditioner(p):
        return {
            "weight": sd[f"{p}.time_positional_embedding.0.weights"],
            "proj": {"kernel": linear(sd[f"{p}.time_positional_embedding.1.weight"]),
                     "bias": sd[f"{p}.time_positional_embedding.1.bias"]},
        }

    return {"params": {
        "text_projection": {"kernel": linear(sd["text_projection.weight"]),
                            "bias": sd["text_projection.bias"]},
        "start_number_conditioner": number_conditioner("start_number_conditioner"),
        "end_number_conditioner": number_conditioner("end_number_conditioner"),
    }}


def convert_vits_text_encoder(state_dict: Dict, cfg) -> Dict:
    """transformers VitsModel text_encoder state dict -> flax params for
    diffmusic_tpu.models.vits.VitsTextEncoder. Accepts keys with or without the
    'text_encoder.' prefix."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    if any(k.startswith("text_encoder.") for k in sd):
        sd = {k[len("text_encoder."):]: v for k, v in sd.items()
              if k.startswith("text_encoder.")}
    p: Dict = {"embed_tokens": {"embedding": sd["embed_tokens.weight"]}}
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layers.{i}"
        p[f"layers_{i}_attention"] = {
            "q_proj": {"kernel": linear(sd[f"{b}.attention.q_proj.weight"]),
                       "bias": sd[f"{b}.attention.q_proj.bias"]},
            "k_proj": {"kernel": linear(sd[f"{b}.attention.k_proj.weight"]),
                       "bias": sd[f"{b}.attention.k_proj.bias"]},
            "v_proj": {"kernel": linear(sd[f"{b}.attention.v_proj.weight"]),
                       "bias": sd[f"{b}.attention.v_proj.bias"]},
            "out_proj": {"kernel": linear(sd[f"{b}.attention.out_proj.weight"]),
                         "bias": sd[f"{b}.attention.out_proj.bias"]},
            "emb_rel_k": sd[f"{b}.attention.emb_rel_k"],
            "emb_rel_v": sd[f"{b}.attention.emb_rel_v"],
        }
        p[f"layers_{i}_layer_norm"] = {
            "scale": sd[f"{b}.layer_norm.weight"],
            "bias": sd[f"{b}.layer_norm.bias"]}
        p[f"layers_{i}_feed_forward"] = {
            "conv_1": {"kernel": conv1d(sd[f"{b}.feed_forward.conv_1.weight"]),
                       "bias": sd[f"{b}.feed_forward.conv_1.bias"]},
            "conv_2": {"kernel": conv1d(sd[f"{b}.feed_forward.conv_2.weight"]),
                       "bias": sd[f"{b}.feed_forward.conv_2.bias"]},
        }
        p[f"layers_{i}_final_layer_norm"] = {
            "scale": sd[f"{b}.final_layer_norm.weight"],
            "bias": sd[f"{b}.final_layer_norm.bias"]}
    return {"params": p}
