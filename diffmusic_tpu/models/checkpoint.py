"""Local-checkpoint loading: diffusers/transformers-layout dirs -> flax pipelines.

The reference calls `from_pretrained(repo_id)` against the HF hub (run.py:218);
this environment has no egress, so the equivalent is a local directory in the HF
snapshot layout:

  <dir>/model_index.json
  <dir>/unet/{config.json, diffusion_pytorch_model.safetensors}
  <dir>/vae/{config.json, diffusion_pytorch_model.safetensors}
  <dir>/vocoder/{config.json, model.safetensors}
  <dir>/text_encoder/{config.json, model.safetensors}
  ... (+ text_encoder_2 / language_model / projection_model for AudioLDM2)

Weights convert by pure layout transposition (convert.py rules) with
diffusers->flax name mapping below.
"""

import json
from pathlib import Path
from typing import Dict

import numpy as np

from . import convert
from .configs import (ClapTextConfig, GPT2Config, HiFiGANConfig, ProjectionConfig,
                      T5Config, UNetConfig, VAEConfig)


def _load_safetensors(path: Path) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    return load_file(str(path))


def _load_module_sd(module_dir: Path) -> Dict[str, np.ndarray]:
    for name in ("diffusion_pytorch_model.safetensors", "model.safetensors",
                 "pytorch_model.safetensors"):
        p = module_dir / name
        if p.exists():
            return _load_safetensors(p)
    bins = sorted(module_dir.glob("*.safetensors"))
    if bins:
        merged: Dict[str, np.ndarray] = {}
        for b in bins:
            merged.update(_load_safetensors(b))
        return merged
    raise FileNotFoundError(f"no safetensors found under {module_dir}")


def _cfg(module_dir: Path) -> Dict:
    with open(module_dir / "config.json") as f:
        return json.load(f)


class TrackingStateDict(dict):
    """State dict that records which keys a converter consumed — first contact
    with a real checkpoint must FAIL LOUDLY if any weight goes unmapped
    (silently dropped weights are the classic from_pretrained footgun;
    reference equivalent: diffusers' own missing/unexpected-keys report)."""

    def __init__(self, sd):
        super().__init__(sd)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)

    # torch artifacts that carry no convertible weight
    IGNORE_SUBSTRINGS = ("num_batches_tracked", "position_ids",
                         "rotary_emb.inv_freq", "attn.masked_bias",
                         "attn.bias", "logit_scale")

    def assert_all_consumed(self, what: str, extra_ignore=()):
        ignore = self.IGNORE_SUBSTRINGS + tuple(extra_ignore)
        leftover = sorted(
            k for k in self if k not in self.consumed
            and not any(s in k for s in ignore))
        if leftover:
            raise ValueError(
                f"{what}: {len(leftover)} checkpoint keys were NOT consumed "
                f"by the converter (weights would be silently dropped): "
                f"{leftover[:12]}{' ...' if len(leftover) > 12 else ''}")


# --------------------------------------------------------------------- configs

def unet_config_from_json(c: Dict) -> UNetConfig:
    cad = c.get("cross_attention_dim")
    if cad is None:
        cross_dims = ()
    elif isinstance(cad, (list, tuple)):
        cross_dims = tuple(d for d in cad if d is not None)
    else:
        cross_dims = (cad,)
    blocks = tuple(c["block_out_channels"])
    down_types = c.get("down_block_types",
                       ["CrossAttnDownBlock2D"] * (len(blocks) - 1) + ["DownBlock2D"])
    has_attention = tuple("CrossAttn" in t or "Attn" in t for t in down_types)
    ahd = c.get("attention_head_dim", 8)
    if isinstance(ahd, (list, tuple)):
        ahd = ahd[0]
    return UNetConfig(
        sample_size=c.get("sample_size", 128),
        in_channels=c.get("in_channels", 8),
        out_channels=c.get("out_channels", 8),
        block_out_channels=blocks,
        layers_per_block=c.get("layers_per_block", 2),
        attention_head_dim=ahd,
        norm_num_groups=c.get("norm_num_groups", 32),
        cross_attention_dims=cross_dims,
        class_embed_type=c.get("class_embed_type"),
        projection_class_embeddings_input_dim=c.get(
            "projection_class_embeddings_input_dim"),
        class_embeddings_concat=c.get("class_embeddings_concat", False),
        has_attention=has_attention,
    )


def vae_config_from_json(c: Dict) -> VAEConfig:
    return VAEConfig(
        in_channels=c.get("in_channels", 1),
        out_channels=c.get("out_channels", 1),
        latent_channels=c.get("latent_channels", 8),
        block_out_channels=tuple(c["block_out_channels"]),
        layers_per_block=c.get("layers_per_block", 2),
        norm_num_groups=c.get("norm_num_groups", 32),
        scaling_factor=c.get("scaling_factor", 0.18215),
    )


def hifigan_config_from_json(c: Dict) -> HiFiGANConfig:
    return HiFiGANConfig(
        model_in_dim=c.get("model_in_dim", 64),
        sampling_rate=c.get("sampling_rate", 16000),
        upsample_initial_channel=c.get("upsample_initial_channel", 1024),
        upsample_rates=tuple(c.get("upsample_rates", (5, 4, 2, 2, 2))),
        upsample_kernel_sizes=tuple(c.get("upsample_kernel_sizes",
                                          (16, 16, 8, 4, 4))),
        resblock_kernel_sizes=tuple(c.get("resblock_kernel_sizes", (3, 7, 11))),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in c.get("resblock_dilation_sizes",
                                    ((1, 3, 5),) * 3)),
        leaky_relu_slope=c.get("leaky_relu_slope", 0.1),
        normalize_before=c.get("normalize_before", False),
    )


# ------------------------------------------------------------- UNet state dict

def _resnet(sd, p):
    out = {
        "norm1": {"scale": sd[f"{p}.norm1.weight"], "bias": sd[f"{p}.norm1.bias"]},
        "conv1": {"kernel": convert.conv2d(sd[f"{p}.conv1.weight"]),
                  "bias": sd[f"{p}.conv1.bias"]},
        "norm2": {"scale": sd[f"{p}.norm2.weight"], "bias": sd[f"{p}.norm2.bias"]},
        "conv2": {"kernel": convert.conv2d(sd[f"{p}.conv2.weight"]),
                  "bias": sd[f"{p}.conv2.bias"]},
    }
    if f"{p}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = {
            "kernel": convert.linear(sd[f"{p}.time_emb_proj.weight"]),
            "bias": sd[f"{p}.time_emb_proj.bias"]}
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = {
            "kernel": convert.conv2d(sd[f"{p}.conv_shortcut.weight"]),
            "bias": sd[f"{p}.conv_shortcut.bias"]}
    return out


def _attention(sd, p):
    """One Attention module: to_q/k/v (+ to_out.0)."""
    return {
        "to_q": {"kernel": convert.linear(sd[f"{p}.to_q.weight"])},
        "to_k": {"kernel": convert.linear(sd[f"{p}.to_k.weight"])},
        "to_v": {"kernel": convert.linear(sd[f"{p}.to_v.weight"])},
        "to_out": {"kernel": convert.linear(sd[f"{p}.to_out.0.weight"]),
                   "bias": sd[f"{p}.to_out.0.bias"]},
    }


def _transformer2d(sd, p, depth, n_cross):
    """diffusers Transformer2DModel -> my Transformer2DModel params."""
    proj_in_w = sd[f"{p}.proj_in.weight"]
    proj_out_w = sd[f"{p}.proj_out.weight"]
    # conv 1x1 (O, I, 1, 1) or linear (O, I) -> Dense (I, O)
    def proj(w):
        w = np.asarray(w)
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        return convert.linear(w)

    out = {
        "norm": {"scale": sd[f"{p}.norm.weight"], "bias": sd[f"{p}.norm.bias"]},
        "proj_in": {"kernel": proj(proj_in_w), "bias": sd[f"{p}.proj_in.bias"]},
        "proj_out": {"kernel": proj(proj_out_w), "bias": sd[f"{p}.proj_out.bias"]},
    }
    for d in range(depth):
        b = f"{p}.transformer_blocks.{d}"
        blk = {
            "norm1": {"scale": sd[f"{b}.norm1.weight"],
                      "bias": sd[f"{b}.norm1.bias"]},
            "attn1": _attention(sd, f"{b}.attn1"),
            "norm3": {"scale": sd[f"{b}.norm3.weight"],
                      "bias": sd[f"{b}.norm3.bias"]},
            "ff": {"proj_in": {"kernel": convert.linear(sd[f"{b}.ff.net.0.proj.weight"]),
                               "bias": sd[f"{b}.ff.net.0.proj.bias"]},
                   "proj_out": {"kernel": convert.linear(sd[f"{b}.ff.net.2.weight"]),
                                "bias": sd[f"{b}.ff.net.2.bias"]}},
        }
        # cross-attention streams: diffusers attn2 (and attn2_1 / norm2_1 for the
        # AudioLDM2 dual variant, when present)
        for i in range(n_cross):
            suffix = "" if i == 0 else f"_{i}"
            if f"{b}.attn2{suffix}.to_q.weight" not in sd:
                continue
            blk[f"norm2_{i}"] = {"scale": sd[f"{b}.norm2{suffix}.weight"],
                                 "bias": sd[f"{b}.norm2{suffix}.bias"]}
            blk[f"attn2_{i}"] = _attention(sd, f"{b}.attn2{suffix}")
        out[f"block_{d}"] = blk
    return out


def convert_unet(sd: Dict[str, np.ndarray], cfg: UNetConfig,
                 strict: bool = True) -> Dict:
    sd = TrackingStateDict(sd)
    n_cross = len(cfg.cross_attention_dims)
    p: Dict = {
        "conv_in": {"kernel": convert.conv2d(sd["conv_in.weight"]),
                    "bias": sd["conv_in.bias"]},
        "time_embedding": {
            "linear_1": {"kernel": convert.linear(sd["time_embedding.linear_1.weight"]),
                         "bias": sd["time_embedding.linear_1.bias"]},
            "linear_2": {"kernel": convert.linear(sd["time_embedding.linear_2.weight"]),
                         "bias": sd["time_embedding.linear_2.bias"]}},
        "conv_norm_out": {"scale": sd["conv_norm_out.weight"],
                          "bias": sd["conv_norm_out.bias"]},
        "conv_out": {"kernel": convert.conv2d(sd["conv_out.weight"]),
                     "bias": sd["conv_out.bias"]},
    }
    if cfg.class_embed_type == "simple_projection":
        p["class_embedding"] = {
            "kernel": convert.linear(sd["class_embedding.weight"]),
            "bias": sd["class_embedding.bias"]}

    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        blk: Dict = {}
        for j in range(cfg.layers_per_block):
            blk[f"resnet_{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}")
            if cfg.has_attention[i]:
                blk[f"attn_{j}"] = _transformer2d(
                    sd, f"down_blocks.{i}.attentions.{j}", 1, n_cross)
        if i != n_blocks - 1:
            blk["downsample"] = {"conv": {
                "kernel": convert.conv2d(sd[f"down_blocks.{i}.downsamplers.0.conv.weight"]),
                "bias": sd[f"down_blocks.{i}.downsamplers.0.conv.bias"]}}
        p[f"down_{i}"] = blk

    p["mid"] = {
        "resnet_0": _resnet(sd, "mid_block.resnets.0"),
        "attn": _transformer2d(sd, "mid_block.attentions.0", 1, n_cross),
        "resnet_1": _resnet(sd, "mid_block.resnets.1"),
    }

    for i in range(n_blocks):
        rev_i = n_blocks - 1 - i
        blk = {}
        for j in range(cfg.layers_per_block + 1):
            blk[f"resnet_{j}"] = _resnet(sd, f"up_blocks.{i}.resnets.{j}")
            if cfg.has_attention[rev_i]:
                blk[f"attn_{j}"] = _transformer2d(
                    sd, f"up_blocks.{i}.attentions.{j}", 1, n_cross)
        if i != n_blocks - 1:
            blk["upsample"] = {"conv": {
                "kernel": convert.conv2d(sd[f"up_blocks.{i}.upsamplers.0.conv.weight"]),
                "bias": sd[f"up_blocks.{i}.upsamplers.0.conv.bias"]}}
        p[f"up_{i}"] = blk
    if strict:
        sd.assert_all_consumed("convert_unet")
    return {"params": p}


def convert_vae(sd: Dict[str, np.ndarray], cfg: VAEConfig,
                strict: bool = True) -> Dict:
    sd = TrackingStateDict(sd)
    def vae_attn(pfx):
        # newer diffusers: to_q/to_k/to_v/to_out.0; older: query/key/value/proj_attn
        if f"{pfx}.to_q.weight" in sd:
            return {"attention": _attention(sd, pfx)}
        return {"attention": {
            "to_q": {"kernel": convert.linear(sd[f"{pfx}.query.weight"])},
            "to_k": {"kernel": convert.linear(sd[f"{pfx}.key.weight"])},
            "to_v": {"kernel": convert.linear(sd[f"{pfx}.value.weight"])},
            "to_out": {"kernel": convert.linear(sd[f"{pfx}.proj_attn.weight"]),
                       "bias": sd[f"{pfx}.proj_attn.bias"]},
        }}

    n = len(cfg.block_out_channels)
    enc: Dict = {
        "conv_in": {"kernel": convert.conv2d(sd["encoder.conv_in.weight"]),
                    "bias": sd["encoder.conv_in.bias"]},
        "conv_norm_out": {"scale": sd["encoder.conv_norm_out.weight"],
                          "bias": sd["encoder.conv_norm_out.bias"]},
        "conv_out": {"kernel": convert.conv2d(sd["encoder.conv_out.weight"]),
                     "bias": sd["encoder.conv_out.bias"]},
        "quant_conv": {"kernel": convert.conv2d(sd["quant_conv.weight"]),
                       "bias": sd["quant_conv.bias"]},
        "mid_resnet_0": _resnet(sd, "encoder.mid_block.resnets.0"),
        "mid_attn": {"group_norm": {
            "scale": sd["encoder.mid_block.attentions.0.group_norm.weight"],
            "bias": sd["encoder.mid_block.attentions.0.group_norm.bias"]},
            **vae_attn("encoder.mid_block.attentions.0")},
        "mid_resnet_1": _resnet(sd, "encoder.mid_block.resnets.1"),
    }
    for i in range(n):
        for j in range(cfg.layers_per_block):
            enc[f"down_{i}_resnet_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i != n - 1:
            enc[f"down_{i}_downsample"] = {"conv": {
                "kernel": convert.conv2d(
                    sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"]),
                "bias": sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"]}}

    dec: Dict = {
        "post_quant_conv": {"kernel": convert.conv2d(sd["post_quant_conv.weight"]),
                            "bias": sd["post_quant_conv.bias"]},
        "conv_in": {"kernel": convert.conv2d(sd["decoder.conv_in.weight"]),
                    "bias": sd["decoder.conv_in.bias"]},
        "conv_norm_out": {"scale": sd["decoder.conv_norm_out.weight"],
                          "bias": sd["decoder.conv_norm_out.bias"]},
        "conv_out": {"kernel": convert.conv2d(sd["decoder.conv_out.weight"]),
                     "bias": sd["decoder.conv_out.bias"]},
        "mid_resnet_0": _resnet(sd, "decoder.mid_block.resnets.0"),
        "mid_attn": {"group_norm": {
            "scale": sd["decoder.mid_block.attentions.0.group_norm.weight"],
            "bias": sd["decoder.mid_block.attentions.0.group_norm.bias"]},
            **vae_attn("decoder.mid_block.attentions.0")},
        "mid_resnet_1": _resnet(sd, "decoder.mid_block.resnets.1"),
    }
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{i}_resnet_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i != n - 1:
            dec[f"up_{i}_upsample"] = {"conv": {
                "kernel": convert.conv2d(
                    sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"]),
                "bias": sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"]}}

    if strict:
        sd.assert_all_consumed("convert_vae")
    return {"params": {"encoder": enc, "decoder": dec}}


# ----------------------------------------------------------------- entry point

def load_musicldm(checkpoint_dir, scheduler_name="ddim", operator=None,
                  schedule=None):
    """Build a MusicLDMPipeline from a local HF-snapshot-layout directory."""
    from ..pipelines.musicldm import MusicLDMPipeline
    from ..samplers import DiffusionSchedule

    d = Path(checkpoint_dir)
    unet_cfg = unet_config_from_json(_cfg(d / "unet"))
    vae_cfg = vae_config_from_json(_cfg(d / "vae"))
    voc_cfg = hifigan_config_from_json(_cfg(d / "vocoder"))
    txt_json = _cfg(d / "text_encoder")
    tcfg = txt_json.get("text_config", txt_json)
    txt_cfg = ClapTextConfig(
        vocab_size=tcfg.get("vocab_size", 50265),
        hidden_size=tcfg.get("hidden_size", 768),
        num_hidden_layers=tcfg.get("num_hidden_layers", 12),
        num_attention_heads=tcfg.get("num_attention_heads", 12),
        intermediate_size=tcfg.get("intermediate_size", 3072),
        max_position_embeddings=tcfg.get("max_position_embeddings", 514),
        projection_dim=txt_json.get("projection_dim", 512))

    unet_params = convert_unet(_load_module_sd(d / "unet"), unet_cfg)
    vae_params = convert_vae(_load_module_sd(d / "vae"), vae_cfg)
    voc_params = convert.convert_hifigan(_load_module_sd(d / "vocoder"), voc_cfg)
    txt_sd = _load_module_sd(d / "text_encoder")
    # ClapModel checkpoints prefix the text tower with "text_model." already
    txt_params = convert.convert_clap_text(txt_sd, txt_cfg)

    tokenizer = None
    tok_dir = d / "tokenizer"
    if tok_dir.exists():
        try:
            from transformers import AutoTokenizer
            hf_tok = AutoTokenizer.from_pretrained(str(tok_dir))

            def tokenizer(texts, maxlen=512):
                out = hf_tok(list(texts), padding="max_length",
                             max_length=hf_tok.model_max_length,
                             truncation=True, return_tensors="np")
                return out["input_ids"], out["attention_mask"]
        except Exception:
            tokenizer = None

    # MusicLDM's text_encoder is a full ClapModel — when the snapshot carries
    # the audio tower, wire it (reference pipeline_musicldm.py:86-88)
    clap_audio_embed, clap_frame_embed = _build_clap_audio(txt_sd, txt_json)

    return MusicLDMPipeline(
        unet_cfg=unet_cfg, vae_cfg=vae_cfg, vocoder_cfg=voc_cfg, text_cfg=txt_cfg,
        unet_params=unet_params, vae_params=vae_params, vocoder_params=voc_params,
        text_params=txt_params,
        schedule=schedule if schedule is not None else DiffusionSchedule(),
        scheduler_name=scheduler_name,
        operator=operator, tokenizer=tokenizer,
        clap_audio_embed=clap_audio_embed, clap_frame_embed=clap_frame_embed)


def _build_clap_audio(clap_sd, clap_json):
    """Optional CLAP audio tower from a ClapModel state dict: returns
    (pooled-embedding callable, per-frame-feature callable) or (None, None).
    The pooled embed serves prompt_type='clap' (plpeline_audioldm2.py:469-481)
    and CLAP re-ranking; the frame embed serves the StyleGuidanceOperator
    gram matrix (operator.py:253-271, dead in the reference, wired here)."""
    if not any(k.startswith("audio_model.") for k in clap_sd):
        return None, None
    from .htsat import ClapAudioModelWithProjection, ClapAudioConfig
    from .clap_features import make_clap_audio_embed, make_clap_frame_embed
    ajson = clap_json.get("audio_config", {})
    a_cfg = ClapAudioConfig(
        spec_size=ajson.get("spec_size", 256),
        patch_size=ajson.get("patch_size", 4),
        patch_stride=tuple(ajson.get("patch_stride", (4, 4))),
        num_mel_bins=ajson.get("num_mel_bins", 64),
        window_size=ajson.get("window_size", 8),
        depths=tuple(ajson.get("depths", (2, 2, 6, 2))),
        num_attention_heads=tuple(ajson.get("num_attention_heads",
                                            (4, 8, 16, 32))),
        patch_embeds_hidden_size=ajson.get("patch_embeds_hidden_size", 96),
        projection_dim=clap_json.get("projection_dim", 512))
    a_params = convert.convert_clap_audio(clap_sd, a_cfg)
    tower = ClapAudioModelWithProjection(a_cfg)
    return (make_clap_audio_embed(tower, a_params),
            make_clap_frame_embed(tower, a_params))


def _make_hf_tokenizer(tok_dir):
    if not Path(tok_dir).exists():
        return None
    try:
        from transformers import AutoTokenizer
        hf_tok = AutoTokenizer.from_pretrained(str(tok_dir))

        def tokenizer(texts):
            out = hf_tok(list(texts), padding="max_length",
                         max_length=min(hf_tok.model_max_length, 512),
                         truncation=True, return_tensors="np")
            return out["input_ids"], out["attention_mask"]
        return tokenizer
    except Exception:
        return None


def load_audioldm2(checkpoint_dir, scheduler_name="ddim", operator=None,
                   schedule=None):
    """Build an AudioLDM2Pipeline from a local HF-snapshot-layout directory:
    text_encoder (CLAP), text_encoder_2 (T5), projection_model, language_model
    (GPT-2), unet (dual cross-attn), vae, vocoder."""
    from ..pipelines.audioldm2 import AudioLDM2Pipeline
    from ..samplers import DiffusionSchedule

    d = Path(checkpoint_dir)
    unet_cfg = unet_config_from_json(_cfg(d / "unet"))
    vae_cfg = vae_config_from_json(_cfg(d / "vae"))
    voc_cfg = hifigan_config_from_json(_cfg(d / "vocoder"))

    clap_json = _cfg(d / "text_encoder")
    tjson = clap_json.get("text_config", clap_json)
    txt_cfg = ClapTextConfig(
        vocab_size=tjson.get("vocab_size", 50265),
        hidden_size=tjson.get("hidden_size", 768),
        num_hidden_layers=tjson.get("num_hidden_layers", 12),
        num_attention_heads=tjson.get("num_attention_heads", 12),
        intermediate_size=tjson.get("intermediate_size", 3072),
        max_position_embeddings=tjson.get("max_position_embeddings", 514),
        projection_dim=clap_json.get("projection_dim", 512))

    t5_json = _cfg(d / "text_encoder_2")
    is_tts = t5_json.get("model_type") == "vits"  # AudioLDM2-TTS variant
    t5_cfg = T5Config(
        vocab_size=t5_json.get("vocab_size", 32128),
        d_model=t5_json.get("d_model", 1024),
        d_kv=t5_json.get("d_kv", 64),
        d_ff=t5_json.get("d_ff", 2816),
        num_layers=t5_json.get("num_layers", 24) if not is_tts else 2,
        num_heads=t5_json.get("num_heads", 16),
        is_gated_act="gated" in t5_json.get("feed_forward_proj", "gated-gelu"))

    gpt2_json = _cfg(d / "language_model")
    gpt2_cfg = GPT2Config(
        vocab_size=gpt2_json.get("vocab_size", 50257),
        n_positions=gpt2_json.get("n_positions", 1024),
        n_embd=gpt2_json.get("n_embd", 768),
        n_layer=gpt2_json.get("n_layer", 12),
        n_head=gpt2_json.get("n_head", 12))
    max_new_tokens = gpt2_json.get("max_new_tokens", 8)

    proj_json = _cfg(d / "projection_model")
    proj_cfg = ProjectionConfig(
        text_encoder_dim=proj_json.get("text_encoder_dim", 512),
        text_encoder_1_dim=proj_json.get("text_encoder_1_dim", 1024),
        langauge_model_dim=proj_json.get("langauge_model_dim", 768))

    unet_params = convert_unet(_load_module_sd(d / "unet"), unet_cfg)
    vae_params = convert_vae(_load_module_sd(d / "vae"), vae_cfg)
    voc_params = convert.convert_hifigan(_load_module_sd(d / "vocoder"), voc_cfg)
    clap_sd = _load_module_sd(d / "text_encoder")
    txt_params = convert.convert_clap_text(clap_sd, txt_cfg)

    vits_cfg = vits_params = None
    if is_tts:
        # TTS variant: text_encoder_2 is a VITS text encoder; transcription
        # drives the second cross-attention stream (plpeline_audioldm2.py:428-501)
        from .vits import VitsConfig
        vits_cfg = VitsConfig(
            vocab_size=t5_json.get("vocab_size", 38),
            hidden_size=t5_json.get("hidden_size", 192),
            num_hidden_layers=t5_json.get("num_hidden_layers", 6),
            num_attention_heads=t5_json.get("num_attention_heads", 2),
            ffn_dim=t5_json.get("ffn_dim", 768),
            ffn_kernel_size=t5_json.get("ffn_kernel_size", 3),
            window_size=t5_json.get("window_size", 4))
        vits_params = convert.convert_vits_text_encoder(
            _load_module_sd(d / "text_encoder_2"), vits_cfg)
        t5_params = None
    else:
        t5_params = convert.convert_t5_encoder(
            _load_module_sd(d / "text_encoder_2"), t5_cfg)
    gpt2_sd = _load_module_sd(d / "language_model")
    # AudioLDM2 wraps GPT2Model under 'model.' in some snapshots
    gpt2_sd = {k[len("model."):] if k.startswith("model.") else k: v
               for k, v in gpt2_sd.items()}
    gpt2_params = convert.convert_gpt2(gpt2_sd, gpt2_cfg)
    proj_params = convert.convert_projection(_load_module_sd(d / "projection_model"))

    # optional CLAP audio tower (for prompt_type='clap' / style guidance)
    clap_audio_embed, clap_frame_embed = _build_clap_audio(clap_sd, clap_json)

    return AudioLDM2Pipeline(
        unet_cfg=unet_cfg, vae_cfg=vae_cfg, vocoder_cfg=voc_cfg, text_cfg=txt_cfg,
        unet_params=unet_params, vae_params=vae_params, vocoder_params=voc_params,
        text_params=txt_params,
        schedule=schedule if schedule is not None else DiffusionSchedule(),
        scheduler_name=scheduler_name, operator=operator,
        tokenizer=_make_hf_tokenizer(d / "tokenizer"),
        t5_cfg=t5_cfg, gpt2_cfg=gpt2_cfg, proj_cfg=proj_cfg,
        t5_params=t5_params, gpt2_params=gpt2_params, proj_params=proj_params,
        t5_tokenizer=_make_hf_tokenizer(d / "tokenizer_2"),
        max_new_tokens=max_new_tokens, clap_audio_embed=clap_audio_embed,
        clap_frame_embed=clap_frame_embed,
        vits_cfg=vits_cfg, vits_params=vits_params,
        vits_tokenizer=_make_hf_tokenizer(d / "tokenizer_2") if is_tts else None)


def load_stable_audio(checkpoint_dir, schedule=None, **_):
    """Build a StableAudioPipeline from a local HF-snapshot-layout directory
    (stabilityai/stable-audio-open-1.0: transformer/ vae/ text_encoder/
    projection_model/ scheduler/)."""
    from ..pipelines.stable_audio import StableAudioPipeline
    from ..samplers.edm import EDMDPMSolverMultistepSchedule
    from .configs import (OobleckConfig, StableAudioDiTConfig,
                          StableAudioProjectionConfig)

    d = Path(checkpoint_dir)
    dit_json = _cfg(d / "transformer")
    dit_cfg = StableAudioDiTConfig(
        sample_size=dit_json.get("sample_size", 1024),
        in_channels=dit_json.get("in_channels", 64),
        num_layers=dit_json.get("num_layers", 24),
        attention_head_dim=dit_json.get("attention_head_dim", 64),
        num_attention_heads=dit_json.get("num_attention_heads", 24),
        num_key_value_attention_heads=dit_json.get(
            "num_key_value_attention_heads", 12),
        out_channels=dit_json.get("out_channels", 64),
        cross_attention_dim=dit_json.get("cross_attention_dim", 768),
        time_proj_dim=dit_json.get("time_proj_dim", 256),
        global_states_input_dim=dit_json.get("global_states_input_dim", 1536),
        cross_attention_input_dim=dit_json.get("cross_attention_input_dim", 768))

    vae_json = _cfg(d / "vae")
    vae_cfg = OobleckConfig(
        encoder_hidden_size=vae_json.get("encoder_hidden_size", 128),
        downsampling_ratios=tuple(vae_json.get("downsampling_ratios",
                                               (2, 4, 4, 8, 8))),
        channel_multiples=tuple(vae_json.get("channel_multiples",
                                             (1, 2, 4, 8, 16))),
        decoder_channels=vae_json.get("decoder_channels", 128),
        decoder_input_channels=vae_json.get("decoder_input_channels", 64),
        audio_channels=vae_json.get("audio_channels", 2),
        sampling_rate=vae_json.get("sampling_rate", 44100))

    t5_json = _cfg(d / "text_encoder")
    t5_cfg = T5Config(
        vocab_size=t5_json.get("vocab_size", 32128),
        d_model=t5_json.get("d_model", 768),
        d_kv=t5_json.get("d_kv", 64),
        d_ff=t5_json.get("d_ff", 2048),
        num_layers=t5_json.get("num_layers", 12),
        num_heads=t5_json.get("num_heads", 12),
        is_gated_act="gated" in t5_json.get("feed_forward_proj", "gated-gelu"))

    proj_json = _cfg(d / "projection_model")
    proj_cfg = StableAudioProjectionConfig(
        text_encoder_dim=proj_json.get("text_encoder_dim", 768),
        conditioning_dim=proj_json.get("conditioning_dim", 768),
        min_value=proj_json.get("min_value", 0.0),
        max_value=proj_json.get("max_value", 512.0))

    dit_params = convert.convert_stable_audio_dit(
        _load_module_sd(d / "transformer"), dit_cfg)
    vae_params = convert.convert_oobleck(_load_module_sd(d / "vae"), vae_cfg)
    t5_params = convert.convert_t5_encoder(_load_module_sd(d / "text_encoder"),
                                           t5_cfg)
    proj_params = convert.convert_stable_audio_projection(
        _load_module_sd(d / "projection_model"))

    sched_json = {}
    sched_file = d / "scheduler" / "scheduler_config.json"
    if sched_file.exists():
        with open(sched_file) as f:
            sched_json = json.load(f)
    if schedule is None:
        schedule = EDMDPMSolverMultistepSchedule(
            sigma_min=sched_json.get("sigma_min", 0.3),
            sigma_max=sched_json.get("sigma_max", 500.0),
            sigma_data=sched_json.get("sigma_data", 1.0),
            rho=sched_json.get("rho", 7.0),
            solver_order=sched_json.get("solver_order", 2),
            prediction_type=sched_json.get("prediction_type", "v_prediction"))

    return StableAudioPipeline(
        dit_cfg=dit_cfg, vae_cfg=vae_cfg, text_cfg=t5_cfg, proj_cfg=proj_cfg,
        dit_params=dit_params, vae_params=vae_params, text_params=t5_params,
        proj_params=proj_params, schedule=schedule,
        tokenizer=_make_hf_tokenizer(d / "tokenizer"))
