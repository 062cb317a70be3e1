"""First-contact hardening for real checkpoints (VERDICT round-2 item 8).

No hub egress exists here, so the hub config.json VALUES cannot be fetched;
what CAN be de-risked offline is (a) the diffusers config.json FIELD GRAMMAR
the parsers consume (including the cross_attention_dim list-with-Nones form
diffusers writes for AudioLDM2) and (b) the COMPLETE full-scale checkpoint
key manifest: the converters must consume EVERY key of a full-scale
diffusers-grammar state dict (both UNet families + VAE) or raise — silently
dropped weights are the classic from_pretrained failure. Key manifests come
from tests/torch_ref_diffusers.py modules instantiated on torch's meta
device (shape-only, no weight allocation), independent of the converter's
own key strings. Reference: /root/reference/run.py:218 from_pretrained.
"""

import numpy as np
import pytest
import torch

from diffmusic_tpu.models.checkpoint import (TrackingStateDict, convert_unet,
                                             convert_vae,
                                             hifigan_config_from_json,
                                             unet_config_from_json,
                                             vae_config_from_json)
from diffmusic_tpu.models.configs import HiFiGANConfig, UNetConfig, VAEConfig

from torch_ref_diffusers import TorchUNet, TorchVAE

# diffusers-schema config.json contents at this build's validated full-scale
# dims (ucsd-reach/musicldm-style single-stream UNet with CLAP class
# projection; cvssp/audioldm2-music-style dual cross-attention UNet)
MUSICLDM_UNET_JSON = {
    "_class_name": "UNet2DConditionModel",
    "sample_size": 128, "in_channels": 8, "out_channels": 8,
    "block_out_channels": [128, 256, 384, 640],
    "down_block_types": ["CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                         "CrossAttnDownBlock2D", "DownBlock2D"],
    "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D",
                       "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"],
    "layers_per_block": 2, "attention_head_dim": 8, "norm_num_groups": 32,
    "cross_attention_dim": None,
    "class_embed_type": "simple_projection",
    "projection_class_embeddings_input_dim": 512,
    "class_embeddings_concat": True,
}
AUDIOLDM2_UNET_JSON = {
    "_class_name": "AudioLDM2UNet2DConditionModel",
    "sample_size": 128, "in_channels": 8, "out_channels": 8,
    "block_out_channels": [128, 256, 384, 640],
    "down_block_types": ["CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                         "CrossAttnDownBlock2D", "DownBlock2D"],
    "layers_per_block": 2, "attention_head_dim": 8, "norm_num_groups": 32,
    # diffusers writes the dual streams as a list; some snapshots carry None
    # placeholders for non-cross blocks — the parser must drop them
    "cross_attention_dim": [768, 1024],
    "class_embed_type": None,
    "projection_class_embeddings_input_dim": None,
    "class_embeddings_concat": False,
}
VAE_JSON = {
    "_class_name": "AutoencoderKL",
    "in_channels": 1, "out_channels": 1, "latent_channels": 8,
    "block_out_channels": [128, 256, 512],
    "layers_per_block": 2, "norm_num_groups": 32,
    "scaling_factor": 0.18215,
}
VOCODER_JSON = {
    "_class_name": "SpeechT5HifiGan",
    "model_in_dim": 64, "sampling_rate": 16000,
    "upsample_initial_channel": 1024,
    "upsample_rates": [5, 4, 2, 2, 2],
    "upsample_kernel_sizes": [16, 16, 8, 4, 4],
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "leaky_relu_slope": 0.1, "normalize_before": False,
}


def _meta_state_dict(module) -> dict:
    """Full key manifest with real shapes, zero allocation (meta device);
    same VAEAttention flattening as torch_ref_diffusers.flat_state_dict."""
    sd = {}
    for k, v in module.state_dict().items():
        k = k.replace(".attn.to_", ".to_")
        sd[k] = np.zeros(tuple(v.shape), np.float32)
    return sd


class TestConfigGrammar:
    def test_musicldm_unet_json(self):
        cfg = unet_config_from_json(MUSICLDM_UNET_JSON)
        assert cfg == UNetConfig(has_attention=(True, True, True, False))

    def test_audioldm2_unet_json(self):
        cfg = unet_config_from_json(AUDIOLDM2_UNET_JSON)
        assert cfg.cross_attention_dims == (768, 1024)
        assert cfg.class_embed_type is None
        assert not cfg.class_embeddings_concat

    def test_cross_attention_dim_with_nones(self):
        j = dict(AUDIOLDM2_UNET_JSON, cross_attention_dim=[None, 768, None, 1024])
        assert unet_config_from_json(j).cross_attention_dims == (768, 1024)

    def test_cross_attention_dim_scalar(self):
        j = dict(AUDIOLDM2_UNET_JSON, cross_attention_dim=768)
        assert unet_config_from_json(j).cross_attention_dims == (768,)

    def test_attention_head_dim_list(self):
        j = dict(MUSICLDM_UNET_JSON, attention_head_dim=[8, 8, 8, 8])
        assert unet_config_from_json(j).attention_head_dim == 8

    def test_vae_json(self):
        assert vae_config_from_json(VAE_JSON) == VAEConfig()

    def test_vocoder_json(self):
        assert hifigan_config_from_json(VOCODER_JSON) == HiFiGANConfig()


class TestFullScaleKeyManifest:
    """Every key of a FULL-SCALE diffusers-grammar checkpoint must be
    consumed by the converter (convert_unet/convert_vae strict=True)."""

    @pytest.mark.parametrize("json_cfg", [MUSICLDM_UNET_JSON,
                                          AUDIOLDM2_UNET_JSON],
                             ids=["musicldm", "audioldm2"])
    def test_unet_all_keys_consumed(self, json_cfg):
        cfg = unet_config_from_json(json_cfg)
        with torch.device("meta"):
            sd = _meta_state_dict(TorchUNet(cfg))
        assert len(sd) > 400  # full-scale manifest, not a stub
        params = convert_unet(sd, cfg, strict=True)  # raises on leftovers
        assert "conv_in" in params["params"]

    def test_vae_all_keys_consumed(self):
        cfg = vae_config_from_json(VAE_JSON)
        with torch.device("meta"):
            sd = _meta_state_dict(TorchVAE(cfg))
        assert len(sd) > 100
        convert_vae(sd, cfg, strict=True)

    def test_unmapped_key_raises(self):
        cfg = unet_config_from_json(MUSICLDM_UNET_JSON)
        with torch.device("meta"):
            sd = _meta_state_dict(TorchUNet(cfg))
        sd["down_blocks.0.attentions.0.some_new_diffusers_weight"] = \
            np.zeros((4, 4), np.float32)
        with pytest.raises(ValueError, match="NOT consumed"):
            convert_unet(sd, cfg, strict=True)

    def test_torch_buffer_artifacts_ignored(self):
        cfg = vae_config_from_json(VAE_JSON)
        with torch.device("meta"):
            sd = _meta_state_dict(TorchVAE(cfg))
        sd["encoder.some.num_batches_tracked"] = np.zeros((), np.float32)
        convert_vae(sd, cfg, strict=True)  # must not raise

    def test_tracking_dict_reports_prefix(self):
        t = TrackingStateDict({"a.weight": 1, "b.weight": 2})
        _ = t["a.weight"]
        with pytest.raises(ValueError, match="b.weight"):
            t.assert_all_consumed("unit")
