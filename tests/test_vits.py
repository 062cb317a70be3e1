"""VITS text encoder: parity against transformers VitsModel.text_encoder
(random tiny weights, converted) and the AudioLDM2 TTS branch wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmusic_tpu.models.vits import VitsConfig, VitsTextEncoder, tiny_vits_config
from diffmusic_tpu.models.convert import convert_vits_text_encoder

pytestmark = pytest.mark.slow  # scan-compiling / multi-minute: excluded from the fast tier


class TestVitsParity:
    def test_matches_transformers(self):
        torch = pytest.importorskip("torch")
        from transformers import VitsConfig as HFVitsConfig, VitsModel

        hf_cfg = HFVitsConfig(
            vocab_size=64, hidden_size=16, num_hidden_layers=2,
            num_attention_heads=2, ffn_dim=32, ffn_kernel_size=3,
            window_size=4, flow_size=16, spectrogram_bins=9,
            upsample_initial_channel=16, use_stochastic_duration_prediction=False)
        torch.manual_seed(0)
        hf = VitsModel(hf_cfg).eval()

        ids = torch.tensor([[1, 5, 9, 13, 2, 0, 0, 0]])
        mask = torch.tensor([[1, 1, 1, 1, 1, 0, 0, 0]])
        with torch.no_grad():
            want = hf.text_encoder(
                ids, padding_mask=mask.unsqueeze(-1).float(),
                attention_mask=mask)[0].numpy()

        cfg = VitsConfig(vocab_size=64, hidden_size=16, num_hidden_layers=2,
                         num_attention_heads=2, ffn_dim=32)
        params = convert_vits_text_encoder(hf.text_encoder.state_dict(), cfg)
        m = VitsTextEncoder(cfg)
        got = np.asarray(m.apply(params, jnp.asarray(ids.numpy()),
                                 jnp.asarray(mask.numpy())))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestTTSBranch:
    def test_transcription_requires_vits(self):
        from diffmusic_tpu.pipelines import get_pipeline
        pipe = get_pipeline("audioldm2").tiny()
        with pytest.raises(ValueError, match="VITS"):
            pipe(prompt="x", transcription="hello world",
                 audio_length_in_s=0.4, num_inference_steps=2)

    def test_tts_generation_with_tiny_vits(self):
        from diffmusic_tpu.pipelines import get_pipeline
        pipe = get_pipeline("audioldm2").tiny()
        cfg = tiny_vits_config()
        # the VITS stream replaces T5: hidden must match the T5 stream dim
        cfg = VitsConfig(vocab_size=cfg.vocab_size, hidden_size=pipe.t5_cfg.d_model,
                         num_hidden_layers=2, num_attention_heads=2, ffn_dim=32)
        m = VitsTextEncoder(cfg)
        pipe.vits_cfg = cfg
        pipe.vits = m
        pipe.vits_params = m.init(jax.random.key(0),
                                  jnp.zeros((1, 8), jnp.int32))

        def tok(texts, maxlen=10):
            ids = np.zeros((len(texts), maxlen), np.int32)
            mask = np.zeros((len(texts), maxlen), np.int32)
            for i, t in enumerate(texts):
                b = [1 + (c % 60) for c in t.encode()][:maxlen]
                ids[i, :len(b)] = b
                mask[i, :len(b)] = 1
            return ids, mask

        pipe.vits_tokenizer = tok
        out = pipe(prompt="speech", transcription="hello there",
                   audio_length_in_s=0.4, num_inference_steps=2,
                   key=jax.random.key(1))
        assert np.isfinite(out.audios).all()
