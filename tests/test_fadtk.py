"""fadtk subsystem: model zoo registry, batch embedding cache, streaming stats,
stats bundles, CLI surfaces (reference: fadtk/{model_loader,fad_batch,utils}.py)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from diffmusic_tpu.data import write_wav
from diffmusic_tpu.fadtk import (FADEngine, get_all_models, get_model,
                                 merge_stats, stats_from_npy_dir)
from diffmusic_tpu.fadtk.fad_batch import cache_embedding_files

pytestmark = pytest.mark.slow  # scan-compiling / multi-minute: excluded from the fast tier


def _make_wavs(d: Path, n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    sr = 16000
    for i in range(n):
        t = np.arange(sr * 2) / sr
        w = 0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t) \
            + 0.02 * rng.standard_normal(len(t))
        write_wav(d / f"clip{i}.wav", w.astype(np.float32)[None], sr)


class TestModelZoo:
    def test_enumeration_has_reference_names(self):
        names = {m.name for m in get_all_models()}
        # reference eval.py:56-66 evaluates these four; plus the zoo families
        for expect in ("vggish", "clap-laion-audio", "clap-laion-music",
                       "w2v2-base", "encodec-emb", "MERT-v1-95M",
                       "whisper-tiny", "mfcc-stack", "dac-44kHz",
                       "cdpam-acoustic", "cdpam-content", "clap-2023"):
            assert expect in names, f"missing {expect}"
        assert len(names) >= 30  # per-layer variants enumerated

    def test_enumeration_is_lazy(self):
        # enumeration must not touch disk / load weights
        ms = get_all_models()
        assert all(not m.loaded for m in ms)

    def test_unknown_name_lists_known(self):
        with pytest.raises(ValueError, match="mfcc-stack"):
            get_model("nope")

    def test_gated_model_error_names_path(self, tmp_path):
        m = get_model("w2v2-base", checkpoint_dir=str(tmp_path))
        with pytest.raises(FileNotFoundError, match="wav2vec2-base-960h"):
            m.get_embedding(np.zeros(16000, np.float32))

    def test_mfcc_stack_works_via_zoo(self):
        m = get_model("mfcc-stack")
        emb = m.get_embedding(np.random.default_rng(0)
                              .standard_normal(32000).astype(np.float32))
        assert emb.ndim == 2 and emb.shape[1] == 160


class TestBatchCache:
    def test_inline_and_pool_agree(self, tmp_path):
        a, b = tmp_path / "a", tmp_path / "b"
        a.mkdir(), b.mkdir()
        _make_wavs(a, 3), _make_wavs(b, 3)
        n1 = cache_embedding_files(a, "mfcc-stack", workers=1)
        n2 = cache_embedding_files(b, "mfcc-stack", workers=2)
        assert n1 == n2 == 3
        for i in range(3):
            ea = np.load(a / "embeddings" / "mfcc-stack" / f"clip{i}.npy")
            eb = np.load(b / "embeddings" / "mfcc-stack" / f"clip{i}.npy")
            np.testing.assert_allclose(ea, eb, atol=1e-5)
        # idempotent
        assert cache_embedding_files(a, "mfcc-stack") == 0


class TestStreamingStats:
    def test_merge_matches_direct(self, rng):
        chunks = [rng.standard_normal((n, 6)) for n in (3, 17, 9)]
        mu, cov = merge_stats(chunks)
        allemb = np.concatenate(chunks)
        np.testing.assert_allclose(mu, allemb.mean(0), atol=1e-10)
        np.testing.assert_allclose(cov, np.cov(allemb, rowvar=False), atol=1e-10)

    def test_stats_from_npy_dir_and_bundle_score(self, tmp_path):
        gt, ev = tmp_path / "gt", tmp_path / "ev"
        gt.mkdir(), ev.mkdir()
        _make_wavs(gt, 3, seed=1), _make_wavs(ev, 3, seed=2)
        cache_embedding_files(gt, "mfcc-stack")
        mu, cov = stats_from_npy_dir(gt / "embeddings" / "mfcc-stack")
        np.savez(tmp_path / "baseline.npz", mu=mu, cov=cov)

        engine = FADEngine(model_name="mfcc-stack")
        from_dirs = engine.score(gt, ev)
        from_bundle = engine.score(tmp_path / "baseline.npz", ev)
        assert from_dirs == pytest.approx(from_bundle, rel=1e-4)
        assert np.isfinite(from_dirs)


def _synth_w2v2_checkpoint(root: Path) -> Path:
    """Random-weight tiny wav2vec2 saved in HF layout — proves the
    transformers-backed loader plumbing without network egress
    (reference fadtk/model_loader.py:524-558 downloads the real one)."""
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2Model
    torch.manual_seed(0)
    cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16,) * 7, do_stable_layer_norm=False)
    path = root / "wav2vec2-base-960h"
    Wav2Vec2Model(cfg).eval().save_pretrained(str(path))
    return path


def _synth_whisper_checkpoint(root: Path) -> Path:
    """Random-weight tiny Whisper + its feature extractor in HF layout
    (reference fadtk/model_loader.py:635-671)."""
    import torch
    from transformers import (WhisperConfig, WhisperFeatureExtractor,
                              WhisperModel)
    torch.manual_seed(0)
    cfg = WhisperConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64)
    path = root / "whisper-tiny"
    WhisperModel(cfg).eval().save_pretrained(str(path))
    WhisperFeatureExtractor().save_pretrained(str(path))
    return path


def _synth_hubert_checkpoint(root: Path) -> Path:
    """Random-weight tiny HuBERT in HF layout
    (reference fadtk/model_loader.py:561-595)."""
    import torch
    from transformers import HubertConfig, HubertModel
    torch.manual_seed(0)
    cfg = HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16,) * 7, do_stable_layer_norm=False)
    path = root / "hubert-base-ls960"
    HubertModel(cfg).eval().save_pretrained(str(path))
    return path


def _synth_wavlm_checkpoint(root: Path) -> Path:
    """Random-weight tiny WavLM in HF layout
    (reference fadtk/model_loader.py:598-632)."""
    import torch
    from transformers import WavLMConfig, WavLMModel
    torch.manual_seed(0)
    cfg = WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16,) * 7, do_stable_layer_norm=False)
    path = root / "wavlm-base"
    WavLMModel(cfg).eval().save_pretrained(str(path))
    return path


def _synth_encodec_checkpoint(root: Path) -> Path:
    """Random-weight tiny EnCodec in HF layout — the loader reads the
    continuous pre-quantization encoder output (reference
    fadtk/model_loader.py:111-186)."""
    import torch
    from transformers import EncodecConfig, EncodecModel
    torch.manual_seed(0)
    cfg = EncodecConfig(
        hidden_size=16, num_filters=4, num_residual_layers=1,
        upsampling_ratios=[8, 5, 4, 2], codebook_size=64,
        codebook_dim=16, sampling_rate=24000)
    path = root / "encodec_24k"
    EncodecModel(cfg).eval().save_pretrained(str(path))
    return path


def _synth_mert_checkpoint(root: Path) -> Path:
    """MERT is a HuBERT-family model (reference fadtk/model_loader.py:254-287
    loads m-a-p/MERT-v1-95M via AutoModel); a tiny HubertModel saved under the
    MERT subdir exercises the same AutoModel + per-layer plumbing."""
    import torch
    from transformers import HubertConfig, HubertModel
    torch.manual_seed(1)
    cfg = HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16,) * 7, do_stable_layer_norm=False)
    path = root / "MERT-v1-95M"
    HubertModel(cfg).eval().save_pretrained(str(path))
    return path


def _synth_clap_checkpoint(root: Path) -> Path:
    """CLAP-LAION routes through this package's own flax HTSAT tower
    (model_loader.CLAPLaionModel); a tiny transformers ClapModel saved under
    'clap' exercises config parsing, convert_clap_audio, the 10-s/1-s-hop
    chunk contract, and the full FAD path. spec_size/num_mel_bins stay at the
    production 256/64 (the feature pipeline's output geometry); only
    depth/width shrink."""
    import torch
    from transformers import ClapConfig, ClapModel
    torch.manual_seed(0)
    cfg = ClapConfig(
        audio_config=dict(
            spec_size=256, patch_size=4, patch_stride=[4, 4],
            num_mel_bins=64, window_size=8, depths=[1, 1],
            num_attention_heads=[2, 2], patch_embeds_hidden_size=8,
            hidden_size=16, projection_dim=16, enable_fusion=False,
            drop_path_rate=0.0, attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0),
        text_config=dict(hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         vocab_size=100, projection_dim=16),
        projection_dim=16)
    path = root / "clap"
    ClapModel(cfg).eval().save_pretrained(str(path))
    return path


class TestRealEmbedderEndToEnd:
    """Drive checkpoint-gated zoo loaders with synthesized local weights
    through the full cache -> stats -> score -> score_inf -> CSV path
    (VERDICT r1 item 4: the zoo must be demonstrated working, not just
    enumerated)."""

    def test_w2v2_loader_contract(self, tmp_path):
        _synth_w2v2_checkpoint(tmp_path)
        m = get_model("w2v2-base", checkpoint_dir=str(tmp_path))
        emb = m.get_embedding(np.random.default_rng(0)
                              .standard_normal(32000).astype(np.float32))
        # (frames, dim): ~49 frames/s from the conv feature extractor
        assert emb.ndim == 2 and emb.shape[0] > 20
        assert emb.dtype == np.float32

    def test_w2v2_full_fad_path(self, tmp_path):
        _synth_w2v2_checkpoint(tmp_path)
        gt, ev = tmp_path / "gt", tmp_path / "ev"
        gt.mkdir(), ev.mkdir()
        _make_wavs(gt, 3, seed=1), _make_wavs(ev, 3, seed=2)

        engine = FADEngine(model_name="w2v2-base",
                           checkpoint_dir=str(tmp_path))
        fad = engine.score(gt, ev)
        assert np.isfinite(fad) and fad > 0
        # identical directories => identical stats => FAD == 0
        assert engine.score(gt, gt) == pytest.approx(0.0, abs=1e-6)

        # cache layout matches the fadtk convention and is idempotent
        cached = sorted((gt / "embeddings" / "w2v2-base").glob("*.npy"))
        assert len(cached) == 3
        assert cache_embedding_files(gt, "w2v2-base",
                                     checkpoint_dir=str(tmp_path)) == 0

        # stats bundle round-trip scores identically to the directory
        engine.save_stats(gt, tmp_path / "gt.npz")
        assert engine.score(tmp_path / "gt.npz", ev) == pytest.approx(
            fad, rel=1e-6)

        fad_inf, slope = engine.score_inf(gt, ev, steps=5)
        assert np.isfinite(fad_inf)

        csv_out = engine.score_individual(gt, ev, tmp_path / "per_song.csv")
        rows = csv_out.read_text().strip().splitlines()
        assert len(rows) == 3 and all("," in r for r in rows)

    def test_whisper_loader_contract(self, tmp_path):
        _synth_whisper_checkpoint(tmp_path)
        m = get_model("whisper-tiny", checkpoint_dir=str(tmp_path))
        emb = m.get_embedding(np.random.default_rng(0)
                              .standard_normal(32000).astype(np.float32))
        assert emb.ndim == 2 and emb.shape[0] > 20
        assert np.isfinite(emb).all()

    def test_hubert_loader_contract(self, tmp_path):
        _synth_hubert_checkpoint(tmp_path)
        m = get_model("hubert-base", checkpoint_dir=str(tmp_path))
        emb = m.get_embedding(np.random.default_rng(0)
                              .standard_normal(32000).astype(np.float32))
        assert emb.ndim == 2 and emb.shape[0] > 20
        assert np.isfinite(emb).all()

    def test_wavlm_loader_contract(self, tmp_path):
        _synth_wavlm_checkpoint(tmp_path)
        m = get_model("wavlm-base", checkpoint_dir=str(tmp_path))
        emb = m.get_embedding(np.random.default_rng(0)
                              .standard_normal(32000).astype(np.float32))
        assert emb.ndim == 2 and emb.shape[0] > 20
        assert np.isfinite(emb).all()

    def test_encodec_loader_contract(self, tmp_path):
        _synth_encodec_checkpoint(tmp_path)
        m = get_model("encodec-emb", checkpoint_dir=str(tmp_path))
        emb = m.get_embedding(np.random.default_rng(0)
                              .standard_normal(48000).astype(np.float32))
        # (frames, hidden): continuous encoder output, transposed
        assert emb.ndim == 2 and emb.shape[0] > 20
        assert np.isfinite(emb).all()

    def test_mert_per_layer_contract(self, tmp_path):
        _synth_mert_checkpoint(tmp_path)
        # the per-layer variant (layer 1 of the tiny 2-layer model) and the
        # final-layer default must both work and differ
        m_final = get_model("MERT-v1-95M", checkpoint_dir=str(tmp_path))
        m_l1 = get_model("MERT-v1-95M-1", checkpoint_dir=str(tmp_path))
        audio = np.random.default_rng(0).standard_normal(48000).astype(
            np.float32)
        e_final, e_l1 = m_final.get_embedding(audio), m_l1.get_embedding(audio)
        assert e_final.shape == e_l1.shape and e_final.ndim == 2
        assert not np.allclose(e_final, e_l1)

    def test_hubert_full_fad_path(self, tmp_path):
        _synth_hubert_checkpoint(tmp_path)
        gt, ev = tmp_path / "gt", tmp_path / "ev"
        gt.mkdir(), ev.mkdir()
        _make_wavs(gt, 2, seed=1), _make_wavs(ev, 2, seed=2)
        engine = FADEngine(model_name="hubert-base",
                           checkpoint_dir=str(tmp_path))
        fad = engine.score(gt, ev)
        assert np.isfinite(fad) and fad > 0
        assert engine.score(gt, gt) == pytest.approx(0.0, abs=1e-6)

    def test_clap_laion_loader_contract(self, tmp_path):
        _synth_clap_checkpoint(tmp_path)
        m = get_model("clap-laion-audio", checkpoint_dir=str(tmp_path))
        # sr must already be correct BEFORE the lazy model load: load_wav
        # resamples against it when the engine decodes the first file
        assert m.sr == 16000
        audio = np.random.default_rng(0).standard_normal(32000).astype(
            np.float32)
        emb = m.get_embedding(audio)
        # reference frame contract (fadtk/model_loader.py:391-412): one
        # embedding per 10-s/1-s-hop chunk -> 2 frames for a 2-s clip
        assert emb.shape == (2, 16)
        assert np.isfinite(emb).all()

    def test_clap_laion_full_fad_path(self, tmp_path):
        _synth_clap_checkpoint(tmp_path)
        gt, ev = tmp_path / "gt", tmp_path / "ev"
        gt.mkdir(), ev.mkdir()
        _make_wavs(gt, 2, seed=1), _make_wavs(ev, 2, seed=2)
        engine = FADEngine(model_name="clap-laion-audio",
                           checkpoint_dir=str(tmp_path))
        fad = engine.score(gt, ev)
        assert np.isfinite(fad) and fad > 0
        assert engine.score(gt, gt) == pytest.approx(0.0, abs=1e-6)

    def test_whisper_scores_differ_from_w2v2(self, tmp_path):
        # two different loaders on the same audio give independent caches
        _synth_w2v2_checkpoint(tmp_path)
        _synth_whisper_checkpoint(tmp_path)
        d = tmp_path / "clips"
        d.mkdir()
        _make_wavs(d, 2)
        for name in ("w2v2-base", "whisper-tiny"):
            assert cache_embedding_files(
                d, name, checkpoint_dir=str(tmp_path)) == 2
        assert (d / "embeddings" / "w2v2-base" / "clip0.npy").exists()
        assert (d / "embeddings" / "whisper-tiny" / "clip0.npy").exists()


class TestCLIs:
    def test_embeds_and_package_clis(self, tmp_path):
        d = tmp_path / "clips"
        d.mkdir()
        _make_wavs(d, 2)
        env_dir = str(Path(__file__).resolve().parent.parent)
        r = subprocess.run(
            [sys.executable, "-m", "diffmusic_tpu.fadtk.embeds",
             "-m", "mfcc-stack", "-d", str(d)],
            capture_output=True, text=True, cwd=env_dir)
        assert r.returncode == 0, r.stderr
        assert "2 new embeddings" in r.stdout

        out = tmp_path / "stats"
        r = subprocess.run(
            [sys.executable, "-m", "diffmusic_tpu.fadtk.package",
             "-m", "mfcc-stack", "-d", str(d), "-o", str(out)],
            capture_output=True, text=True, cwd=env_dir)
        assert r.returncode == 0, r.stderr
        z = np.load(out / "mfcc-stack.npz")
        assert z["mu"].shape == (160,) and z["cov"].shape == (160, 160)
