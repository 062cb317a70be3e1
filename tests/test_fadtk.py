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
