"""Metrics: Fréchet distance math, FAD engine caching, KL/LSD/MSE sanity."""

from pathlib import Path

import numpy as np
import pytest

from diffmusic_tpu.metrics import (FrechetAudioDistance, frechet_distance,
                                   KullbackLeiblerDivergence, LogSpectralDistance,
                                   MeanSquaredError, MFCCStackEmbedding,
                                   get_embedding_model)
from diffmusic_tpu.fadtk import FADEngine, cache_embedding_files, cache_path
from diffmusic_tpu.data import write_wav


def _tone(freq, n=16000, sr=16000, amp=0.3):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestFrechetMath:
    def test_identical_distributions_zero(self, rng):
        x = rng.standard_normal((500, 8))
        mu, cov = x.mean(0), np.cov(x, rowvar=False)
        assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-6)

    def test_mean_shift(self):
        mu1, cov = np.zeros(4), np.eye(4)
        mu2 = np.ones(4) * 2.0
        # FD = |mu1-mu2|^2 when covariances equal
        assert frechet_distance(mu1, cov, mu2, cov) == pytest.approx(16.0, rel=1e-6)

    def test_known_1d(self):
        # FD(N(0,1), N(1,4)) = 1 + 1 + 4 - 2*2 = 2
        assert frechet_distance([0.0], [[1.0]], [1.0], [[4.0]]) == pytest.approx(2.0)

    def test_degenerate_covariance_is_finite(self, rng):
        x = rng.standard_normal((5, 16))  # rank-deficient cov
        mu, cov = x.mean(0), np.cov(x, rowvar=False)
        d = frechet_distance(mu, cov, mu + 0.1, cov)
        assert np.isfinite(d) and d >= 0


class TestEmbedding:
    def test_shapes_and_determinism(self):
        emb = MFCCStackEmbedding()
        e1 = emb(_tone(440, 32000))
        e2 = emb(_tone(440, 32000))
        assert e1.shape[1] == emb.dim
        np.testing.assert_array_equal(e1, e2)

    def test_discriminates_content(self):
        emb = MFCCStackEmbedding()
        a = emb(_tone(200)).mean(0)
        b = emb(_tone(3000)).mean(0)
        assert np.linalg.norm(a - b) > 1.0

    def test_registry(self):
        assert get_embedding_model("mfcc-stack").name == "mfcc-stack"
        # vggish now routes to the native implementation (metrics/vggish.py),
        # which is checkpoint-gated in this zero-egress environment
        with pytest.raises(FileNotFoundError):
            get_embedding_model("vggish")
        with pytest.raises(ValueError):
            get_embedding_model("no-such-embedder")


class TestFADPipeline:
    def test_similar_lower_than_different(self, rng):
        fad = FrechetAudioDistance()
        set_a = [_tone(f) + rng.standard_normal(16000).astype(np.float32) * 0.01
                 for f in (200, 210, 220, 230)]
        set_b = [_tone(f) + rng.standard_normal(16000).astype(np.float32) * 0.01
                 for f in (205, 215, 225, 235)]
        set_c = [rng.standard_normal(16000).astype(np.float32) * 0.3
                 for _ in range(4)]
        close = fad.score(set_a, set_b)
        far = fad.score(set_a, set_c)
        assert close < far

    def test_engine_caching_idempotent(self, tmp_path):
        for i, f in enumerate((220, 440, 880)):
            write_wav(tmp_path / f"t{i}.wav", _tone(f)[None], 16000)
        engine = FADEngine()
        n1 = cache_embedding_files(tmp_path, engine.model)
        n2 = cache_embedding_files(tmp_path, engine.model)
        assert n1 == 3 and n2 == 0
        assert cache_path(tmp_path / "t0.wav", "mfcc-stack").exists()

    def test_engine_score_and_stats_bundle(self, tmp_path):
        a, b = tmp_path / "a", tmp_path / "b"
        a.mkdir(), b.mkdir()
        for i, f in enumerate((220, 440, 660)):
            write_wav(a / f"x{i}.wav", _tone(f)[None], 16000)
            write_wav(b / f"y{i}.wav", _tone(f + 5)[None], 16000)
        engine = FADEngine()
        s = engine.score(a, b)
        assert np.isfinite(s) and s >= 0
        engine.save_stats(a, tmp_path / "stats.npz")
        s2 = engine.score(tmp_path / "stats.npz", b)
        assert s2 == pytest.approx(s, rel=1e-6)

    def test_score_individual_csv(self, tmp_path):
        a, b = tmp_path / "a", tmp_path / "b"
        a.mkdir(), b.mkdir()
        for i, f in enumerate((220, 440)):
            write_wav(a / f"x{i}.wav", _tone(f, 32000)[None], 16000)
            write_wav(b / f"y{i}.wav", _tone(f + 3, 32000)[None], 16000)
        out = FADEngine().score_individual(a, b, tmp_path / "indiv.csv")
        lines = out.read_text().strip().splitlines()
        assert len(lines) == 2


class TestClassicMetrics:
    def test_mse_identical_zero(self):
        x = [_tone(440)]
        assert MeanSquaredError().score(x, x) == 0.0

    def test_mse_known_value(self):
        a = [np.zeros(100, np.float32)]
        b = [np.ones(100, np.float32) * 2]
        assert MeanSquaredError().score(a, b) == pytest.approx(4.0)

    def test_lsd_identical_zero(self):
        x = [_tone(440)]
        assert LogSpectralDistance().score(x, x) == pytest.approx(0.0, abs=1e-5)

    def test_lsd_orders(self):
        gt = [_tone(440)]
        close = [_tone(440) * 0.9]
        far = [np.random.default_rng(0).standard_normal(16000).astype(np.float32)]
        lsd = LogSpectralDistance()
        assert lsd.score(gt, close) < lsd.score(gt, far)

    def test_lsd_reference_formula_parity(self):
        """Exact parity with the reference formula (diffmusic/metrics/lsd.py:
        17-40): log10(|STFT| + 1e-10) — NOT |STFT|^2 — with librosa.stft
        framing (periodic hann n_fft, center=True, ZERO padding). The torch
        replication below reproduces librosa.stft exactly for these settings
        (win_length == n_fft, pad_mode='constant')."""
        import torch

        def ref_lsd(bg, ev, n_fft=1024, hop=160, eps=1e-10):
            ev = np.nan_to_num(ev, nan=0.0, posinf=1.0, neginf=-1.0)
            win = torch.hann_window(n_fft, periodic=True, dtype=torch.float64)

            def mag(x):
                s = torch.stft(torch.as_tensor(x, dtype=torch.float64),
                               n_fft=n_fft, hop_length=hop, window=win,
                               center=True, pad_mode="constant",
                               return_complex=True)
                return torch.abs(s).numpy()

            lb, le = np.log10(mag(bg) + eps), np.log10(mag(ev) + eps)
            per_frame = np.sqrt(np.mean((lb - le) ** 2, axis=0))
            return float(per_frame.mean())

        rng = np.random.default_rng(3)
        bg = (0.4 * _tone(440) + 0.05 *
              rng.standard_normal(16000)).astype(np.float32)
        ev = (0.4 * _tone(523) + 0.05 *
              rng.standard_normal(16000)).astype(np.float32)
        ours = LogSpectralDistance().score([bg], [ev])
        theirs = ref_lsd(bg, ev)
        assert ours == pytest.approx(theirs, abs=1e-6)

    def test_lsd_sanitizes_eval_waveform(self):
        """NaN/Inf in the eval clip must be sanitized like the reference
        (lsd.py:22 nan_to_num on the waveform)."""
        bg = _tone(440)
        ev = _tone(440).copy()
        ev[10] = np.nan
        ev[20] = np.inf
        s = LogSpectralDistance().score([bg], [ev])
        assert np.isfinite(s)

    def test_kl_identical_zero(self):
        x = [_tone(440)]
        assert KullbackLeiblerDivergence().score(x, x) == pytest.approx(0.0,
                                                                        abs=1e-8)

    def test_kl_nonnegative(self, rng):
        a = [_tone(300)]
        b = [rng.standard_normal(16000).astype(np.float32)]
        assert KullbackLeiblerDivergence().score(a, b) >= 0

    def test_kl_reference_formula_parity(self):
        """Exact parity with the reference formula (diffmusic/metrics/kl.py:
        100-110): per-clip (frames, D) embeddings concatenated over frames
        (get_embeddings, kl.py:98), per-FRAME softmax, then
        kl_div((p+eps).log(), q+eps, reduction='sum') / n_eval_frames with
        p = eval, q = background, eps = 1e-6 — NOT a per-clip mean-pooled
        variant. Torch replication at 1e-6."""
        import torch
        import torch.nn.functional as F

        emb = MFCCStackEmbedding()
        rng = np.random.default_rng(7)
        clips_bg = [(0.4 * _tone(300, 32000)
                     + 0.02 * rng.standard_normal(32000)).astype(np.float32),
                    _tone(520, 48000)]
        clips_ev = [(0.4 * _tone(330, 32000)
                     + 0.02 * rng.standard_normal(32000)).astype(np.float32),
                    _tone(620, 48000)]

        def ref_kl(bg_clips, ev_clips, eps=1e-6):
            e_bg = np.concatenate([emb(c) for c in bg_clips], axis=0)
            e_ev = np.concatenate([emb(c) for c in ev_clips], axis=0)
            p = torch.tensor(e_ev, dtype=torch.float32).softmax(dim=-1)
            q = torch.tensor(e_bg, dtype=torch.float32).softmax(dim=-1)
            return float(F.kl_div((p + eps).log(), (q + eps),
                                  reduction="sum") / len(p))

        ours = KullbackLeiblerDivergence(embed_fn=emb).score(clips_bg,
                                                             clips_ev)
        theirs = ref_kl(clips_bg, clips_ev)
        assert ours == pytest.approx(theirs, abs=1e-6)

    def test_kl_frame_count_mismatch_raises(self):
        # torch.kl_div errors on non-broadcastable frame counts; we fail with
        # a clearer message rather than silently truncating
        with pytest.raises(ValueError, match="frame counts differ"):
            KullbackLeiblerDivergence().score([_tone(300, 16000)],
                                              [_tone(300, 64000)])

    def test_kl_empty_dir_sentinel(self):
        # reference returns -1 for an empty directory (kl.py:156-161)
        assert KullbackLeiblerDivergence().score([], [_tone(440)]) == -1.0
