"""Golden-score regression gate, mirroring fadtk's only real test suite
(fadtk/test/__main__.py:84-94): recompute metric scores on fixed synthetic
fixtures and require max-abs-diff < 5% of the golden mean.

The reference's fixtures are 24 .opus clips scored against fma_pop stats (the
stats file was stripped from the mirror); here the fixtures are deterministic
synthetic clips generated from fixed seeds, and the goldens live in
tests/golden_scores.json (regenerate with `python tests/test_golden_regression.py
--regen` after an intentional metric change).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # scan-compiling / multi-minute: excluded from the fast tier

GOLDEN_PATH = Path(__file__).parent / "golden_scores.json"
TOLERANCE = 0.05  # fadtk/test/__main__.py:93


def _fixture_sets():
    rng = np.random.default_rng(1234)
    sr = 16000

    def clip(freqs, noise, seed_shift=0):
        t = np.arange(sr * 2) / sr
        w = sum(0.2 * np.sin(2 * np.pi * f * t) for f in freqs)
        w = w + noise * np.random.default_rng(seed_shift).standard_normal(len(t))
        return w.astype(np.float32)

    gt = [clip((220, 440), 0.01, i) for i in range(4)]
    recon = [clip((225, 445), 0.02, 100 + i) for i in range(4)]
    return gt, recon


def compute_scores():
    from diffmusic_tpu.metrics import (FrechetAudioDistance,
                                       KullbackLeiblerDivergence,
                                       LogSpectralDistance, MeanSquaredError)
    gt, recon = _fixture_sets()
    return {
        "fad_mfcc_stack": FrechetAudioDistance().score(gt, recon),
        "kl": KullbackLeiblerDivergence().score(gt, recon),
        "lsd": LogSpectralDistance().score(gt, recon),
        "mse": MeanSquaredError().score(gt, recon),
    }


class TestGoldenScores:
    def test_scores_within_5pct_of_golden(self):
        assert GOLDEN_PATH.exists(), (
            "golden_scores.json missing; regenerate with "
            "`python tests/test_golden_regression.py --regen`")
        golden = json.loads(GOLDEN_PATH.read_text())
        scores = compute_scores()
        # golden_scores.json also carries goldens owned by other suites (the
        # opus-fixture gate in test_codecs.py) — check only the keys computed
        # here, and require each to have a frozen golden
        for k, got in scores.items():
            assert k in golden, f"{k} missing from golden_scores.json"
            want = golden[k]
            tol = TOLERANCE * abs(want) if want != 0 else 1e-6
            assert abs(got - want) < tol, (
                f"{k}: got {got}, golden {want} (tol {tol})")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        # merge: golden_scores.json also carries goldens owned by other
        # suites (the opus-fixture gate in test_codecs.py) — keep them
        merged = json.loads(GOLDEN_PATH.read_text()) if GOLDEN_PATH.exists() \
            else {}
        merged.update(compute_scores())
        GOLDEN_PATH.write_text(json.dumps(merged, indent=2, sort_keys=True))
        print(f"wrote {GOLDEN_PATH}")
