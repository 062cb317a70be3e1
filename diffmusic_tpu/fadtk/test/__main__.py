"""Golden-score regression gate CLI (reference: fadtk/test/__main__.py:12-104).

The reference recomputes per-song FAD scores on 24 .opus fixtures against
fma_pop stats and exits 2 when any model's max-abs-diff exceeds 5% of the mean
(its stats file was stripped from the mirror, so it cannot actually run there).
This gate is runnable: deterministic synthetic fixtures, scores pinned in
goldens.json next to this file.

  python -m diffmusic_tpu.fadtk.test [--regen]

Exit codes: 0 pass, 2 regression (same contract as the reference).
"""

import json
import sys
from pathlib import Path

import numpy as np

TOLERANCE = 0.05  # fadtk/test/__main__.py:93
GOLDEN = Path(__file__).parent / "goldens.json"


def _fixtures(tmp: Path):
    from ...data import write_wav
    sr = 16000
    base, ev = tmp / "baseline", tmp / "eval"
    base.mkdir(parents=True, exist_ok=True)
    ev.mkdir(parents=True, exist_ok=True)
    for d, freqs, seed in ((base, (220, 330, 440), 10), (ev, (233, 349, 466), 20)):
        for i, f0 in enumerate(freqs):
            t = np.arange(sr * 2) / sr
            w = (0.3 * np.sin(2 * np.pi * f0 * t)
                 + 0.1 * np.sin(2 * np.pi * 2 * f0 * t)
                 + 0.02 * np.random.default_rng(seed + i).standard_normal(len(t)))
            write_wav(d / f"clip{i}.wav", w.astype(np.float32)[None], sr)
    return base, ev


def compute_scores(tmp: Path) -> dict:
    from ..engine import FADEngine
    base, ev = _fixtures(tmp)
    engine = FADEngine(model_name="mfcc-stack")
    return {
        "fad": float(engine.score(base, ev)),
        "fad_inf": float(engine.score_inf(base, ev, steps=5)[0]),
    }


def main() -> int:
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        scores = compute_scores(Path(tmp))
    if "--regen" in sys.argv:
        GOLDEN.write_text(json.dumps(scores, indent=2))
        print(f"wrote {GOLDEN}: {scores}")
        return 0
    if not GOLDEN.exists():
        print("goldens.json missing; run with --regen first", file=sys.stderr)
        return 2
    golden = json.loads(GOLDEN.read_text())
    failed = False
    for k, want in golden.items():
        got = scores[k]
        tol = TOLERANCE * abs(want) if want else 1e-6
        status = "OK" if abs(got - want) < tol else "FAIL"
        failed |= status == "FAIL"
        print(f"{k}: got {got:.6f}, golden {want:.6f} [tol {tol:.6f}] {status}")
    return 2 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
