"""fadtk-compatible CLI: `python -m diffmusic_tpu.fadtk MODEL BASELINE EVAL [csv]
[--inf | --indiv]` (reference surface: fadtk/__main__.py:9-74)."""

import argparse
import csv
from pathlib import Path


def main():
    p = argparse.ArgumentParser(prog="diffmusic_tpu.fadtk")
    p.add_argument("model", help="embedding model name (offline: mfcc-stack)")
    p.add_argument("baseline", help="baseline dir or .npz stats bundle")
    p.add_argument("eval", help="evaluation dir")
    p.add_argument("csv", nargs="?", default=None,
                   help="append the score to this CSV")
    p.add_argument("--inf", action="store_true", help="FAD-inf extrapolation")
    p.add_argument("--indiv", action="store_true", help="per-song FAD CSV")
    args = p.parse_args()

    from .engine import FADEngine
    engine = FADEngine(model_name=args.model)

    if args.indiv:
        out = Path(args.csv or f"fad-individual-{args.model}.csv")
        engine.score_individual(args.baseline, args.eval, out)
        print(f"individual FAD scores -> {out}")
        return

    if args.inf:
        score, slope = engine.score_inf(args.baseline, args.eval)
        label = "FAD-inf"
    else:
        score = engine.score(args.baseline, args.eval)
        label = "FAD"

    print(f"{label} ({args.model}): {score:.6f}")
    if args.csv:
        with open(args.csv, "a", newline="") as fh:
            csv.writer(fh).writerow([args.model, args.baseline, args.eval,
                                     label, score])


if __name__ == "__main__":
    main()
