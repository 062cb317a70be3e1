"""Stats-bundle packager CLI (reference: fadtk/package.py:29-42): compute
mu/Sigma for a directory of audio under one or more embedding models and write
them as .npz bundles usable as FAD baselines.

  python -m diffmusic_tpu.fadtk.package -m MODEL [MODEL...] -d DIR -o OUTDIR
"""

import argparse
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser(prog="diffmusic_tpu.fadtk.package")
    p.add_argument("-m", "--models", nargs="+", required=True)
    p.add_argument("-d", "--dir", required=True,
                   help="directory of baseline .wav files")
    p.add_argument("-o", "--out", required=True, help="output directory for .npz")
    p.add_argument("-w", "--workers", type=int, default=1)
    p.add_argument("--checkpoint_dir", default=None)
    args = p.parse_args()

    from .fad_batch import cache_embedding_files
    from .utils import stats_from_npy_dir

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    for model in args.models:
        cache_embedding_files(args.dir, model, workers=args.workers,
                              checkpoint_dir=args.checkpoint_dir)
        emb_dir = Path(args.dir) / "embeddings" / model
        mu, cov = stats_from_npy_dir(emb_dir)
        out = out_dir / f"{model}.npz"
        np.savez(out, mu=mu, cov=cov)
        print(f"{model}: stats bundle -> {out}")


if __name__ == "__main__":
    main()
