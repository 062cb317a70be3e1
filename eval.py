"""Evaluation CLI — drop-in surface of the reference's eval.py (eval.py:16-33):
`python eval.py -gt DIR -r DIR` computes FAD / KL / LSD / MSE between a
ground-truth directory and a reconstruction directory, with fadtk-style embedding
caching, and prints a score table (reference eval.py:150-163)."""

from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def parse_arguments():
    p = ArgumentParser()
    p.add_argument("-gt", "--ground_truth_dir", type=str, required=True)
    p.add_argument("-r", "--recon_dir", type=str, required=True)
    p.add_argument("--embedding", type=str, nargs="+", default=["mfcc-stack"],
                   help="embedding model(s) for FAD/KL — the reference loops "
                        "clap-laion-audio/music, vggish, w2v2-base "
                        "(eval.py:56-66); offline default: mfcc-stack")
    p.add_argument("--fad_inf", action="store_true",
                   help="also compute FAD-inf extrapolation")
    p.add_argument("--individual", type=str, default=None,
                   help="write per-song FAD CSV to this path")
    p.add_argument("--mesh", type=str, default=None,
                   help="device mesh spec e.g. 'dp=8': shards embedding "
                        "batches over the chips jax.devices() sees "
                        "(batch-capable embedders only)")
    return p.parse_args()


def load_dir(d):
    # threaded loader with mono downmix AND 16 kHz resampling (the reference
    # resamples via resampy in its eval loader, diffmusic/utils.py:45-75 —
    # stable_audio recons are stereo 44.1 kHz and must not be embedded at the
    # wrong rate)
    from diffmusic_tpu.utils import load_audio_files
    waves, _names = load_audio_files(d, sample_rate=16000)
    return waves


def main():
    args = parse_arguments()
    from diffmusic_tpu.fadtk import FADEngine
    from diffmusic_tpu.metrics import (FrechetAudioDistance,
                                       KullbackLeiblerDivergence,
                                       LogSpectralDistance, MeanSquaredError,
                                       get_embedding_model)

    gt = load_dir(args.ground_truth_dir)
    recon = load_dir(args.recon_dir)
    if not gt or not recon:
        raise SystemExit("no .wav files found in one of the directories")

    mesh = None
    if args.mesh:
        from run import parse_mesh
        mesh = parse_mesh(args.mesh)

    if args.embedding == ["mfcc-stack"]:
        print("note: FAD/KL below use the offline 'mfcc-stack' embedder — "
              "values are NOT comparable to the reference's vggish/CLAP "
              "tables (eval.py:56-66). Pass --embedding vggish w2v2-base ... "
              "with DIFFMUSIC_TPU_CHECKPOINTS set for reference-comparable "
              "numbers.")

    scores = {}
    first_model = None
    for name in args.embedding:  # per-model FAD loop (reference eval.py:56-73)
        from diffmusic_tpu.fadtk import get_model
        model = get_model(name) if name != "mfcc-stack" \
            else get_embedding_model(name)
        first_model = first_model or model
        engine = FADEngine(model=model, mesh=mesh)
        scores[f"FAD ({name})"] = engine.score(args.ground_truth_dir,
                                               args.recon_dir)
        if args.fad_inf:
            fad_inf, slope = engine.score_inf(args.ground_truth_dir,
                                              args.recon_dir)
            scores[f"FAD-inf ({name})"] = fad_inf
        if args.individual:
            engine.score_individual(args.ground_truth_dir, args.recon_dir,
                                    args.individual)

    scores["KL"] = KullbackLeiblerDivergence(embed_fn=first_model).score(gt, recon)
    scores["LSD"] = LogSpectralDistance().score(gt, recon)
    scores["MSE"] = MeanSquaredError().score(gt, recon)

    width = max(len(k) for k in scores)
    print("=" * (width + 20))
    for k, v in scores.items():
        print(f"| {k:<{width}} : {v:.6f}")
    print("=" * (width + 20))
    return scores


if __name__ == "__main__":
    main()
