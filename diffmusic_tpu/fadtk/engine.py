"""fadtk-equivalent FAD engine: per-file embedding caches, mu/Sigma stats bundles,
score / score_inf / score_individual.

Reference: fadtk/fad.py (cache layout fadtk/utils.py:60-68; FAD-inf extrapolation
fad.py:303-350; per-song scores fad.py:352-394). The reference fans embedding work
across a multiprocessing spawn pool (fadtk/fad_batch.py:25-48); embeddings here are
already batched JAX/numpy computations, so the fan-out is a plain loop with
file-level .npy idempotency — the same resume semantics without process overhead.
"""

import csv
from pathlib import Path
from typing import Callable, Optional, Sequence

import numpy as np

from ..data import read_audio
from ..metrics.embeddings import get_embedding_model
from ..metrics.frechet import frechet_distance, _stats
from ..ops.resample import resample

# formats the engine scores directly (fadtk accepts wav and — through its
# ffmpeg fallback, fad.py:160-183 — compressed audio; decode here is native,
# data/codecs.py)
AUDIO_EXTENSIONS = (".wav", ".mp3", ".opus", ".ogg")


def _audio_files(directory: Path):
    return sorted(p for p in Path(directory).iterdir()
                  if p.suffix.lower() in AUDIO_EXTENSIONS)


def cache_path(audio_path: Path, model_name: str) -> Path:
    """fadtk cache convention: <dir>/embeddings/<model>/<stem>.npy
    (fadtk/utils.py:60-68)."""
    audio_path = Path(audio_path)
    return audio_path.parent / "embeddings" / model_name / (audio_path.stem + ".npy")


def _load_16k(path) -> np.ndarray:
    wav, sr = read_audio(path)
    wav = wav.mean(axis=0)
    if sr != 16000:
        wav = np.asarray(resample(wav[None], sr, 16000))[0]
    return wav.astype(np.float32)


def cache_embedding_files(directory, model, workers: int = 1,
                          mesh=None) -> int:
    """Embed every .wav in `directory`, caching <dir>/embeddings/<model>/*.npy.
    Returns number of files newly embedded. Idempotent like fadtk
    (fad.py:193-200). For process-pool fan-out use fad_batch.cache_embedding_files
    (reference fadtk/fad_batch.py:25-48).

    With a mesh and a batch-capable model (batch_embed), equal-length files
    are embedded as one dp-sharded program over the mesh — the TPU-native
    replacement for the reference's multiprocessing fan-out."""
    directory = Path(directory)
    load = getattr(model, "load_wav", _load_16k)
    todo = [f for f in _audio_files(directory)
            if not cache_path(f, model.name).exists()]
    if not todo:
        return 0
    # load the model before decoding: load_wav resamples to model.sr, which
    # must not be observed before a lazy load_model had a chance to refine it
    if hasattr(model, "loaded") and not model.loaded:
        model.load_model()
        model.loaded = True
    for f in todo:
        cache_path(f, model.name).parent.mkdir(parents=True, exist_ok=True)

    if mesh is not None and hasattr(model, "batch_embed"):
        by_len: dict = {}
        wavs = {f: load(f) for f in todo}
        for f, w in wavs.items():
            by_len.setdefault(len(w), []).append(f)
        dp = mesh.shape.get("dp", 1)
        for files in by_len.values():
            batch = np.stack([wavs[f] for f in files])
            pad = (-len(files)) % dp  # dp-sharding needs a divisible batch
            if pad:
                batch = batch[np.arange(len(files) + pad) % len(files)]
            embs = model.batch_embed(batch, mesh=mesh)
            for f, e in zip(files, embs):
                np.save(cache_path(f, model.name), e)
        return len(todo)

    for f in todo:
        np.save(cache_path(f, model.name), model(load(f)))
    return len(todo)


class FADEngine:
    def __init__(self, model=None, model_name: str = "mfcc-stack",
                 checkpoint_dir=None, mesh=None):
        if model is None:
            if model_name == "mfcc-stack":
                model = get_embedding_model(model_name)
            else:
                from .model_loader import get_model
                model = get_model(model_name, checkpoint_dir)
        self.model = model
        self.mesh = mesh

    def _dir_embeddings(self, directory) -> np.ndarray:
        directory = Path(directory)
        cache_embedding_files(directory, self.model, mesh=self.mesh)
        embs = [np.load(p) for p in sorted(
            (directory / "embeddings" / self.model.name).glob("*.npy"))]
        if not embs:
            raise FileNotFoundError(f"no .wav embeddings under {directory}")
        return np.concatenate(embs, axis=0)

    def stats(self, directory):
        return _stats(self._dir_embeddings(directory))

    def save_stats(self, directory, out_npz):
        mu, cov = self.stats(directory)
        np.savez(out_npz, mu=mu, cov=cov)

    def score(self, baseline_dir, eval_dir) -> float:
        """FAD between two directories (fadtk/fad.py:291-301); `baseline_dir` may
        be a precomputed .npz stats bundle."""
        if str(baseline_dir).endswith(".npz"):
            z = np.load(baseline_dir)
            mu_b, cov_b = z["mu"], z["cov"]
        else:
            mu_b, cov_b = self.stats(baseline_dir)
        mu_e, cov_e = self.stats(eval_dir)
        return frechet_distance(mu_b, cov_b, mu_e, cov_e)

    def score_inf(self, baseline_dir, eval_dir, steps: int = 25,
                  min_n: int = 500) -> tuple[float, float]:
        """FAD-inf: linear extrapolation of FAD vs 1/n to n -> inf
        (fadtk/fad.py:303-350). Returns (fad_inf_intercept, slope)."""
        if str(baseline_dir).endswith(".npz"):
            z = np.load(baseline_dir)
            mu_b, cov_b = z["mu"], z["cov"]
        else:
            mu_b, cov_b = self.stats(baseline_dir)
        embs = self._dir_embeddings(eval_dir)
        total = embs.shape[0]
        min_n = min(min_n, max(2, total // 2))
        rng = np.random.default_rng(0)
        xs, ys = [], []
        for n in np.linspace(min_n, total, steps).astype(int):
            idx = rng.choice(total, size=n, replace=False)
            mu_e, cov_e = _stats(embs[idx])
            xs.append(1.0 / n)
            ys.append(frechet_distance(mu_b, cov_b, mu_e, cov_e))
        slope, intercept = np.polyfit(xs, ys, 1)
        return float(intercept), float(slope)

    def score_individual(self, baseline_dir, eval_dir, csv_out) -> Path:
        """Per-song FAD CSV (fadtk/fad.py:352-394)."""
        if str(baseline_dir).endswith(".npz"):
            z = np.load(baseline_dir)
            mu_b, cov_b = z["mu"], z["cov"]
        else:
            mu_b, cov_b = self.stats(baseline_dir)
        eval_dir = Path(eval_dir)
        cache_embedding_files(eval_dir, self.model, mesh=self.mesh)
        rows = []
        for f in sorted((eval_dir / "embeddings" / self.model.name).glob("*.npy")):
            emb = np.load(f)
            if emb.shape[0] < 2:
                emb = np.repeat(emb, 2, axis=0)
            mu_e, cov_e = _stats(emb)
            rows.append((f.stem, frechet_distance(mu_b, cov_b, mu_e, cov_e)))
        csv_out = Path(csv_out)
        with open(csv_out, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerows(rows)
        return csv_out
