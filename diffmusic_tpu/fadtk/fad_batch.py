"""Batch embedding cache with a multiprocessing spawn pool.

Reference: fadtk/fad_batch.py:25-48 — files are split across spawn workers, each
instantiating the model and writing per-file .npy caches. Same semantics here;
workers=1 short-circuits to the in-process loop (the jax-based default embedder
is already batched compute, so processes only pay off for the torch-backed zoo
models with real per-file decode cost).
"""

import multiprocessing
from pathlib import Path
from typing import Sequence, Union

from .engine import cache_path


def _worker(args) -> int:
    model_name, checkpoint_dir, files = args
    # embedding extraction is host-side batch work: pin spawned workers to the
    # CPU backend so they neither contend for the TPU with the diffusion loop
    # nor produce device-dependent numerics vs in-process runs (set
    # DIFFMUSIC_TPU_EMBED_DEVICE=tpu to override)
    import os
    if os.environ.get("DIFFMUSIC_TPU_EMBED_DEVICE", "cpu") == "cpu":
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized; keep whatever it is
    from .model_loader import get_model
    import numpy as np
    model = get_model(model_name, checkpoint_dir)
    new = 0
    for f in files:
        out = cache_path(Path(f), model.name)
        if out.exists():
            continue
        out.parent.mkdir(parents=True, exist_ok=True)
        emb = model.get_embedding(model.load_wav(f))
        np.save(out, emb)
        new += 1
    return new


def cache_embedding_files(files: Union[str, Path, Sequence],
                          model_name: str = "mfcc-stack",
                          workers: int = 1, checkpoint_dir=None) -> int:
    """Embed every file (or every .wav under a directory), caching
    <dir>/embeddings/<model>/<stem>.npy. Returns the number newly embedded.
    Idempotent (reference fad.py:193-200)."""
    if isinstance(files, (str, Path)):
        from .engine import _audio_files
        files = _audio_files(files)
    files = [Path(f) for f in files]
    files = [f for f in files if not cache_path(f, model_name).exists()]
    if not files:
        return 0
    if workers <= 1 or len(files) == 1:
        return _worker((model_name, checkpoint_dir, files))
    chunks = [files[i::workers] for i in range(workers)]
    chunks = [c for c in chunks if c]
    ctx = multiprocessing.get_context("spawn")  # fad_batch.py:46-48
    with ctx.Pool(len(chunks)) as pool:
        counts = pool.map(_worker, [(model_name, checkpoint_dir, c)
                                    for c in chunks])
    return sum(counts)
