"""KL divergence between softmax-ed audio embeddings.

Reference: diffmusic/metrics/kl.py:100-110 — per-clip softmax over embedding
features, then sum kl_div(log_softmax(eval), softmax(background)) / N.
"""

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import numpy as np


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


@dataclass
class KullbackLeiblerDivergence:
    embed_fn: Optional[Callable] = None

    def __post_init__(self):
        if self.embed_fn is None:
            from .embeddings import MFCCStackEmbedding
            self.embed_fn = MFCCStackEmbedding()

    def score(self, background: Sequence[np.ndarray],
              eval_set: Sequence[np.ndarray]) -> float:
        total = 0.0
        n = min(len(background), len(eval_set))
        for bg, ev in zip(background[:n], eval_set[:n]):
            p = _softmax(self.embed_fn(np.asarray(bg).reshape(-1)).mean(0))
            q = _softmax(self.embed_fn(np.asarray(ev).reshape(-1)).mean(0))
            total += float(np.sum(p * (np.log(p + 1e-12) - np.log(q + 1e-12))))
        return total / max(n, 1)
