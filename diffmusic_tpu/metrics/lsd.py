"""Log-spectral distance (reference: diffmusic/metrics/lsd.py:17-40)."""

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.stft import spectrogram


@dataclass
class LogSpectralDistance:
    n_fft: int = 1024
    hop_length: int = 160
    win_length: int = 1024

    def _log_spec(self, wav: np.ndarray) -> np.ndarray:
        mag = spectrogram(jnp.asarray(np.asarray(wav, np.float32).reshape(1, -1)),
                          self.n_fft, self.hop_length, self.win_length,
                          power=1.0, use_hann=True)
        return np.log10(np.asarray(mag)[0] ** 2 + 1e-10)

    def score(self, background: Sequence[np.ndarray],
              eval_set: Sequence[np.ndarray]) -> float:
        total, n = 0.0, min(len(background), len(eval_set))
        for bg, ev in zip(background[:n], eval_set[:n]):
            m = min(np.size(bg), np.size(ev))
            a = self._log_spec(np.asarray(bg).reshape(-1)[:m])
            b = self._log_spec(np.asarray(ev).reshape(-1)[:m])
            # RMSE over frequency, mean over frames
            d = np.sqrt(np.mean((a - b) ** 2, axis=0))
            total += float(np.nan_to_num(d.mean()))
        return total / max(n, 1)
