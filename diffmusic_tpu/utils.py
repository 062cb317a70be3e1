"""Host-side audio utilities (reference: diffmusic/utils.py).

waveform_to_spectrogram lives in ops.stft (magphase_spectrogram); this module
carries the threaded multi-file loader used by eval (utils.py:45-75).
"""

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from .data import read_wav
from .ops.resample import resample
from .ops.stft import magphase_spectrogram as waveform_to_spectrogram  # noqa: F401


def load_audio_task(fname, sample_rate: int, channels: int = 1):
    wav, sr = read_wav(fname)
    wav = wav.mean(axis=0) if channels == 1 else wav
    if sr != sample_rate:
        wav = np.asarray(resample(np.atleast_2d(wav), sr, sample_rate))
        wav = wav[0] if channels == 1 else wav
    return wav.astype(np.float32)


def load_audio_files(directory, sample_rate: int = 16000,
                     max_workers: int = 8) -> Tuple[List[np.ndarray], List[str]]:
    """Threaded directory loader (reference utils.py:55-73 uses a thread pool the
    same way; decoding is host I/O so threads, not devices, are the right tool)."""
    files = sorted(Path(directory).glob("*.wav"))
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        waves = list(pool.map(lambda f: load_audio_task(f, sample_rate), files))
    return waves, [f.name for f in files]
