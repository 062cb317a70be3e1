"""Audio embedding models for FAD/KL evaluation.

The reference pulls VGGish from torch.hub (diffmusic/metrics/fad.py:59) and a zoo
of HF models via fadtk (fadtk/model_loader.py). This environment has zero egress,
so the default embedder is deterministic and training-free (MFCC statistics over
VGGish-style ~1 s frames — standard audio features, reproducible everywhere), and
real embedders (VGGish/CLAP) plug in through the same interface when local
checkpoints are available.

Interface: model(waveform_16k: (n,) float32) -> (num_frames, dim) embeddings.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import mel_filterbank
from ..ops.stft import spectrogram


def _dct_matrix(n_filters: int, n_coeffs: int) -> np.ndarray:
    """Orthonormal type-II DCT matrix (n_filters, n_coeffs)."""
    n = np.arange(n_filters)[:, None]
    k = np.arange(n_coeffs)[None, :]
    m = np.cos(np.pi / n_filters * (n + 0.5) * k)
    m *= np.sqrt(2.0 / n_filters)
    m[:, 0] *= np.sqrt(0.5)
    return m.astype(np.float32)


@dataclass(frozen=True)
class MFCCStackEmbedding:
    """Deterministic embedding: per ~0.96 s window, mean/std of 40 MFCCs and their
    deltas -> 160-d vector (VGGish-like framing: 16 kHz, 25 ms/10 ms frames,
    96-frame windows)."""
    sample_rate: int = 16000
    n_mels: int = 64
    n_mfcc: int = 40
    window_frames: int = 96
    hop_frames: int = 48
    name: str = "mfcc-stack"

    @property
    def dim(self) -> int:
        return 4 * self.n_mfcc

    def _embed_jax(self, x: jax.Array) -> jax.Array:
        """(B, L) waveforms -> (B, windows, 4*n_mfcc). Pure jax (jit/dp-able)."""
        spec = spectrogram(x, n_fft=400, hop_length=160, win_length=400,
                           power=2.0, use_hann=True)  # (B, 201, T)
        fb = jnp.asarray(mel_filterbank(201, self.n_mels, self.sample_rate,
                                        f_min=125.0, f_max=7500.0))
        mel = jnp.einsum("bft,fm->bmt", spec, fb)
        logmel = jnp.swapaxes(jnp.log(mel + 1e-6), 1, 2)  # (B, T, n_mels)
        dct = jnp.asarray(_dct_matrix(self.n_mels, self.n_mfcc))
        mfcc = logmel @ dct  # (B, T, n_mfcc)

        T = mfcc.shape[1]
        if T < self.window_frames:
            mfcc = jnp.pad(mfcc, ((0, 0), (0, self.window_frames - T), (0, 0)))
            T = self.window_frames
        frames = []
        for start in range(0, T - self.window_frames + 1, self.hop_frames):
            w = mfcc[:, start:start + self.window_frames]
            d = jnp.diff(w, axis=1)
            frames.append(jnp.concatenate([
                w.mean(1), w.std(1), d.mean(1), d.std(1)], axis=-1))
        return jnp.stack(frames, axis=1)

    def batch_embed(self, wavs: np.ndarray, mesh=None) -> np.ndarray:
        """Embed a (B, L) batch of equal-length waveforms in one jitted
        program; with a mesh, the batch axis shards over 'dp'
        (parallel/mesh.py::data_parallel_map — the TPU-native replacement for
        the reference fadtk's multiprocessing fan-out, fad_batch.py:46-48)."""
        wavs = np.asarray(wavs, np.float32)
        if mesh is not None:
            from ..parallel.mesh import data_parallel_map
            fn = data_parallel_map(self._embed_jax, mesh)
        else:
            fn = jax.jit(self._embed_jax)
        return np.asarray(fn(jnp.asarray(wavs)), np.float32)

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav, np.float32).reshape(-1)
        return self.batch_embed(wav[None])[0]


def get_embedding_model(name: str = "mfcc-stack", checkpoint_dir=None):
    """Pluggable registry. 'mfcc-stack' is the egress-free default; 'vggish'
    (the reference's FAD/KL embedder, metrics/fad.py:59) runs natively from a
    local torchvggish state dict; other zoo names route through
    fadtk.get_model and their checkpoint gates."""
    if name == "mfcc-stack":
        return MFCCStackEmbedding()
    if name == "vggish":
        from ..fadtk.model_loader import VGGishModel
        m = VGGishModel(checkpoint_dir=checkpoint_dir)
        m.load_model()

        def embed(wav: np.ndarray) -> np.ndarray:
            return m.get_embedding(np.asarray(wav, np.float32).reshape(-1))

        embed.name = "vggish"
        embed.dim = m.num_features
        return embed
    from ..fadtk.model_loader import get_model
    m = get_model(name, checkpoint_dir=checkpoint_dir)
    m.load_model()

    def embed(wav: np.ndarray) -> np.ndarray:
        return m.get_embedding(np.asarray(wav, np.float32).reshape(-1))

    embed.name = name
    embed.dim = m.num_features
    return embed
