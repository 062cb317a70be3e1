"""Native VGGish embedding model (AudioSet) — preprocessing, flax network,
PCA postprocessor, and a torchvggish state-dict converter.

The reference's primary FAD/KL embedder is VGGish pulled via
`torch.hub.load("harritaylor/torchvggish")` (reference
diffmusic/metrics/fad.py:59, metrics/kl.py; fadtk/model_loader.py:89-108).
This image has no hub egress, so the architecture is implemented here from
the published AudioSet VGGish specification (Hershey et al., "CNN
Architectures for Large-Scale Audio Classification", ICASSP 2017; the
tensorflow/models vggish reference parameters), loading a plain torchvggish
`state_dict` from a local checkpoint directory. The network is four
conv/pool stages (64-128-256x2-512x2, all 3x3 'same' + ReLU, 2x2 max-pool)
over (96, 64) log-mel examples, then a 4096-4096-128 ReLU MLP on the
NHWC-flattened (6, 4, 512) feature map.

Preprocessing (AudioSet vggish_params):
  16 kHz mono -> |rFFT-512| magnitude spectrogram with 400-sample Hann
  window, 160 hop -> 64 HTK-mel bands over 125-7500 Hz (DC bin zeroed) ->
  log(mel + 0.01) -> non-overlapping 96-frame examples (0.96 s).

Postprocessing (torchvggish Postprocessor): PCA whitening with the AudioSet
eigenvectors/means, clip to [-2, 2], 8-bit quantize to 0..255 (kept as
float32, matching what the reference's FAD statistics are computed on).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
STFT_WINDOW = 400        # 25 ms
STFT_HOP = 160           # 10 ms
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
EXAMPLE_FRAMES = 96      # 0.96 s windows, hop == window (non-overlapping)
EMBEDDING_DIM = 128

_CONV_CHANNELS = (64, 128, 256, 256, 512, 512)
_POOL_AFTER = (True, True, False, True, False, True)  # 2x2 max-pool


def _hz_to_mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_weight_matrix() -> np.ndarray:
    """(257, 64) spectrogram-bin -> HTK-mel-band weights, DC row zeroed."""
    nfft = 512
    spec_hz = np.linspace(0.0, SAMPLE_RATE / 2.0, nfft // 2 + 1)
    spec_mel = _hz_to_mel(spec_hz)
    edges = np.linspace(_hz_to_mel(MEL_MIN_HZ), _hz_to_mel(MEL_MAX_HZ),
                        NUM_MEL_BINS + 2)
    lower, center, upper = edges[:-2], edges[1:-1], edges[2:]
    lo = (spec_mel[:, None] - lower[None, :]) / (center - lower)[None, :]
    hi = (upper[None, :] - spec_mel[:, None]) / (upper - center)[None, :]
    w = np.maximum(0.0, np.minimum(lo, hi))
    w[0, :] = 0.0  # HTK excludes the DC bin
    return w.astype(np.float32)


def log_mel_examples(audio: np.ndarray) -> np.ndarray:
    """16 kHz waveform -> (num_examples, 96, 64) float32 log-mel examples."""
    x = np.asarray(audio, np.float32).reshape(-1)
    if len(x) < STFT_WINDOW:
        return np.zeros((0, EXAMPLE_FRAMES, NUM_MEL_BINS), np.float32)
    n_frames = 1 + (len(x) - STFT_WINDOW) // STFT_HOP
    idx = (np.arange(STFT_WINDOW)[None, :]
           + STFT_HOP * np.arange(n_frames)[:, None])
    frames = x[idx] * np.hanning(STFT_WINDOW).astype(np.float32)[None, :]
    mag = np.abs(np.fft.rfft(frames, n=512, axis=-1)).astype(np.float32)
    logmel = np.log(mag @ mel_weight_matrix() + LOG_OFFSET)
    n_ex = n_frames // EXAMPLE_FRAMES
    if n_ex == 0:
        return np.zeros((0, EXAMPLE_FRAMES, NUM_MEL_BINS), np.float32)
    return logmel[:n_ex * EXAMPLE_FRAMES].reshape(n_ex, EXAMPLE_FRAMES,
                                                  NUM_MEL_BINS)


class VGGish(nn.Module):
    """Feature CNN + embedding MLP. Input (N, 96, 64, 1) NHWC; output
    (N, 128) pre-postprocessing embeddings (fp32)."""

    @nn.compact
    def __call__(self, x):
        for i, (ch, pool) in enumerate(zip(_CONV_CHANNELS, _POOL_AFTER)):
            x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv_{i}")(x)
            x = nn.relu(x)
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # (N, 6, 4, 512) NHWC flatten == torchvggish's transpose-then-view
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(4096, name="fc_0")(x))
        x = nn.relu(nn.Dense(4096, name="fc_1")(x))
        x = nn.relu(nn.Dense(EMBEDDING_DIM, name="fc_2")(x))
        return x


# torchvggish Sequential indices of the six convs and three linears
_TORCH_CONV_IDX = (0, 3, 6, 8, 11, 13)
_TORCH_FC_IDX = (0, 2, 4)


@dataclasses.dataclass
class VGGishPCA:
    eigen_vectors: np.ndarray  # (128, 128)
    means: np.ndarray          # (128,)

    def __call__(self, emb: np.ndarray) -> np.ndarray:
        """PCA -> clip [-2, 2] -> 8-bit quantize (kept float32), matching
        torchvggish's Postprocessor semantics."""
        y = (np.asarray(emb, np.float32) - self.means[None, :]) \
            @ self.eigen_vectors.T
        y = np.clip(y, -2.0, 2.0)
        return np.round((y + 2.0) * (255.0 / 4.0)).astype(np.float32)


def convert_torchvggish_state_dict(sd):
    """torchvggish `state_dict()` (torch tensors or numpy arrays) -> (flax
    params, VGGishPCA | None). Conv weights OIHW -> HWIO; linear weights
    transposed. PCA buffers live under 'pproc.' in the hub module."""
    def arr(v):
        return np.asarray(getattr(v, "numpy", lambda: v)()
                          if hasattr(v, "numpy") else v, np.float32)

    p = {}
    for i, ti in enumerate(_TORCH_CONV_IDX):
        w = arr(sd[f"features.{ti}.weight"])  # (O, I, kh, kw)
        p[f"conv_{i}"] = {"kernel": w.transpose(2, 3, 1, 0),
                          "bias": arr(sd[f"features.{ti}.bias"])}
    for i, ti in enumerate(_TORCH_FC_IDX):
        w = arr(sd[f"embeddings.{ti}.weight"])  # (out, in)
        p[f"fc_{i}"] = {"kernel": w.T,
                        "bias": arr(sd[f"embeddings.{ti}.bias"])}
    pca = None
    for prefix in ("pproc.", ""):
        if f"{prefix}pca_eigen_vectors" in sd:
            pca = VGGishPCA(
                eigen_vectors=arr(sd[f"{prefix}pca_eigen_vectors"]),
                means=arr(sd[f"{prefix}pca_means"]).reshape(-1))
            break
    return {"params": p}, pca


def load_vggish(path):
    """Load a plain torchvggish state dict (.pth via torch, or .npz) from
    `path` and return (apply_fn(examples)->(N,128), pca | None)."""
    if str(path).endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
    params, pca = convert_torchvggish_state_dict(sd)
    model = VGGish()

    @jax.jit
    def apply(examples):
        return model.apply(params, examples)

    return apply, pca


def vggish_embedding(apply_fn, pca, audio) -> np.ndarray:
    """Waveform (16 kHz) -> (num_examples, 128) float32 embeddings, PCA+
    quantize applied when `pca` is present (the reference computes FAD/KL
    statistics on the postprocessed embeddings)."""
    ex = log_mel_examples(audio)
    if ex.shape[0] == 0:
        return np.zeros((0, EMBEDDING_DIM), np.float32)
    emb = np.asarray(apply_fn(jnp.asarray(ex[..., None])), np.float32)
    return pca(emb) if pca is not None else emb
