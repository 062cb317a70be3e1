"""Native VGGish (metrics/vggish.py) parity and end-to-end tests.

The torch reference is hand-written here from the published AudioSet VGGish
architecture (the same layer grammar torchvggish uses: features Sequential
with convs at indices 0/3/6/8/11/13, embeddings MLP at 0/2/4, NHWC flatten
between them) — reference fadtk/model_loader.py:89-108 and
diffmusic/metrics/fad.py:59 consume it via torch.hub.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from diffmusic_tpu.metrics import vggish as V

pytestmark = pytest.mark.slow  # scan-compiling / multi-minute: excluded from the fast tier


def _torch_vggish():
    features = tnn.Sequential(
        tnn.Conv2d(1, 64, 3, padding=1), tnn.ReLU(), tnn.MaxPool2d(2, 2),
        tnn.Conv2d(64, 128, 3, padding=1), tnn.ReLU(), tnn.MaxPool2d(2, 2),
        tnn.Conv2d(128, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(), tnn.MaxPool2d(2, 2),
        tnn.Conv2d(256, 512, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(512, 512, 3, padding=1), tnn.ReLU(), tnn.MaxPool2d(2, 2),
    )
    embeddings = tnn.Sequential(
        tnn.Linear(512 * 4 * 6, 4096), tnn.ReLU(),
        tnn.Linear(4096, 4096), tnn.ReLU(),
        tnn.Linear(4096, 128), tnn.ReLU(),
    )
    return features, embeddings


def _torch_forward(features, embeddings, x_nchw):
    h = features(x_nchw)                       # (N, 512, 6, 4)
    h = h.permute(0, 2, 3, 1).contiguous()     # NHWC flatten, as torchvggish
    return embeddings(h.view(h.size(0), -1))


def _state_dict(features, embeddings, with_pca=True, seed=0):
    sd = {f"features.{k}": v for k, v in features.state_dict().items()}
    sd.update({f"embeddings.{k}": v for k, v in embeddings.state_dict().items()})
    if with_pca:
        rng = np.random.default_rng(seed)
        q, _ = np.linalg.qr(rng.standard_normal((128, 128)))
        sd["pproc.pca_eigen_vectors"] = torch.from_numpy(
            q.astype(np.float32))
        sd["pproc.pca_means"] = torch.from_numpy(
            rng.standard_normal((128, 1)).astype(np.float32))
    return sd


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    f, e = _torch_vggish()
    for p in list(f.parameters()) + list(e.parameters()):
        p.data.mul_(0.05)  # keep post-ReLU activations in a sane range
    return f.eval(), e.eval()


def test_network_parity_vs_torch(torch_model):
    f, e = torch_model
    params, pca = V.convert_torchvggish_state_dict(_state_dict(f, e))
    assert pca is not None
    x = np.random.default_rng(1).standard_normal((3, 96, 64, 1)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = _torch_forward(f, e, torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(V.VGGish().apply(params, x))
    assert got.shape == (3, 128)
    assert np.max(np.abs(ref - got)) < 1e-4


def test_preprocess_shapes_and_stft_magnitude():
    sr = V.SAMPLE_RATE
    x = np.sin(2 * np.pi * 440 * np.arange(2 * sr) / sr).astype(np.float32)
    ex = V.log_mel_examples(x)
    # 2 s @ 16 kHz: 1 + (32000-400)//160 = 198 frames -> 2 examples of 96
    assert ex.shape == (2, 96, 64)
    assert np.isfinite(ex).all()
    # frame 10's magnitudes match an explicit DFT of the same windowed frame
    # (torch.stft is NOT comparable: with win_length=400/n_fft=512 it frames
    # by n_fft and center-pads the window, shifting the frame grid by 56)
    fr = x[10 * 160:10 * 160 + 400] * np.hanning(400)
    k = np.arange(257)[:, None] * np.arange(512)[None, :]
    dft = np.exp(-2j * np.pi * k / 512.0)
    mag = np.abs(dft[:, :400] @ fr)
    logmel_ref = np.log(mag @ V.mel_weight_matrix() + V.LOG_OFFSET)
    assert np.max(np.abs(logmel_ref - ex[0, 10])) < 1e-3
    # mel triangles: every band has support; matrix is nonnegative; DC zeroed
    W = V.mel_weight_matrix()
    assert W.shape == (257, 64) and (W >= 0).all() and (W[0] == 0).all()
    assert (W.sum(axis=0) > 0).all()
    # short audio -> zero examples, correct trailing shape
    assert V.log_mel_examples(x[:100]).shape == (0, 96, 64)


def test_pca_postprocess_matches_reference_semantics():
    rng = np.random.default_rng(2)
    q, _ = np.linalg.qr(rng.standard_normal((128, 128)))
    means = rng.standard_normal(128).astype(np.float32)
    pca = V.VGGishPCA(eigen_vectors=q.astype(np.float32), means=means)
    emb = rng.standard_normal((5, 128)).astype(np.float32) * 3
    got = pca(emb)
    ref = np.round((np.clip((emb - means) @ q.T.astype(np.float32),
                            -2, 2) + 2.0) * (255.0 / 4.0))
    assert np.array_equal(got, ref)
    assert got.min() >= 0 and got.max() <= 255


def test_loader_end_to_end(tmp_path, torch_model):
    f, e = torch_model
    ck = tmp_path / "vggish"
    ck.mkdir()
    torch.save(_state_dict(f, e), ck / "vggish.pth")

    from diffmusic_tpu.fadtk.model_loader import get_model
    m = get_model("vggish", checkpoint_dir=str(tmp_path))
    wav = np.random.default_rng(3).standard_normal(2 * 16000) \
        .astype(np.float32) * 0.1
    emb = m.get_embedding(wav)
    assert emb.shape == (2, 128)
    assert emb.min() >= 0 and emb.max() <= 255  # postprocessed embeddings

    # classic-metrics registry path (eval.py FAD/KL embedder)
    from diffmusic_tpu.metrics.embeddings import get_embedding_model
    em = get_embedding_model("vggish", checkpoint_dir=str(tmp_path))
    assert em.dim == 128
    assert np.array_equal(em(wav), emb)
