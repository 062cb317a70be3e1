"""Embedding model zoo for FAD evaluation (reference: fadtk/model_loader.py).

Same registry surface as the vendored fadtk the reference evaluates with
(fadtk/model_loader.py:21-86 ModelLoader ABC; get_all_models :675-700): every
loader has `name`, `sr`, `load_model()`, and `get_embedding(audio) ->
(frames, dim)`. This environment has zero egress, so loaders resolve weights
from a LOCAL checkpoint directory (`checkpoint_dir` or the
`DIFFMUSIC_TPU_CHECKPOINTS` env var) instead of the HF hub / torch.hub the
reference downloads from at runtime (fadtk/model_loader.py:323-378); a missing
checkpoint raises a clear error naming the expected path. `mfcc-stack` is the
always-available, deterministic, egress-free default.

transformers-backed loaders (w2v2/HuBERT/WavLM/Whisper/MERT/EnCodec) run the
HF torch models on CPU — evaluation embeddings are a host-side batch job in the
reference too (multiprocessing pool, fadtk/fad_batch.py:46-48); the TPU stays
dedicated to the diffusion hot loop.
"""

import os
from abc import ABC, abstractmethod
from pathlib import Path
from typing import List, Optional

import numpy as np


def _checkpoint_root(checkpoint_dir=None) -> Optional[Path]:
    d = checkpoint_dir or os.environ.get("DIFFMUSIC_TPU_CHECKPOINTS")
    return Path(d) if d else None


class ModelLoader(ABC):
    """Embedding model interface (reference fadtk/model_loader.py:21-86)."""

    def __init__(self, name: str, num_features: int, sr: int,
                 audio_len: Optional[float] = None):
        self.name = name
        self.num_features = num_features
        self.sr = sr
        self.audio_len = audio_len
        self.model = None
        self.loaded = False

    def get_embedding(self, audio: np.ndarray) -> np.ndarray:
        if not self.loaded:
            self.load_model()
            self.loaded = True
        embd = self._get_embedding(audio)
        return np.asarray(embd, np.float32)

    # fadtk calls models directly in places; keep both surfaces
    def __call__(self, audio: np.ndarray) -> np.ndarray:
        return self.get_embedding(audio)

    @abstractmethod
    def load_model(self):
        ...

    @abstractmethod
    def _get_embedding(self, audio: np.ndarray) -> np.ndarray:
        ...

    def load_wav(self, wav_file):
        from ..data import read_audio  # wav/mp3/opus (data/codecs.py)
        wav, sr = read_audio(wav_file)
        wav = wav.mean(axis=0)
        if sr != self.sr:
            from scipy.signal import resample_poly
            wav = resample_poly(wav, self.sr, sr)
        return wav.astype(np.float32)


class MFCCStackLoader(ModelLoader):
    """Deterministic egress-free default (see metrics/embeddings.py)."""

    def __init__(self):
        super().__init__("mfcc-stack", 160, 16000)

    def load_model(self):
        from ..metrics.embeddings import MFCCStackEmbedding
        self.model = MFCCStackEmbedding()

    def _get_embedding(self, audio):
        return self.model(audio)


class _LocalCheckpointLoader(ModelLoader):
    """Shared machinery for loaders that need a local checkpoint directory."""

    subdir: str = ""

    def __init__(self, name, num_features, sr, checkpoint_dir=None,
                 audio_len=None):
        super().__init__(name, num_features, sr, audio_len)
        self.checkpoint_dir = checkpoint_dir

    def _resolve(self) -> Path:
        root = _checkpoint_root(self.checkpoint_dir)
        if root is None:
            raise FileNotFoundError(
                f"Embedding model '{self.name}' needs local weights (no hub "
                f"egress here). Set DIFFMUSIC_TPU_CHECKPOINTS=<dir> containing "
                f"'{self.subdir}', or pass checkpoint_dir=.")
        path = root / self.subdir if self.subdir else root
        if not path.exists():
            raise FileNotFoundError(
                f"Embedding model '{self.name}': expected checkpoint at {path}")
        return path


class _HFFeatureLoader(_LocalCheckpointLoader):
    """transformers AutoModel hidden-state embeddings (w2v2 / HuBERT / WavLM /
    MERT family — reference fadtk/model_loader.py:524-632)."""

    def __init__(self, name, num_features, sr, subdir, layer=None,
                 checkpoint_dir=None, final_layer=False):
        super().__init__(name, num_features, sr, checkpoint_dir)
        self.subdir = subdir
        self.layer = layer
        # the unsuffixed variant means "the final encoder layer" (reference
        # fadtk names w2v2-base = layer 12 of the 12-layer model); resolve the
        # index against the LOADED checkpoint's depth so local checkpoints of
        # any depth (e.g. tiny test models) keep that semantics
        self.final_layer = final_layer

    def load_model(self):
        import torch
        from transformers import AutoModel
        path = self._resolve()
        self.model = AutoModel.from_pretrained(str(path)).eval()
        if self.final_layer:
            depth = getattr(self.model.config, "num_hidden_layers", None)
            if depth is not None:
                self.layer = depth
        self.torch = torch

    def _get_embedding(self, audio):
        torch = self.torch
        with torch.no_grad():
            x = torch.from_numpy(np.asarray(audio, np.float32))[None]
            out = self.model(x, output_hidden_states=self.layer is not None)
        if self.layer is not None:
            h = out.hidden_states[self.layer]
        else:
            h = out.last_hidden_state
        return h[0].cpu().numpy()


class W2V2Model(_HFFeatureLoader):
    """wav2vec2 base/large per-layer (reference fadtk/model_loader.py:524-558)."""

    def __init__(self, size: str = "base", layer: Optional[int] = None,
                 checkpoint_dir=None):
        dim = 768 if size == "base" else 1024
        # reference naming (fadtk/model_loader.py:532): the final layer (12
        # for base, 24 for large) is the unsuffixed name; other layers get a
        # plain -{layer} suffix
        last = 12 if size == "base" else 24
        tag = "" if layer in (None, last) else f"-{layer}"
        super().__init__(f"w2v2-{size}{tag}", dim, 16000,
                         f"wav2vec2-{size}-960h", layer, checkpoint_dir,
                         final_layer=layer in (None, last))


class HuBERTModel(_HFFeatureLoader):
    def __init__(self, size: str = "base", layer: Optional[int] = None,
                 checkpoint_dir=None):
        dim = 768 if size == "base" else 1024
        last = 12 if size == "base" else 24
        tag = "" if layer in (None, last) else f"-{layer}"
        super().__init__(f"hubert-{size}{tag}", dim, 16000,
                         f"hubert-{size}-ls960", layer, checkpoint_dir,
                         final_layer=layer in (None, last))


class WavLMModel(_HFFeatureLoader):
    def __init__(self, size: str = "base", layer: Optional[int] = None,
                 checkpoint_dir=None):
        dim = 768 if "base" in size else 1024
        last = 12 if "base" in size else 24
        tag = "" if layer in (None, last) else f"-{layer}"
        super().__init__(f"wavlm-{size}{tag}", dim, 16000,
                         f"wavlm-{size}", layer, checkpoint_dir,
                         final_layer=layer in (None, last))


class MERTModel(_HFFeatureLoader):
    """MERT-v1-95M per-layer (reference fadtk/model_loader.py:254-287)."""

    def __init__(self, layer: int = 12, checkpoint_dir=None):
        super().__init__(f"MERT-v1-95M-{layer}" if layer != 12 else "MERT-v1-95M",
                         768, 24000, "MERT-v1-95M", layer, checkpoint_dir, final_layer=layer == 12)


class WhisperModel(_LocalCheckpointLoader):
    """Whisper encoder embeddings (reference fadtk/model_loader.py:635-671)."""

    def __init__(self, size: str = "tiny", checkpoint_dir=None):
        dims = {"tiny": 384, "base": 512, "small": 768, "medium": 1024,
                "large": 1280}
        super().__init__(f"whisper-{size}", dims[size], 16000, checkpoint_dir)
        self.subdir = f"whisper-{size}"

    def load_model(self):
        import torch
        from transformers import AutoFeatureExtractor, WhisperModel as HFWhisper
        path = self._resolve()
        self.feature_extractor = AutoFeatureExtractor.from_pretrained(str(path))
        self.model = HFWhisper.from_pretrained(str(path)).eval()
        self.torch = torch

    def _get_embedding(self, audio):
        torch = self.torch
        feats = self.feature_extractor(np.asarray(audio, np.float32),
                                       sampling_rate=self.sr,
                                       return_tensors="pt")
        with torch.no_grad():
            h = self.model.encoder(feats.input_features).last_hidden_state
        return h[0].cpu().numpy()


class EncodecEmbModel(_LocalCheckpointLoader):
    """EnCodec continuous pre-quant embeddings (reference
    fadtk/model_loader.py:111-186)."""

    def __init__(self, variant: str = "24k", checkpoint_dir=None):
        super().__init__(f"encodec-emb{'' if variant == '24k' else '-48k'}",
                         128, 24000 if variant == "24k" else 48000,
                         checkpoint_dir)
        self.subdir = f"encodec_{variant}"

    def load_model(self):
        import torch
        from transformers import EncodecModel
        path = self._resolve()
        self.model = EncodecModel.from_pretrained(str(path)).eval()
        self.torch = torch

    def _get_embedding(self, audio):
        torch = self.torch
        x = torch.from_numpy(np.asarray(audio, np.float32))[None, None]
        with torch.no_grad():
            emb = self.model.encoder(x)  # (1, 128, frames)
        return emb[0].T.cpu().numpy()


class CLAPLaionModel(_LocalCheckpointLoader):
    """LAION-CLAP audio embeddings via this package's flax HTSAT tower
    (reference fadtk/model_loader.py:290-417 downloads laion_clap checkpoints;
    here the tower is the converted local CLAP audio model)."""

    def __init__(self, type: str = "audio", checkpoint_dir=None):
        # sr=16000: prepare_clap_input (models/clap_features.py) consumes
        # 16 kHz mono and does the 48 kHz resample itself, unlike the
        # reference loader which feeds laion_clap 48 kHz directly. Declared
        # here (not in load_model) so load_wav resamples correctly even for
        # files decoded before the lazy model load.
        super().__init__(f"clap-laion-{type}", 512, 16000, checkpoint_dir)
        self.type = type
        self.subdir = "clap"

    def load_model(self):
        from ..models.checkpoint import _cfg, _load_module_sd
        from ..models.htsat import ClapAudioModelWithProjection, ClapAudioConfig
        from ..models.clap_features import make_clap_audio_embed
        from ..models import convert
        path = self._resolve()
        clap_json = _cfg(path)
        ajson = clap_json.get("audio_config", {})
        cfg = ClapAudioConfig(
            spec_size=ajson.get("spec_size", 256),
            patch_size=ajson.get("patch_size", 4),
            patch_stride=tuple(ajson.get("patch_stride", (4, 4))),
            num_mel_bins=ajson.get("num_mel_bins", 64),
            window_size=ajson.get("window_size", 8),
            depths=tuple(ajson.get("depths", (2, 2, 6, 2))),
            num_attention_heads=tuple(ajson.get("num_attention_heads",
                                                (4, 8, 16, 32))),
            patch_embeds_hidden_size=ajson.get("patch_embeds_hidden_size", 96),
            projection_dim=clap_json.get("projection_dim", 512))
        params = convert.convert_clap_audio(_load_module_sd(path), cfg)
        self.model = make_clap_audio_embed(ClapAudioModelWithProjection(cfg),
                                           params)

    def _get_embedding(self, audio):
        # reference frame contract (fadtk/model_loader.py:391-412): int16
        # quantization round-trip, 10-s chunks at 1-s hop (zero-padded tail),
        # one embedding per chunk stacked to (timeframes, 512). Chunks are
        # batched through the flax tower in ONE call instead of a per-chunk
        # loop.
        x = np.asarray(audio, np.float32)
        x = (np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int16) / 32767.0
        chunk, hop = 10 * self.sr, self.sr
        starts = range(0, max(len(x), 1), hop)
        rows = []
        for i in starts:
            c = x[i:i + chunk]
            if len(c) < chunk:
                c = np.pad(c, (0, chunk - len(c)))
            rows.append(c)
        emb = self.model(np.stack(rows).astype(np.float32))
        return np.asarray(emb)


class VGGishModel(_LocalCheckpointLoader):
    """VGGish (reference diffmusic/metrics/fad.py:59 pulls it from torch.hub).

    Preferred path: the NATIVE implementation (metrics/vggish.py — flax
    network + AudioSet preprocessing + PCA postprocessor) loading a plain
    torchvggish state dict (`vggish.pth` or `vggish.npz`) from the checkpoint
    dir. Falls back to a local torch.hub checkout of harritaylor/torchvggish
    when only that layout is present."""

    def __init__(self, checkpoint_dir=None):
        super().__init__("vggish", 128, 16000, checkpoint_dir)
        self.subdir = "vggish"

    def load_model(self):
        path = self._resolve()
        for fname in ("vggish.pth", "vggish.npz", "weights.pth"):
            if (path / fname).exists():
                from ..metrics.vggish import load_vggish
                self._apply, self._pca = load_vggish(path / fname)
                self.model = "native"
                return
        import torch
        self.model = torch.hub.load(str(path), "vggish", source="local",
                                    pretrained=True)
        self.model.eval()
        self.torch = torch

    def _get_embedding(self, audio):
        if self.model == "native":
            from ..metrics.vggish import vggish_embedding
            return vggish_embedding(self._apply, self._pca,
                                    np.asarray(audio, np.float32))
        with self.torch.no_grad():
            emb = self.model.forward(np.asarray(audio, np.float64), self.sr)
        return emb.cpu().numpy()


class DACModel(_LocalCheckpointLoader):
    """Descript audio codec continuous encoder embeddings (reference
    fadtk/model_loader.py:189-251). Needs the `dac` package (descript-audio-
    codec) + a local weights file — not baked into this image, so load_model
    gates with a clear error; enumeration stays lazy/cheap."""

    def __init__(self, checkpoint_dir=None):
        super().__init__("dac-44kHz", 1024, 44100, checkpoint_dir)
        self.subdir = "dac_44khz"

    def load_model(self):
        try:
            import dac  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "Embedding model 'dac-44kHz' needs the descript-audio-codec "
                "package (`dac`), which is not installed in this image") from e
        import torch
        path = self._resolve()
        self.model = dac.DAC.load(str(path / "weights.pth")).eval()
        self.torch = torch

    def _get_embedding(self, audio):
        # Reference (fadtk/model_loader.py:189-251) normalizes to -16 LUFS via
        # audiotools and encodes 5-s windows with 50% overlap. audiotools is
        # not in this image, so loudness uses an RMS dBFS proxy (documented
        # divergence, PARITY.md); the 5-s/50%-overlap windowing is exact.
        torch = self.torch
        audio = np.asarray(audio, np.float32)
        rms = float(np.sqrt(np.mean(audio ** 2))) if audio.size else 0.0
        if rms > 0:
            gain = 10.0 ** ((-16.0 - 20.0 * np.log10(rms)) / 20.0)
            audio = np.clip(audio * gain, -1.0, 1.0)
        win = 5 * self.sr
        hop = win // 2
        frames = []
        for start in range(0, max(len(audio), 1), hop):
            chunk = audio[start:start + win]
            if len(chunk) == 0:
                break
            x = torch.from_numpy(chunk)[None, None]
            with torch.no_grad():
                x = self.model.preprocess(x, self.sr)
                z = self.model.encoder(x)  # (1, 1024, frames)
            frames.append(z[0].T.cpu().numpy())
            if start + win >= len(audio):
                break
        return np.concatenate(frames, axis=0)


class CdpamModel(_LocalCheckpointLoader):
    """CDPAM perceptual embeddings (reference fadtk/model_loader.py:420-459).
    Needs the `cdpam` package (not in this image); gated like DAC."""

    def __init__(self, mode: str = "acoustic", checkpoint_dir=None):
        super().__init__(f"cdpam-{mode}", 512, 22050, checkpoint_dir)
        self.mode = mode
        self.subdir = "cdpam"

    def load_model(self):
        try:
            import cdpam
        except ImportError as e:
            raise ImportError(
                "Embedding model 'cdpam-*' needs the `cdpam` package, which "
                "is not installed in this image") from e
        self.model = cdpam.CDPAM(dev="cpu")

    def _get_embedding(self, audio):
        # 1-s windows, one L2-normalized embedding per window, stacked to
        # (frames, 512) — matching reference fadtk/model_loader.py:433-448
        # (a single whole-file pass would return one frame and break the
        # FAD mean/cov over the frames axis)
        import torch
        audio = np.asarray(audio, np.float32)
        frames = []
        for start in range(0, max(len(audio), 1), self.sr):
            chunk = audio[start:start + self.sr]
            if len(chunk) == 0:
                continue
            x = torch.from_numpy(
                np.round(chunk * 32768.0)).float()[None]
            with torch.no_grad():
                _, acoustic, content = self.model.model.base_encoder.forward(
                    x.unsqueeze(1))
            h = acoustic if self.mode == "acoustic" else content
            h = torch.nn.functional.normalize(h, dim=1)
            frames.append(h.cpu().numpy())
        return np.concatenate(frames, axis=0)


class MSCLAPModel(_LocalCheckpointLoader):
    """Microsoft CLAP 2023 audio embeddings (reference
    fadtk/model_loader.py:462-521). Needs the `msclap` package; gated."""

    def __init__(self, year: str = "2023", checkpoint_dir=None):
        super().__init__(f"clap-{year}", 1024, 44100, checkpoint_dir)
        self.year = year
        self.subdir = f"msclap_{year}"

    def load_model(self):
        try:
            from msclap import CLAP
        except ImportError as e:
            raise ImportError(
                "Embedding model 'clap-2023' needs the `msclap` package, "
                "which is not installed in this image") from e
        path = self._resolve()
        self.model = CLAP(model_fp=str(path / "CLAP_weights.pth"),
                          version=self.year, use_cuda=False)

    def _get_embedding(self, audio):
        # 7-s windows with a 1-s hop, one embedding per window, stacked to
        # (timeframes, 1024) — reference fadtk/model_loader.py:462-521 (a
        # single pooled whole-file vector would give FAD stats one frame)
        import tempfile
        from scipy.io import wavfile
        audio = np.asarray(audio, np.float32)
        win, hop = 7 * self.sr, 1 * self.sr
        frames = []
        for start in range(0, max(len(audio), 1), hop):
            chunk = audio[start:start + win]
            if len(chunk) == 0:
                break
            # msclap's public surface is file-based
            with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                wavfile.write(f.name, self.sr, chunk)
                emb = np.asarray(self.model.get_audio_embeddings([f.name])[0])
            frames.append(emb[None] if emb.ndim == 1 else emb)
            if start + win >= len(audio):
                break
        return np.concatenate(frames, axis=0)


def get_all_models(checkpoint_dir=None) -> List[ModelLoader]:
    """Enumerate the zoo (reference fadtk/model_loader.py:675-700). Loaders are
    lazy: enumeration never touches disk; load happens on first embedding."""
    ms: List[ModelLoader] = [
        MFCCStackLoader(),
        VGGishModel(checkpoint_dir),
        CLAPLaionModel("audio", checkpoint_dir),
        CLAPLaionModel("music", checkpoint_dir),
        EncodecEmbModel("24k", checkpoint_dir),
        EncodecEmbModel("48k", checkpoint_dir),
        *(MERTModel(layer, checkpoint_dir) for layer in range(1, 13)),
        *(W2V2Model("base", l, checkpoint_dir) for l in range(1, 13)),
        *(W2V2Model("large", l, checkpoint_dir) for l in range(1, 25)),
        *(HuBERTModel("base", l, checkpoint_dir) for l in range(1, 13)),
        *(HuBERTModel("large", l, checkpoint_dir) for l in range(1, 25)),
        *(WavLMModel("base", l, checkpoint_dir) for l in range(1, 13)),
        *(WavLMModel("base-plus", l, checkpoint_dir) for l in range(1, 13)),
        *(WavLMModel("large", l, checkpoint_dir) for l in range(1, 25)),
        *(WhisperModel(s, checkpoint_dir)
          for s in ("tiny", "base", "small", "medium", "large")),
        DACModel(checkpoint_dir),
        CdpamModel("acoustic", checkpoint_dir),
        CdpamModel("content", checkpoint_dir),
        MSCLAPModel("2023", checkpoint_dir),
    ]
    return ms


def get_model(name: str, checkpoint_dir=None) -> ModelLoader:
    for m in get_all_models(checkpoint_dir):
        if m.name == name:
            return m
    known = ", ".join(m.name for m in get_all_models(checkpoint_dir))
    raise ValueError(f"Unknown embedding model '{name}'. Known: {known}")
