"""Pipeline factory (parity with reference diffmusic/pipelines/__init__.py:5-15)."""

from .base import AudioPipelineOutput, save_mel_spectrogram
from .musicldm import MusicLDMPipeline


def get_pipeline(pip_name: str):
    if pip_name == "musicldm":
        return MusicLDMPipeline
    if pip_name == "audioldm2":
        from .audioldm2 import AudioLDM2Pipeline
        return AudioLDM2Pipeline
    if pip_name == "stable_audio":
        # improvement over the reference, whose factory never returns its
        # StableAudioPipeline (reference pipelines/__init__.py:11-13)
        from .stable_audio import StableAudioPipeline
        return StableAudioPipeline
    raise ValueError(f"Unknown pipeline: {pip_name}")


__all__ = ["AudioPipelineOutput", "MusicLDMPipeline", "get_pipeline",
           "save_mel_spectrogram"]
