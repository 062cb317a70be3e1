from .frechet import frechet_distance, FrechetAudioDistance
from .kl import KullbackLeiblerDivergence
from .lsd import LogSpectralDistance
from .mse import MeanSquaredError
from .embeddings import MFCCStackEmbedding, get_embedding_model

__all__ = ["frechet_distance", "FrechetAudioDistance",
           "KullbackLeiblerDivergence", "LogSpectralDistance",
           "MeanSquaredError", "MFCCStackEmbedding", "get_embedding_model"]
