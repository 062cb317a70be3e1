"""Degradation operators A(x) and measurement-noise models.

Mirrors the reference's `diffmusic/inverse_problem/` (operator.py, noise.py,
__init__.py:4-11) with explicit JAX PRNG keys instead of global torch RNG state.
"""

from .noise import BaseNoise, GaussianNoise, PoissonNoise, get_noiser
from .operator import (
    BaseOperator,
    IdentityOperator,
    MusicInpaintingOperator,
    PhaseRetrievalOperator,
    SuperResolutionOperator,
    MusicDereverberationOperator,
    StyleGuidanceOperator,
)

__all__ = [
    "BaseNoise", "GaussianNoise", "PoissonNoise", "get_noiser",
    "BaseOperator", "IdentityOperator", "MusicInpaintingOperator",
    "PhaseRetrievalOperator", "SuperResolutionOperator",
    "MusicDereverberationOperator", "StyleGuidanceOperator",
]
