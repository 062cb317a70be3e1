"""Measurement-noise models with explicit PRNG keys.

Reference: diffmusic/inverse_problem/noise.py. The Poisson noiser there round-trips
through numpy on the host (noise.py:32-39), killing differentiability and device
residency; here it is TPU-native `jax.random.poisson` with a straight-through
gradient so the guidance path still differentiates through `A(.)` when the noiser is
part of it.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp


class BaseNoise:
    def __call__(self, data, key=None):
        return self.forward(data, key)

    def forward(self, data, key=None):
        raise NotImplementedError


@dataclass(frozen=True)
class GaussianNoise(BaseNoise):
    sigma: float = 0.0

    def forward(self, data, key=None):
        if self.sigma == 0.0 or key is None:
            return data
        return data + jax.random.normal(key, data.shape, data.dtype) * self.sigma


@dataclass(frozen=True)
class PoissonNoise(BaseNoise):
    rate: float = 1.0

    def forward(self, data, key=None):
        if key is None:
            return data
        x = jnp.clip((data + 1.0) / 2.0, 0.0, 1.0)
        lam = x * 255.0 * self.rate
        noisy = jax.random.poisson(key, lam).astype(data.dtype) / (255.0 * self.rate)
        noisy = jnp.clip(noisy * 2.0 - 1.0, -1.0, 1.0)
        # straight-through: sample in the forward pass, identity in the backward
        return data + jax.lax.stop_gradient(noisy - data)


def get_noiser(name: str, **kwargs) -> BaseNoise:
    """Factory matching the reference's get_noiser (inverse_problem/__init__.py:4-11)."""
    if name == "gaussian":
        return GaussianNoise(sigma=float(kwargs.get("sigma", 0.0)))
    if name == "poisson":
        return PoissonNoise(rate=float(kwargs.get("rate", 1.0)))
    raise ValueError(f"Unknown noiser: {name}")
