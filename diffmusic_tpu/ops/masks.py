"""Time-domain inpainting masks (box / random / periodic).

Same mask families as the reference (diffmusic/inverse_problem/operator.py:87-121),
built as static numpy arrays (box/periodic) or with an explicit PRNG key (random) so
the jitted guidance path closes over a constant mask tensor.
"""

import jax
import jax.numpy as jnp
import numpy as np


def box_mask(total_samples: int, sample_rate: int,
             start_s: float | None, end_s: float | None) -> np.ndarray:
    mask = np.ones((1, total_samples), np.float32)
    if start_s is not None and end_s is not None:
        mask[:, int(start_s * sample_rate):int(end_s * sample_rate)] = 0.0
    return mask


def random_mask(key: jax.Array, total_samples: int, sample_rate: int,
                mask_percentage: float, mask_duration_s: float) -> np.ndarray:
    """`mask_count` random spans of `mask_duration_s`, like operator.py:101-111."""
    dur = int(mask_duration_s * sample_rate)
    mask_samples = int(mask_percentage * total_samples)
    mask_count = max(1, mask_samples // dur)
    starts = jax.random.randint(key, (mask_count,), 0, total_samples - dur)
    starts = np.asarray(starts)
    mask = np.ones((1, total_samples), np.float32)
    for s in starts:
        mask[:, int(s):int(s) + dur] = 0.0
    return mask


def periodic_mask(total_samples: int, sample_rate: int,
                  interval_s: float, mask_duration_s: float) -> np.ndarray:
    interval = int(interval_s * sample_rate)
    dur = int(mask_duration_s * sample_rate)
    mask = np.ones((1, total_samples), np.float32)
    for start in range(0, total_samples, interval):
        mask[:, start:min(start + dur, total_samples)] = 0.0
    return mask
