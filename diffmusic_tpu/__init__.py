"""DiffMusic-TPU: a TPU-native (JAX/XLA/Pallas) framework for training-free music
inverse problems with latent audio-diffusion models.

Re-designed from scratch for TPU after the capabilities of jwliao1209/DiffMusic
(reference layer map: /root/reference/run.py, diffmusic/). The compute path is pure
JAX: DSP in `ops/`, degradation operators in `inverse_problem/`, flax models in
`models/`, guided samplers as pure `lax.scan`-able step functions in `samplers/`,
and orchestration in `pipelines/`.
"""

__version__ = "0.1.0"
