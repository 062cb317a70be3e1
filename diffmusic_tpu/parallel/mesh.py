"""Device-mesh sharding utilities (dp x tp).

The reference is single-process single-GPU with no distributed backend
(SURVEY.md section 2, run.py:217/249); the TPU-native scaling story is:
- dp: shard the batch / num_waveforms_per_prompt / dataset-sweep axis over ICI
- tp: shard every large Dense/Conv output-channel axis, letting GSPMD insert the
  all-reduces (XLA collectives over ICI, not NCCL calls)

GSPMD propagates from these annotations through the whole scanned denoise program,
so one `jax.jit(..., in_shardings=...)` covers UNet, VAE, vocoder, and the
guidance backward pass.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None) -> Mesh:
    devices = np.asarray(jax.devices())
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"make_mesh needs {n} devices but the backend "
            f"({jax.default_backend()}) exposes only {len(devices)}. For a "
            f"virtual multi-device CPU mesh, set JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} before the "
            f"first backend use (tests/conftest.py does this), or call "
            f"__graft_entry__.dryrun_multichip which self-provisions.")
    devices = devices[:n]
    if dp is None and tp is None:
        tp = 1
        while tp * 2 <= n and n % (tp * 2) == 0 and tp < 4:
            tp *= 2
        dp = n // tp
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_dp(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch axis (axis 0) over 'dp', everything else replicated."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def _tp_spec_for(path_leaf: jax.Array, tp_size: int):
    """Shard the last (output-channel) axis over 'tp' when divisible.

    Dense kernels (I, O), Conv kernels (kh, kw, I, O) and biases (O,) all carry
    the output dim last, so one rule covers the whole model zoo.
    """
    shape = path_leaf.shape
    if len(shape) >= 1 and shape[-1] % tp_size == 0 and shape[-1] >= tp_size * 8:
        return P(*([None] * (len(shape) - 1)), "tp")
    return P()


def shard_params_tp(params, mesh: Mesh):
    """NamedSharding pytree for a params pytree: output channels over 'tp'."""
    tp_size = mesh.shape["tp"]

    def leaf_sharding(leaf):
        return NamedSharding(mesh, _tp_spec_for(leaf, tp_size))

    return jax.tree.map(leaf_sharding, params)


def data_parallel_map(fn, mesh: Mesh):
    """jit fn with batch-axis inputs sharded over 'dp' (replicated params closed
    over). Replaces the reference's host-side multiprocessing fan-out for eval
    embedding computation (fadtk/fad_batch.py:46-48)."""
    def sharded(x):
        return jax.device_put(x, shard_batch_dp(mesh, x.ndim))

    jitted = jax.jit(fn)

    def wrapper(batch):
        return jitted(jax.tree.map(sharded, batch))

    return wrapper
