"""Guided samplers (the scientific core of the framework).

Each sampler is a *pure function* of (model_output, timestep, sample, key) closed
over the diffusion schedule and a reconstruction-loss function; the pipelines scan
them with `jax.lax.scan`, so the whole 500-step guided denoise compiles into one XLA
program. Guidance gradients are `jax.grad` of the loss chain (VAE decode -> vocoder
-> degradation operator), replacing torch.enable_grad/autograd.grad in the reference
(diffmusic/schedulers/scheduling_dps.py:164-213 etc).
"""

from .schedule import DiffusionSchedule
from .steps import (
    InverseProblemSchedulerOutput,
    SamplerConfig,
    make_step_fn,
    ddim_step,
    dps_step,
    mpgd_step,
    dsg_step,
    diffmusic_step,
    slerp,
)

SCHEDULER_REGISTRY = ("ddim", "dps", "mpgd", "dsg", "diffmusic", "ditto")


def get_scheduler(scheduler_name: str) -> str:
    """Validate and normalize a scheduler name (factory parity with the reference's
    get_scheduler, diffmusic/schedulers/__init__.py:9-24; here samplers are pure
    functions selected by name via `make_step_fn`)."""
    if scheduler_name not in SCHEDULER_REGISTRY:
        raise ValueError(f"Unknown scheduler: {scheduler_name}")
    return scheduler_name


__all__ = [
    "DiffusionSchedule", "SamplerConfig", "make_step_fn", "get_scheduler",
    "ddim_step", "dps_step", "mpgd_step", "dsg_step", "diffmusic_step", "slerp",
]
