"""Pure step functions for DDIM / DPS / MPGD / DSG / DiffMusic guided sampling.

Each returns (prev_sample, pred_original_sample, rec_loss). `loss_fn` is the scalar
reconstruction loss as a function of the pred-x0 latent — the pipeline composes it
from VAE decode, vocoder, degradation operator, and supervision-space transform, so
`jax.grad(loss_fn)` is the TPU equivalent of the reference's
torch.autograd.grad through that chain.

Update rules re-derived from:
  DPS       scheduling_dps.py:137-219       (arXiv:2209.14687)
  MPGD      scheduling_mpgd.py:137-224      (arXiv:2311.16424)
  DSG       scheduling_dsg.py:148-230       (arXiv:2402.03201)
  DiffMusic scheduling_diffmusic.py:148-229 (slerp noise/gradient mixing)
  DDIM      scheduling_ddim.py:58-104
DITTO (scheduling_ditto.py) is an outer-loop optimization over init latents and
lives in pipelines (the whole scan is differentiated w.r.t. the initial latent).
"""

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule

LossFn = Callable[[jax.Array], jax.Array]  # pred_x0 latent -> scalar


@dataclass(frozen=True)
class SamplerConfig:
    name: str = "diffmusic"
    eta: float = 1.0
    ip_guidance_rate: float = 0.08
    num_inference_steps: int = 200
    eps: float = 1e-8


def _common(schedule: DiffusionSchedule, t, num_inference_steps: int):
    t_prev = t - schedule.step_ratio(num_inference_steps)
    a_prev = schedule.alpha_prod_prev(t_prev)
    var = schedule.variance(t, t_prev)
    return t_prev, a_prev, var


def _recomposed_eps(schedule, t, sample, x0):
    """eps implied by (sample, x0): (x_t - sqrt(a_t) x0) / sqrt(1 - a_t)."""
    a_t = schedule.alpha_prod(t)
    return (sample - a_t ** 0.5 * x0) / (1.0 - a_t) ** 0.5


def slerp(x0: jax.Array, x1: jax.Array, gamma: float,
          threshold: float = 0.9995) -> jax.Array:
    """Spherical interpolation between flattened tensors (branch-free lax form).

    Falls back to lerp when the directions are near-(anti)parallel, like the
    reference's slerp (scheduling_diffmusic.py:59-68) — expressed with jnp.where so
    it traces under jit.
    """
    n0 = jnp.linalg.norm(x0)
    n1 = jnp.linalg.norm(x1)
    cos_theta = jnp.sum((x0 / n0) * (x1 / n1))
    cos_safe = jnp.clip(cos_theta, -threshold, threshold)
    theta = jnp.arccos(cos_safe)
    sin_theta = jnp.sin(theta)
    w0 = jnp.sin((1.0 - gamma) * theta) / sin_theta
    w1 = jnp.sin(gamma * theta) / sin_theta
    lerp = x0 + gamma * (x1 - x0)
    out = w0 * x0 + w1 * x1
    return jnp.where(jnp.abs(cos_theta) > threshold, lerp, out)


def ddim_step(schedule: DiffusionSchedule, cfg: SamplerConfig,
              eps: jax.Array, t, sample: jax.Array,
              key: Optional[jax.Array] = None, loss_fn: Optional[LossFn] = None):
    """Plain (unguided) DDIM: prev = sqrt(a_prev) x0 + sqrt(1 - a_prev) eps."""
    _, a_prev, _ = _common(schedule, t, cfg.num_inference_steps)
    x0 = schedule.pred_original(eps, t, sample)
    eps_rec = _recomposed_eps(schedule, t, sample, x0)
    prev = a_prev ** 0.5 * x0 + (1.0 - a_prev) ** 0.5 * eps_rec
    loss = jnp.asarray(t, jnp.float32)
    return prev, x0, loss


def dps_step(schedule: DiffusionSchedule, cfg: SamplerConfig,
             eps: jax.Array, t, sample: jax.Array, key: jax.Array,
             loss_fn: LossFn):
    """DPS: prev = DDIM(x_t) - rate * d rec_loss(x0(x_t)) / d x_t."""
    _, a_prev, var = _common(schedule, t, cfg.num_inference_steps)
    std = cfg.eta * var ** 0.5

    def loss_of_sample(s):
        x0 = schedule.pred_original(eps, t, s)
        return loss_fn(x0), x0

    (loss, x0), grad = jax.value_and_grad(loss_of_sample, has_aux=True)(sample)
    eps_rec = _recomposed_eps(schedule, t, sample, x0)
    prev = a_prev ** 0.5 * x0 + (1.0 - a_prev - std ** 2) ** 0.5 * eps_rec
    if cfg.eta > 0:
        prev = prev + std * jax.random.normal(key, sample.shape, sample.dtype)
    prev = prev - cfg.ip_guidance_rate * grad
    return prev, x0, loss


def mpgd_step(schedule: DiffusionSchedule, cfg: SamplerConfig,
              eps: jax.Array, t, sample: jax.Array, key: jax.Array,
              loss_fn: LossFn):
    """MPGD: guide x0-hat directly (cheaper graph — no grad through DDIM algebra)."""
    _, a_prev, var = _common(schedule, t, cfg.num_inference_steps)
    std = cfg.eta * var ** 0.5

    x0 = schedule.pred_original(eps, t, sample)
    x0 = jax.lax.stop_gradient(x0)
    loss, grad = jax.value_and_grad(loss_fn)(x0)
    x0 = x0 - cfg.ip_guidance_rate * grad

    eps_rec = _recomposed_eps(schedule, t, sample, x0)
    prev = a_prev ** 0.5 * x0 + (1.0 - a_prev - std ** 2) ** 0.5 * eps_rec
    if cfg.eta > 0:
        prev = prev + std * jax.random.normal(key, sample.shape, sample.dtype)
    return prev, x0, loss


def dsg_step(schedule: DiffusionSchedule, cfg: SamplerConfig,
             eps: jax.Array, t, sample: jax.Array, key: jax.Array,
             loss_fn: LossFn):
    """DSG: spherical-Gaussian-constraint mixing of noise and guidance directions."""
    _, a_prev, var = _common(schedule, t, cfg.num_inference_steps)
    std = cfg.eta * var ** 0.5

    def loss_of_sample(s):
        x0 = schedule.pred_original(eps, t, s)
        return loss_fn(x0) / 1000.0, x0

    (scaled_loss, x0), grad = jax.value_and_grad(loss_of_sample, has_aux=True)(sample)
    loss = scaled_loss * 1000.0

    mean = a_prev ** 0.5 * x0 + (1.0 - a_prev - std ** 2) ** 0.5 * eps
    grad_norm = jnp.linalg.norm(grad)
    numel = sample.size / sample.shape[0] if sample.ndim > 3 else sample.size
    r = jnp.sqrt(jnp.asarray(float(numel), sample.dtype)) * std
    d_star = -r * grad / (grad_norm + cfg.eps)
    z = jax.random.normal(key, sample.shape, sample.dtype)
    d_sample = std * z
    mix = d_sample + cfg.ip_guidance_rate * (d_star - d_sample)
    mix_norm = jnp.linalg.norm(mix)
    prev = mean + r * mix / (mix_norm + cfg.eps)
    return prev, x0, loss


def diffmusic_step(schedule: DiffusionSchedule, cfg: SamplerConfig,
                   eps: jax.Array, t, sample: jax.Array, key: jax.Array,
                   loss_fn: LossFn):
    """DiffMusic: slerp-mix the stochastic noise with the normalized -gradient."""
    _, a_prev, var = _common(schedule, t, cfg.num_inference_steps)
    std = cfg.eta * var ** 0.5

    def loss_of_sample(s):
        x0 = schedule.pred_original(eps, t, s)
        return loss_fn(x0) / 1000.0, x0

    (scaled_loss, x0), grad = jax.value_and_grad(loss_of_sample, has_aux=True)(sample)
    loss = scaled_loss * 1000.0

    mean = a_prev ** 0.5 * x0 + (1.0 - a_prev - std ** 2) ** 0.5 * eps
    z = jax.random.normal(key, sample.shape, sample.dtype)
    normalized_grad = grad / (jnp.linalg.norm(grad) + cfg.eps) * jnp.linalg.norm(z)
    mixed_eps = slerp(z, -normalized_grad, cfg.ip_guidance_rate)
    prev = mean + std * mixed_eps
    return prev, x0, loss


_STEPS = {
    "ddim": ddim_step,
    "dps": dps_step,
    "mpgd": mpgd_step,
    "dsg": dsg_step,
    "diffmusic": diffmusic_step,
    # "ditto" is realized at the pipeline level (outer-loop latent optimization);
    # its inner per-step update is plain DDIM with eta noise.
    "ditto": ddim_step,
}


def make_step_fn(schedule: DiffusionSchedule, cfg: SamplerConfig,
                 loss_fn: Optional[LossFn] = None):
    """Bind a sampler into `(eps, t, sample, key) -> (prev, x0, loss)`."""
    raw = _STEPS[cfg.name]

    if cfg.name == "ddim":
        def step(eps, t, sample, key=None):
            return ddim_step(schedule, cfg, eps, t, sample, key)
        return step

    if cfg.name == "ditto":
        def step(eps, t, sample, key=None):
            # DDIM mean + eta noise; loss evaluated on prev_sample (kept
            # differentiable for the outer init-latent gradient), like
            # scheduling_ditto.py:168-203.
            _, a_prev, var = _common(schedule, t, cfg.num_inference_steps)
            std = cfg.eta * var ** 0.5
            x0 = schedule.pred_original(eps, t, sample)
            eps_rec = _recomposed_eps(schedule, t, sample, x0)
            prev = a_prev ** 0.5 * x0 + (1.0 - a_prev - std ** 2) ** 0.5 * eps_rec
            if cfg.eta > 0 and key is not None:
                prev = prev + std * jax.random.normal(key, sample.shape, sample.dtype)
            loss = loss_fn(prev) if loss_fn is not None else jnp.float32(0)
            return prev, x0, loss
        return step

    if loss_fn is None:
        raise ValueError(f"Sampler '{cfg.name}' requires a loss_fn")

    def step(eps, t, sample, key):
        return raw(schedule, cfg, eps, t, sample, key, loss_fn)
    return step


@dataclass
class InverseProblemSchedulerOutput:
    """API-compat output record (reference schedulers/utils.py:8-16). The
    samplers themselves are pure functions returning (prev, x0, loss) tuples —
    this wrapper exists for users porting reference code that reads fields."""
    prev_sample: jax.Array
    pred_original_sample: jax.Array = None
    loss: jax.Array = None
    sample: jax.Array = None
    encoder_hidden_states: jax.Array = None
    encoder_hidden_states_1: jax.Array = None
    init_latents: jax.Array = None
