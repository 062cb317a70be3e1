"""EDM DPM-Solver++ (2M) schedule for the StableAudio DiT.

Equivalent of the diffusers `EDMDPMSolverMultistepScheduler` the reference's
dormant StableAudio pipeline selects (reference pipeline_stable_audio.py:25-27;
configs/model/stable_audio.yaml). TPU re-design: the sigma table is a precomputed
numpy constant closed over by the jitted sampler; the 2nd-order multistep update
is a pure function of (carry, index), so the whole sampler is one `lax.scan` —
the step index (not the timestep value) drives all table lookups, keeping every
gather static-shape.

Math (Karras et al. 2022 EDM preconditioning + DPM-Solver++ 2M, Lu et al. 2022):
  c_skip = sd^2 / (s^2 + sd^2);  c_out = s*sd / sqrt(s^2 + sd^2)
  c_in  = 1 / sqrt(s^2 + sd^2); c_noise = log(s) / 4
  x0_i  = c_skip * x + c_out * F(c_in * x, c_noise)        (epsilon-parametrized F)
  DPM++2M: x_{i+1} = (s_{i+1}/s_i) x - a_i (e^{-h} - 1) D_i,
           D_i = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1}
"""

from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class EDMDPMSolverMultistepSchedule:
    sigma_min: float = 0.3
    sigma_max: float = 500.0
    sigma_data: float = 1.0
    rho: float = 7.0
    solver_order: int = 2
    prediction_type: str = "v_prediction"

    def sigmas(self, num_inference_steps: int) -> np.ndarray:
        """Karras rho-spaced sigma table, descending, with trailing 0."""
        ramp = np.linspace(0, 1, num_inference_steps, dtype=np.float64)
        inv_rho = 1.0 / self.rho
        s = (self.sigma_max ** inv_rho
             + ramp * (self.sigma_min ** inv_rho - self.sigma_max ** inv_rho)
             ) ** self.rho
        return np.append(s, 0.0).astype(np.float32)

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """c_noise values fed to the model as `timestep` (diffusers EDM:
        0.25 * log(sigma))."""
        return 0.25 * np.log(self.sigmas(num_inference_steps)[:-1])

    def scale_input(self, sample, sigma):
        return sample / jnp.sqrt(sigma ** 2 + self.sigma_data ** 2)

    def precondition_outputs(self, sample, model_output, sigma):
        """x0-hat from the raw network output under EDM preconditioning."""
        sd = self.sigma_data
        c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
        if self.prediction_type == "epsilon":
            c_out = sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
        elif self.prediction_type == "v_prediction":
            c_out = -sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
        else:
            raise ValueError(f"Unsupported prediction_type: {self.prediction_type}")
        return c_skip * sample + c_out * model_output


def make_edm_sampler(schedule: EDMDPMSolverMultistepSchedule,
                     num_inference_steps: int,
                     model_fn: Callable) -> Callable:
    """Build `sample(latents, key) -> latents` scanning DPM-Solver++ 2M.

    model_fn(scaled_sample, c_noise_timestep) -> raw network output. The first
    step falls back to first-order (no x0 history), matching diffusers'
    lower_order_final/warmup behavior for order 2.
    """
    sig = jnp.asarray(schedule.sigmas(num_inference_steps))  # (N+1,)
    c_noise = jnp.asarray(schedule.timesteps(num_inference_steps))  # (N,)

    def body(carry, i):
        x, x0_prev = carry
        s, s_next, c = sig[i], sig[i + 1], c_noise[i]
        out = model_fn(schedule.scale_input(x, s), c)
        x0 = schedule.precondition_outputs(x, out, s)

        # log-sigma space; guard the final sigma=0 with a floor (the final
        # update is first-order in the s_next -> 0 limit: x = x0)
        lam = jnp.log(jnp.maximum(s, 1e-10))
        lam_next = jnp.log(jnp.maximum(s_next, 1e-10))
        h = lam - lam_next

        s_prev = sig[jnp.maximum(i - 1, 0)]
        lam_prev = jnp.log(jnp.maximum(s_prev, 1e-10))
        r = jnp.where(i > 0, (lam_prev - lam) / jnp.maximum(h, 1e-10), 1.0)

        d = jnp.where(i > 0,
                      (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev,
                      x0)
        x_next = (s_next / s) * x - jnp.expm1(-h) * d
        x_next = jnp.where(s_next > 0, x_next, x0)
        return (x_next, x0), None

    def sample(latents, key=None):
        # fp32 solver algebra regardless of the model compute dtype (matches
        # the DDIM-family samplers); model_fn casts at the network boundary
        lat = latents.astype(jnp.float32)
        init = (lat * sig[0], jnp.zeros_like(lat))
        (final, _), _ = jax.lax.scan(body, init,
                                     jnp.arange(num_inference_steps))
        return final

    return sample
