"""DDIM noise schedule tables (diffusers-compatible math, precomputed in numpy).

The alpha-cumprod table is a compile-time constant gathered with `jnp.take` inside
the scanned step, so timesteps can be traced values. Matches the configuration the
reference instantiates from configs/model/*.yaml (scaled_linear betas in
[0.0015, 0.0195], 1000 train steps, leading spacing, steps_offset=1,
set_alpha_to_one=False).
"""

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DiffusionSchedule:
    num_train_timesteps: int = 1000
    beta_start: float = 0.0015
    beta_end: float = 0.0195
    beta_schedule: str = "scaled_linear"
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    timestep_spacing: str = "leading"
    prediction_type: str = "epsilon"
    alphas_cumprod: np.ndarray = field(init=False, repr=False)
    final_alpha_cumprod: float = field(init=False)

    def __post_init__(self):
        n = self.num_train_timesteps
        if self.beta_schedule == "linear":
            betas = np.linspace(self.beta_start, self.beta_end, n, dtype=np.float64)
        elif self.beta_schedule == "scaled_linear":
            betas = np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5, n,
                                dtype=np.float64) ** 2
        else:
            raise ValueError(f"Unsupported beta_schedule: {self.beta_schedule}")
        ac = np.cumprod(1.0 - betas).astype(np.float32)
        object.__setattr__(self, "alphas_cumprod", ac)
        object.__setattr__(self, "final_alpha_cumprod",
                           1.0 if self.set_alpha_to_one else float(ac[0]))

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending inference timesteps with `leading` spacing + steps_offset."""
        n = self.num_train_timesteps
        if self.timestep_spacing == "leading":
            step_ratio = n // num_inference_steps
            ts = (np.arange(0, num_inference_steps) * step_ratio).round()
            ts = ts[::-1].copy().astype(np.int32) + self.steps_offset
        elif self.timestep_spacing == "trailing":
            step_ratio = n / num_inference_steps
            ts = np.round(np.arange(n, 0, -step_ratio)).astype(np.int32) - 1
        else:
            raise ValueError(f"Unsupported timestep_spacing: {self.timestep_spacing}")
        return ts

    def step_ratio(self, num_inference_steps: int) -> int:
        return self.num_train_timesteps // num_inference_steps

    # --- traced-timestep lookups (usable inside lax.scan) ---

    def alpha_prod(self, t):
        ac = jnp.asarray(self.alphas_cumprod)
        return jnp.take(ac, jnp.clip(t, 0, self.num_train_timesteps - 1))

    def alpha_prod_prev(self, t_prev):
        ac = jnp.asarray(self.alphas_cumprod)
        safe = jnp.take(ac, jnp.clip(t_prev, 0, self.num_train_timesteps - 1))
        return jnp.where(t_prev >= 0, safe, self.final_alpha_cumprod)

    def variance(self, t, t_prev):
        """DDIM posterior variance (diffusers DDIMScheduler._get_variance)."""
        a_t = self.alpha_prod(t)
        a_prev = self.alpha_prod_prev(t_prev)
        b_t = 1.0 - a_t
        b_prev = 1.0 - a_prev
        return (b_prev / b_t) * (1.0 - a_t / a_prev)

    def pred_original(self, eps, t, sample):
        """x0-hat for epsilon prediction: (x_t - sqrt(1-a_t) eps) / sqrt(a_t)."""
        a_t = self.alpha_prod(t)
        return (sample - (1.0 - a_t) ** 0.5 * eps) / a_t ** 0.5
