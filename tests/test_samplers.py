"""Sampler math: schedule parity with diffusers formulas + guided-step behavior on
an analytically tractable toy inverse problem (latents ARE the signal)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmusic_tpu.samplers import (
    DiffusionSchedule, SamplerConfig, make_step_fn, get_scheduler, slerp,
)


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule(num_train_timesteps=1000, beta_start=0.0015,
                             beta_end=0.0195, beta_schedule="scaled_linear",
                             set_alpha_to_one=False, steps_offset=1)


class TestSchedule:
    def test_scaled_linear_betas(self, sched):
        # matches diffusers: betas = linspace(sqrt(b0), sqrt(b1), N)^2
        betas = np.linspace(0.0015 ** 0.5, 0.0195 ** 0.5, 1000) ** 2
        ac = np.cumprod(1 - betas)
        np.testing.assert_allclose(sched.alphas_cumprod, ac, rtol=1e-5)
        assert sched.final_alpha_cumprod == pytest.approx(float(ac[0]))

    def test_leading_timesteps(self, sched):
        ts = sched.timesteps(50)
        assert len(ts) == 50
        assert ts[0] == 981 and ts[-1] == 1  # (49*20)+1 ... 0+1
        assert (np.diff(ts) == -20).all()

    def test_variance_formula(self, sched):
        t, tp = 981, 961
        a_t, a_p = sched.alphas_cumprod[t], sched.alphas_cumprod[tp]
        expected = ((1 - a_p) / (1 - a_t)) * (1 - a_t / a_p)
        assert float(sched.variance(t, tp)) == pytest.approx(expected, rel=1e-5)

    def test_alpha_prod_prev_final(self, sched):
        assert float(sched.alpha_prod_prev(-19)) == pytest.approx(
            sched.final_alpha_cumprod)

    def test_pred_original_roundtrip(self, sched, rng):
        x0 = jnp.asarray(rng.standard_normal((1, 8, 16, 16)).astype(np.float32))
        eps = jnp.asarray(rng.standard_normal((1, 8, 16, 16)).astype(np.float32))
        t = 500
        a = sched.alphas_cumprod[t]
        xt = a ** 0.5 * x0 + (1 - a) ** 0.5 * eps
        np.testing.assert_allclose(np.asarray(sched.pred_original(eps, t, xt)),
                                   np.asarray(x0), rtol=1e-3, atol=1e-4)


class TestSlerp:
    def test_slerp_endpoints(self, rng):
        x0 = jnp.asarray(rng.standard_normal(100).astype(np.float32))
        x1 = jnp.asarray(rng.standard_normal(100).astype(np.float32))
        np.testing.assert_allclose(np.asarray(slerp(x0, x1, 0.0)), np.asarray(x0),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(slerp(x0, x1, 1.0)), np.asarray(x1),
                                   rtol=1e-4, atol=1e-4)

    def test_slerp_parallel_falls_back_to_lerp(self):
        x = jnp.ones(10)
        out = slerp(x, x * 2, 0.5)
        np.testing.assert_allclose(np.asarray(out), 1.5, rtol=1e-5)

    def test_slerp_matches_torch_reference_math(self, rng):
        import torch

        def torch_slerp(x0, x1, gamma=0.008, threshold=0.9995):
            cos_theta = ((x0 / torch.norm(x0)) * (x1 / torch.norm(x1))).sum()
            if cos_theta.abs() > threshold:
                return x0 + gamma * (x1 - x0)
            theta = torch.acos(cos_theta)
            sin_theta = torch.sin(theta)
            w0 = torch.sin((1 - gamma) * theta) / sin_theta
            w1 = torch.sin(gamma * theta) / sin_theta
            return w0 * x0 + w1 * x1

        a = rng.standard_normal(64).astype(np.float32)
        b = rng.standard_normal(64).astype(np.float32)
        want = torch_slerp(torch.from_numpy(a), torch.from_numpy(b), 0.08).numpy()
        got = np.asarray(slerp(jnp.asarray(a), jnp.asarray(b), 0.08))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _toy_problem(sched, rng, n_steps=20):
    """Latent IS the signal; A = box mask; y = A(x_true)."""
    shape = (1, 1, 8, 16)
    x_true = jnp.asarray((rng.standard_normal(shape) * 0.5).astype(np.float32))
    mask = np.ones(shape, np.float32)
    mask[..., 4:8, :] = 0.0
    mask = jnp.asarray(mask)
    y = x_true * mask

    def loss_fn(x0):
        return jnp.linalg.norm(y - x0 * mask)

    return x_true, mask, y, loss_fn, shape


class TestGuidedSteps:
    @pytest.mark.parametrize("name,eta,rate", [
        ("dps", 0.0, 0.5), ("mpgd", 0.0, 0.5), ("dsg", 1.0, 0.2),
        ("diffmusic", 1.0, 0.2), ("ddim", 0.0, 0.0),
    ])
    def test_step_shapes_and_finiteness(self, sched, rng, name, eta, rate):
        x_true, mask, y, loss_fn, shape = _toy_problem(sched, rng)
        cfg = SamplerConfig(name=name, eta=eta, ip_guidance_rate=rate,
                            num_inference_steps=20)
        step = make_step_fn(sched, cfg, loss_fn)
        eps = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        xt = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        if name == "ddim":
            prev, x0, loss = step(eps, jnp.int32(981), xt)
        else:
            prev, x0, loss = step(eps, jnp.int32(981), xt, jax.random.key(0))
        assert prev.shape == shape and x0.shape == shape
        assert np.isfinite(np.asarray(prev)).all()
        assert np.isfinite(float(loss))

    @pytest.mark.parametrize("name,eta,rate", [
        # DPS uses an L2-*norm* loss whose gradient is always unit-magnitude, so
        # its rate must be small (the reference default is 5e-4, configs/dps.yaml)
        ("dps", 0.0, 0.02), ("mpgd", 0.0, 0.3), ("dsg", 1.0, 0.3),
        ("diffmusic", 1.0, 0.3),
    ])
    def test_full_scan_recovers_measurement(self, sched, rng, name, eta, rate):
        """Scanned guided sampling should drive the masked-region residual down."""
        n_steps = 50
        x_true, mask, y, loss_fn, shape = _toy_problem(sched, rng, n_steps)
        cfg = SamplerConfig(name=name, eta=eta, ip_guidance_rate=rate,
                            num_inference_steps=n_steps)
        step = make_step_fn(sched, cfg, loss_fn)
        ts = jnp.asarray(sched.timesteps(n_steps))

        # toy "model": predicts eps consistent with x0 = current best guess of y
        def model(xt, t):
            a = sched.alpha_prod(t)
            return (xt - a ** 0.5 * y) / (1 - a) ** 0.5

        def body(carry, tk):
            xt, key = carry
            t = tk
            key, sub = jax.random.split(key)
            eps = model(xt, t)
            prev, x0, loss = step(eps, t, xt, sub)
            return (prev, key), loss

        x_init = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        (x_final, _), losses = jax.lax.scan(body, (x_init, jax.random.key(2)), ts)
        # observed region must match the measurement closely
        obs_err = float(jnp.linalg.norm((x_final - y) * mask))
        assert obs_err < 1.0, f"{name}: obs_err={obs_err}, losses={losses[-5:]}"
        assert float(losses[-1]) < float(losses[0])


class TestRegistry:
    def test_get_scheduler(self):
        for name in ("ddim", "dps", "mpgd", "dsg", "diffmusic", "ditto"):
            assert get_scheduler(name) == name
        with pytest.raises(ValueError):
            get_scheduler("unknown")

    def test_guided_requires_loss_fn(self, sched):
        with pytest.raises(ValueError):
            make_step_fn(sched, SamplerConfig(name="dps"), None)
