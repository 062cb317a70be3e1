"""Degradation operators: shapes, semantics, differentiability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmusic_tpu.inverse_problem import (
    GaussianNoise, PoissonNoise, get_noiser,
    IdentityOperator, MusicInpaintingOperator, PhaseRetrievalOperator,
    SuperResolutionOperator, MusicDereverberationOperator, StyleGuidanceOperator,
)


def _wave(rng, n=80000):
    return jnp.asarray(rng.standard_normal((1, n)).astype(np.float32) * 0.2)


class TestNoise:
    def test_gaussian_zero_sigma_is_identity(self, rng):
        x = _wave(rng, 1000)
        y = GaussianNoise(0.0)(x, jax.random.key(0))
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_gaussian_sigma_scales(self, rng):
        x = jnp.zeros((1, 100000))
        y = GaussianNoise(0.5)(x, jax.random.key(0))
        assert abs(float(jnp.std(y)) - 0.5) < 0.02

    def test_poisson_straight_through_grad(self):
        x = jnp.full((1, 100), 0.3)
        g = jax.grad(lambda v: jnp.sum(PoissonNoise(1.0)(v, jax.random.key(1))))(x)
        np.testing.assert_allclose(np.asarray(g), 1.0)

    def test_factory(self):
        assert isinstance(get_noiser(name="gaussian", sigma=0.0), GaussianNoise)
        assert isinstance(get_noiser(name="poisson", rate=1.0), PoissonNoise)
        with pytest.raises(ValueError):
            get_noiser(name="bogus")


class TestOperators:
    def test_identity(self, rng):
        x = _wave(rng)
        op = IdentityOperator(sample_rate=16000)
        np.testing.assert_array_equal(np.asarray(op.forward(x)), np.asarray(x))
        mel = op.transform(x)
        assert mel.shape == (1, 64, 501)
        assert float(jnp.max(mel)) <= 80.0

    def test_inpainting_box_mask(self, rng):
        x = _wave(rng)
        op = MusicInpaintingOperator(audio_length_in_s=5.0, sample_rate=16000,
                                     mask_type="box", start_inpainting_s=2.0,
                                     end_inpainting_s=3.0)
        y = op.forward(x)
        assert np.abs(np.asarray(y)[:, 32000:48000]).max() == 0.0
        np.testing.assert_array_equal(np.asarray(y)[:, :32000],
                                      np.asarray(x)[:, :32000])

    def test_inpainting_periodic_and_random(self, rng):
        x = _wave(rng)
        for mt in ("periodic", "random"):
            op = MusicInpaintingOperator(audio_length_in_s=5.0, sample_rate=16000,
                                         mask_type=mt)
            y = op.forward(x)
            zeros = (np.asarray(op.mask) == 0).sum()
            assert zeros > 0
            assert np.abs(np.asarray(y)[np.asarray(op.mask) == 0]).max() == 0.0

    def test_inpainting_grad_flows_through_unmasked(self, rng):
        op = MusicInpaintingOperator(audio_length_in_s=5.0, sample_rate=16000,
                                     mask_type="box", start_inpainting_s=2.0,
                                     end_inpainting_s=3.0)
        x = _wave(rng)
        g = jax.grad(lambda v: jnp.sum(op.forward(v) ** 2))(x)
        g = np.asarray(g)
        assert np.abs(g[:, 32000:48000]).max() == 0.0
        assert np.abs(g[:, :32000]).max() > 0.0

    def test_phase_retrieval_magnitude(self, rng):
        x = _wave(rng, 16000)
        op = PhaseRetrievalOperator()
        mag = op.forward(x)
        assert mag.shape == (1, 513, 101)
        assert (np.asarray(mag) >= 0).all()
        mel = op.transform(mag)
        assert mel.shape == (1, 64, 101)

    def test_super_resolution_length(self, rng):
        x = _wave(rng, 16000)
        op = SuperResolutionOperator(sample_rate=16000, scale=2)
        y = op.forward(x)
        assert y.shape == (1, 8000)
        # downsampling preserves low-frequency content
        t = np.arange(16000) / 16000
        tone = jnp.asarray(np.sin(2 * np.pi * 200 * t)[None].astype(np.float32))
        low = np.asarray(op.forward(tone))
        assert np.abs(low).max() > 0.8

    def test_dereverb_shapes_and_determinism(self, rng):
        x = _wave(rng, 16000)
        op = MusicDereverberationOperator(ir_length=5000, decay_factor=0.99)
        y1, y2 = op.forward(x), op.forward(x)
        # conv with pad ir//2: L + 2*2500 - 5000 + 1 = L + 1
        assert y1.shape == (1, 16001)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_style_guidance_gram(self, rng):
        def fake_clap(audio):
            return jnp.stack([audio[:, :32], audio[:, 32:64]], axis=1)  # (B,2,32)
        op = StyleGuidanceOperator(clap_embed=fake_clap)
        x = _wave(rng, 64)
        gram = op.transform(x)
        assert gram.shape == (1, 32, 32)
        np.testing.assert_allclose(np.asarray(gram), np.asarray(gram).transpose(0, 2, 1),
                                   atol=1e-5)

    def test_operator_loss_chain_differentiable(self, rng):
        """End-to-end: grad of ||A(x) - y|| in mel space through each operator."""
        x = _wave(rng)
        ops = [
            IdentityOperator(sample_rate=16000),
            MusicInpaintingOperator(audio_length_in_s=5.0, sample_rate=16000,
                                    mask_type="box", start_inpainting_s=2.0,
                                    end_inpainting_s=3.0),
            SuperResolutionOperator(sample_rate=16000, scale=2),
            MusicDereverberationOperator(ir_length=800, decay_factor=0.85),
        ]
        for op in ops:
            y = op.forward(x)
            target = op.transform(y)

            def loss(v):
                return jnp.linalg.norm(op.transform(op.forward(v)) - target)

            g = jax.grad(loss)(x + 0.01)
            assert np.isfinite(np.asarray(g)).all(), type(op).__name__
